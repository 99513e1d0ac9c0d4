from smmb_tpu.kernels.packed_spmm import packed_spmm
