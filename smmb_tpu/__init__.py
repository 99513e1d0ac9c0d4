"""smmb_tpu — a TPU-native sparse ternary linear-algebra framework.

Built from scratch in JAX/XLA/Pallas with the capabilities of the CPU benchmark
suite `shepherdvovkes/sparse-matrix-multiplication-benchmark` (see SURVEY.md):

- ``formats``: TCSC (ternary compressed sparse column, two index planes,
  reference layout contract: /root/reference/sparse/tcsc.h:6-17), BCSR
  (/root/reference/sparse/bcsr.h:5-12), and the TPU-native ``TernaryPacked``
  2-bit dense execution format (net-new; no reference counterpart).
- ``ops``: jnp reference-semantics kernels (SpMM, PReLU epilogues, dense GEMM
  oracle) mirroring /root/reference/sparse/tcsc.c kernels.
- ``kernels``: Pallas TPU kernels (decompress-and-MXU, gather SpMM, BCSR).
- ``parallel``: mesh partitioner + shard_map collectives (net-new layer
  required by BASELINE.json).
- ``models``: ternary MLP forward + straight-through-estimator training.
- ``bench``: measurement harness + roofline reporting replacing the
  reference's RDTSC/PAPI/kperf stack (/root/reference/measure.h:13-76).
"""

__version__ = "0.1.0"

from smmb_tpu.formats.tcsc import TCSC, tcsc_from_dense, tcsc_to_dense
from smmb_tpu.formats.bcsr import BCSR, bcsr_from_dense, bcsr_to_dense
from smmb_tpu.formats.packed import TernaryPacked, pack_ternary, unpack_ternary
from smmb_tpu.formats.tcsc import TCSCPadded, tcsc_pad_columns
from smmb_tpu.formats.packed import pack_ternary_device
from smmb_tpu.kernels.packed_spmm import packed_spmm
from smmb_tpu.ops import (
    bcsr_spmm,
    bcsr_spmm_prelu,
    gemm,
    gemm_prelu,
    packed_spmm_jnp,
    prelu,
    tcsc_spmm,
    tcsc_spmm_padded,
    tcsc_spmm_prelu,
)
