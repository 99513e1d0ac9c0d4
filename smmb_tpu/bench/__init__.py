from smmb_tpu.bench.flops import (
    dense_flops,
    sparse_flops,
    spmm_bytes,
)
from smmb_tpu.bench.measure import Measurement, measure, measure_device
from smmb_tpu.bench.roofline import chip_spec, roofline_time_s
