from smmb_tpu.formats.tcsc import TCSC, tcsc_from_dense, tcsc_to_dense
from smmb_tpu.formats.bcsr import BCSR, bcsr_from_dense, bcsr_to_dense
from smmb_tpu.formats.packed import TernaryPacked, pack_ternary, unpack_ternary
from smmb_tpu.formats.legacy import (
    ternarize_threshold,
    tcsc_from_dense_threshold,
    pack_ternary_threshold,
    bcsr_from_dense_threshold,
)
