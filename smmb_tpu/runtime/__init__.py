from smmb_tpu.runtime.native import (
    bcsr_from_dense_native,
    native_available,
    pack_ternary_native,
    tcsc_from_dense_native,
)
