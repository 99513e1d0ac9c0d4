from smmb_tpu.utils import rng
