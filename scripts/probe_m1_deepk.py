"""Probe: decode strategies at the decode-bound M=1 deep-K shape.

1x4096x4096 bf16 measured 13.8us with the shift decode vs a ~5.2us
2-bit-traffic HBM floor; the K=1024 fold-vs-shift comparison (5.2 vs
6.5us) ran in the HBM-bound regime where decode cost is hidden. Deep-K
M=1 is where VPU decode ops actually bind, and the fold decode does
~2 int16 ops/plane vs shift's ~3 int32 ops — so re-compare HERE, plus
tile-size variants of both.
"""

import time

T0 = time.time()
import jax

try:
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

import jax.numpy as jnp
import numpy as np

from smmb_tpu.bench.measure import measure_device
from smmb_tpu.formats.packed import TernaryPacked, pack_ternary
from smmb_tpu.kernels.packed_spmm import packed_spmm
from smmb_tpu.utils import rng


def t(m):
    print("[%6.1fs] %s" % (time.time() - T0, m), flush=True)


K = N = 4096
kx, kw, kb = jax.random.split(jax.random.PRNGKey(0), 3)
x = rng.rand_dense(kx, (1, K))
w = rng.rand_ternary(kw, (K, N), non_zero=10)
bias = rng.rand_dense(kb, (N,))
p = pack_ternary(np.asarray(w))
oracle = (
    np.asarray(x, np.float64) @ np.asarray(w, np.float64)
    + np.asarray(bias, np.float64)
)
t(f"devices: {jax.devices()}")

CASES = [
    ("shift bn4096 bk1024", dict(decode="shift")),  # current default
    ("fold  bn4096 bk1024", dict(decode="fold")),
    ("fold  bn4096 bk2048", dict(decode="fold", block_k=2048)),
    ("fold  bn2048 bk1024", dict(decode="fold", block_n=2048)),
    ("shift bn4096 bk2048", dict(decode="shift", block_k=2048)),
    ("shift bn2048 bk2048", dict(decode="shift", block_n=2048, block_k=2048)),
]

for label, kw_ in CASES:

    def f(x, data, bias, _kw=dict(kw_)):
        w_ = TernaryPacked(data=data, rows=K, cols=N, nnz=p.nnz)
        return packed_spmm(
            x, w_, bias, compute_dtype=jnp.bfloat16, **_kw
        )

    y = f(x, p.data, bias)
    err = np.abs(np.asarray(y, np.float64) - oracle).max()
    meas = measure_device(f, x, p.data, bias, reps=3)
    t(f"{label}: {meas.min_s * 1e6:6.2f}us err={err:.2e}")
