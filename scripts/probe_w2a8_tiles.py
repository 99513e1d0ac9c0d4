"""W2A8 (int8 MXU) headline-shape tile probe: does the round-3 wide-N
regime (bn4096/bk512, measured 50.2us for bf16) also win for int8?
Current int8 best: 50.7us at bn512/bk2048 (round 2). VMEM check: int8
scratch (512,4096)=2MB + f32 y (256,4096)=4MB fits the 16M budget.

    PYTHONPATH=/root/repo:$PYTHONPATH python scripts/probe_w2a8_tiles.py
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


M, K, N = 256, 4096, 4096
kx, kw = jax.random.split(jax.random.PRNGKey(0))
x = rng.rand_dense(kx, (M, K))
p = pack_ternary(np.asarray(rng.rand_ternary(kw, (K, N), non_zero=10)))

CANDS = [
    {"block_m": 256, "block_n": 512, "block_k": 2048},   # shipped int8 best
    {"block_m": 256, "block_n": 2048, "block_k": 512},
    {"block_m": 256, "block_n": 4096, "block_k": 512},
    {"block_m": 256, "block_n": 2048, "block_k": 1024},
]

t(f"devices: {jax.devices()}")
results = []
for cand in CANDS:
    def f(x, d):
        w_ = TernaryPacked(data=d, rows=K, cols=N, nnz=-1)
        return packed_spmm(x, w_, compute_dtype=jnp.int8, **cand)

    try:
        meas = measure_device(f, x, p.data, reps=5)
    except Exception as e:
        t(f"{cand}: FAILED {type(e).__name__}: {str(e)[:90]}")
        continue
    t(f"{cand}: best {meas.min_s*1e6:.1f}us  median {meas.mean_s*1e6:.1f}us")
    results.append((meas.min_s, cand))

results.sort()
t("=== ranked ===")
for s, c in results:
    t(f"{s*1e6:7.1f}us  {c}")
