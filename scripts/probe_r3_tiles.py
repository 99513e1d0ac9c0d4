"""Round-3 headline tile probe: widen the packed_spmm config space.

The committed headline (54.5 us best) sits at 0.80 of the compute SOL with
bn512/bk2048 — knife-edge vs the BASELINE >=0.80 target. Probe untried tile
combos on the chip to find margin.

    PYTHONPATH=/root/repo:$PYTHONPATH python scripts/probe_r3_tiles.py
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
    # committed default heuristic first (fresh reference point this session)
    {"block_m": 256, "block_n": 512, "block_k": 2048},
    {"block_m": 256, "block_n": 2048, "block_k": 512},
    {"block_m": 128, "block_n": 512, "block_k": 2048},
    {"block_m": 128, "block_n": 1024, "block_k": 1024},
    {"block_m": 128, "block_n": 2048, "block_k": 512},
    {"block_m": 64, "block_n": 512, "block_k": 2048},
    {"block_m": 256, "block_n": 256, "block_k": 2048},
    {"block_m": 256, "block_n": 512, "block_k": 2048, "decode": "fold"},
]

t(f"devices: {jax.devices()}")
results = []
for cand in CANDS:
    def f(x, d):
        w_ = TernaryPacked(data=d, rows=K, cols=N, nnz=-1)
        return packed_spmm(x, w_, compute_dtype=jnp.bfloat16, **cand)

    try:
        meas = measure_device(f, x, p.data, reps=5)
    except Exception as e:
        t(f"{cand}: FAILED {type(e).__name__}: {str(e)[:100]}")
        continue
    t(f"{cand}: best {meas.min_s*1e6:.1f}us  median {meas.mean_s*1e6:.1f}us")
    results.append((meas.min_s, cand))

results.sort()
t("=== ranked ===")
for s, c in results:
    t(f"{s*1e6:7.1f}us  {c}")
