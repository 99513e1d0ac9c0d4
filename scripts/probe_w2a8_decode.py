"""W2A8 decode-mode probe at the wide-N tile regime: round 2 measured
fold slower than shift at bn512/bk2048 (52.2 vs 50.7us) — but the wide-N
tiles (bn4096/bk512, int8 32.1us) changed the decode/MXU overlap picture,
so re-rank the decode modes here. Also probes bf16 fold at wide-N.

    PYTHONPATH=/root/repo:$PYTHONPATH python scripts/probe_w2a8_decode.py
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
    {"compute_dtype": jnp.int8, "decode": "shift"},   # shipped
    {"compute_dtype": jnp.int8, "decode": "fold"},
    {"compute_dtype": jnp.bfloat16, "decode": "shift"},  # shipped
    {"compute_dtype": jnp.bfloat16, "decode": "fold"},
]

t(f"devices: {jax.devices()}")
results = []
for cand in CANDS:
    def f(x, d):
        w_ = TernaryPacked(data=d, rows=K, cols=N, nnz=-1)
        return packed_spmm(x, w_, **cand)  # wide-N heuristic picks tiles

    try:
        meas = measure_device(f, x, p.data, reps=5)
    except Exception as e:
        t(f"{cand}: FAILED {type(e).__name__}: {str(e)[:90]}")
        continue
    name = f"{cand['compute_dtype'].__name__}/{cand['decode']}"
    t(f"{name}: best {meas.min_s*1e6:.1f}us  median {meas.mean_s*1e6:.1f}us")
    results.append((meas.min_s, name))

results.sort()
t("=== ranked ===")
for s, c in results:
    t(f"{s*1e6:7.1f}us  {c}")
