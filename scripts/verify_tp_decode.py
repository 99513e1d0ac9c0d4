"""Hardware verification of tensor-parallel LM serving (tp_transformer.py).

On the 1x1 mesh (single real chip) the TP machinery — shard_map bodies,
head-sharded caches, the two per-block psums — must produce the same logits
as the single-device path and cost ~nothing extra. Parity + generate_tp
timing vs models/lm.generate.
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

from smmb_tpu.models.lm import TernaryLMConfig, generate, init_lm, pack_lm
from smmb_tpu.parallel.mesh import make_mesh
from smmb_tpu.parallel.tp_transformer import (
    generate_tp,
    lm_decode_step_tp,
    lm_forward_tp,
    lm_init_cache_tp,
    lm_prefill_tp,
    shard_lm_tp,
)


def t(m):
    print("[%6.1fs] %s" % (time.time() - T0, m), flush=True)


CFG = TernaryLMConfig(
    vocab=8192, d_model=1024, n_heads=8, d_ff=4096, n_layers=4, max_len=256
)
STEPS = 64
mesh = make_mesh(1, 1)
t(f"devices: {jax.devices()}  mesh={mesh.shape}")

params = init_lm(jax.random.PRNGKey(0), CFG)
packed = pack_lm(params)
sharded = shard_lm_tp(packed, mesh)
toks = jax.random.randint(jax.random.PRNGKey(1), (1, 32), 0, CFG.vocab)

# parity: TP decode step vs TP full forward, HIGHEST
HI = jax.lax.Precision.HIGHEST
full = lm_forward_tp(sharded, toks, CFG, mesh=mesh, precision=HI)
cache = lm_init_cache_tp(CFG, batch=1, mesh=mesh)
_, cache = lm_prefill_tp(
    sharded, toks[:, :-1], cache, CFG, mesh=mesh, precision=HI
)
step_logits, _ = lm_decode_step_tp(
    sharded, toks[:, -1], cache, CFG, mesh=mesh, precision=HI
)
err = np.abs(np.asarray(step_logits) - np.asarray(full[:, -1])).max()
t(f"tp decode-vs-forward parity (HIGHEST): err={err:.2e} "
  + ("PASS" if err < 5e-3 else "FAIL"))


def time_gen(fn, steps, n_timed=5):
    out = fn(steps)
    out.block_until_ready()  # compile
    t0 = time.perf_counter()
    for _ in range(n_timed):
        out = fn(steps)
    out.block_until_ready()
    return (time.perf_counter() - t0) / n_timed


gen_tp = lambda s: generate_tp(
    sharded, toks, CFG, s, mesh=mesh, compute_dtype=jnp.bfloat16
)
gen_1d = lambda s: generate(packed, toks, CFG, s, compute_dtype=jnp.bfloat16)

# token parity between TP and single-device greedy generation (bf16)
o_tp, o_1d = np.asarray(gen_tp(STEPS)), np.asarray(gen_1d(STEPS))
match = (o_tp == o_1d).mean()
t(f"generate_tp vs generate token match: {match * 100:.1f}% "
  + ("PASS" if match > 0.95 else "FAIL (bf16 argmax ties?)"))

d_lo, d_hi = time_gen(gen_tp, STEPS), time_gen(gen_tp, STEPS * 3)
per_tok = (d_hi - d_lo) / (2 * STEPS)
t(f"TIME generate_tp 1x1: slope {per_tok * 1e6:.1f}us/tok "
  f"= {1.0 / per_tok:.0f} tok/s (single-device baseline 87.2us/tok)")
