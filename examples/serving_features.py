#!/usr/bin/env python
"""Tour of the serving stack on one tiny ternary LM: chunked prefill,
speculative decoding, beam search, sampling controls, int8 KV cache,
prefix caching, ragged batches, rope/window/GQA configs.

Runs on CPU (Pallas in interpreter mode) or TPU. ~2 min on CPU.

    python examples/serving_features.py [--cpu]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

from smmb_tpu.models.lm import (
    TernaryLMConfig,
    fork_cache,
    generate,
    generate_beam,
    init_lm,
    lm_decode_step,
    lm_init_cache,
    lm_prefill,
    lm_prefill_chunked,
    pack_lm,
)
from smmb_tpu.models.spec_decode import generate_speculative

use_kernel = jax.default_backend() == "tpu"

# rope + GQA + sliding window, all through one config
cfg = TernaryLMConfig(
    vocab=256, d_model=256, n_heads=4, d_ff=512, n_layers=2, max_len=128,
    n_kv_heads=2, rope=True, window=32,
)
packed = pack_lm(init_lm(jax.random.PRNGKey(0), cfg))
prompt = jax.random.randint(jax.random.PRNGKey(1), (1, 16), 0, cfg.vocab)
kw = dict(use_kernel=use_kernel)

print("greedy      :", np.asarray(generate(packed, prompt, cfg, 12, **kw))[0])

print("sampled     :", np.asarray(
    generate(
        packed, prompt, cfg, 12, temperature=0.8, top_k=40, top_p=0.95,
        key=jax.random.PRNGKey(2), **kw,
    )
)[0])

print("int8 cache  :", np.asarray(
    generate(packed, prompt, cfg, 12, kv_quant=True, **kw)
)[0])

beams, scores = generate_beam(packed, prompt, cfg, 12, beam=4, **kw)
print("beam best   :", np.asarray(beams)[0], f"(score {float(scores[0]):.2f})")

# speculative decoding: 1-layer draft proposes, target verifies
dcfg = TernaryLMConfig(
    vocab=256, d_model=128, n_heads=2, d_ff=256, n_layers=1, max_len=128,
    rope=True, window=32, n_kv_heads=2,
)
draft = pack_lm(init_lm(jax.random.PRNGKey(3), dcfg))
spec = generate_speculative(
    packed, draft, prompt, cfg, dcfg, 12, k=4, **kw
)
print("speculative :", np.asarray(spec)[0], "(token-identical to greedy)")

# chunked prefill: long prompt in 16-token segments, same cache state
long_prompt = jax.random.randint(jax.random.PRNGKey(4), (1, 64), 0, cfg.vocab)
l1, _ = lm_prefill(packed, long_prompt, lm_init_cache(cfg, 1), cfg, **kw)
l2, _ = lm_prefill_chunked(
    packed, long_prompt, lm_init_cache(cfg, 1), cfg, chunk=16, **kw
)
print(f"chunked prefill matches one-shot: "
      f"{np.allclose(np.asarray(l1), np.asarray(l2), atol=1e-3)}")

# prefix caching: prefill once, fork for 3 divergent continuations
_, shared = lm_prefill(packed, prompt, lm_init_cache(cfg, 1), cfg, **kw)
forked = fork_cache(shared, 3)
div = jnp.asarray([7, 99, 200])
logits, _ = lm_decode_step(packed, div, forked, cfg, **kw)
print("prefix-cache fork: 3 continuations from one prefill,",
      "next tokens", np.asarray(jnp.argmax(logits, -1)))

# ragged batch: 5- and 13-token prompts served together, left-padded
pa = jax.random.randint(jax.random.PRNGKey(5), (1, 5), 0, cfg.vocab)
pb = jax.random.randint(jax.random.PRNGKey(6), (1, 13), 0, cfg.vocab)
batch = jnp.concatenate(
    [jnp.pad(pa, ((0, 0), (8, 0))), pb]
)
mask = jnp.concatenate(
    [jnp.pad(jnp.ones((1, 5), bool), ((0, 0), (8, 0))), jnp.ones((1, 13), bool)]
)
ragged = generate(packed, batch, cfg, 8, prompt_mask=mask, **kw)
solo = generate(packed, pa, cfg, 8, **kw)
print("ragged row 0 == its solo run:",
      bool(jnp.array_equal(ragged[0], solo[0])))

# LoRA: fine-tune adapters on the frozen 2-bit base (3 steps for show)
from smmb_tpu.models.lora import (
    attach_lora, init_lora_lm, make_lora_train_step,
)

adapters = init_lora_lm(jax.random.PRNGKey(7), cfg, rank=4)
init_opt, lstep = make_lora_train_step(packed, cfg, learning_rate=5e-3)
opt = init_opt(adapters)
ltoks = jax.random.randint(jax.random.PRNGKey(8), (4, 24), 0, cfg.vocab)
jstep = jax.jit(lstep)
l0 = ln = None
for _ in range(3):
    adapters, opt, loss = jstep(adapters, opt, ltoks)
    l0, ln = (l0 if l0 is not None else float(loss)), float(loss)
print(f"LoRA adapters: loss {l0:.3f} -> {ln:.3f}; "
      "2-bit base untouched; serve via attach_lora(packed, adapters)")
adapted = attach_lora(packed, adapters)
print("adapted greedy:", np.asarray(
    generate(adapted, prompt, cfg, 8, **kw)
)[0])
