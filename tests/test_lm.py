"""End-to-end ternary LM: forward/prefill/decode equivalence + generation.

The serving contract: the incremental-decode path (prefill + KV-cache
steps) must produce the same logits as the full causal forward, and
``generate`` must equal the hand-rolled greedy loop.
"""

import jax
import jax.numpy as jnp
import numpy as np

from smmb_tpu.models.lm import (
    TernaryLMConfig,
    generate,
    init_lm,
    lm_decode_step,
    lm_forward,
    lm_init_cache,
    lm_prefill,
    pack_lm,
)

CFG = TernaryLMConfig(
    vocab=512, d_model=256, n_heads=4, d_ff=512, n_layers=2, max_len=64
)


def _setup(seed=0):
    params = init_lm(jax.random.PRNGKey(seed), CFG)
    packed = pack_lm(params)
    toks = jax.random.randint(jax.random.PRNGKey(seed + 1), (2, 8), 0, CFG.vocab)
    return packed, toks


def test_lm_forward_shapes():
    packed, toks = _setup()
    logits = lm_forward(packed, toks, CFG)
    assert logits.shape == (2, 8, CFG.vocab)
    assert np.all(np.isfinite(np.asarray(logits)))


def test_lm_decode_matches_forward():
    # prefill T-1 then one decode step == full forward's last position
    packed, toks = _setup(3)
    full = lm_forward(packed, toks, CFG)
    cache = lm_init_cache(CFG, batch=2)
    _, cache = lm_prefill(packed, toks[:, :-1], cache, CFG)
    step_logits, _ = lm_decode_step(packed, toks[:, -1], cache, CFG)
    np.testing.assert_allclose(
        np.asarray(step_logits), np.asarray(full[:, -1]), atol=2e-4, rtol=0
    )


def test_lm_prefill_matches_forward():
    packed, toks = _setup(4)
    full = lm_forward(packed, toks, CFG)
    cache = lm_init_cache(CFG, batch=2)
    last, cache = lm_prefill(packed, toks, cache, CFG)
    np.testing.assert_allclose(
        np.asarray(last), np.asarray(full[:, -1]), atol=2e-4, rtol=0
    )
    assert int(cache[0]["pos"]) == toks.shape[1]


def test_generate_greedy_equivalence():
    packed, toks = _setup(5)
    steps = 4
    out = generate(packed, toks, CFG, steps)
    assert out.shape == (2, steps)
    # hand-rolled greedy loop over the full forward (no cache) — the
    # independent oracle for the scan + cache machinery
    cur = toks
    want = []
    for _ in range(steps):
        logits = lm_forward(packed, cur, CFG)
        nxt = jnp.argmax(logits[:, -1], axis=-1)
        want.append(nxt)
        cur = jnp.concatenate([cur, nxt[:, None]], axis=1)
    want = jnp.stack(want, axis=1)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(want))


def test_lm_train_step_reduces_loss():
    # train → pack → serve: STE training on the full LM pytree, then the
    # quantize-pack of the trained masters serves finite logits
    from smmb_tpu.models.lm import make_lm_train_step, qat_lm_forward

    cfg = TernaryLMConfig(
        vocab=64, d_model=64, n_heads=2, d_ff=128, n_layers=1, max_len=16
    )
    params = init_lm(jax.random.PRNGKey(30), cfg)
    # masters must be non-degenerate floats for absmean/STE to train
    params = jax.tree.map(lambda a: a + 0.01, params)
    toks = jax.random.randint(jax.random.PRNGKey(31), (4, 8), 0, cfg.vocab)
    init_opt, train_step = make_lm_train_step(cfg, learning_rate=1e-2)
    opt_state = init_opt(params)
    jstep = jax.jit(train_step)
    losses = []
    for _ in range(8):
        params, opt_state, loss = jstep(params, opt_state, toks)
        losses.append(float(loss))
    assert losses[-1] < losses[0], f"loss did not decrease: {losses}"
    # serving parity of what was trained: qat forward == packed jnp forward
    packed = pack_lm(params, quantize=True)
    served = lm_forward(packed, toks, cfg, use_kernel=False)
    qat = qat_lm_forward(params, toks, cfg)
    # biases are absent from the LM head in both paths; blocks carry theirs
    np.testing.assert_allclose(
        np.asarray(served), np.asarray(qat), atol=5e-4, rtol=0
    )


def test_lm_quantized_pack():
    params = init_lm(jax.random.PRNGKey(9), CFG)
    # non-ternary masters exercise the QAT pack path
    params["head"] = params["head"] + 0.01
    params["blocks"] = jax.tree.map(lambda a: a, params["blocks"])
    packed = pack_lm(params, quantize=True)
    toks = jax.random.randint(jax.random.PRNGKey(10), (1, 4), 0, CFG.vocab)
    logits = lm_forward(packed, toks, CFG)
    assert np.all(np.isfinite(np.asarray(logits)))


def test_lm_gqa_decode_matches_forward():
    # grouped-query attention end to end: smaller KV cache, same serving
    # contract (prefill + decode == full forward)
    cfg = TernaryLMConfig(
        vocab=256, d_model=256, n_heads=8, d_ff=256, n_layers=2,
        max_len=32, n_kv_heads=2,
    )
    params = init_lm(jax.random.PRNGKey(71), cfg)
    packed = pack_lm(params)
    toks = jax.random.randint(jax.random.PRNGKey(72), (2, 6), 0, cfg.vocab)
    full = lm_forward(packed, toks, cfg, use_kernel=False)
    cache = lm_init_cache(cfg, batch=2)
    assert cache[0]["k"].shape == (2, 32, 64)  # flat: kv_heads*hd
    _, cache = lm_prefill(packed, toks[:, :-1], cache, cfg, use_kernel=False)
    step_logits, _ = lm_decode_step(
        packed, toks[:, -1], cache, cfg, use_kernel=False
    )
    np.testing.assert_allclose(
        np.asarray(step_logits), np.asarray(full[:, -1]), atol=2e-4, rtol=0
    )


def test_generate_sampling():
    packed, toks = _setup(13)
    key = jax.random.PRNGKey(42)
    out = generate(
        packed, toks, CFG, 6, temperature=0.8, top_k=16, key=key
    )
    assert out.shape == (2, 6)
    assert np.all((np.asarray(out) >= 0) & (np.asarray(out) < CFG.vocab))
    # deterministic given the key; different keys explore
    out2 = generate(
        packed, toks, CFG, 6, temperature=0.8, top_k=16, key=key
    )
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))
    out3 = generate(
        packed, toks, CFG, 6, temperature=5.0, key=jax.random.PRNGKey(7)
    )
    assert not np.array_equal(np.asarray(out), np.asarray(out3))
    # temperature=0 stays the greedy path
    import pytest

    with pytest.raises(ValueError):
        generate(packed, toks, CFG, 6, temperature=0.5)  # no key


def test_lm_train_grad_accumulation_matches_full_batch():
    """accum_steps microbatching == the full-batch gradient step (same
    optimizer update: mean of equal-size microbatch means is the batch
    mean)."""
    from smmb_tpu.models.lm import make_lm_train_step

    cfg = TernaryLMConfig(
        vocab=64, d_model=64, n_heads=2, d_ff=128, n_layers=1, max_len=16
    )
    params = init_lm(jax.random.PRNGKey(50), cfg)
    params = jax.tree.map(lambda a: a + 0.01, params)
    toks = jax.random.randint(jax.random.PRNGKey(51), (8, 8), 0, cfg.vocab)

    init_opt, step1 = make_lm_train_step(cfg, learning_rate=1e-2)
    _, step4 = make_lm_train_step(cfg, learning_rate=1e-2, accum_steps=4)
    o1 = init_opt(params)
    _, _, l1 = jax.jit(step1)(params, o1, toks)
    _, _, l4 = jax.jit(step4)(params, o1, toks)
    np.testing.assert_allclose(float(l4), float(l1), rtol=1e-5)

    # ragged microbatching is rejected at trace time
    import pytest

    with pytest.raises(ValueError, match="divisible"):
        jax.jit(step4)(params, o1, toks[:6])


def test_attention_extend_matches_prefill():
    """Chunked attention_extend over an empty cache == one-shot prefill."""
    from smmb_tpu.models.attention import (
        TernaryAttentionConfig, attention_extend, attention_prefill,
        init_attention, init_kv_cache, pack_attention,
    )
    from smmb_tpu.utils import rng

    cfg = TernaryAttentionConfig(d_model=256, n_heads=4, n_kv_heads=2)
    packed = pack_attention(init_attention(jax.random.PRNGKey(80), cfg))
    x = rng.rand_dense(jax.random.PRNGKey(81), (2, 16, 256)) * 0.1
    HI = jax.lax.Precision.HIGHEST

    cache0 = init_kv_cache(cfg, 2, 32)
    y_ref, cache_ref = attention_prefill(
        packed, x, cache0, cfg, use_kernel=False, precision=HI
    )
    cache = init_kv_cache(cfg, 2, 32)
    ys = []
    for i in range(0, 16, 4):
        y_c, cache = attention_extend(
            packed, x[:, i:i + 4], cache, cfg, use_kernel=False, precision=HI
        )
        ys.append(np.asarray(y_c))
    y = np.concatenate(ys, axis=1)
    np.testing.assert_allclose(y, np.asarray(y_ref), atol=1e-4, rtol=0)
    np.testing.assert_allclose(
        np.asarray(cache["k"]), np.asarray(cache_ref["k"]), atol=1e-5
    )
    assert int(cache["pos"]) == int(cache_ref["pos"]) == 16


def test_lm_prefill_chunked_matches_one_shot():
    """lm_prefill_chunked == lm_prefill: same last logits, same cache."""
    from smmb_tpu.models.lm import lm_prefill, lm_prefill_chunked

    cfg = TernaryLMConfig(
        vocab=64, d_model=128, n_heads=2, d_ff=256, n_layers=2, max_len=32,
        n_kv_heads=1,
    )
    params = init_lm(jax.random.PRNGKey(82), cfg)
    packed = pack_lm(params)
    toks = jax.random.randint(jax.random.PRNGKey(83), (2, 16), 0, cfg.vocab)
    HI = jax.lax.Precision.HIGHEST

    logits_ref, cache_ref = lm_prefill(
        packed, toks, lm_init_cache(cfg, 2), cfg,
        use_kernel=False, precision=HI,
    )
    logits, cache = lm_prefill_chunked(
        packed, toks, lm_init_cache(cfg, 2), cfg, chunk=4,
        use_kernel=False, precision=HI,
    )
    np.testing.assert_allclose(
        np.asarray(logits), np.asarray(logits_ref), atol=2e-4, rtol=0
    )
    for c, cr in zip(cache, cache_ref):
        np.testing.assert_allclose(
            np.asarray(c["k"]), np.asarray(cr["k"]), atol=1e-5
        )
        assert int(c["pos"]) == int(cr["pos"])

    # decode continues identically from either cache
    from smmb_tpu.models.lm import lm_decode_step

    t0 = jnp.asarray([1, 2])
    l1, _ = lm_decode_step(
        packed, t0, cache, cfg, use_kernel=False, precision=HI
    )
    l1r, _ = lm_decode_step(
        packed, t0, cache_ref, cfg, use_kernel=False, precision=HI
    )
    np.testing.assert_allclose(
        np.asarray(l1), np.asarray(l1r), atol=2e-4, rtol=0
    )

    import pytest

    with pytest.raises(ValueError, match="divisible"):
        lm_prefill_chunked(
            packed, toks[:, :15], lm_init_cache(cfg, 2), cfg, chunk=4,
            use_kernel=False,
        )


def test_top_p_sampler_masks_tail():
    """Nucleus sampling keeps the smallest prefix with mass >= p."""
    from smmb_tpu.models.lm import _make_sampler

    # probs ~ [0.85, 0.09, 0.03, ...]: top_p=0.5 must keep ONLY token 0
    logits = jnp.asarray([[5.0, 2.75, 1.6, 1.0, 0.5, 0.0]])
    sample = _make_sampler(temperature=1.0, top_k=None, top_p=0.5)
    keys = jax.random.split(jax.random.PRNGKey(0), 64)
    toks = np.asarray([int(sample(k, logits)[0]) for k in keys])
    assert set(toks) == {0}, set(toks)

    # p=0.9 keeps {0, 1} (0.85 alone < 0.9); never samples the tail
    sample = _make_sampler(temperature=1.0, top_k=None, top_p=0.9)
    toks = np.asarray([int(sample(k, logits)[0]) for k in keys])
    assert set(toks) <= {0, 1} and 1 in set(toks), set(toks)


def test_generate_top_p_runs():
    cfg = TernaryLMConfig(
        vocab=64, d_model=128, n_heads=2, d_ff=256, n_layers=1, max_len=32
    )
    packed = pack_lm(init_lm(jax.random.PRNGKey(70), cfg))
    toks = jax.random.randint(jax.random.PRNGKey(71), (2, 8), 0, cfg.vocab)
    out = generate(
        packed, toks, cfg, steps=6, use_kernel=False,
        temperature=0.8, top_p=0.9, key=jax.random.PRNGKey(72),
    )
    assert out.shape == (2, 6)
    assert np.all((np.asarray(out) >= 0) & (np.asarray(out) < cfg.vocab))


def test_fork_cache_prefix_caching():
    """Prefill once at batch 1, fork to 3 rows, decode divergent tokens —
    each row matches an independent full pass over (prompt + its token)."""
    from smmb_tpu.models.lm import fork_cache, lm_decode_step, lm_prefill

    cfg = TernaryLMConfig(
        vocab=64, d_model=128, n_heads=2, d_ff=256, n_layers=2, max_len=32
    )
    packed = pack_lm(init_lm(jax.random.PRNGKey(60), cfg))
    prompt = jax.random.randint(jax.random.PRNGKey(61), (1, 8), 0, cfg.vocab)
    HI = jax.lax.Precision.HIGHEST

    _, cache1 = lm_prefill(
        packed, prompt, lm_init_cache(cfg, 1), cfg,
        use_kernel=False, precision=HI,
    )
    forked = fork_cache(cache1, 3)
    div = jnp.asarray([5, 17, 42])
    logits, forked = lm_decode_step(
        packed, div, forked, cfg, use_kernel=False, precision=HI
    )

    for r in range(3):
        toks_r = jnp.concatenate([prompt, div[r][None, None]], axis=1)
        full = lm_forward(packed, toks_r, cfg, use_kernel=False, precision=HI)
        np.testing.assert_allclose(
            np.asarray(logits[r]), np.asarray(full[0, -1]),
            atol=5e-4, rtol=0, err_msg=f"row {r}",
        )

    import pytest

    with pytest.raises(ValueError, match="batch-1"):
        fork_cache(forked, 2)


def test_beam_search():
    from smmb_tpu.models.lm import generate_beam

    cfg = TernaryLMConfig(
        vocab=64, d_model=128, n_heads=2, d_ff=256, n_layers=2, max_len=32
    )
    packed = pack_lm(init_lm(jax.random.PRNGKey(80), cfg))
    prompt = jax.random.randint(jax.random.PRNGKey(81), (1, 8), 0, cfg.vocab)

    # beam=1 reduces exactly to greedy generate
    greedy = generate(packed, prompt, cfg, steps=8, use_kernel=False)
    b1, s1 = generate_beam(
        packed, prompt, cfg, steps=8, beam=1, use_kernel=False
    )
    np.testing.assert_array_equal(np.asarray(b1), np.asarray(greedy))

    # beam=4: scores sorted best-first; best beam scores >= greedy's path
    b4, s4 = generate_beam(
        packed, prompt, cfg, steps=8, beam=4, use_kernel=False
    )
    s4 = np.asarray(s4)
    assert b4.shape == (4, 8) and np.all(np.diff(s4) <= 1e-6)
    assert s4[0] >= float(s1[0]) - 1e-5  # wider beam never scores worse

    import pytest

    with pytest.raises(ValueError, match="batch-1"):
        generate_beam(
            packed, jnp.zeros((2, 4), jnp.int32), cfg, steps=4,
            use_kernel=False,
        )
