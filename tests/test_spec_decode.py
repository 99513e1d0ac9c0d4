"""Speculative decoding: token-exact equivalence with target greedy.

The whole point of greedy speculative decoding is that the draft changes
WHEN tokens are computed, never WHAT — so the output must equal the
target's own greedy ``generate`` token for token.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from smmb_tpu.models.lm import TernaryLMConfig, generate, init_lm, pack_lm
from smmb_tpu.models.spec_decode import generate_speculative


TARGET = TernaryLMConfig(
    vocab=64, d_model=128, n_heads=2, d_ff=256, n_layers=2, max_len=64
)
DRAFT = TernaryLMConfig(
    vocab=64, d_model=64, n_heads=2, d_ff=128, n_layers=1, max_len=64
)


def _models(seed=0):
    target = pack_lm(init_lm(jax.random.PRNGKey(seed), TARGET))
    draft = pack_lm(init_lm(jax.random.PRNGKey(seed + 1), DRAFT))
    return target, draft


@pytest.mark.parametrize("k", [1, 3, 4])
def test_spec_matches_target_greedy(k):
    target, draft = _models(10)
    prompt = jax.random.randint(jax.random.PRNGKey(12), (1, 8), 0, 64)
    want = generate(target, prompt, TARGET, steps=16, use_kernel=False)
    got = generate_speculative(
        target, draft, prompt, TARGET, DRAFT, steps=16, k=k,
        use_kernel=False,
    )
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_spec_self_draft_accepts_everything():
    """Draft == target: every proposal accepted → still exact output."""
    target, _ = _models(20)
    prompt = jax.random.randint(jax.random.PRNGKey(21), (1, 6), 0, 64)
    want = generate(target, prompt, TARGET, steps=12, use_kernel=False)
    got = generate_speculative(
        target, target, prompt, TARGET, TARGET, steps=12, k=4,
        use_kernel=False,
    )
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_spec_with_rope_and_gqa():
    """Spec decode composes with rope + GQA configs (cache semantics)."""
    tcfg = dataclasses.replace(TARGET, rope=True, n_kv_heads=1)
    dcfg = dataclasses.replace(DRAFT, rope=True)
    target = pack_lm(init_lm(jax.random.PRNGKey(30), tcfg))
    draft = pack_lm(init_lm(jax.random.PRNGKey(31), dcfg))
    prompt = jax.random.randint(jax.random.PRNGKey(32), (1, 8), 0, 64)
    want = generate(target, prompt, tcfg, steps=10, use_kernel=False)
    got = generate_speculative(
        target, draft, prompt, tcfg, dcfg, steps=10, k=3,
        use_kernel=False,
    )
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_spec_rejects_batch_and_overflow():
    target, draft = _models(40)
    with pytest.raises(ValueError, match="max_len"):
        generate_speculative(
            target, draft, jnp.zeros((1, 8), jnp.int32), TARGET, DRAFT,
            steps=60, use_kernel=False,
        )


def test_draft_distillation_improves_agreement():
    """Distilling the draft toward the target reduces the soft-CE loss
    and raises greedy agreement with the target on held-out prompts."""
    from smmb_tpu.models.lm import lm_forward, pack_lm as _pack
    from smmb_tpu.models.spec_decode import make_draft_distill_step

    target, _ = _models(50)
    draft_params = init_lm(jax.random.PRNGKey(51), DRAFT)
    draft_params = jax.tree.map(lambda a: a + 0.01, draft_params)
    toks = jax.random.randint(jax.random.PRNGKey(52), (8, 16), 0, 64)

    init_opt, step = make_draft_distill_step(
        target, TARGET, DRAFT, learning_rate=5e-3
    )
    opt = init_opt(draft_params)
    jstep = jax.jit(step)

    def agreement(params):
        t = jnp.argmax(lm_forward(target, toks, TARGET, use_kernel=False), -1)
        packed_d = _pack(params, quantize=True)
        d = jnp.argmax(lm_forward(packed_d, toks, DRAFT, use_kernel=False), -1)
        return float(jnp.mean(t == d))

    a0 = agreement(draft_params)
    losses = []
    for _ in range(20):
        draft_params, opt, loss = jstep(draft_params, opt, toks)
        losses.append(float(loss))
    assert losses[-1] < losses[0], f"distill loss did not decrease: {losses}"
    a1 = agreement(draft_params)
    assert a1 > a0, f"argmax agreement did not improve: {a0} -> {a1}"

    # the distilled draft packs and drives spec decode; output stays
    # token-identical to target greedy (drafts never change WHAT)
    packed_d = _pack(draft_params, quantize=True)
    prompt = toks[:1, :8]
    want = generate(target, prompt, TARGET, steps=10, use_kernel=False)
    got = generate_speculative(
        target, packed_d, prompt, TARGET, DRAFT, steps=10, k=3,
        use_kernel=False,
    )
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_distill_rejects_vocab_mismatch():
    import dataclasses

    from smmb_tpu.models.spec_decode import make_draft_distill_step

    target, _ = _models(60)
    with pytest.raises(ValueError, match="vocab"):
        make_draft_distill_step(
            target, TARGET, dataclasses.replace(DRAFT, vocab=32)
        )


def test_generate_speculative_batched_matches_plain():
    """Batch-8 spec decode: every row equals the target's own greedy
    continuation of that row (the dead-slot valid-mask path; f32 HIGHEST
    so ragged and dense attention agree exactly)."""
    import jax.numpy as jnp

    cfg = TernaryLMConfig(
        vocab=64, d_model=128, n_heads=1, d_ff=128, n_layers=1, max_len=64,
    )
    target = pack_lm(init_lm(jax.random.PRNGKey(0), cfg))
    draft = pack_lm(init_lm(jax.random.PRNGKey(1), cfg))
    b, t, steps, k = 4, 8, 8, 3
    toks = jax.random.randint(jax.random.PRNGKey(2), (b, t), 0, cfg.vocab)
    got = np.asarray(
        generate_speculative(
            target, draft, toks, cfg, cfg, steps, k=k, use_kernel=False,
        )
    )
    assert got.shape == (b, steps)
    for r in range(b):
        ref = np.asarray(
            generate(
                target, toks[r : r + 1], cfg, steps, use_kernel=False,
            )
        )
        np.testing.assert_array_equal(got[r : r + 1], ref, err_msg=f"row {r}")


def test_generate_speculative_batched_stats_and_guards():
    import jax.numpy as jnp
    import pytest

    cfg = TernaryLMConfig(
        vocab=32, d_model=128, n_heads=1, d_ff=128, n_layers=1, max_len=48,
    )
    rcfg = TernaryLMConfig(
        vocab=32, d_model=128, n_heads=1, d_ff=128, n_layers=1, max_len=48,
        rope=True,
    )
    target = pack_lm(init_lm(jax.random.PRNGKey(3), cfg))
    draft = pack_lm(init_lm(jax.random.PRNGKey(4), cfg))
    toks = jax.random.randint(jax.random.PRNGKey(5), (2, 4), 0, cfg.vocab)
    out, stats = generate_speculative(
        target, draft, toks, cfg, cfg, 6, k=2, use_kernel=False,
        return_stats=True,
    )
    assert out.shape == (2, 6)
    assert int(stats["rounds"]) >= 1
    # rope rejected at batch > 1
    rtarget = pack_lm(init_lm(jax.random.PRNGKey(6), rcfg))
    with pytest.raises(ValueError, match="rope"):
        generate_speculative(
            rtarget, draft, toks, rcfg, cfg, 6, k=2, use_kernel=False
        )
    # buffer-budget guard
    with pytest.raises(ValueError, match="buffer"):
        generate_speculative(
            target, draft, toks, cfg, cfg, 40, k=3, use_kernel=False
        )
