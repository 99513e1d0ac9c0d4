"""Token-corpus data loader: coverage, determinism, native/fallback parity
of properties, and end-to-end feed into the LM train step."""

import ctypes

import jax
import numpy as np
import pytest

from smmb_tpu.runtime import native
from smmb_tpu.runtime.data import TokenDataset, write_token_file


@pytest.fixture()
def corpus(tmp_path):
    path = str(tmp_path / "corpus.u32")
    toks = np.arange(1000, dtype=np.int64)  # unique ids: offset == token
    write_token_file(path, toks)
    return path, toks


def _all_windows(ds, epoch=0):
    return np.concatenate(list(ds.batches(epoch)), axis=0)


def test_every_window_exactly_once(corpus):
    path, toks = corpus
    ds = TokenDataset(path, seq_len=9, batch=10)  # 100 windows of 10
    assert ds.n_windows == 100 and len(ds) == 10
    got = _all_windows(ds)
    assert got.shape == (100, 10)
    # tokens are their own offsets: every row must be a contiguous span
    # starting at a multiple of the window, and all 100 spans must appear
    for w in got:
        np.testing.assert_array_equal(w, np.arange(w[0], w[0] + 10))
        assert w[0] % 10 == 0
    assert set(int(w[0]) // 10 for w in got) == set(range(100))


def test_deterministic_and_epoch_varies(corpus):
    path, _ = corpus
    ds = TokenDataset(path, seq_len=9, batch=10, seed=7)
    a = _all_windows(ds, epoch=0)
    b = _all_windows(TokenDataset(path, seq_len=9, batch=10, seed=7), 0)
    np.testing.assert_array_equal(a, b)
    c = _all_windows(ds, epoch=1)
    assert not np.array_equal(a, c)  # different epoch, different order


def test_fallback_path_same_properties(corpus, monkeypatch):
    path, _ = corpus
    monkeypatch.setattr(native, "_lib", lambda: None)
    ds = TokenDataset(path, seq_len=9, batch=10, seed=3)
    got = _all_windows(ds)
    assert got.shape == (100, 10)
    again = _all_windows(TokenDataset(path, seq_len=9, batch=10, seed=3))
    np.testing.assert_array_equal(got, again)


def test_ragged_tail_dropped_and_too_small_rejected(tmp_path):
    path = str(tmp_path / "tiny.u32")
    write_token_file(path, np.zeros(25, np.int64))
    ds = TokenDataset(path, seq_len=9, batch=2)  # 2 windows, 1 batch
    assert ds.n_windows == 2 and len(ds) == 1
    with pytest.raises(ValueError, match="fewer than one batch"):
        TokenDataset(path, seq_len=9, batch=3)
    with pytest.raises(ValueError, match="1-D"):
        write_token_file(path, np.zeros((2, 2)))


def test_feeds_lm_train_step(corpus):
    from smmb_tpu.models.lm import TernaryLMConfig, init_lm, make_lm_train_step

    path, _ = corpus
    cfg = TernaryLMConfig(
        vocab=64, d_model=64, n_heads=2, d_ff=128, n_layers=1, max_len=16
    )
    params = jax.tree.map(
        lambda a: a + 0.01, init_lm(jax.random.PRNGKey(0), cfg)
    )
    init_opt, step = make_lm_train_step(cfg, learning_rate=1e-2)
    opt = init_opt(params)
    jstep = jax.jit(step)
    ds = TokenDataset(path, seq_len=11, batch=4)
    losses = []
    for batch in ds.batches(0):
        # the test corpus uses raw offsets as ids; fold into the vocab
        params, opt, loss = jstep(params, opt, batch % cfg.vocab)
        losses.append(float(loss))
        if len(losses) >= 6:
            break
    assert losses[-1] < losses[0], losses
