"""Token-corpus data loader for LM training (native-accelerated).

The training-side IO component the compute path needs: a corpus is a flat
little-endian uint32 token file, memory-mapped (zero-copy — the OS pages
it in; multi-GB corpora never fully materialize in RAM). Each epoch
yields shuffled (batch, seq_len+1) int32 windows — seq_len inputs plus
the shifted next-token targets ``make_lm_train_step`` consumes.

The two hot host-side steps run in the native runtime library
(runtime/csrc/converters.cpp) when available: the seeded Fisher-Yates
epoch permutation and the OpenMP parallel window gather. A numpy fallback
keeps the loader working without a toolchain (same properties — every
window exactly once per epoch, deterministic in (seed, epoch) — but a
different permutation ORDER, since numpy's Generator is a different
PRNG; pipelines must not depend on cross-backend batch order).
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

from smmb_tpu.runtime import native


def write_token_file(path: str, tokens) -> None:
    """Serialize a 1-D int token sequence as the flat uint32 corpus format.

    Ids must fit int32 (the reader emits int32 batches — JAX's index
    dtype; a uint32-max bound here would let ids ≥ 2³¹ silently wrap
    negative on read)."""
    arr = np.asarray(tokens)
    if arr.ndim != 1:
        raise ValueError(f"tokens must be 1-D, got shape {arr.shape}")
    if arr.size and (arr.min() < 0 or arr.max() > np.iinfo(np.int32).max):
        raise ValueError("token ids must be in [0, 2**31) (int32 batches)")
    arr.astype("<u4").tofile(path)


class TokenDataset:
    """Shuffled fixed-window batches over a memory-mapped token corpus.

    Windows are the ``n_windows`` non-overlapping (seq_len+1)-token spans
    (the +1 provides next-token targets; a trailing partial span is
    dropped). ``batches(epoch)`` yields (batch, seq_len+1) int32 arrays in
    a per-(seed, epoch) deterministic shuffled order, dropping the last
    ragged batch so every batch is full-size (static shapes for jit).
    """

    def __init__(
        self, path: str, seq_len: int, batch: int, seed: int = 0
    ):
        self.tokens = np.memmap(path, dtype="<u4", mode="r")
        self.seq_len = int(seq_len)
        self.batch = int(batch)
        self.seed = int(seed)
        self.window = self.seq_len + 1
        self.n_windows = len(self.tokens) // self.window
        if self.n_windows < self.batch:
            raise ValueError(
                f"corpus has {self.n_windows} windows of {self.window} "
                f"tokens — fewer than one batch of {self.batch}"
            )
        self.n_batches = self.n_windows // self.batch

    def _perm(self, epoch: int) -> np.ndarray:
        mixed = (self.seed << 32) ^ (epoch & 0xFFFFFFFF)
        lib = native._lib()
        if lib is not None:
            out = np.empty(self.n_windows, np.int64)
            lib.shuffle_offsets(
                self.n_windows, ctypes.c_uint64(mixed & (2**64 - 1)),
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            )
            return out
        return np.random.default_rng(mixed).permutation(
            self.n_windows
        ).astype(np.int64)

    def _gather(self, starts: np.ndarray) -> np.ndarray:
        lib = native._lib()
        out = np.empty((len(starts), self.window), np.int32)
        if lib is not None:
            lib.gather_windows(
                self.tokens.ctypes.data_as(
                    ctypes.POINTER(ctypes.c_uint32)
                ),
                np.ascontiguousarray(starts).ctypes.data_as(
                    ctypes.POINTER(ctypes.c_int64)
                ),
                len(starts), self.window,
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            )
            return out
        for i, s in enumerate(starts):
            out[i] = self.tokens[s:s + self.window]
        return out

    def batches(self, epoch: int = 0):
        """Yield ``n_batches`` arrays of shape (batch, seq_len+1)."""
        perm = self._perm(epoch)
        for b in range(self.n_batches):
            idx = perm[b * self.batch:(b + 1) * self.batch]
            yield self._gather(idx * self.window)

    def __len__(self) -> int:
        return self.n_batches
