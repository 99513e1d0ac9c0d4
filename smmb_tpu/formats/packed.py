"""TernaryPacked — the TPU-native 2-bit dense execution format (net-new).

No reference counterpart: the reference exploits ternary weights by making the
CPU inner loop multiplication-free (/root/reference/sparse/tcsc.c:86-94). On
TPU the same insight maps to *bandwidth*, not instruction count: matmul FLOPs
are nearly free on the MXU, and SpMM at the reference's densities (6-50%) is
memory-bound on weight traffic. So the execution format is a dense 2-bit
encoding — 16× smaller than the fp32 weights the reference streams, 8× smaller
than bf16 — decompressed tile-by-tile in VMEM and fed straight to the MXU
(see smmb_tpu/kernels/packed_spmm.py).

Layout — group-strided so the kernel decode is gather-free:

    data : int8[K_pad // 4, N],  K_pad = round_up(K, GROUP_ROWS)

Logical rows are packed in groups of ``GROUP_ROWS = 512``; each group owns
``SUB = 128`` packed rows. Packed row ``p`` of group ``g`` (i.e.
``data[g*128 + p]``) stores four logical rows in its four 2-bit fields:

    bits 0-1 → row  g*512 +   0 + p
    bits 2-3 → row  g*512 + 128 + p
    bits 4-5 → row  g*512 + 256 + p
    bits 6-7 → row  g*512 + 384 + p

Decoding a whole group is therefore four shift+sign-extend passes whose
outputs concatenate along the sublane axis into logical row order — no
interleaving, no gathers, perfectly shaped for the TPU VPU (8×128 vregs) and
a 512-row MXU K-tile. Codes are 2-bit two's complement (``0b00=0``,
``0b01=+1``, ``0b11=-1``), decoded branch-free by ``(w << shl) >> 6`` on int8.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from smmb_tpu.utils.shapes import round_up

VALUES_PER_BYTE = 4
SUB = 128  # packed rows per group (= TPU lane count, sublane-concat friendly)
GROUP_ROWS = VALUES_PER_BYTE * SUB  # 512 logical rows per group


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["data"],
    meta_fields=["rows", "cols", "nnz"],
)
@dataclasses.dataclass(frozen=True)
class TernaryPacked:
    """2-bit packed ternary matrix; logical shape (rows, cols)."""

    data: jax.Array  # int8[K_pad // 4, cols]
    rows: int  # logical K (un-padded)
    cols: int  # N
    nnz: int  # number of ±1 entries (for nnz/s reporting)

    @property
    def shape(self):
        return (self.rows, self.cols)

    @property
    def packed_rows(self) -> int:
        return self.data.shape[0]

    @property
    def padded_rows(self) -> int:
        return self.packed_rows * VALUES_PER_BYTE

    @property
    def density(self) -> float:
        return self.nnz / float(self.rows * self.cols)

    def weight_bytes(self) -> int:
        """HBM bytes of weight traffic per full read of the matrix."""
        return int(self.data.shape[0]) * int(self.data.shape[1])


def _pack_groups(t):
    """(K_pad, N) int8 ternary → (K_pad//4, N) packed words (jnp or numpy)."""
    xp = jnp if isinstance(t, jax.Array) else np
    kpad, cols = t.shape
    g = kpad // GROUP_ROWS
    t4 = t.reshape(g, VALUES_PER_BYTE, SUB, cols)
    codes = (t4 & 3).astype(xp.uint8)
    packed = (
        codes[:, 0]
        | (codes[:, 1] << 2)
        | (codes[:, 2] << 4)
        | (codes[:, 3] << 6)
    )
    return packed.reshape(g * SUB, cols).astype(xp.int8)


def pack_ternary(w) -> TernaryPacked:
    """Dense (K × N) ternary float matrix → 2-bit packed (host-side).

    Like the reference's format constructors, entries exactly equal to ±1.0
    are encoded; everything else is treated as 0
    (/root/reference/sparse/tcsc.c:54-57).
    """
    w = np.asarray(w, dtype=np.float32)
    rows, cols = w.shape
    t = np.zeros(w.shape, dtype=np.int8)
    t[w == 1.0] = 1
    t[w == -1.0] = -1
    nnz = int(np.count_nonzero(t))
    pad_rows = round_up(max(rows, 1), GROUP_ROWS)
    if pad_rows != rows:
        t = np.concatenate([t, np.zeros((pad_rows - rows, cols), np.int8)])
    return TernaryPacked(
        data=jnp.asarray(_pack_groups(t)), rows=rows, cols=cols, nnz=nnz
    )


def pack_ternary_device(t: jax.Array, nnz: int = -1) -> TernaryPacked:
    """Jittable device-side packer for already-ternary int8/float input.

    Used by the training path (smmb_tpu/models/train.py) to re-pack quantized
    master weights each step without a host round-trip. ``nnz`` is static
    metadata; pass -1 when unknown (density reporting then unavailable).
    """
    rows, cols = t.shape
    # same contract as the host-side pack_ternary: anything not exactly ±1
    # encodes as 0 (a bare astype would mis-encode e.g. 2.0 → code 0b10)
    ti = jnp.where(
        jnp.abs(t) == 1, jnp.sign(t).astype(jnp.int8), jnp.int8(0)
    )
    pad_rows = round_up(max(rows, 1), GROUP_ROWS)
    if pad_rows != rows:
        ti = jnp.concatenate([ti, jnp.zeros((pad_rows - rows, cols), jnp.int8)])
    return TernaryPacked(data=_pack_groups(ti), rows=rows, cols=cols, nnz=nnz)


def concat_packed_cols(mats: list[TernaryPacked]) -> TernaryPacked:
    """Column-concatenate packed matrices sharing a row count.

    The 2-bit packing is column-independent (each byte holds 4 row-values
    of ONE column — _pack_groups), so fusing [Wq | Wk | Wv] is a plain
    axis-1 concat of the packed words. Serving decode uses this to run the
    QKV projections as ONE weight-streaming kernel call per step instead
    of three (models/attention._proj_qkv)."""
    rows = {m.rows for m in mats}
    if len(rows) != 1:
        raise ValueError(f"row mismatch across packed matrices: {rows}")
    nnz = -1 if any(m.nnz < 0 for m in mats) else sum(m.nnz for m in mats)
    return TernaryPacked(
        data=jnp.concatenate([m.data for m in mats], axis=1),
        rows=mats[0].rows,
        cols=sum(m.cols for m in mats),
        nnz=nnz,
    )


def decode_words(words: jax.Array, dtype=jnp.float32) -> jax.Array:
    """Decode packed words covering whole groups → dense logical rows.

    ``words`` is int8[(g*SUB), N] (a slice of ``data`` aligned to group
    boundaries); returns dense[(g*GROUP_ROWS), N] in ``dtype``. This is the
    exact decode the Pallas kernel performs per K-tile — kept here so the jnp
    oracle and the kernel share one definition of the layout.
    """
    prows, cols = words.shape
    g = prows // SUB
    # decode in int32 registers — int8 vector shifts are not universally
    # supported on TPU (Mosaic rejects arith.shli on i8 vectors)
    w3 = words.reshape(g, SUB, cols).astype(jnp.int32)
    planes = [
        ((w3 << (30 - 2 * i)) >> 30).astype(dtype)
        for i in range(VALUES_PER_BYTE)
    ]
    out = jnp.stack(planes, axis=1)  # (g, 4, SUB, cols)
    return out.reshape(g * GROUP_ROWS, cols)


def unpack_ternary(p: TernaryPacked, dtype=jnp.float32) -> jax.Array:
    """Packed → dense (rows × cols). Jittable; also the round-trip test hook."""
    return decode_words(p.data, dtype)[: p.rows]
