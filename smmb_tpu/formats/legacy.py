"""Legacy threshold-based format construction (reference course path).

The reference's original course code builds its TCSC layout from an *int*
matrix with threshold compares — ``>= 1`` → +1 entry, ``<= -1`` → -1 entry
(/root/reference/SparseGEMM.h:20-39) — unlike the modern C path's exact
``== ±1.0f`` float compares (/root/reference/sparse/tcsc.c:54-57). These
wrappers reproduce the threshold semantics for every format in this
framework, so the legacy driver's own workloads (``initX`` int matrices,
/root/reference/SparseGEMM.h:43-51) convert with full parity.

Note the legacy kernels still multiply by implicit ±1 regardless of the
stored magnitude, so a value of e.g. +5 contributes +1 — ``sparseGEMM``
computes against the *thresholded* matrix, not the raw one. The oracle for
parity tests is therefore ``gemm(x, ternarize_threshold(w), b)`` with the
legacy tolerance 1e-5 (/root/reference/SparseGEMM.h:176).
"""

from __future__ import annotations

import jax
import numpy as np

from smmb_tpu.formats.bcsr import BCSR, bcsr_from_dense
from smmb_tpu.formats.packed import TernaryPacked, pack_ternary
from smmb_tpu.formats.tcsc import TCSC, tcsc_from_dense


def ternarize_threshold(w) -> np.ndarray:
    """Int/float matrix → float32 ternary via the legacy thresholds:
    ``w >= 1`` → +1.0, ``w <= -1`` → -1.0, else 0.0
    (/root/reference/SparseGEMM.h:26-34)."""
    w = np.asarray(w)
    t = np.zeros(w.shape, dtype=np.float32)
    t[w >= 1] = 1.0
    t[w <= -1] = -1.0
    return t


def tcsc_from_dense_threshold(w) -> TCSC:
    """Legacy ``SparseFormat`` constructor: TCSC from an int matrix with
    threshold compares (/root/reference/SparseGEMM.h:20-39)."""
    return tcsc_from_dense(ternarize_threshold(w))


def pack_ternary_threshold(w) -> TernaryPacked:
    """Threshold-semantics packing into the 2-bit execution format."""
    return pack_ternary(ternarize_threshold(w))


def bcsr_from_dense_threshold(w, r: int, c: int) -> BCSR:
    """Threshold-semantics BCSR construction."""
    return bcsr_from_dense(ternarize_threshold(w), r, c)
