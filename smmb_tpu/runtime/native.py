"""ctypes bindings for the native C++ format constructors.

The reference's construction layer is C (/root/reference/sparse/tcsc.c,
bcsr.c); here it is a multithreaded C++ shared library compiled on first use
(g++ -O3 -fopenmp) and bound via ctypes — no pybind11 dependency. Every entry
point has a numpy fallback, so the framework works without a toolchain; the
native path exists because host-side conversion of multi-GB ternary weights
must overlap TPU execution (see csrc/converters.cpp).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_LOCK = threading.Lock()
_LIB: ctypes.CDLL | None = None
_TRIED = False

_SRC = os.path.join(os.path.dirname(__file__), "csrc", "converters.cpp")
_SO = os.path.join(os.path.dirname(__file__), "csrc", "libsmmb_runtime.so")


def _build() -> str | None:
    if os.path.exists(_SO) and os.path.getmtime(_SO) >= os.path.getmtime(_SRC):
        return _SO
    cmd = [
        "g++", "-O3", "-march=native", "-fopenmp", "-shared", "-fPIC",
        "-o", _SO, _SRC,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return _SO
    except Exception:
        # no/old toolchain: retry without -march/-fopenmp before giving up
        try:
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-o", _SO, _SRC],
                check=True, capture_output=True, timeout=120,
            )
            return _SO
        except Exception:
            return None


def _lib() -> ctypes.CDLL | None:
    global _LIB, _TRIED
    with _LOCK:
        if _TRIED:
            return _LIB
        _TRIED = True
        so = _build()
        if so is None:
            return None
        try:
            lib = ctypes.CDLL(so)
        except OSError:
            return None  # stale/foreign .so: fall back to numpy paths
        try:
            _bind(lib)
        except AttributeError:
            # .so predates a symbol (e.g. preserved-mtime artifact without
            # a toolchain to rebuild): fall back to numpy rather than
            # crashing every native path on first use
            return None
        _LIB = lib
        return _LIB


def _bind(lib: ctypes.CDLL) -> None:
    """Declare argtypes for every exported symbol (raises AttributeError
    if the loaded .so predates one — the caller falls back to numpy)."""
    i64 = ctypes.c_int64
    i32p = ctypes.POINTER(ctypes.c_int32)
    i64p = ctypes.POINTER(ctypes.c_int64)
    f32p = ctypes.POINTER(ctypes.c_float)
    i8p = ctypes.POINTER(ctypes.c_int8)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    lib.tcsc_count.argtypes = [f32p, i64, i64, i32p, i32p, i64p, i64p]
    lib.tcsc_fill.argtypes = [f32p, i64, i64, i32p, i32p, i32p, i32p]
    lib.pack_ternary.argtypes = [f32p, i64, i64, i64, i8p]
    lib.bcsr_count.argtypes = [f32p, i64, i64, i64, i64, i32p, u8p]
    lib.bcsr_count.restype = i64
    lib.bcsr_fill.argtypes = [f32p, i64, i64, i64, i64, i32p, u8p, i32p, f32p]
    u64 = ctypes.c_uint64
    u32p = ctypes.POINTER(ctypes.c_uint32)
    lib.shuffle_offsets.argtypes = [i64, u64, i64p]
    lib.gather_windows.argtypes = [u32p, i64p, i64, i64, i32p]


def native_available() -> bool:
    return _lib() is not None


def _f32c(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _i32c(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def tcsc_from_dense_native(w: np.ndarray):
    """Native two-pass TCSC construction; returns the same pytree as
    smmb_tpu.formats.tcsc.tcsc_from_dense (which it falls back to)."""
    from smmb_tpu.formats import tcsc as tcsc_mod

    lib = _lib()
    w = np.ascontiguousarray(w, dtype=np.float32)
    if lib is None:
        return tcsc_mod.tcsc_from_dense(w)
    rows, cols = w.shape
    csp = np.zeros(cols + 1, np.int32)
    csn = np.zeros(cols + 1, np.int32)
    n_pos = ctypes.c_int64()
    n_neg = ctypes.c_int64()
    lib.tcsc_count(
        _f32c(w), rows, cols, _i32c(csp), _i32c(csn),
        ctypes.byref(n_pos), ctypes.byref(n_neg),
    )
    rip = np.empty(n_pos.value, np.int32)
    rin = np.empty(n_neg.value, np.int32)
    lib.tcsc_fill(_f32c(w), rows, cols, _i32c(csp), _i32c(csn),
                  _i32c(rip), _i32c(rin))
    import jax.numpy as jnp

    return tcsc_mod.TCSC(
        col_start_pos=jnp.asarray(csp),
        col_start_neg=jnp.asarray(csn),
        row_index_pos=jnp.asarray(rip),
        row_index_neg=jnp.asarray(rin),
        rows=rows,
        cols=cols,
        n_pos=int(n_pos.value),
        n_neg=int(n_neg.value),
    )


def pack_ternary_native(w: np.ndarray):
    """Native group-strided 2-bit packing; TernaryPacked result (falls back
    to smmb_tpu.formats.packed.pack_ternary)."""
    from smmb_tpu.formats import packed as packed_mod

    lib = _lib()
    w = np.ascontiguousarray(w, dtype=np.float32)
    if lib is None:
        return packed_mod.pack_ternary(w)
    rows, cols = w.shape
    pad_rows = -(-max(rows, 1) // packed_mod.GROUP_ROWS) * packed_mod.GROUP_ROWS
    out = np.empty((pad_rows // 4, cols), np.int8)
    lib.pack_ternary(
        _f32c(w), rows, cols, pad_rows,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)),
    )
    nnz = int(np.count_nonzero((w == 1.0) | (w == -1.0)))
    import jax.numpy as jnp

    return packed_mod.TernaryPacked(
        data=jnp.asarray(out), rows=rows, cols=cols, nnz=nnz
    )


def bcsr_from_dense_native(w: np.ndarray, r: int, c: int):
    """Native BCSR construction (zero-block-row-safe); falls back to
    smmb_tpu.formats.bcsr.bcsr_from_dense."""
    from smmb_tpu.formats import bcsr as bcsr_mod

    lib = _lib()
    w = np.ascontiguousarray(w, dtype=np.float32)
    if lib is None:
        return bcsr_mod.bcsr_from_dense(w, r, c)
    rows, cols = w.shape
    if rows % r or cols % c:
        raise ValueError(f"shape {w.shape} not divisible by block ({r}, {c})")
    br, bc = rows // r, cols // c
    row_start = np.zeros(br + 1, np.int32)
    valid = np.zeros(br * bc, np.uint8)
    k = int(
        lib.bcsr_count(
            _f32c(w), rows, cols, r, c, _i32c(row_start),
            valid.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        )
    )
    col_idx = np.empty(k, np.int32)
    values = np.empty((k, r, c), np.float32)
    lib.bcsr_fill(
        _f32c(w), rows, cols, r, c, _i32c(row_start),
        valid.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        _i32c(col_idx), _f32c(values),
    )
    import jax.numpy as jnp

    return bcsr_mod.BCSR(
        b_row_start=jnp.asarray(row_start),
        b_col_idx=jnp.asarray(col_idx),
        b_values=jnp.asarray(values),
        rows=rows, cols=cols, r=r, c=c, br=br, bc=bc, k=k,
    )
