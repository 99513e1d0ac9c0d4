"""One-config hardware probe for packed_spmm decode variants.

Usage: python scripts/probe_decode.py M K N non_zero decode dtype [bn bk]
Prints one line:  RESULT M K N decode dtype bn bk compile_s time_us err
Run each config under `timeout` — pathological Mosaic compiles hang >9 min.
"""

import sys
import time

import jax

try:
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

import jax.numpy as jnp
import numpy as np

from smmb_tpu.bench.measure import measure_device
from smmb_tpu.formats.packed import pack_ternary
from smmb_tpu.kernels.packed_spmm import packed_spmm
from smmb_tpu.utils import rng


def main():
    m, k, n, nz = (int(v) for v in sys.argv[1:5])
    decode, dtype_s = sys.argv[5], sys.argv[6]
    bn = int(sys.argv[7]) if len(sys.argv) > 7 else 0
    bk = int(sys.argv[8]) if len(sys.argv) > 8 else 0
    dtype = {"f32": jnp.float32, "bf16": jnp.bfloat16, "int8": jnp.int8}[dtype_s]

    kx, kw, kb = jax.random.split(jax.random.PRNGKey(0), 3)
    x = rng.rand_dense(kx, (m, k))
    w = np.asarray(rng.rand_ternary(kw, (k, n), non_zero=nz))
    b = rng.rand_dense(kb, (n,))
    oracle = np.asarray(x, np.float64) @ w.astype(np.float64) + np.asarray(
        b, np.float64
    )
    p = pack_ternary(w)

    kw_args = dict(compute_dtype=dtype, decode=decode)
    if bn:
        kw_args["block_n"] = bn
    if bk:
        kw_args["block_k"] = bk

    def fn(x, p, b):
        return packed_spmm(x, p, b, **kw_args)

    t0 = time.time()
    y = np.asarray(fn(x, p, b), np.float64)
    compile_s = time.time() - t0
    err = np.abs(y - oracle).max()
    meas = measure_device(fn, x, p, b, reps=3)
    print(
        f"RESULT {m} {k} {n} {decode} {dtype_s} bn={bn or 'def'} "
        f"bk={bk or 'def'} compile={compile_s:.1f}s "
        f"t={meas.min_s * 1e6:.2f}us err={err:.2e}",
        flush=True,
    )


if __name__ == "__main__":
    main()
