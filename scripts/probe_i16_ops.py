"""Micro-probe: which int16 vector ops does Mosaic legalize on v5e?

Each candidate op runs in a minimal pallas_call; prints OK/FAIL per op.
Usage: python scripts/probe_i16_ops.py [op ...]   (default: all)
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

T0 = time.time()


def t(msg):
    print(f"[{time.time() - T0:6.1f}s] {msg}", flush=True)


def run(name, body, out_dtype=jnp.float32):
    x = jnp.asarray(
        np.random.randint(-128, 128, size=(256, 512)), jnp.int8
    )

    def kernel(x_ref, o_ref):
        o_ref[:] = body(x_ref[:])

    try:
        y = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((256, 512), out_dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x)
        y.block_until_ready()
        t(f"{name}: OK  sum={np.asarray(y, np.float64).sum():.1f}")
    except Exception as e:
        msg = str(e).replace("\n", " | ")[:220]
        t(f"{name}: FAIL {type(e).__name__}: {msg}")


OPS = {
    "ext_i16": lambda x: x.astype(jnp.int16).astype(jnp.float32),
    "and_i16": lambda x: (
        x.astype(jnp.int16) & jnp.int16(5)
    ).astype(jnp.float32),
    "sub_i16": lambda x: (
        (x.astype(jnp.int16) & jnp.int16(1))
        - (x.astype(jnp.int16) & jnp.int16(2))
    ).astype(jnp.float32),
    "cvt_i16_bf16": lambda x: (
        x.astype(jnp.int16).astype(jnp.bfloat16).astype(jnp.float32)
    ),
    "fold_plane_bf16": lambda x: (
        (
            (x.astype(jnp.int16) & jnp.int16(4))
            - (x.astype(jnp.int16) & jnp.int16(8))
        ).astype(jnp.bfloat16)
    ).astype(jnp.float32),
    "cvt_i16_i8": lambda x: (
        (x.astype(jnp.int16) & jnp.int16(3)).astype(jnp.int8).astype(jnp.float32)
    ),
    "mul_i16": lambda x: (
        (x.astype(jnp.int16) & jnp.int16(1)) * jnp.int16(1000)
    ).astype(jnp.float32),
    "or_i16": lambda x: (
        (x.astype(jnp.int16) & jnp.int16(1)) | jnp.int16(256)
    ).astype(jnp.float32),
    "bitcast_i16_bf16": lambda x: jax.lax.bitcast_convert_type(
        (x.astype(jnp.int16) & jnp.int16(1)) * jnp.int16(16256),
        jnp.bfloat16,
    ).astype(jnp.float32),
}


OPS["add_i16"] = lambda x: (
    (x.astype(jnp.int16) & jnp.int16(3)) + jnp.int16(-2)
).astype(jnp.float32)
OPS["xor_i16"] = lambda x: (
    (x.astype(jnp.int16) ^ jnp.int16(0xAA)) & jnp.int16(255)
).astype(jnp.float32)
OPS["fold_xor_plane"] = lambda x: (
    (
        ((x.astype(jnp.int16) ^ jnp.int16(0xAA)) & jnp.int16(3 << 2))
        + jnp.int16(-(2 << 2))
    ).astype(jnp.bfloat16)
).astype(jnp.float32)
OPS["fold_xor_plane_i8"] = lambda x: (
    (
        ((x.astype(jnp.int16) ^ jnp.int16(0xAA)) & jnp.int16(3 << 2))
        + jnp.int16(-(2 << 2))
    ).astype(jnp.int8)
).astype(jnp.float32)

def main():
    names = sys.argv[1:] or list(OPS)
    t(f"backend={jax.default_backend()}")
    for n in names:
        run(n, OPS[n])


if __name__ == "__main__":
    main()
