"""Micro-probe: which int8 vector ops does Mosaic legalize on v5e?

Companion to probe_i16_ops.py (which established that i16 and/or/xor/add
legalize but sub/mul/shift SIGABRT). Round-2 finding: arith.addi on i8 is
rejected outright ("Only vector<i16> and vector<i32> are supported") — this
probe maps the full i8 op surface so decode designs stop guessing.
Usage: python scripts/probe_i8_ops.py [op ...]   (default: all)
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
    x = jnp.asarray(np.random.randint(-128, 128, size=(256, 512)), jnp.int8)

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
        msg = str(e).replace("\n", " | ")[:200]
        t(f"{name}: FAIL {type(e).__name__}: {msg}")


OPS = {
    "and_i8": lambda x: (x & jnp.int8(5)).astype(jnp.float32),
    "or_i8": lambda x: (x | jnp.int8(1)).astype(jnp.float32),
    "xor_i8": lambda x: (x ^ jnp.int8(-86)).astype(jnp.float32),
    "add_i8": lambda x: (x + jnp.int8(1)).astype(jnp.float32),
    "sub_i8": lambda x: (x - jnp.int8(1)).astype(jnp.float32),
    "cmp_i8": lambda x: ((x & jnp.int8(4)) != 0).astype(jnp.float32),
    "sel_i8": lambda x: jnp.where(
        (x & jnp.int8(4)) != 0, jnp.int8(-1), jnp.int8(0)
    ).astype(jnp.float32),
    "sel_nested_i8": lambda x: jnp.where(
        (x & jnp.int8(1)) != 0,
        jnp.where((x & jnp.int8(2)) != 0, jnp.int8(-1), jnp.int8(1)),
        jnp.int8(0),
    ).astype(jnp.float32),
    "sel_bf16": lambda x: jnp.where(
        (x & jnp.int8(4)) != 0, jnp.bfloat16(-1), jnp.bfloat16(0)
    ).astype(jnp.float32),
    "cvt_i8_bf16": lambda x: (
        (x & jnp.int8(3)).astype(jnp.bfloat16).astype(jnp.float32)
    ),
    "bitcast_i8x4_i32": lambda x: jax.lax.bitcast_convert_type(
        x.reshape(256, 128, 4), jnp.int32
    ).astype(jnp.float32).sum(-1).broadcast_in_dim((256, 512), (0, 1))
    if False
    else jax.lax.bitcast_convert_type(
        x.reshape(256, 128, 4), jnp.int32
    ).astype(jnp.float32),
}


def main():
    names = sys.argv[1:] or [n for n in OPS if n != "bitcast_i8x4_i32"]
    t(f"backend={jax.default_backend()}")
    for n in names:
        run(n, OPS[n])


if __name__ == "__main__":
    main()
