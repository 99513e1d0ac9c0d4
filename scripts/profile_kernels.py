"""Per-kernel trace profile — the kperf-analog decomposition (VERDICT r2
missing #2; /root/reference/kperf.h:1045-1081 decodes 8 PMU counters per
region; the TPU equivalent is the XLA profiler's per-op device timeline).

Captures one trace per flagship kernel and aggregates the TPU device plane
into a per-op table (total/avg device time, occupancy fraction of the
traced window), printed and written to docs/PROFILE.md:

  * packed_spmm headline (256x4096x4096 bf16, wide-N tiles)
  * packed_spmm M=1 deep-K (1x4096x4096 bf16 — ROADMAP #7's parked gap)
  * flash attention (B1 H16 T4096 causal MHA bf16, tuned tiles)
  * LM decode step (batch-1, ctx 512 — the serving hot loop)

    PYTHONPATH=/root/repo:$PYTHONPATH python scripts/profile_kernels.py

Parsing uses tensorflow.tsl's xplane proto (available in this image); the
capture side is smmb_tpu/bench/trace.py (plain jax.profiler).
"""

import os
import sys
import time

T0 = time.time()

# provenance stamp: first output line records the commit being measured
# (round-3 VERDICT #1 — artifacts must match the code at HEAD)
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from smmb_tpu.utils.stamp import print_stamp
print_stamp()
import jax

try:
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

import jax.numpy as jnp
import numpy as np

from smmb_tpu.bench.trace import capture_trace
from smmb_tpu.formats.packed import TernaryPacked, pack_ternary
from smmb_tpu.kernels.flash_attention import flash_attention
from smmb_tpu.kernels.packed_spmm import packed_spmm
from smmb_tpu.utils import rng


def t(m):
    print("[%6.1fs] %s" % (time.time() - T0, m), flush=True)


def parse_xplane(trace_dir):
    """Aggregate the TPU device plane(s): {line_name: {op: (count, total_ps)}}."""
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    pbs = []
    for root, _, files in os.walk(trace_dir):
        for f in files:
            if f.endswith(".xplane.pb"):
                pbs.append(os.path.join(root, f))
    if not pbs:
        raise FileNotFoundError(f"no .xplane.pb under {trace_dir}")
    pbs.sort(key=os.path.getmtime)
    space = xplane_pb2.XSpace()
    with open(pbs[-1], "rb") as f:
        space.ParseFromString(f.read())
    out = {}
    for plane in space.planes:
        if "TPU" not in plane.name and "Tensor" not in plane.name:
            continue
        emeta = {m.id: m.name for m in plane.event_metadata.values()}
        for line in plane.lines:
            key = f"{plane.name} / {line.name}"
            agg = out.setdefault(key, {})
            for ev in line.events:
                name = emeta.get(ev.metadata_id, str(ev.metadata_id))
                c, tot = agg.get(name, (0, 0))
                agg[name] = (c + 1, tot + ev.duration_ps)
    return out


def report(title, trace_dir, n_calls, lines):
    planes = parse_xplane(trace_dir)
    lines.append(f"\n## {title}\n")
    for key in sorted(planes):
        agg = planes[key]
        if not agg:
            continue
        total_ps = sum(v[1] for v in agg.values())
        rows = sorted(agg.items(), key=lambda kv: -kv[1][1])[:12]
        lines.append(f"### {key}\n")
        lines.append("| op | calls | total µs | per-call µs | % of plane |")
        lines.append("|---|---|---|---|---|")
        for name, (c, tot) in rows:
            lines.append(
                f"| `{name[:70]}` | {c} | {tot/1e6:.1f} | {tot/c/1e6:.2f} "
                f"| {100*tot/max(total_ps,1):.1f}% |"
            )
        lines.append("")
    for ln in lines[-40:]:
        print(ln)


def main():
    t(f"devices: {jax.devices()}")
    lines = [
        "# Per-kernel device-time profile (XLA profiler — the kperf analog)",
        "",
        f"Captured on {jax.devices()[0].device_kind} via "
        "`scripts/profile_kernels.py` (regenerate any time; traces land in "
        "/tmp/smmb_prof_*). Each capture times N back-to-back calls of the "
        "jitted program; the tables aggregate the TPU device plane per op.",
    ]

    kx, kw = jax.random.split(jax.random.PRNGKey(0))

    # 1) headline packed_spmm
    x = rng.rand_dense(kx, (256, 4096))
    p = pack_ternary(np.asarray(rng.rand_ternary(kw, (4096, 4096), 10)))

    def headline(x, d):
        w_ = TernaryPacked(data=d, rows=4096, cols=4096, nnz=p.nnz)
        return packed_spmm(x, w_, compute_dtype=jnp.bfloat16)

    t("tracing headline packed_spmm...")
    d1 = capture_trace(
        jax.jit(headline), x, p.data,
        trace_dir="/tmp/smmb_prof_headline", n_calls=50,
    )
    report("packed_spmm 256×4096×4096 bf16 (headline, 50 calls)", d1, 50,
           lines)

    # 2) M=1 deep-K
    x1 = rng.rand_dense(kx, (1, 4096))
    t("tracing M=1 deep-K packed_spmm...")
    d2 = capture_trace(
        jax.jit(headline), x1, p.data,
        trace_dir="/tmp/smmb_prof_m1", n_calls=50,
    )
    report("packed_spmm 1×4096×4096 bf16 (M=1 deep-K, 50 calls)", d2, 50,
           lines)

    # 3) flash attention
    kq, kk, kv = jax.random.split(jax.random.PRNGKey(1), 3)
    q = jax.random.normal(kq, (1, 16, 4096, 128), jnp.bfloat16)
    k = jax.random.normal(kk, (1, 16, 4096, 128), jnp.bfloat16)
    v = jax.random.normal(kv, (1, 16, 4096, 128), jnp.bfloat16)
    t("tracing flash attention T=4096...")
    d3 = capture_trace(
        jax.jit(lambda q, k, v: flash_attention(q, k, v, causal=True)),
        q, k, v, trace_dir="/tmp/smmb_prof_flash", n_calls=20,
    )
    report("flash attention B1 H16 T4096 causal MHA bf16 (20 calls)", d3,
           20, lines)

    # 4) LM decode step at ctx 512
    from smmb_tpu.models.lm import (
        TernaryLMConfig, init_lm, lm_decode_step, lm_init_cache, lm_prefill,
        pack_lm,
    )

    cfg = TernaryLMConfig(
        vocab=8192, d_model=1024, n_heads=8, d_ff=4096, n_layers=4,
        max_len=1024,
    )
    kwd = dict(compute_dtype=jnp.bfloat16, use_kernel=True)
    lm = pack_lm(init_lm(jax.random.PRNGKey(0), cfg))
    prompt = jax.random.randint(jax.random.PRNGKey(2), (1, 512), 0, cfg.vocab)
    cache = lm_init_cache(cfg, 1, dtype=jnp.bfloat16)
    lg, cache = lm_prefill(lm, prompt, cache, cfg, **kwd)
    tok = jnp.argmax(lg, axis=-1).astype(jnp.int32)

    @jax.jit
    def step(tok, cache):
        lg, c = lm_decode_step(lm, tok, cache, cfg, **kwd)
        return jnp.argmax(lg, axis=-1).astype(jnp.int32), c

    t("tracing LM decode step (ctx 512)...")
    d4 = capture_trace(step, tok, cache,
                       trace_dir="/tmp/smmb_prof_decode", n_calls=50)
    report("LM decode step batch-1 ctx512 bf16 (4 layers, 50 calls)", d4,
           50, lines)

    # 5) int8-cache decode step w/ flash decode at long ctx — chases the
    # LM-level int8-vs-bf16 gap that the kernel-level numbers contradict
    cfg8 = TernaryLMConfig(
        vocab=8192, d_model=1024, n_heads=8, d_ff=4096, n_layers=4,
        max_len=8448,
    )
    lm8 = pack_lm(init_lm(jax.random.PRNGKey(0), cfg8))
    prompt8 = jax.random.randint(
        jax.random.PRNGKey(2), (1, 8192), 0, cfg8.vocab
    )
    for quant, nm in ((False, "bf16"), (True, "int8")):
        cache8 = lm_init_cache(cfg8, 1, dtype=jnp.bfloat16, quantized=quant)
        lg8, cache8 = lm_prefill(
            lm8, prompt8, cache8, cfg8, use_flash=True, **kwd
        )
        tok8 = jnp.argmax(lg8, axis=-1).astype(jnp.int32)

        @jax.jit
        def step8(tok, cache):
            lg, c = lm_decode_step(
                lm8, tok, cache, cfg8, use_flash=True, **kwd
            )
            return jnp.argmax(lg, axis=-1).astype(jnp.int32), c

        t(f"tracing LM decode step ctx8192 {nm} cache (flash decode)...")
        d5 = capture_trace(
            step8, tok8, cache8,
            trace_dir=f"/tmp/smmb_prof_decode8k_{nm}", n_calls=20,
        )
        report(
            f"LM decode step batch-1 ctx8192 {nm} cache, flash decode "
            "(4 layers, 20 calls)", d5, 20, lines,
        )

    out = "docs/PROFILE.md"
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    t(f"wrote {out}")


if __name__ == "__main__":
    sys.exit(main())
