"""XLA profiler trace capture — the kperf/PAPI analog (SURVEY.md §5).

The reference reads hardware PMU counters (cycles, uops, branch misses) via
reverse-engineered macOS kperf bindings (/root/reference/kperf.h:1045-1081)
and PAPI FLOP counters (/root/reference/papi/my_papi.c:43-81). The TPU-native
equivalent is an XLA profiler trace: per-op device timing, HLO, memory and
DMA activity, viewable in TensorBoard/Perfetto.
"""

from __future__ import annotations

import os

import jax


def capture_trace(fn, *args, trace_dir: str = "/tmp/smmb_trace", n_calls: int = 3):
    """Run ``fn(*args)`` under the JAX profiler; returns the trace directory.

    The trace contains per-kernel device timelines — open with
    ``tensorboard --logdir <dir>`` or upload the .pb to Perfetto.
    """
    os.makedirs(trace_dir, exist_ok=True)
    jax.block_until_ready(fn(*args))  # compile outside the trace
    with jax.profiler.trace(trace_dir):
        out = None
        for _ in range(n_calls):
            out = fn(*args)
        jax.block_until_ready(out)
    return trace_dir


def annotate(name: str):
    """Named trace region (``with annotate("decode"): ...``) — the analog of
    bracketing a region with start/stop counters (/root/reference/measure.h)."""
    return jax.profiler.TraceAnnotation(name)
