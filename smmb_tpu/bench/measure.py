"""Walltime measurement harness — the TPU analog of measure.h.

The reference measures cycles with an adaptive warm-up (re-run until the
batch costs ≥1e8 cycles, defeating timer overhead and cold caches), then
averages REP(50) × NUM_RUNS(20) timed calls
(/root/reference/measure.h:13-76, knobs /root/reference/main.cpp:8-17).

On TPU the analog is: compile + device warm-up first (jit cache, HBM
residency), a calibration phase that sizes the timed batch so one batch
costs ≥ ``min_batch_s`` (timer overhead and host→device dispatch noise play
the role of RDTSC overhead), then ``reps`` timed batches with
``jax.block_until_ready`` fencing. Reports mean/min/std seconds per call.
Cycle counts are replaced by wall seconds; flops/cycle by achieved FLOP/s,
nnz/s and fraction-of-roofline (smmb_tpu/bench/roofline.py) — SURVEY.md §5's
prescribed mapping for the L0/L1 layers.
"""

from __future__ import annotations

import dataclasses
import time

import jax
import numpy as np

# defaults mirror the reference protocol constants (main.cpp:8-17):
# NUM_RUNS→runs, REP→reps, CYCLES_REQUIRED(1e8 cyc ≈ tens of ms)→min_batch_s
DEFAULT_REPS = 10
DEFAULT_MIN_BATCH_S = 0.02
DEFAULT_WARMUP_CALLS = 2


@dataclasses.dataclass(frozen=True)
class Measurement:
    mean_s: float
    min_s: float
    std_s: float
    calls_per_batch: int
    reps: int

    def rate(self, work_per_call: float) -> float:
        """work/second at the mean time (work = FLOPs, nnz, bytes, ...)."""
        return work_per_call / self.mean_s

    def best_rate(self, work_per_call: float) -> float:
        return work_per_call / self.min_s


def measure(
    fn,
    *args,
    reps: int = DEFAULT_REPS,
    min_batch_s: float = DEFAULT_MIN_BATCH_S,
    warmup_calls: int = DEFAULT_WARMUP_CALLS,
) -> Measurement:
    """Measure mean walltime per call of ``fn(*args)``.

    ``fn`` should be jitted; its output is fenced with block_until_ready.
    Protocol (mirrors /root/reference/measure.h:24-75):
      1. warm-up calls — compile + caches ("warm up the cpu", measure.h:27)
      2. calibrate: grow calls-per-batch until one batch ≥ min_batch_s
      3. reps timed batches; report per-call stats
    """

    def run_batch(ncalls: int) -> float:
        t0 = time.perf_counter()
        out = None
        for _ in range(ncalls):
            out = fn(*args)
        jax.block_until_ready(out)
        return time.perf_counter() - t0

    for _ in range(warmup_calls):
        jax.block_until_ready(fn(*args))

    calls = 1
    while True:
        t = run_batch(calls)
        if t >= min_batch_s or calls >= 1 << 20:
            break
        # overshoot slightly, like the reference's ×2 retry loop
        calls = max(calls * 2, int(calls * min_batch_s / max(t, 1e-9)) + 1)

    times = np.array([run_batch(calls) / calls for _ in range(reps)])
    return Measurement(
        mean_s=float(times.mean()),
        min_s=float(times.min()),
        std_s=float(times.std()),
        calls_per_batch=calls,
        reps=reps,
    )


def _device_loop(fn, n_iters: int):
    """Jit a program that runs ``fn`` n_iters times on-device.

    ``lax.scan`` re-executes the body each trip; the optimization_barrier on
    the carried inputs makes them formally loop-dependent, which blocks XLA
    from hoisting the (loop-invariant) kernel call out of the loop. A scalar
    probe of each output keeps the kernel live.
    """
    import jax.numpy as jnp

    def run(args):
        def body(carry, _):
            carry = jax.lax.optimization_barrier(carry)
            out = fn(*carry)
            probe = jax.tree_util.tree_reduce(
                lambda a, l: a + jnp.sum(l) * 0.0,
                out,
                jnp.float32(0.0),
            )
            return carry, probe
        _, probes = jax.lax.scan(body, args, None, length=n_iters)
        return probes[-1]

    return jax.jit(run)


def measure_device(
    fn,
    *args,
    iters: int = 50,
    reps: int = DEFAULT_REPS,
) -> Measurement:
    """Per-call device time with host-dispatch latency cancelled.

    Through a remote-dispatch tunnel (or any high-latency host link), naive
    walltime measures round-trip latency, not the kernel. This variant runs
    the kernel ``iters`` and ``2×iters`` times inside single jitted device
    loops and reports the slope ``(t_2R − t_R) / R`` — dispatch overhead and
    loop fixed costs cancel. The TPU analog of the reference's
    timer-overhead-defeating warm-up batching (/root/reference/measure.h:24-49).
    """
    short = _device_loop(fn, iters)
    long = _device_loop(fn, 2 * iters)

    jax.block_until_ready(short(args))  # compile
    jax.block_until_ready(long(args))

    def run(f) -> float:
        t0 = time.perf_counter()
        jax.block_until_ready(f(args))
        return time.perf_counter() - t0

    # The device may be time-shared (remote pools); single readings swing
    # wildly under contention. Two estimators:
    #  - min over direct long-loop per-iteration times: a quiet-window
    #    capability bound that cannot be biased low (loop overhead amortizes
    #    to < dispatch/2R per call) — the primary number.
    #  - median of slope estimates (t_2R − t_R)/R: cancels fixed overheads
    #    exactly but is noise-sensitive in both directions — secondary.
    direct, deltas = [], []
    for _ in range(reps):
        t_short = run(short)
        t_long = run(long)
        direct.append(t_long / (2 * iters))
        direct.append(t_short / iters)
        deltas.append((t_long - t_short) / iters)
    best = float(np.min(direct))
    slope = float(np.median(deltas))
    mean = slope if slope > 0 else best
    return Measurement(
        mean_s=max(min(mean, float(np.median(direct))), 1e-9),
        min_s=max(best, 1e-9),
        std_s=float(np.std(deltas)),
        calls_per_batch=iters,
        reps=reps,
    )
