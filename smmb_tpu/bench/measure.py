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


def _device_loop(fn, n_iters: int, rotate_argnums=(), rotate_copies=1):
    """Jit a program that runs ``fn`` n_iters times on-device.

    ``lax.scan`` re-executes the body each trip; the optimization_barrier on
    the carried inputs makes them formally loop-dependent, which blocks XLA
    from hoisting the (loop-invariant) kernel call out of the loop. A scalar
    probe of each output keeps the kernel live.

    ``rotate_argnums``/``rotate_copies``: those positional args arrive
    STACKED ``rotate_copies`` times along a new leading axis and iteration
    ``i`` uses copy ``i % rotate_copies``. Rationale (measured,
    scripts/probe_subfloor.py): a loop-invariant operand small enough to be
    pinned in on-chip memory across scan iterations measures BELOW its HBM
    traffic floor (jnp GQA decode over an 8.5 MB cache: 4.0 µs vs the
    10.2 µs floor) — rotating over enough copies that the total footprint
    exceeds on-chip memory restores true HBM-streaming conditions (20.6 µs
    same case; a non-pinnable 33.8 MB cache measures the same rotated or
    not, so the dynamic-slice indexing fuses into consumers and adds ~3 µs,
    not a cache-sized copy).
    """
    import jax.numpy as jnp

    def run(args):
        # The loop must carry a TRUE VALUE dependence from each iteration's
        # output into the next iteration's input. optimization_barrier is
        # not enough on every backend: the remote-TPU compile path was
        # observed hoisting the (formally loop-invariant) fn call out of
        # the scan, collapsing any loop length to one call — and a
        # sum(out)*0.0 probe alone is foldable for integer outputs,
        # DCE-ing fn entirely. So: reduce the output to a scalar that is
        # finite at runtime but not provably so, and gate the smallest
        # input leaf on it with a value-preserving `where` — each
        # iteration's inputs then genuinely depend on the previous output.
        leaves0 = jax.tree_util.tree_leaves(args)
        small = min(
            range(len(leaves0)), key=lambda i: getattr(leaves0[i], "size", 1)
        )
        treedef = jax.tree_util.tree_structure(args)

        def body(carry, _):
            base, i = carry
            if rotate_argnums:
                call = list(base)
                for a in rotate_argnums:
                    call[a] = jax.lax.dynamic_index_in_dim(
                        base[a], i % rotate_copies, 0, keepdims=False
                    )
                out = fn(*call)
            else:
                out = fn(*base)
            live = jax.tree_util.tree_reduce(
                lambda a, l: a + jnp.sum(jnp.abs(l)).astype(jnp.float32),
                out,
                jnp.float32(0.0),
            )
            leaves = jax.tree_util.tree_leaves(base)
            lv = leaves[small]
            # always-true at runtime (live is finite), unprovable statically
            leaves[small] = jnp.where(live < jnp.inf, lv, jnp.zeros_like(lv))
            base = jax.tree_util.tree_unflatten(treedef, leaves)
            return (base, (i + 1) % (1 << 30)), live

        _, probes = jax.lax.scan(
            body, (args, jnp.int32(0)), None, length=n_iters
        )
        return probes[-1]

    return jax.jit(run)


def measure_device(
    fn,
    *args,
    iters: int | None = None,
    reps: int = DEFAULT_REPS,
    min_batch_s: float = 0.3,
    rotate_argnums: tuple = (),
    rotate_min_mb: float = 512.0,
) -> Measurement:
    """Per-call device time, robust to dispatch latency AND contention.

    Through a remote-dispatch tunnel the per-call overhead can be tens of
    milliseconds and the chip may be time-shared, so both naive walltime and
    small fixed-count loops mislead. Protocol (the TPU analog of the
    reference's timer-overhead-defeating warm-up batching,
    /root/reference/measure.h:24-49):

      1. calibrate: double the device-loop length R until one loop costs
         ≥ ``min_batch_s`` (fixed overhead then ≤ ~10%);
      2. run R- and 2R-iteration loops ``reps`` times; estimate the fixed
         overhead as median(2·t_R − t_2R) (exact if both runs are quiet);
      3. report min over overhead-corrected per-iteration times (quiet-window
         capability — contention only ever makes runs slower) as ``min_s``
         and the median as ``mean_s``.

    ``iters`` overrides the calibrated R (step 1 skipped).

    ``rotate_argnums``: positional args that a real workload would STREAM
    from HBM (e.g. a KV cache). They are replicated (with per-copy offsets)
    until their total footprint reaches ``rotate_min_mb`` and each loop
    iteration uses a different copy — defeating the on-chip pinning of a
    small loop-invariant operand that otherwise yields below-HBM-floor
    readings (see _device_loop; measured in scripts/probe_subfloor.py).
    """
    import jax.numpy as jnp

    rotate_copies = 1
    if rotate_argnums:
        rot_bytes = sum(
            args[a].size * args[a].dtype.itemsize for a in rotate_argnums
        )
        rotate_copies = max(2, int(np.ceil(rotate_min_mb * 1e6 / rot_bytes)))
        args = list(args)
        for a in rotate_argnums:
            x = args[a]
            # per-copy offset so no copy is CSE-able into another; int
            # dtypes get a no-op offset (codes must stay in range)
            if jnp.issubdtype(x.dtype, jnp.floating):
                offs = jnp.arange(rotate_copies, dtype=x.dtype).reshape(
                    (rotate_copies,) + (1,) * x.ndim
                )
                args[a] = x[None] + offs * jnp.asarray(1e-6, x.dtype)
            else:
                args[a] = jnp.broadcast_to(x[None], (rotate_copies,) + x.shape)
                # materialize the broadcast so each copy occupies real HBM
                args[a] = args[a] + jnp.zeros((), x.dtype)
        args = tuple(args)

    def run(f) -> float:
        # time by MATERIALIZING the loop's scalar probe: float() forces a
        # device-to-host read of a value that depends on every iteration,
        # so it cannot complete early. block_until_ready is NOT trusted —
        # the remote-TPU tunnel was observed returning from it without
        # waiting, which silently turns every walltime into ~0.
        t0 = time.perf_counter()
        float(f(args))
        return time.perf_counter() - t0

    if iters is None:
        iters = 16
        while True:
            loop = _device_loop(fn, iters, rotate_argnums, rotate_copies)
            run(loop)  # compile + settle
            t = min(run(loop), run(loop))
            if t >= min_batch_s or iters >= 1 << 18:
                break
            # overshoot toward the target like the reference's ×2 retry,
            # capped so a mis-measured fast round can't queue a monster loop
            iters = min(
                max(2 * iters, int(iters * min_batch_s / max(t, 1e-9)) + 1),
                1 << 18,
            )

    short = _device_loop(fn, iters, rotate_argnums, rotate_copies)
    long = _device_loop(fn, 2 * iters, rotate_argnums, rotate_copies)
    run(short)  # compile
    run(long)

    t_shorts, t_longs = [], []
    for _ in range(reps):
        t_shorts.append(run(short))
        t_longs.append(run(long))
    t_shorts = np.array(t_shorts)
    t_longs = np.array(t_longs)
    overhead = max(0.0, float(np.median(2 * t_shorts - t_longs)))
    per_iter = np.concatenate(
        [(t_shorts - overhead) / iters, (t_longs - overhead) / (2 * iters)]
    )
    per_iter = per_iter[per_iter > 0]
    if len(per_iter) == 0:
        per_iter = np.array([t_longs.min() / (2 * iters)])
    return Measurement(
        mean_s=max(float(np.median(per_iter)), 1e-9),
        min_s=max(float(np.min(per_iter)), 1e-9),
        std_s=float(np.std(per_iter)),
        calls_per_batch=iters,
        reps=reps,
    )
