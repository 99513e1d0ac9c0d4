"""Bench harness smoke tests (models, harness protocol, reporting)."""

import jax
import jax.numpy as jnp
import numpy as np

from smmb_tpu.bench import (
    chip_spec,
    dense_flops,
    measure,
    measure_device,
    roofline_time_s,
    sparse_flops,
    spmm_bytes,
)
from smmb_tpu.bench.report import (
    results_table,
    speedup_analysis,
    to_csv,
)


def test_flops_models():
    # formulas from /root/reference/main.cpp:293 and :47-51
    assert dense_flops(1, 4096, 1024) == 2 * 1 * 4096 * 1024 + 1 * 4096
    assert sparse_flops(1, 4096, 2 ** 21) == 2 * 2 ** 21 + 4096


def test_spmm_bytes():
    b = spmm_bytes(8, 16, 32, weight_bytes=100)
    assert b == 8 * 32 * 4 + 100 + 8 * 16 * 4 + 4 * 16


def test_chip_spec_fallback():
    spec = chip_spec()
    assert spec.hbm_gbps > 0 and spec.bf16_tflops > 0


def test_roofline_two_ceilings():
    spec = chip_spec()
    # compute-bound: huge flops, no bytes
    assert roofline_time_s(1e15, 1, spec) == 1e15 / (spec.bf16_tflops * 1e12)
    # bw-bound
    assert roofline_time_s(1, 1e12, spec) == 1e12 / (spec.hbm_gbps * 1e9)


def test_measure_walltime_protocol():
    f = jax.jit(lambda x: x * 2.0)
    x = jnp.ones((128, 128))
    m = measure(f, x, reps=3, min_batch_s=0.001)
    assert m.mean_s > 0 and m.min_s <= m.mean_s
    assert m.calls_per_batch >= 1


def test_measure_device_loop():
    f = jax.jit(lambda x: jnp.dot(x, x))
    x = jnp.ones((256, 256))
    m = measure_device(f, x, iters=5, reps=3)
    assert m.mean_s > 0


def test_report_table_and_csv(tmp_path):
    rows = [
        {"case": "a", "kernel": "dense", "mean_s": 2.0},
        {"case": "a", "kernel": "packed", "mean_s": 0.5},
    ]
    table = results_table(rows)
    assert "packed" in table and "dense" in table
    s = speedup_analysis(rows)
    assert "4.00x" in s
    path = tmp_path / "out.csv"
    text = to_csv(rows, str(path))
    assert path.exists() and "case,kernel,mean_s" in text


def test_run_case_cpu_smoke():
    # tiny end-to-end: validate + measure through the sweep driver on CPU
    from smmb_tpu.bench.sweep import run_case

    results = run_case(4, 512, 256, 2, iters=2, reps=2, use_pallas=False)
    assert all(r.valid for r in results), [
        (r.kernel, r.max_err) for r in results
    ]
    assert {"dense", "tcsc_segsum", "packed_jnp"} <= {
        r.kernel for r in results
    }
    assert all(np.isfinite(r.time_s) for r in results)


def test_decode_bench_cpu_smoke():
    # tiny decode-loop bench end-to-end on CPU (jnp path, 2 reps)
    from smmb_tpu.bench.decode_bench import run_decode_bench

    r = run_decode_bench(
        layers=1, d_model=64, n_heads=2, d_ff=128, batch=1,
        max_len=16, prompt_len=4, reps=2, use_kernel=False,
    )
    assert r.step_s > 0 and r.tokens_per_s > 0
    assert r.prefill_tokens_per_s > 0
