"""Aux subsystem tests: config layer, trace capture, scaling harness."""

import json
import os

import jax
import jax.numpy as jnp

from smmb_tpu.bench.scaling import run_scaling
from smmb_tpu.bench.trace import annotate, capture_trace
from smmb_tpu.utils.config import BenchConfig


def test_config_roundtrip():
    cfg = BenchConfig(ms=(1, 2), iters=3, mesh_shapes=((1, 2), (2, 2)))
    text = cfg.to_json()
    back = BenchConfig.from_json(text)
    assert back == cfg
    assert len(cfg.cases()) == len(cfg.non_zeros) * 2 * len(cfg.ks) * len(cfg.ns)


def test_config_json_valid():
    json.loads(BenchConfig().to_json())


def test_capture_trace(tmp_path):
    f = jax.jit(lambda x: x * 2 + 1)
    x = jnp.ones((64, 64))
    d = capture_trace(f, x, trace_dir=str(tmp_path / "trace"), n_calls=2)
    assert os.path.isdir(d)
    # profiler should have written something under the dir
    entries = [p for p, _, files in os.walk(d) for f_ in files]
    assert entries, "trace produced no files"


def test_annotate_context():
    with annotate("test-region"):
        pass


def test_scaling_harness_cpu():
    for part in ("column", "row", "overlap", "bcsr_column"):
        pts = run_scaling(
            m=8, k=1024, n=1024, non_zero=2,
            mesh_shapes=((1, 1), (1, 2)), partitioning=part,
            iters=2, reps=2, use_kernel=False,
        )
        assert len(pts) == 2, part
        assert pts[0].devices == 1 and pts[1].devices == 2
        assert pts[0].efficiency == 1.0
        assert all(p.nnz_per_s > 0 for p in pts), part
        assert all(p.partitioning == part for p in pts)


def test_autotune_cache(tmp_path, monkeypatch):
    from smmb_tpu.bench import autotune

    monkeypatch.setattr(
        autotune, "CACHE_PATH", str(tmp_path / "cache.json")
    )
    import jax.numpy as jnp

    cfg = autotune.autotune_packed_spmm(
        4, 512, 256, jnp.float32,
        candidates=[{"block_m": 32, "block_n": 256, "block_k": 512}],
        reps=2,
    )
    assert cfg["block_n"] == 256
    # second call hits the cache (no measurement)
    cfg2 = autotune.autotune_packed_spmm(4, 512, 256, jnp.float32)
    assert cfg2 == cfg


def test_mlp_bench_cpu():
    from smmb_tpu.bench.mlp_bench import run_mlp_bench

    r = run_mlp_bench(
        depth=2, dim=512, batch=8, non_zero=2, reps=2, use_kernel=False
    )
    assert r.mean_s > 0 and r.rows_per_s > 0 and r.nnz_per_s > 0
    r2 = run_mlp_bench(
        depth=2, dim=1024, batch=8, non_zero=2, reps=2,
        mesh_shape=(1, 2), use_kernel=False,
    )
    assert "mesh" in r2.label and r2.mean_s > 0


def test_use_interpret_resolution():
    from smmb_tpu.kernels._compat import use_interpret

    assert use_interpret(True) is True
    assert use_interpret(False) is False
    # on the CPU test platform, auto-detection must choose interpret
    assert use_interpret(None) is True


def test_enable_compile_cache(tmp_path):
    import jax

    from smmb_tpu.utils.cache import enable_compile_cache

    path = enable_compile_cache(str(tmp_path / "cache"))
    assert (tmp_path / "cache").is_dir()
    assert jax.config.jax_compilation_cache_dir == path


def test_round_up():
    from smmb_tpu.utils.shapes import round_up

    assert round_up(1, 8) == 8
    assert round_up(8, 8) == 8
    assert round_up(9, 8) == 16
    assert round_up(0, 512) == 0
