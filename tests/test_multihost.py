"""REAL multi-process multihost test (SURVEY.md §4 prescription).

Spawns two OS processes, each a separate JAX runtime with 2 virtual CPU
devices, connected by ``jax.distributed.initialize`` via
``smmb_tpu.parallel.multihost.initialize_multihost`` — the seam a
single-process virtual mesh cannot exercise (round-3 VERDICT missing #2).
The workers (scripts/multihost_worker.py) build a cross-process 4-device
mesh and assert parity of the column-sharded SpMM, the row-sharded SpMM
(cross-process psum), and one TP transformer block against single-process
references.
"""

import os
import socket
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_cpu_multihost():
    port = _free_port()
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    # a stale compilation-cache dir inherited from the parent process can
    # race between the two workers; give them none
    env.pop("JAX_COMPILATION_CACHE_DIR", None)
    # hosted-TPU plugin envs (if present) would register a device plugin in
    # the workers; this test is a pure-CPU cross-process run
    for var in list(env):
        if var.startswith(("PALLAS_AXON", "AXON_", "TPU_")):
            env.pop(var)
    procs = [
        subprocess.Popen(
            [
                sys.executable,
                os.path.join(REPO, "scripts", "multihost_worker.py"),
                "--process-id", str(i),
                "--num-processes", "2",
                "--coordinator", f"localhost:{port}",
            ],
            env=env,
            cwd=REPO,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for i in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=540)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {i} failed:\n{out}"
        assert f"MULTIHOST_OK process {i}" in out, out
        for marker in ("PASS_COLUMN", "PASS_ROW", "PASS_BLOCK"):
            assert marker in out, f"process {i} missing {marker}:\n{out}"
    # exactly one primary writes artifacts
    primaries = sum("PRIMARY_OK" in o for o in outs)
    assert primaries == 1, outs


def test_four_process_cpu_multihost():
    """4 OS processes × 2 devices: the 2-process stages plus ring-overlap
    (one device per process — every ppermute hop crosses processes) and a
    pipeline-parallel LM whose stage boundary crosses processes
    (VERDICT r4 #10)."""
    port = _free_port()
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env.pop("JAX_COMPILATION_CACHE_DIR", None)
    for var in list(env):
        if var.startswith(("PALLAS_AXON", "AXON_", "TPU_")):
            env.pop(var)
    n = 4
    procs = [
        subprocess.Popen(
            [
                sys.executable,
                os.path.join(REPO, "scripts", "multihost_worker.py"),
                "--process-id", str(i),
                "--num-processes", str(n),
                "--coordinator", f"localhost:{port}",
            ],
            env=env,
            cwd=REPO,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for i in range(n)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=540)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {i} failed:\n{out}"
        assert f"MULTIHOST_OK process {i}" in out, out
        # full-mesh stages run on every process; subset-mesh stages run on
        # their participants only (block: procs 0+1; pp: procs 0+2)
        want = ["PASS_COLUMN", "PASS_ROW", "PASS_RING"]
        if i in (0, 1):
            want.append("PASS_BLOCK")
        if i in (0, 2):
            want.append("PASS_PP")
        for marker in want:
            assert marker in out, f"process {i} missing {marker}:\n{out}"
    assert sum("PRIMARY_OK" in o for o in outs) == 1, outs
