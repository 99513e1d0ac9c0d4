"""Run configuration layer (SURVEY.md §5 "config/flag system" gap).

The reference's knobs are compile-time macros and hardcoded workload vectors
(/root/reference/main.cpp:8-17, :258-264; SparseGEMM.cpp:74-81). Here a real
config object enumerates kernels × sizes × sparsities × mesh shapes, with
JSON (de)serialization so benchmark runs are reproducible artifacts.
"""

from __future__ import annotations

import dataclasses
import json


@dataclasses.dataclass(frozen=True)
class BenchConfig:
    """One benchmark run specification."""

    # workload grid
    ms: tuple = (1, 16, 64)  # SparseGEMM.cpp:74
    ks: tuple = (256, 512, 1024)  # SparseGEMM.cpp:76
    ns: tuple = (512, 1024, 2048)  # SparseGEMM.cpp:77
    non_zeros: tuple = (2, 8, 16)  # SparseGEMM.cpp:75 (density = 1/nz)
    # kernels to include (names from bench.sweep registry)
    kernels: tuple = ()  # empty = all available
    # measurement protocol (measure.py defaults mirror main.cpp:8-17);
    # iters=None auto-calibrates the device-loop length (measure_device)
    iters: int | None = None
    reps: int = 5
    # PReLU slope; None = driver default (showcase 0.2 /root/reference/
    # main.cpp:268, sweep 0.25 SparseGEMM.cpp:81)
    alpha: float | None = None
    seed: int = 0
    # mesh shapes for scaling runs: tuples of (data, model)
    mesh_shapes: tuple = ((1, 1), (1, 2), (1, 4), (1, 8))
    validate: bool = True

    def cases(self):
        import itertools

        return list(
            itertools.product(self.non_zeros, self.ms, self.ks, self.ns)
        )

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2)

    @classmethod
    def from_json(cls, text: str) -> "BenchConfig":
        d = json.loads(text)
        for k in ("ms", "ks", "ns", "non_zeros", "kernels"):
            if k in d:
                d[k] = tuple(d[k])
        if "mesh_shapes" in d:
            d["mesh_shapes"] = tuple(tuple(t) for t in d["mesh_shapes"])
        return cls(**d)
