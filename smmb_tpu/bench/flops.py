"""Analytic FLOP / byte models — the PAPI-stub analog.

The reference counts FLOPs two ways: hardware PAPI counters
(/root/reference/papi/my_papi.c:43-81) or analytic formulas pushed into the
stub on machines without PAPI (/root/reference/main.cpp:293, :304-306). On
TPU only the analytic path is meaningful; the formulas are kept identical:

    dense : 2·M·N·K + M·N            (/root/reference/main.cpp:293)
    sparse: 2·M·nnz + M·N            (/root/reference/main.cpp:47-51)

plus net-new byte models for roofline accounting (SURVEY.md §5 maps the
flops/cycle metric to nnz/s + %-of-roofline on TPU).
"""

from __future__ import annotations


def dense_flops(m: int, n: int, k: int) -> int:
    """FLOPs of dense ``Y = X·W + B`` (/root/reference/main.cpp:293)."""
    return 2 * m * n * k + m * n


def sparse_flops(m: int, n: int, nnz: int) -> int:
    """Effective FLOPs of ternary SpMM + bias: one add/sub per stored ±1 per
    batch row, plus the bias add (/root/reference/main.cpp:47-51)."""
    return 2 * m * nnz + m * n


def spmm_bytes(
    m: int,
    n: int,
    k: int,
    *,
    weight_bytes: int,
    x_itemsize: int = 4,
    y_itemsize: int = 4,
    bias: bool = True,
) -> int:
    """Minimum HBM traffic of one SpMM call: read X and W once, write Y once.

    ``weight_bytes`` is format-dependent: TernaryPacked.weight_bytes() for the
    2-bit path, 4·K·N for the reference's fp32 dense streaming.
    """
    return (
        m * k * x_itemsize
        + weight_bytes
        + m * n * y_itemsize
        + (4 * n if bias else 0)
    )
