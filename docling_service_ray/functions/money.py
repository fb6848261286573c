"""Exact decimal arithmetic over doubles for shuffle-order-independent sums.

Floating-point SUM depends on reduction order, so a parallel engine and a
serial oracle disagree in the last ulp. The fix used throughout this repo:
scale to integer units per row with round-half-up (``floor(x*scale + 0.5)``
— identical semantics in pyarrow and ANSI SQL), sum as int64 (exact,
associative, order-independent), and present the integer units.

SQL mirror: ``CAST(FLOOR(x * 100 + 0.5) AS BIGINT)``.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def to_cents(arr: pa.ChunkedArray | pa.Array, scale: int = 100) -> pa.Array:
    """double -> int64 units, round-half-up (matches SQL FLOOR(x*s+0.5))."""
    return pc.cast(
        pc.floor(pc.add(pc.multiply(pc.cast(arr, pa.float64()), float(scale)), 0.5)),
        pa.int64(),
    )


def sql_cents(expr: str, scale: int = 100) -> str:
    """The DuckDB-side mirror of :func:`to_cents` for oracle SQL strings."""
    return f"CAST(FLOOR(({expr}) * {scale} + 0.5) AS BIGINT)"
