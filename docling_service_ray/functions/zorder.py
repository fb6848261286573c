"""Z-order (Morton) keys: multi-dimensional data layout for scan pruning.

Interleaving the bits of two sort dimensions gives a single sort key
under which rows close in EITHER dimension land close in the file — so
parquet row-group min/max statistics prune 2-D range predicates that a
single-column sort can only prune on its leading column. This is the
standard lakehouse clustering technique (public literature: Morton 1966;
z-ordering in analytic table formats), and the engine-side complement of
"prune at the read": `read_parquet(filter=...)` skips row groups whose
stats miss the predicate, and z-order is what makes those stats tight in
both dimensions at once.

The spread is the classic shift-or-mask ladder, vectorized in numpy and
mirrored EXACTLY by arithmetic in the SQL oracle (DuckDB `<<`/`&`/`|`),
so the `zorder_keys` query is strict-verifiable.

At 100 TB: compute the key map-only, then `sort("z")` once before the
partitioned write — one shuffle buys statistics-tight layout for every
later scan. Measured pruning benefit: `tests/test_zorder.py` writes the
same rows z-sorted vs single-column-sorted with small row groups and
counts row groups overlapping a 2-D box predicate via parquet metadata.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

_MASKS = (
    np.uint64(0x0000FFFF0000FFFF),
    np.uint64(0x00FF00FF00FF00FF),
    np.uint64(0x0F0F0F0F0F0F0F0F),
    np.uint64(0x3333333333333333),
    np.uint64(0x5555555555555555),
)
_SHIFTS = (16, 8, 4, 2, 1)


def spread_bits31(x: np.ndarray) -> np.ndarray:
    """Spread each of the low 31 bits of ``x`` to even positions
    (b_i -> bit 2i) — the Morton interleave half. 31 bits, not 32, so
    the final key (odd half shifted left once) tops out at bit 61 and
    stays positive in int64/BIGINT on BOTH sides of the oracle."""
    x = x.astype(np.uint64) & np.uint64(0x7FFFFFFF)
    for mask, shift in zip(_MASKS, _SHIFTS):
        x = (x | (x << np.uint64(shift))) & mask
    return x


def zorder_key2(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Morton key of two 31-bit non-negative coordinates: x takes the
    even bit positions, y the odd."""
    return (spread_bits31(x) | (spread_bits31(y) << np.uint64(1))) \
        .astype(np.int64)


_SQL_MASKS = (0x0000FFFF0000FFFF, 0x00FF00FF00FF00FF, 0x0F0F0F0F0F0F0F0F,
              0x3333333333333333, 0x5555555555555555)


def zorder_oracle_sql(base_sql: str, keep: str, xexpr: str,
                      yexpr: str) -> str:
    """EXACT SQL mirror of :func:`zorder_key2` as a linear CTE ladder
    (naive expression nesting would duplicate each operand 2^5 times).
    ``base_sql`` must select ``keep`` plus the raw columns ``xexpr`` /
    ``yexpr`` reference; the result selects ``keep, z``."""
    sql = (f"WITH __z0 AS (SELECT {keep}, ({xexpr}) & 2147483647 AS xs, "
           f"({yexpr}) & 2147483647 AS ys FROM ({base_sql}) __zb)")
    prev = "__z0"
    for i, (mask, shift) in enumerate(zip(_SQL_MASKS, _SHIFTS), start=1):
        sql += (f", __z{i} AS (SELECT {keep}, "
                f"((xs | (xs << {shift})) & {mask}) AS xs, "
                f"((ys | (ys << {shift})) & {mask}) AS ys FROM {prev})")
        prev = f"__z{i}"
    return f"{sql} SELECT {keep}, CAST(xs | (ys << 1) AS BIGINT) AS z " \
           f"FROM {prev}"
