"""Range partitioning: assign rows to ordered value ranges using exact
distributed quantile boundaries — the primitive behind sorted output
layouts and merge-ready shards WITHOUT a global sort.

Boundaries come from the value-count histogram reduce (the same
domain-cardinality-not-row-cardinality shape as the percentile queries:
the cluster collapses the column to (value, count) pairs; only the value
DOMAIN reaches the driver). Assignment is then an embarrassingly-parallel
broadcast ``searchsorted`` per batch. Ray's own ``Dataset.sort`` uses the
same boundary-sampling idea internally; exposing it lets pipelines write
range-sharded parquet (shard i holds keys in [b_{i-1}, b_i)) that a later
consumer can merge-read in order, or binary-search into.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def exact_quantile_boundaries(ds, col: str, n_parts: int,
                              *, n_buckets: int = 16) -> list:
    """(n_parts-1) exact type-1 quantile cut points of ds[col]:
    boundary p = smallest v with cumulative count >= ceil(p * N)."""
    from .agg import bucketed_group_agg

    hist = (
        bucketed_group_agg(
            ds.select_columns([col]), [col], {"c": (col, "size")},
            n_buckets=n_buckets,
        )
        .to_pandas()
        .sort_values(col)
    )
    n = int(hist["c"].sum())
    cum = hist["c"].cumsum()
    out = []
    for i in range(1, n_parts):
        k = math.ceil(i / n_parts * n)
        out.append(hist.loc[cum >= k, col].iloc[0])
    return out


def assign_range_partition(ds, col: str, boundaries: list,
                           out_col: str = "part"):
    """Append ``out_col``: the index of the range [b_{i-1}, b_i) holding
    each row's value (searchsorted right — value == boundary goes to the
    HIGHER partition, matching ``x >= b`` CASE semantics)."""
    bounds = np.asarray(boundaries)

    def assign(batch: pa.Table) -> pa.Table:
        x = batch[col].to_numpy(zero_copy_only=False)
        part = np.searchsorted(bounds, x, side="right").astype(np.int64)
        return batch.append_column(out_col, pa.array(part))

    return ds.map_batches(assign, batch_format="pyarrow", batch_size=65536)


def range_partitioned_write(ds, col: str, n_parts: int, path: str):
    """Write ds as range-sharded parquet: directory ``part=<i>`` holds
    rows whose ``col`` falls in the i-th quantile range. Shards are
    balanced by construction (exact quantile cuts) and globally ordered
    ACROSS directories, so ordered consumption = read dirs in index order
    (no global sort ever ran)."""
    boundaries = exact_quantile_boundaries(ds, col, n_parts)
    assigned = assign_range_partition(ds, col, boundaries)
    assigned.write_parquet(path, partition_cols=["part"])
    return boundaries
