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
                              *, n_buckets: int = 16,
                              max_distinct: int = 2_000_000) -> list:
    """(n_parts-1) exact type-1 quantile cut points of ds[col]:
    boundary p = smallest v with cumulative count >= ceil(p * N).

    Contract: the driver collects the (value, count) histogram, so the
    column's DISTINCT-VALUE domain must be bounded — ``max_distinct``
    makes that enforceable instead of aspirational (fails loudly and
    names :func:`sampled_quantile_boundaries`, the unbounded-domain
    path). Row cardinality is irrelevant; only the domain reaches the
    driver."""
    from .agg import bucketed_group_agg

    hist_ds = bucketed_group_agg(
        ds.select_columns([col]), [col], {"c": (col, "size")},
        n_buckets=n_buckets,
    ).materialize()
    n_distinct = hist_ds.count()
    if n_distinct > max_distinct:
        raise ValueError(
            f"exact_quantile_boundaries: {col!r} has {n_distinct} distinct "
            f"values > max_distinct={max_distinct}; the exact histogram "
            "path is for bounded domains — use sampled_quantile_boundaries "
            "for unbounded keys"
        )
    hist = hist_ds.to_pandas().sort_values(col)
    n = int(hist["c"].sum())
    cum = hist["c"].cumsum()
    out = []
    for i in range(1, n_parts):
        k = math.ceil(i / n_parts * n)
        out.append(hist.loc[cum >= k, col].iloc[0])
    return out


def sampled_quantile_boundaries(ds, col: str, n_parts: int,
                                *, sample_k: int = 65536) -> list:
    """Approximate quantile boundaries for UNBOUNDED domains: a uniform
    row sample of ~``sample_k`` values (per-block sampling at rate
    ``sample_k / N``, seeded from block content — deterministic for a
    fixed block layout), boundaries = type-1 quantiles of the sample.

    Rank error is O(N / sqrt(sample_k)) with high probability — the
    standard boundary-sampling scheme Ray's own sort uses. Driver memory
    is bounded by the sample, never the domain."""
    from .hashing import stable_seed

    n = ds.count()
    if n == 0:
        return []
    rate = min(1.0, 1.25 * sample_k / n)  # slack so the union stays >= k

    def sample_batch(t: pa.Table) -> pa.Table:
        x = t[col].to_numpy(zero_copy_only=False)
        take = max(1, int(len(x) * rate)) if len(x) else 0
        if take >= len(x):
            return t.select([col])
        # Seed from STABLE block content (blake2b inside stable_seed) —
        # never builtin hash(), which is salted per process and would make
        # the sample differ across runs/workers. First+last value plus
        # length decorrelates blocks that merely share a prefix.
        rng = stable_seed("qboundaries", len(x), str(x[0]), str(x[-1]))
        idx = rng.choice(len(x), take, replace=False)
        return pa.table({col: pa.array(np.sort(x[idx]))})

    sample = (
        ds.select_columns([col])
        .map_batches(sample_batch, batch_format="pyarrow")
        .to_pandas()[col]
        .to_numpy()
    )
    sample = np.sort(sample)
    return [
        sample[min(len(sample) - 1,
                   math.ceil(i / n_parts * len(sample)) - 1)]
        for i in range(1, n_parts)
    ]


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
