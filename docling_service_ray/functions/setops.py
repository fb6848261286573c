"""Distributed set operations on a key column: union-distinct, intersect,
except, plus multiset INTERSECT ALL / EXCEPT ALL.
Neither the reference (SURVEY.md §2.7: "No union/intersect
operators") nor this Ray version's Dataset API ships them; a 100 TB
training-data pipeline needs them for id-set algebra (split management,
exclusion lists, incremental corpus diffs).

Plan (the repo's standard shape): tag each side, hash-bucket the key, ONE
groupby(bucket) co-locates every key, and each bucket resolves membership
vectorized (pandas groupby-aggregation over the side tags — no per-key
dispatch). Output is the distinct key set satisfying the operation.

Partitioning assumption: a bucket's share of both sides' DISTINCT keys
fits a worker (size ``n_buckets`` to the corpus; keys are deduped per
batch before the shuffle, so the exchange moves distinct-ish keys, not
raw rows).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .hashing import bucket_column

_SIDE = "__set_side"
_BUCKET = "__set_bucket"


def _tagged_union(a, b, key: str, n_buckets: int):
    def tag(side: int):
        def fn(tbl: pa.Table) -> pa.Table:
            # per-batch dedup BEFORE the shuffle: the exchange moves
            # distinct keys per batch, not raw rows
            df = tbl.select([key]).to_pandas().drop_duplicates()
            out = pa.table({key: pa.array(df[key].to_numpy())})
            out = bucket_column(out, key, n_buckets, _BUCKET)
            return out.append_column(
                _SIDE, pa.array(np.full(len(df), side, np.int8))
            )

        return fn

    return a.map_batches(tag(0), batch_format="pyarrow").union(
        b.map_batches(tag(1), batch_format="pyarrow")
    )


def _resolve(tagged, key: str, keep):
    """keep(in_a: bool array, in_b: bool array) -> bool array per key."""

    def resolve_bucket(grp: pa.Table) -> pa.Table:
        df = grp.to_pandas()
        sides = df.groupby(key)[_SIDE].agg(["min", "max"])
        in_a = sides["min"].to_numpy() == 0
        in_b = sides["max"].to_numpy() == 1
        kept = sides.index.to_numpy()[keep(in_a, in_b)]
        return pa.table({key: pa.array(np.sort(kept))})

    return tagged.groupby(_BUCKET).map_groups(
        resolve_bucket, batch_format="pyarrow"
    )


def union_distinct(a, b, key: str, *, n_buckets: int = 64):
    """Distinct keys present in either side (SQL UNION)."""
    return _resolve(
        _tagged_union(a, b, key, n_buckets), key,
        lambda in_a, in_b: in_a | in_b,
    )


def intersect(a, b, key: str, *, n_buckets: int = 64):
    """Distinct keys present in BOTH sides (SQL INTERSECT)."""
    return _resolve(
        _tagged_union(a, b, key, n_buckets), key,
        lambda in_a, in_b: in_a & in_b,
    )


def except_keys(a, b, key: str, *, n_buckets: int = 64):
    """Distinct keys of side a absent from side b (SQL EXCEPT)."""
    return _resolve(
        _tagged_union(a, b, key, n_buckets), key,
        lambda in_a, in_b: in_a & ~in_b,
    )


# ---------------------------------------------------------------------------
# Bag (multiset) semantics: INTERSECT ALL / EXCEPT ALL. Same one-shuffle
# plan, but the exchange moves per-batch PARTIAL COUNTS (key, side, n)
# instead of distinct keys — still never raw rows — and each bucket emits
# every key repeated by its result multiplicity (min(n_a, n_b) for
# INTERSECT ALL, max(n_a - n_b, 0) for EXCEPT ALL — the SQL definitions).
# ---------------------------------------------------------------------------
_N = "__set_n"


def _tagged_counts(a, b, key: str, n_buckets: int):
    def tag(side: int):
        def fn(tbl: pa.Table) -> pa.Table:
            df = tbl.select([key]).to_pandas()
            cnt = df.groupby(key, sort=False).size()
            out = pa.table(
                {
                    key: pa.array(cnt.index.to_numpy()),
                    _N: pa.array(cnt.to_numpy().astype(np.int64)),
                }
            )
            out = bucket_column(out, key, n_buckets, _BUCKET)
            return out.append_column(
                _SIDE, pa.array(np.full(len(cnt), side, np.int8))
            )

        return fn

    return a.map_batches(tag(0), batch_format="pyarrow").union(
        b.map_batches(tag(1), batch_format="pyarrow")
    )


def _resolve_bag(tagged, key: str, mult):
    """mult(n_a: int64 array, n_b: int64 array) -> result multiplicity."""

    def resolve_bucket(grp: pa.Table) -> pa.Table:
        df = grp.to_pandas()
        sums = (
            df.groupby([key, _SIDE], sort=True)[_N].sum().unstack(fill_value=0)
        )
        n_a = (
            sums[0].to_numpy()
            if 0 in sums.columns else np.zeros(len(sums), np.int64)
        )
        n_b = (
            sums[1].to_numpy()
            if 1 in sums.columns else np.zeros(len(sums), np.int64)
        )
        m = mult(n_a, n_b)
        keys = sums.index.to_numpy()
        keep = m > 0
        return pa.table({key: pa.array(np.repeat(keys[keep], m[keep]))})

    return tagged.groupby(_BUCKET).map_groups(
        resolve_bucket, batch_format="pyarrow"
    )


def intersect_all(a, b, key: str, *, n_buckets: int = 64):
    """Each key repeated min(count_a, count_b) times (SQL INTERSECT ALL)."""
    return _resolve_bag(
        _tagged_counts(a, b, key, n_buckets), key, np.minimum
    )


def except_all(a, b, key: str, *, n_buckets: int = 64):
    """Each key repeated max(count_a - count_b, 0) times (SQL EXCEPT ALL)."""
    return _resolve_bag(
        _tagged_counts(a, b, key, n_buckets), key,
        lambda n_a, n_b: np.maximum(n_a - n_b, 0),
    )


def union_by_name(a, b):
    """SQL ``UNION ALL BY NAME``: all rows of both sides with schemas
    aligned by COLUMN NAME — a column missing on one side becomes nulls
    there (DuckDB union_by_name / pandas concat semantics). Ray's
    ``Dataset.union`` requires identical schemas; heterogeneous shards
    (schema drift across corpus vintages) are routine at 100 TB.

    Zero shuffle: each side is null-padded and type-aligned map-side to
    the unified schema (``pa.unify_schemas`` permissive promotion — e.g.
    int32 | int64 -> int64), then block-level union. Column order is
    side-a's columns followed by side-b-only columns, as in SQL."""
    from .arrow_util import arrow_schema_of

    unified = pa.unify_schemas(
        [arrow_schema_of(a), arrow_schema_of(b)],
        promote_options="permissive",
    )

    def pad(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        cols = {}
        for f in unified:
            if f.name in t.column_names:
                cols[f.name] = pc.cast(t[f.name], f.type)
            else:
                cols[f.name] = pa.nulls(len(t), f.type)
        return pa.table(cols)

    return a.map_batches(pad, batch_format="pyarrow").union(
        b.map_batches(pad, batch_format="pyarrow")
    )
