"""Distributed join primitives the Dataset API doesn't ship (this Ray
version): bucketed big-big hash join, broadcast semi/anti filters, grouped
top-k, and per-key as-of matching.

The reference has no relational joins (SURVEY.md §2.4); these are the
engine-completeness operators a 100 TB training-data pipeline needs.
Partitioning contract, stated per function: each relies on one explicit
hash-bucket co-location step (``functions.hashing.bucket_column``) and
keeps blocks Arrow end-to-end until the in-bucket pandas kernel.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .arrow_util import table_from_pandas

from .hashing import bucket_column

_SIDE_COL = "__join_side"
_BUCKET_COL = "__join_bucket"


def bucketed_hash_join(left, right, key: str, *, n_buckets: int = 64,
                       how: str = "inner", lschema=None, rschema=None):
    """Big-big equi-join: both sides bucketed by hash(key) % n_buckets,
    union'd, co-located with ONE groupby(bucket), joined per bucket with a
    vectorized pandas merge.

    Partitioning assumption: a single bucket's share of BOTH sides fits a
    worker (size n_buckets accordingly; salt hot keys upstream if one key
    dominates). Output columns = left's then right's minus the duplicated
    key. Schemas are aligned by null-padding so the union is well-typed.

    Pass ``lschema``/``rschema`` (pyarrow) when the caller already knows
    them: ``Dataset.schema()`` on a side whose lineage contains a shuffle
    EXECUTES that upstream once just to learn the schema, and the join
    then executes it again — a silent 2x on the expensive side.
    """
    from .arrow_util import arrow_schema_of

    # SQL names -> pandas merge names; "full" = FULL OUTER
    how = {"full": "outer"}.get(how, how)
    if how not in ("inner", "left", "right", "outer"):
        raise ValueError(f"unsupported join type {how!r}")
    lschema = lschema or arrow_schema_of(left)
    rschema = rschema or arrow_schema_of(right)
    lnames = list(lschema.names)
    rnames = [n for n in rschema.names if n != key]
    overlap = set(lnames) & set(rnames)
    if overlap:
        raise ValueError(f"column collision (rename first): {overlap}")
    ltypes = dict(zip(lschema.names, lschema.types))
    rtypes = dict(zip(rschema.names, rschema.types))
    all_fields = [(n, ltypes[n]) for n in lnames] + [(n, rtypes[n]) for n in rnames]

    def align(side: int):
        def fn(tbl: pa.Table) -> pa.Table:
            tbl = bucket_column(tbl, key, n_buckets, _BUCKET_COL)
            n = tbl.num_rows
            arrays, names = [], []
            for name, typ in all_fields:
                if name in tbl.column_names:
                    arrays.append(tbl[name])
                else:
                    arrays.append(pa.nulls(n, typ))
                names.append(name)
            arrays.append(tbl[_BUCKET_COL])
            names.append(_BUCKET_COL)
            arrays.append(pa.array(np.full(n, side, dtype=np.int8)))
            names.append(_SIDE_COL)
            return pa.table(dict(zip(names, arrays)))

        return fn

    tagged = left.map_batches(align(0), batch_format="pyarrow").union(
        right.map_batches(align(1), batch_format="pyarrow")
    )

    out_schema = pa.schema(all_fields)

    def join_bucket(grp: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        # split sides while still ARROW: the union null-pads each side's
        # missing columns, and converting those padded (all-null) int
        # columns through pandas would upcast to float64 — silently
        # changing the dtype of join keys used by a downstream join
        lmask = pc.equal(grp[_SIDE_COL], 0)
        lcols = lnames if key in lnames else lnames + [key]
        l = grp.filter(lmask).select(lcols).to_pandas()
        r = grp.filter(pc.invert(lmask)).select([key] + rnames).to_pandas()
        joined = l.merge(r, on=key, how=how)
        # enforce the declared output schema (outer joins introduce NaN in
        # int columns; from_pandas(schema=...) maps them back to nulls)
        return table_from_pandas(
            joined[[n for n, _ in all_fields]], schema=out_schema)

    return tagged.groupby(_BUCKET_COL).map_groups(
        join_bucket, batch_format="pyarrow"
    )


def dense_lookup_array_ref(ds, key_col: str, val_col: str, *,
                           dtype=np.int16, fill=-1,
                           max_bytes: int = 1 << 30):
    """Build a dense ``key -> val`` numpy lookup array from a Dataset
    WITHOUT materializing the table on the driver, and return the
    ``ObjectRef`` of the finished array (pass it into ``map_batches``
    closures; ``ray.get`` it inside the task).

    Shape of the build: per-block key maxima are computed by small Ray
    tasks (driver sees one int per block), then ONE reduce task streams
    the blocks ``ray.get``-one-at-a-time into the array — peak memory in
    that task is the array plus a single block, and the driver never
    holds a row. This is the scale-safe form of the J1 broadcast lookup
    (reference's in-memory ``image_map``, app/main.py:402-413) for dense
    integer keyspaces (e.g. TPC-H custkey 1..N, ~``itemsize`` bytes per
    key).

    ``max_bytes`` guards the dense representation itself: above it the
    array is no longer a sane broadcast object and callers must switch to
    ``bucketed_hash_join`` (sparse or huge keyspaces) — we raise with
    that instruction rather than silently shipping a multi-GB object.
    """
    import pyarrow.compute as pc
    import ray

    refs = ds.to_arrow_refs()

    @ray.remote
    def block_max(tbl: pa.Table) -> int:
        v = pc.max(tbl[key_col]).as_py()
        return -1 if v is None else int(v)

    @ray.remote
    def build(max_key: int, block_refs) -> np.ndarray:
        arr = np.full(max_key + 1, fill, dtype=dtype)
        for r in block_refs:  # one block resident at a time
            b = ray.get(r)
            keys = np.asarray(b[key_col])
            arr[keys] = np.asarray(b[val_col]).astype(dtype)
        return arr

    max_key = max(ray.get([block_max.remote(r) for r in refs]), default=-1)
    nbytes = (max_key + 1) * np.dtype(dtype).itemsize
    if nbytes > max_bytes:
        raise ValueError(
            f"dense lookup array for {key_col!r} would be {nbytes} bytes "
            f"(max_key={max_key}); keyspace is too large/sparse for a "
            "broadcast array — use bucketed_hash_join instead"
        )
    # pass refs nested in a list so the reduce task resolves them lazily
    return build.remote(max_key, list(refs))


def broadcast_anti_filter(ds, key: str, key_set, *, keep_matches: bool = False):
    """Semi/anti join with a broadcast key set: ``ray.put`` the (small) set
    once, filter each Arrow batch vectorized. keep_matches=True → semi
    join; False → anti join. No shuffle.
    (Anti-join shape of the reference's dedup existence probe J3,
    app/main.py:721-729, done as a set-filter instead of per-row RPCs.)"""
    import pyarrow.compute as pc
    import ray

    vals = pa.array(sorted(key_set))
    ref = ray.put(vals)

    def filt(tbl: pa.Table) -> pa.Table:
        mask = pc.is_in(tbl[key], value_set=ray.get(ref))
        if not keep_matches:
            mask = pc.invert(mask)
        return tbl.filter(mask)

    return ds.map_batches(filt, batch_format="pyarrow", zero_copy_batch=True)


def bucketed_semi_anti_join(left, right, key: str, *, right_key: str | None = None,
                            keep_matches: bool = False, n_buckets: int = 64):
    """Distributed semi/anti join: keep left rows whose ``key`` is (semi)
    or is not (anti) present in ``right``'s key column — the scale path
    when the probe side is too large for :func:`broadcast_anti_filter`'s
    driver-collected set.

    Plan: right is projected to per-batch-deduped keys; both sides are
    hash-bucketed on the key and co-located with ONE groupby(bucket);
    each bucket filters left's rows with a vectorized ``isin`` against
    the bucket-local probe keys. Left's columns and dtypes pass through
    unchanged.
    """
    import pyarrow.compute as pc

    from .arrow_util import arrow_schema_of, table_from_pandas
    from .hashing import bucket_column

    rk = right_key or key
    lschema = arrow_schema_of(left)
    lnames = list(lschema.names)
    _PROBE = "__probe_key"

    def probe_rows(tbl: pa.Table) -> pa.Table:
        keys = pa.table({_PROBE: tbl[rk].cast(lschema.field(key).type)})
        df = keys.to_pandas().drop_duplicates()
        out = table_from_pandas(df)
        out = bucket_column(out, _PROBE, n_buckets, _BUCKET_COL)
        n = out.num_rows
        arrays = [pa.nulls(n, t) for t in lschema.types]
        for name, arr in zip(lnames, arrays):
            out = out.append_column(name, arr)
        return out.append_column(_SIDE_COL, pa.array(np.full(n, 1, np.int8)))

    def left_rows(tbl: pa.Table) -> pa.Table:
        tbl = bucket_column(tbl.select(lnames), key, n_buckets, _BUCKET_COL)
        n = tbl.num_rows
        out = pa.table(
            {_PROBE: pa.nulls(n, lschema.field(key).type),
             _BUCKET_COL: tbl[_BUCKET_COL]}
        )
        for name in lnames:
            out = out.append_column(name, tbl[name])
        return out.append_column(_SIDE_COL, pa.array(np.full(n, 0, np.int8)))

    tagged = left.map_batches(left_rows, batch_format="pyarrow").union(
        right.map_batches(probe_rows, batch_format="pyarrow")
    )

    def filter_bucket(grp: pa.Table) -> pa.Table:
        lmask = pc.equal(grp[_SIDE_COL], 0)
        rows = grp.filter(lmask).select(lnames)
        probe = grp.filter(pc.invert(lmask))[_PROBE]
        mask = pc.is_in(rows[key], value_set=probe.combine_chunks())
        if not keep_matches:
            mask = pc.invert(mask)
        return rows.filter(mask)

    return tagged.groupby(_BUCKET_COL).map_groups(
        filter_bucket, batch_format="pyarrow"
    )


def grouped_topk(ds, group_key: str, order_col: str, k: int, *,
                 descending: bool = True, tiebreak_col: str | None = None,
                 n_buckets: int = 64):
    """Top-k rows per group.

    Two-phase: (1) per-batch PARTIAL prune — each batch keeps at most k
    rows per group it sees, shrinking the shuffle input; (2) one
    groupby(bucket) over the survivors, vectorized
    sort+groupby.head(k)+rank per bucket. Deterministic ties via
    ``tiebreak_col`` ascending. Output = input columns + ``rank`` (1..k).
    """
    tb = tiebreak_col or group_key

    def prune(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(
            [group_key, order_col, tb],
            ascending=[True, not descending, True],
            kind="mergesort",
        )
        return df.groupby(group_key, sort=False).head(k)

    pruned = ds.map_batches(prune, batch_format="pandas")
    bucketed = pruned.map_batches(
        lambda t: bucket_column(t, group_key, n_buckets, _BUCKET_COL),
        batch_format="pyarrow",
    )

    def finish(grp: pa.Table) -> pa.Table:
        df = grp.drop_columns([_BUCKET_COL]).to_pandas()
        df = df.sort_values(
            [group_key, order_col, tb],
            ascending=[True, not descending, True],
            kind="mergesort",
        )
        top = df.groupby(group_key, sort=False).head(k).copy()
        top["rank"] = top.groupby(group_key, sort=False).cumcount() + 1
        return table_from_pandas(top)

    return bucketed.groupby(_BUCKET_COL).map_groups(
        finish, batch_format="pyarrow"
    )


def interval_join_count(anchors, events, *, anchor_id: str, ts_col: str,
                        window_us: int, n_buckets_hint: int = 0):
    """Non-equi interval join, aggregated: for each anchor row, COUNT the
    event rows with ``anchor.ts <= event.ts < anchor.ts + window``.
    No shared key — this is the range-predicate join class the equi-join
    primitives can't express.

    Distributed plan (time-bucket replication — the standard interval-join
    shape): bucket width = the window length, so every anchor interval
    overlaps AT MOST TWO buckets. Anchors replicate to those (<=2)
    buckets, events land in exactly one; ONE groupby(bucket) co-locates
    them and each task counts per-bucket matches with two vectorized
    ``searchsorted`` calls against its sorted event timestamps. Because
    each event belongs to one bucket, per-bucket partial counts sum to
    the exact answer — a second (tiny: ids + partial counts) groupby on
    the anchor id finishes. The exchange carries only (id, int64 ts)
    rows, never payloads.

    Partitioning assumption: one time-bucket's events fit a worker
    (buckets are time-ranges — for heavily skewed event-time
    distributions, shrink the window or pre-split hot buckets upstream).
    """
    import pyarrow.compute as pc

    from .arrow_util import table_from_pandas

    W = np.int64(window_us)
    _TB = "__ij_bucket"
    _SIDE = "__ij_side"

    def anchor_rows(t: pa.Table) -> pa.Table:
        ids = t[anchor_id].cast(pa.int64()).to_numpy(zero_copy_only=False)
        ts = t[ts_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
        b0 = ts // W
        b1 = (ts + W - 1) // W  # bucket of the last contained microsecond
        dup = b1 != b0
        out_ids = np.concatenate([ids, ids[dup]])
        out_ts = np.concatenate([ts, ts[dup]])
        out_b = np.concatenate([b0, b1[dup]])
        n = len(out_ids)
        return pa.table(
            {
                "id": pa.array(out_ids),
                "ts": pa.array(out_ts),
                _TB: pa.array(out_b),
                _SIDE: pa.array(np.zeros(n, np.int8)),
            }
        )

    def event_rows(t: pa.Table) -> pa.Table:
        ts = t[ts_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
        n = len(ts)
        return pa.table(
            {
                "id": pa.array(np.full(n, -1, np.int64)),
                "ts": pa.array(ts),
                _TB: pa.array(ts // W),
                _SIDE: pa.array(np.ones(n, np.int8)),
            }
        )

    tagged = anchors.map_batches(anchor_rows, batch_format="pyarrow").union(
        events.map_batches(event_rows, batch_format="pyarrow")
    )

    def count_bucket(grp: pa.Table) -> pa.Table:
        amask = pc.equal(grp[_SIDE], 0)
        a = grp.filter(amask)
        ev_ts = np.sort(
            grp.filter(pc.invert(amask))["ts"].to_numpy(zero_copy_only=False)
        )
        ids = a["id"].to_numpy(zero_copy_only=False)
        starts = a["ts"].to_numpy(zero_copy_only=False)
        bucket = grp[_TB][0].as_py()
        # clamp the count range to THIS bucket's time span so the two
        # replicas of a straddling anchor never double-count an event
        lo = np.maximum(starts, bucket * W)
        hi = np.minimum(starts + W, (bucket + 1) * W)
        cnt = np.searchsorted(ev_ts, hi, side="left") - np.searchsorted(
            ev_ts, lo, side="left"
        )
        return pa.table(
            {"id": pa.array(ids), "partial": pa.array(cnt.astype(np.int64))}
        )

    partials = tagged.groupby(_TB).map_groups(
        count_bucket, batch_format="pyarrow"
    )

    def sum_bucket(df: pd.DataFrame) -> pa.Table:
        out = df.groupby("id", as_index=False)["partial"].sum()
        return table_from_pandas(
            out.rename(columns={"id": anchor_id, "partial": "n_in_window"})
        )

    from .hashing import bucket_column

    pb = partials.map_batches(
        lambda t: bucket_column(t, "id", 64, _TB), batch_format="pyarrow"
    )
    return pb.groupby(_TB).map_groups(
        lambda g: sum_bucket(g.drop_columns([_TB]).to_pandas()),
        batch_format="pyarrow",
    )


def asof_join_per_key(left, right, key: str, ts_col: str, *,
                      left_cols: list, right_cols: list,
                      suffix: str = "_matched", n_buckets: int = 64):
    """Per-key as-of match: for each left row, the right row with the
    greatest ``ts_col`` <= left's, within the same ``key`` (inner: left
    rows with no match are dropped).

    Bucketed plan: both sides hash-bucketed on ``key``, ONE
    groupby(bucket) co-locates every key, and each bucket runs a single
    vectorized ``pd.merge_asof(..., by=key)`` — no per-key Python
    dispatch. Partitioning assumption: a bucket's share of both sides
    fits a worker (size ``n_buckets``; salt by time range upstream for a
    pathological hot key)."""
    _SIDE = "__asof_side"

    def tag(side):
        def fn(tbl: pa.Table) -> pa.Table:
            tbl = bucket_column(tbl, key, n_buckets, _BUCKET_COL)
            n = tbl.num_rows
            return tbl.append_column(_SIDE, pa.array(np.full(n, side, np.int8)))

        return fn

    cols = sorted({key, ts_col, *left_cols, *right_cols})
    both = left.select_columns([c for c in cols if c in left.schema().names])
    rt = right.select_columns([c for c in cols if c in right.schema().names])
    tagged = both.map_batches(tag(0), batch_format="pyarrow").union(
        rt.map_batches(tag(1), batch_format="pyarrow")
    )

    lkeep = [c for c in left_cols if c not in (key, ts_col)]
    rkeep = [c for c in right_cols if c != ts_col]
    out_columns = [key, ts_col] + lkeep + [c + suffix for c in rkeep]

    def match_bucket(grp: pa.Table) -> pa.Table:
        df = grp.drop_columns([_BUCKET_COL]).to_pandas()
        # merge_asof(by=key) needs both frames sorted by ts only; ties
        # within equal ts resolve to the LAST right row after the stable
        # sort, so sort right by (ts, rkeep) for determinism
        l = df[df[_SIDE] == 0].sort_values(ts_col, kind="mergesort")
        r = df[df[_SIDE] == 1].sort_values(
            [ts_col] + rkeep, kind="mergesort"
        )
        r2 = r[[key, ts_col] + rkeep].rename(
            columns={c: c + suffix for c in rkeep}
        )
        m = pd.merge_asof(
            l[[key, ts_col] + lkeep], r2, on=ts_col, by=key,
            direction="backward",
        )
        if rkeep:  # inner semantics: drop left rows with no as-of match
            m = m.dropna(subset=[rkeep[0] + suffix])
        return table_from_pandas(m[out_columns])

    return tagged.groupby(_BUCKET_COL).map_groups(
        match_bucket, batch_format="pyarrow"
    )


def skew_salted_join(big, small, key: str, *, hot_keys, n_salt: int = 8,
                     n_buckets: int = 64, bschema=None, sschema=None):
    """Equi-join that survives skewed keys: the explicit hot-key plan the
    other joins' docstrings point at ("salt hot keys upstream").

    ``big`` rows whose key is in ``hot_keys`` get a per-row salt
    (round-robin within each batch), spreading one hot key across
    ``n_salt`` co-location buckets; ``small``'s hot-key rows are
    REPLICATED once per salt so every (key, salt) pair still meets. Cold
    keys take salt 0 — exactly the plain bucketed plan. The join result
    is independent of salt assignment, so batch-boundary differences
    never change output.

    Partitioning contract: a single bucket holds <= 1/n_salt of any hot
    key's big-side rows (plus cold keys' full groups — size n_buckets for
    those as usual). ``hot_keys`` is broadcast once via ``ray.put`` (hot
    keys are few by definition; detect them with a frequency pass such as
    functions/heavy_hitters.py at corpus scale).
    """
    import pyarrow.compute as pc
    import ray

    from .arrow_util import arrow_schema_of
    from .hashing import bucket_column

    bschema = bschema or arrow_schema_of(big)
    sschema = sschema or arrow_schema_of(small)
    bnames = list(bschema.names)
    snames = [n for n in sschema.names if n != key]
    overlap = set(bnames) & set(snames)
    if overlap:
        raise ValueError(f"column collision (rename first): {overlap}")
    btypes = dict(zip(bschema.names, bschema.types))
    stypes = dict(zip(sschema.names, sschema.types))
    all_fields = [(n, btypes[n]) for n in bnames] + [(n, stypes[n]) for n in snames]
    out_schema = pa.schema(all_fields)
    hot_ref = ray.put(pa.array(sorted(hot_keys)))
    _SALT = "__salt"

    def _finish(tbl: pa.Table, names, side: int) -> pa.Table:
        # bucket on (key, salt): same key+salt co-locates on both sides
        tbl = bucket_column(tbl, key, 1 << 30, "__h")
        h = tbl["__h"].to_numpy(zero_copy_only=False)
        salt = tbl[_SALT].to_numpy(zero_copy_only=False).astype(np.int64)
        bucket = (h + salt * 1000003) % n_buckets
        tbl = tbl.drop_columns(["__h"]).append_column(
            _BUCKET_COL, pa.array(bucket.astype(np.int64))
        )
        n = tbl.num_rows
        arrays, out_names = [], []
        for name, typ in all_fields:
            arrays.append(tbl[name] if name in tbl.column_names
                          else pa.nulls(n, typ))
            out_names.append(name)
        for extra in (key, _SALT, _BUCKET_COL):
            if extra not in out_names:
                arrays.append(tbl[extra])
                out_names.append(extra)
        arrays.append(pa.array(np.full(n, side, np.int8)))
        out_names.append(_SIDE_COL)
        return pa.table(dict(zip(out_names, arrays)))

    def big_rows(tbl: pa.Table) -> pa.Table:
        hot = pc.is_in(tbl[key], value_set=ray.get(hot_ref))
        salt = np.where(
            hot.to_numpy(zero_copy_only=False),
            np.arange(tbl.num_rows, dtype=np.int64) % n_salt,
            0,
        )
        tbl = tbl.append_column(_SALT, pa.array(salt))
        return _finish(tbl, bnames, 0)

    def small_rows(tbl: pa.Table) -> pa.Table:
        hot_mask = pc.is_in(tbl[key], value_set=ray.get(hot_ref))
        cold = tbl.filter(pc.invert(hot_mask))
        cold = cold.append_column(
            _SALT, pa.array(np.zeros(cold.num_rows, np.int64))
        )
        hot = tbl.filter(hot_mask)
        reps = [
            hot.append_column(
                _SALT, pa.array(np.full(hot.num_rows, s, np.int64)))
            for s in range(n_salt)
        ] if hot.num_rows else []
        merged = pa.concat_tables([cold, *reps]) if reps else cold
        return _finish(merged, snames, 1)

    tagged = big.map_batches(big_rows, batch_format="pyarrow").union(
        small.map_batches(small_rows, batch_format="pyarrow")
    )

    def join_bucket(grp: pa.Table) -> pa.Table:
        lmask = pc.equal(grp[_SIDE_COL], 0)
        bcols = bnames if key in bnames else bnames + [key]
        l = grp.filter(lmask).select(bcols + [_SALT]).to_pandas()
        r = grp.filter(pc.invert(lmask)).select(
            [key, _SALT] + snames).to_pandas()
        joined = l.merge(r, on=[key, _SALT])
        return table_from_pandas(
            joined[[n for n, _ in all_fields]], schema=out_schema)

    return tagged.groupby(_BUCKET_COL).map_groups(
        join_bucket, batch_format="pyarrow"
    )
