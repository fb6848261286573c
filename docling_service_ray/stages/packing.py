"""Sequence packing: assign chunks to fixed-budget packs (the step that
turns chunked documents into dense training sequences — minimizing pad
waste by first-fit-decreasing).

No reference analog (the reference converts one document at a time);
this is an engine-extension training-data operator (SURVEY.md §2.11).

Distributed shape: chunks hash-bucket by doc id (ONE shuffle of id+size
rows — sizes only, never chunk text), each bucket runs a deterministic
first-fit-decreasing pass over its chunks, and pack ids are made
globally unique by offsetting with the bucket id. Packing quality is
bucket-local (a chunk never packs with a chunk from another bucket) —
the standard locality/quality trade; waste is bounded by one open pack
per bucket and measured by the emitted fill stats.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

_BUCKET = "__pk_bucket"
_PACK_STRIDE = 1 << 40  # pack_id = bucket * stride + local index


def pack_chunks(ds, *, size_col: str = "n_chunk_chars", budget: int = 2000,
                id_cols: tuple = ("doc_id", "chunk_idx"),
                n_buckets: int = 64):
    """Assign each chunk a ``pack_id`` such that every pack's total
    ``size_col`` <= ``budget`` (a chunk larger than the budget gets a
    pack of its own). Deterministic: chunks order by (size desc, *ids)
    within their bucket, first-fit over open packs.

    Returns the input id/size columns + ``pack_id: int64``.
    """
    from ..functions.hashing import bucket_column

    cols = [*id_cols, size_col]

    def project(t: pa.Table) -> pa.Table:
        return bucket_column(t.select(cols), id_cols[0], n_buckets, _BUCKET)

    bucketed = ds.map_batches(project, batch_format="pyarrow")

    def pack_bucket(grp: pa.Table) -> pa.Table:
        df = grp.to_pandas()
        bucket = int(df[_BUCKET].iloc[0])
        df = df.drop(columns=_BUCKET).sort_values(
            [size_col, *id_cols], ascending=[False] + [True] * len(id_cols),
            kind="mergesort",
        )
        sizes = df[size_col].to_numpy()
        pack_of = np.empty(len(df), dtype=np.int64)
        remaining: list = []  # remaining capacity per open pack
        for i, sz in enumerate(sizes):
            placed = False
            for p, cap in enumerate(remaining):
                if sz <= cap:
                    remaining[p] = cap - sz
                    pack_of[i] = p
                    placed = True
                    break
            if not placed:
                pack_of[i] = len(remaining)
                # oversized chunk: own (already-full) pack
                remaining.append(max(budget - sz, 0))
        df["pack_id"] = pack_of + np.int64(bucket) * np.int64(_PACK_STRIDE)
        return pa.Table.from_pandas(df, preserve_index=False)

    return bucketed.groupby(_BUCKET).map_groups(
        pack_bucket, batch_format="pyarrow"
    )


def pack_stats(packed, *, size_col: str = "n_chunk_chars",
               budget: int = 2000, n_buckets: int = 64):
    """One row per pack: (pack_id, n_chunks, total_chars, fill_pct).
    Partial per-batch aggregation before the (tiny) pack-keyed shuffle."""
    from ..functions.agg import bucketed_group_agg

    stats = bucketed_group_agg(
        packed.select_columns(["pack_id", size_col]),
        ["pack_id"],
        {"n_chunks": (size_col, "size"), "total_chars": (size_col, "sum")},
        n_buckets=n_buckets,
    )

    def fill(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["n_chunks"] = df["n_chunks"].astype("int64")
        df["total_chars"] = df["total_chars"].astype("int64")
        df["fill_pct"] = (df["total_chars"] * 100 // budget).astype("int64")
        return df

    return stats.map_batches(fill, batch_format="pandas")
