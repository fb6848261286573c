"""Distributed per-key window functions (row_number / cumsum / lag / diff).

Reference analog: the reading-order contract — pages serialized strictly in
ascending page order (``/root/reference/app/main.py:455``) — is a window
ordering over a partition key. This module generalizes it to the classic
SQL window family: ``ROW_NUMBER() OVER (PARTITION BY k ORDER BY o)``,
running sums, and ``LAG``-based deltas.

Scale plan (100 TB-safe):
- ONE hash shuffle co-locates each partition key via a coarse int bucket
  (``hashing.bucket_column`` — the same discipline every corpus-cardinality
  groupby in this repo uses). ``n_buckets`` bounds shuffle fan-in; the
  per-key work never touches the driver.
- Inside each bucket task: a single vectorized pandas sort + groupby
  transform computes EVERY requested window column in one pass — no
  per-key Python dispatch (measured ~10x cheaper on corpus-cardinality
  keys, see ``pipelines/relational.py:stitch_events``).
- Assumption (documented, standard for partitioned window engines): one
  partition key's rows fit in a single task. For mega-keys, range-salt the
  key upstream exactly like the stitch stage's salted two-level variant
  (``stages/stitch.py``) — cumsum/row_number then need a per-salt offset
  merge pass, which ``partitioned_window`` intentionally does not hide.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

from .arrow_util import table_from_pandas
from .hashing import bucket_column

_BUCKET = "__wbucket"

# spec kinds -> (needs src column?, description)
KINDS = ("row_number", "cumsum", "lag", "diff")


def partitioned_window(
    ds,
    key: str,
    order_by: list[str],
    specs: list[tuple],
    *,
    n_buckets: int = 64,
    keep_columns: list[str] | None = None,
):
    """Compute window columns over ``PARTITION BY key ORDER BY order_by``.

    ``specs`` is a list of ``(out_col, kind, src_col, fill)`` tuples:

    - ``("rn", "row_number", None, None)`` — 1-based rank in order.
    - ``("cum", "cumsum", col, None)`` — running sum of ``col`` (int64).
    - ``("prev", "lag", col, fill)`` — previous row's ``col`` (first row
      of each key gets ``fill``).
    - ``("gap", "diff", col, fill)`` — ``col - lag(col)`` (first row of
      each key gets ``fill``). Exact for integer columns.

    Returns a Dataset with ``keep_columns`` (default: key + order_by +
    every src col) plus the window columns. Ordering is restored
    structurally per key; no global sort is performed.
    """
    for spec in specs:
        if spec[1] not in KINDS:
            raise ValueError(f"unknown window kind {spec[1]!r}")
    if keep_columns is None:
        keep = [key] + [c for c in order_by if c != key]
        for _, kind, src, _ in specs:
            if src is not None and src not in keep:
                keep.append(src)
        keep_columns = keep
    out_cols = keep_columns + [s[0] for s in specs]

    bucketed = ds.map_batches(
        lambda t: bucket_column(t, key, n_buckets, _BUCKET),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    def window_bucket(grp: pa.Table) -> pa.Table:
        df = grp.drop_columns([_BUCKET]).to_pandas()
        df = df.sort_values([key] + order_by, kind="mergesort")
        g = df.groupby(key, sort=False)
        for out, kind, src, fill in specs:
            if kind == "row_number":
                df[out] = (g.cumcount() + 1).astype("int64")
            elif kind == "cumsum":
                df[out] = g[src].cumsum().astype("int64")
            elif kind == "lag":
                shifted = g[src].shift(1)
                df[out] = (
                    shifted.fillna(fill).astype(df[src].dtype)
                    if fill is not None
                    else shifted
                )
            elif kind == "diff":
                delta = df[src] - g[src].shift(1)
                df[out] = (
                    delta.fillna(fill).astype("int64")
                    if fill is not None
                    else delta
                )
            # re-group: window columns must not leak across keys when a
            # later spec reads an earlier output (not supported — specs
            # are independent by contract)
        return table_from_pandas(df[out_cols])

    return bucketed.groupby(_BUCKET).map_groups(window_bucket, batch_format="pyarrow")
