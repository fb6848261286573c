"""Canonical content-addressed keys + reference rewriting (M9 analog).

The reference content-hashes every extracted image, keys it
``images/{xxhash64}.png`` (``app/main.py:717-718``), dedup-uploads
first-wins (``app/main.py:721-729``), and then REWRITES each in-document
image ref to the final stored key (``_update_image_uris``,
``app/main.py:402-413``). This module is the Ray-native analog over text
payloads:

- :func:`canonical_keys` — per row: content hash, content-addressed
  stored key, the canonical (first-wins) owner id and a kept/deduplicated
  action, computed with ONE hash-bucket shuffle (never a driver dict —
  the migration script's ``hash_to_new_key`` accumulator,
  ``scripts/r2_migrate_xxhash.py:171``, is the anti-pattern);
- :func:`rewrite_refs` — replaces ``ref://<id>`` markers inside a text
  column with the referenced row's canonical stored key, broadcast
  mapping via ``ray.put`` (the mapping is keys-only — O(corpus rows) of
  short strings, NOT text; for corpora where even that is too large,
  bucket-join the refs instead).
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.arrow_util import table_from_pandas

DEFAULT_PREFIX = "blocks/"
DEFAULT_SUFFIX = ".md"

_REF_RE = re.compile(r"ref://(\d+)")


def _md5_series(texts: pd.Series) -> list:
    return [hashlib.md5(str(t).encode("utf-8")).hexdigest() for t in texts]


def canonical_keys(ds, *, id_col: str = "doc_id", text_col: str = "text",
                   prefix: str = DEFAULT_PREFIX, suffix: str = DEFAULT_SUFFIX,
                   n_buckets: int = 64):
    """One row per input row: (id, stored_key, canonical_id, action).

    ``stored_key`` = ``{prefix}{md5(text)}{suffix}`` — the key scheme of
    the reference's dedup-upload (``app/main.py:717-718``).
    ``canonical_id`` = smallest id sharing the content (first-wins upload
    winner); ``action`` mirrors the migration script's accounting
    (``scripts/r2_migrate_xxhash.py:243,265,303``).

    Plan: hash per batch (vectorized column assembly), ONE groupby on a
    hash bucket of the content hash co-locates all rows of each content,
    each bucket resolves canonical ids with a single vectorized
    groupby-transform — no per-group dispatch, no driver state.
    """
    from ..functions.hashing import bucket_column

    def hash_batch(df: pd.DataFrame) -> pd.DataFrame:
        h = _md5_series(df[text_col])
        return pd.DataFrame(
            {
                id_col: df[id_col].astype("int64"),
                "content_hash": h,
                "stored_key": [prefix + x + suffix for x in h],
            }
        )

    hashed = ds.map_batches(hash_batch, batch_format="pandas")
    bucketed = hashed.map_batches(
        lambda t: bucket_column(t, "content_hash", n_buckets, "__rb"),
        batch_format="pyarrow",
    )

    def resolve_bucket(grp: pa.Table) -> pa.Table:
        df = grp.drop_columns(["__rb"]).to_pandas()
        canon = df.groupby("content_hash")[id_col].transform("min")
        out = pd.DataFrame(
            {
                id_col: df[id_col].astype("int64"),
                "stored_key": df["stored_key"],
                "canonical_id": canon.astype("int64"),
                "action": np.where(
                    df[id_col] == canon, "kept", "deduplicated"
                ),
            }
        )
        return table_from_pandas(out)

    return bucketed.groupby("__rb").map_groups(
        resolve_bucket, batch_format="pyarrow"
    )


def rewrite_refs(ds, keys_ds, *, id_col: str = "doc_id",
                 text_col: str = "text", out_col: str = "rewritten"):
    """Rewrite ``ref://<id>`` markers to the referenced row's canonical
    stored key (``app/main.py:402-413`` semantics: every ref points at the
    deduplicated artifact's final key, so two ids with identical content
    resolve to the SAME key).

    ``keys_ds``: output of :func:`canonical_keys`. The id->key mapping is
    broadcast ONCE via ``ray.put`` as two aligned numpy arrays (ids +
    short key strings).
    """
    import ray

    kdf = keys_ds.select_columns([id_col, "stored_key"]).to_pandas()
    ids = kdf[id_col].to_numpy().astype(np.int64)
    order = np.argsort(ids, kind="mergesort")
    mapping_ref = ray.put((ids[order], kdf["stored_key"].to_numpy()[order]))

    def rewrite_batch(df: pd.DataFrame) -> pd.DataFrame:
        ids_sorted, keys_sorted = ray.get(mapping_ref)

        def sub(text: str) -> str:
            def repl(m):
                rid = int(m.group(1))
                i = np.searchsorted(ids_sorted, rid)
                if i < len(ids_sorted) and ids_sorted[i] == rid:
                    return str(keys_sorted[i])
                return m.group(0)  # unknown ref left intact

            return _REF_RE.sub(repl, text)

        df = df.copy()
        df[out_col] = [sub(str(t)) for t in df[text_col]]
        return df

    return ds.map_batches(rewrite_batch, batch_format="pandas")
