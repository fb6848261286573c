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
  column with the referenced row's canonical stored key. Fully bucketed
  plan (nothing O(corpus) ever reaches the driver or a broadcast): the
  referenced ids are extracted per batch (vectorized ``str.extractall``),
  bucket-joined against the keys dataset, and the resolved (row, ref,
  key) triples are co-located with the referring rows by ONE
  hash-bucket shuffle of the text, where the splice happens vectorized
  per bucket. :func:`rewrite_refs_broadcast` keeps the old small-side
  shortcut for keys tables known to fit comfortably in the object store.
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
                # id dtype is preserved (int or string ids both valid;
                # first-wins canonical = min() either way)
                id_col: df[id_col].to_numpy(),
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
                id_col: df[id_col].to_numpy(),
                "stored_key": df["stored_key"],
                "canonical_id": canon.to_numpy(),
                "action": np.where(
                    df[id_col] == canon, "kept", "deduplicated"
                ),
            }
        )
        return table_from_pandas(out)

    return bucketed.groupby("__rb").map_groups(
        resolve_bucket, batch_format="pyarrow"
    )


def content_keys(ds, *, id_col: str = "doc_id", text_col: str = "text",
                 prefix: str = DEFAULT_PREFIX, suffix: str = DEFAULT_SUFFIX):
    """(id, stored_key) per row, map-only — NO shuffle.

    Because the key scheme is content-addressed (md5 of the text,
    ``app/main.py:717-718``), a duplicate's key IS its canonical owner's
    key; resolving the canonical owner id (:func:`canonical_keys`'s
    shuffle) is only needed when the caller wants the owner/action
    columns. :func:`rewrite_refs` only needs (id, stored_key), so feeding
    it this map-only dataset saves one corpus shuffle."""

    def hash_batch(df: pd.DataFrame) -> pd.DataFrame:
        h = _md5_series(df[text_col])
        return pd.DataFrame(
            {
                id_col: df[id_col].to_numpy(),
                "stored_key": [prefix + x + suffix for x in h],
            }
        )

    return ds.map_batches(hash_batch, batch_format="pandas")


def rewrite_refs(ds, keys_ds, *, id_col: str = "doc_id",
                 text_col: str = "text", out_col: str = "rewritten",
                 n_buckets: int = 64):
    """Rewrite ``ref://<id>`` markers to the referenced row's canonical
    stored key (``app/main.py:402-413`` semantics: every ref points at the
    deduplicated artifact's final key, so two ids with identical content
    resolve to the SAME key). Unknown refs are left intact.

    ``keys_ds``: output of :func:`canonical_keys`. Scale-safe bucketed
    plan — the id->key mapping is NEVER materialized on the driver or
    broadcast:

    1. vectorized ``str.extractall`` per batch → tiny edge table
       ``(referrer id, ref id)``, deduped per batch;
    2. bucketed hash join of the edges against ``keys_ds`` on the ref id
       (both sides shuffled by hash(ref id) — each task sees only its
       bucket's slice of the key map);
    3. the resolved ``(referrer, ref, key)`` triples and the referring
       rows are co-located by ONE hash-bucket shuffle on the referrer id,
       and each bucket splices vectorized with a bucket-local dict.

    The text column moves through exactly one shuffle (same cost shape as
    the stitch stage); everything else on the wire is ids + short keys.

    Partitioning assumption: one bucket's share of referring rows plus
    the keys they reference fits a worker; size ``n_buckets`` to the
    corpus and salt upstream if a single row references a huge number of
    distinct ids.
    """
    from ..functions.hashing import bucket_column
    from ..functions.joins import bucketed_hash_join

    _REF = "__ref_id"
    _KEY = "__ref_key"
    _B = "__rw_bucket"
    _SIDE = "__rw_side"

    from ..functions.arrow_util import arrow_schema_of

    # resolve schemas ONCE, from the (cheap) input dataset — never via
    # .schema() on a shuffle output, which would execute that upstream
    # once for the schema and again for the real run
    ds_schema = arrow_schema_of(ds)
    id_field_type = ds_schema.field(id_col).type
    edges_schema = pa.schema([(id_col, id_field_type), (_REF, pa.int64())])
    keys2_schema = pa.schema([(_REF, pa.int64()), (_KEY, pa.large_string())])

    def extract_edges(df: pd.DataFrame) -> pd.DataFrame:
        s = df[text_col].astype(str).reset_index(drop=True)
        m = s.str.extractall(_REF_RE)
        ids = df[id_col].to_numpy()
        if len(m):
            pos = m.index.get_level_values(0).to_numpy()
            out = pd.DataFrame(
                {id_col: ids[pos], _REF: m[0].astype("int64").to_numpy()}
            ).drop_duplicates()
        else:
            out = pd.DataFrame(
                {
                    id_col: pd.Series([], dtype=df[id_col].dtype),
                    _REF: pd.Series([], dtype="int64"),
                }
            )
        return table_from_pandas(out, schema=edges_schema)

    edges = ds.map_batches(extract_edges, batch_format="pandas")

    def project_keys(df: pd.DataFrame):
        return table_from_pandas(
            pd.DataFrame(
                {
                    _REF: df[id_col].astype("int64").to_numpy(),
                    _KEY: df["stored_key"].to_numpy(),
                }
            ),
            schema=keys2_schema,
        )

    keys2 = keys_ds.map_batches(project_keys, batch_format="pandas")
    # inner join: unknown refs simply don't resolve and stay intact.
    # Explicit schemas: keys_ds's lineage contains the canonical_keys
    # shuffle — letting the join infer via .schema() would execute it 2x
    resolved = bucketed_hash_join(edges, keys2, key=_REF,
                                  n_buckets=n_buckets, how="inner",
                                  lschema=edges_schema, rschema=keys2_schema)

    # tag-and-union: side 0 = the referring rows (full columns), side 1 =
    # resolved triples; co-locate by hash(referrer id)
    all_fields = [(n, t) for n, t in zip(ds_schema.names, ds_schema.types)]
    all_fields += [(_REF, pa.int64()), (_KEY, pa.large_string())]
    out_schema = pa.schema(
        [(n, t) for n, t in zip(ds_schema.names, ds_schema.types)]
        + [(out_col, pa.large_string())]
    )

    def align(side: int):
        def fn(tbl: pa.Table) -> pa.Table:
            tbl = bucket_column(tbl, id_col, n_buckets, _B)
            n = tbl.num_rows
            arrays, names = [], []
            for name, typ in all_fields:
                if name in tbl.column_names:
                    arrays.append(tbl[name].cast(typ))
                else:
                    arrays.append(pa.nulls(n, typ))
                names.append(name)
            arrays += [tbl[_B], pa.array(np.full(n, side, np.int8))]
            names += [_B, _SIDE]
            return pa.table(dict(zip(names, arrays)))

        return fn

    tagged = ds.map_batches(align(0), batch_format="pyarrow").union(
        resolved.map_batches(align(1), batch_format="pyarrow")
    )

    def splice_bucket(grp: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        lmask = pc.equal(grp[_SIDE], 0)
        rows = grp.filter(lmask).select(ds_schema.names).to_pandas()
        if not len(rows):
            return out_schema.empty_table()
        maps = grp.filter(pc.invert(lmask)).select([_REF, _KEY]).to_pandas()
        lut = dict(
            zip(maps[_REF].to_numpy(), maps[_KEY].to_numpy())
        )

        def sub(text: str) -> str:
            return _REF_RE.sub(
                lambda m: str(lut.get(int(m.group(1)), m.group(0))), text
            )

        rows[out_col] = [sub(str(t)) for t in rows[text_col]]
        return table_from_pandas(rows, schema=out_schema)

    return tagged.groupby(_B).map_groups(splice_bucket, batch_format="pyarrow")


def rewrite_refs_broadcast(ds, keys_ds, *, id_col: str = "doc_id",
                           text_col: str = "text", out_col: str = "rewritten"):
    """Small-side shortcut for :func:`rewrite_refs`: the id->key mapping is
    collected once and broadcast via ``ray.put`` (two aligned numpy
    arrays). Use ONLY when the keys table is known to be small (e.g. a
    per-document image set, the reference's actual shape —
    ``app/main.py:402-413``); the default :func:`rewrite_refs` is the
    scale path."""
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
