"""Conversation stitching with explicit skew handling.

Restores stable turn ordering (the north-rule invariant) STRUCTURALLY —
sort/arrange within group — rather than with global ``preserve_order``
(SURVEY.md §4 "Ordering"). Turn markers mirror the per-page markers of the
reference serializer (``app/main.py:467``); the appended
``json.dumps(..., indent=2)`` metadata block mirrors M13
(``app/main.py:535-546``) including its byte-exact formatting.

Two implementations, byte-identical output:

- :func:`stitch_conversations` (default): **hash-bucket shuffle**. Each
  conversation is assigned a bucket = crc32(conv_id) % B (computed on
  dictionary-encoded uniques — one hash per distinct conv per block, not
  per row), then ONE ``groupby(bucket)`` co-locates complete conversations
  and each bucket is stitched VECTORIZED (a single pandas sort +
  groupby-agg per bucket, not one Python call per conversation). All
  blocks stay Arrow end-to-end — zero-copy through the object store; the
  pandas conversion happens once inside the bucket task.
  Measured at sf0.1/32cpus: 6x faster than the naive per-group
  ``groupby(conv_id).map_groups`` formulation (whose cost is millions of
  per-group Python dispatches plus a large-string sort shuffle).

  Skew: buckets are hash-balanced; a mega-conversation only adds its own
  payload to one bucket, and B is sized so a bucket is a few tens of MB.
  A conversation larger than worker memory would need the salted variant.

- :func:`stitch_conversations_salted`: two-level salted groupby
  (``(conv_id, turn_idx // SALT_SPAN)`` then ``conv_id``) bounding
  per-task group size — the formulation to prefer when single
  conversations are themselves giant.
"""

from __future__ import annotations

import json

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

SALT_SPAN = 64  # turns per stitch chunk in the salted path

METADATA_START = "<!-- DOCLING_METADATA_START -->"
METADATA_END = "<!-- DOCLING_METADATA_END -->"

STITCH_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("document", pa.large_string()),
        ("n_turns", pa.int64()),
        ("n_errors", pa.int64()),
    ]
)

_SEG_COLUMNS = ["conv_id", "seg_text", "n_turns", "n_errors", "min_turn", "max_turn"]


def turn_marker(turn_idx: int, role: str) -> str:
    return f"<!-- Turn {turn_idx} ({role}) -->"


def _metadata_block(conv_id, n_turns, n_errors, first_turn, last_turn) -> str:
    meta = {
        "conv_id": conv_id,
        "total_turns": int(n_turns),
        "total_errors": int(n_errors),
        "first_turn": int(first_turn),
        "last_turn": int(last_turn),
    }
    # byte-exact metadata framing, mirroring reference app/main.py:537-546
    return (
        "\n\n---\n"
        + METADATA_START
        + "\n```json\n"
        + json.dumps(meta, indent=2)
        + "\n```\n"
        + METADATA_END
    )


def _stitch_frame(df: pd.DataFrame) -> pd.DataFrame:
    """Per-turn rows -> one segment row per conversation, vectorized.

    Marker/piece assembly are pandas str kernels; the only per-group
    Python is the final "\\n\\n".join.
    """
    if len(df) == 0:
        return pd.DataFrame(columns=_SEG_COLUMNS)
    df = df.sort_values(["conv_id", "turn_idx"], kind="mergesort")
    marker = (
        "<!-- Turn " + df["turn_idx"].astype(str) + " (" + df["role"] + ") -->"
    )
    text = df["extracted_text"].fillna("")
    piece = np.where(text != "", marker + "\n" + text, marker)
    tmp = pd.DataFrame(
        {
            "conv_id": df["conv_id"].to_numpy(),
            "piece": piece,
            "turn_idx": df["turn_idx"].to_numpy(),
            "err": (~df["ok"].astype(bool)).to_numpy(),
        }
    )
    seg = (
        tmp.groupby("conv_id", sort=True)
        .agg(
            seg_text=("piece", "\n\n".join),
            n_turns=("piece", "size"),
            n_errors=("err", "sum"),
            min_turn=("turn_idx", "min"),
            max_turn=("turn_idx", "max"),
        )
        .reset_index()
    )
    for c in ("n_turns", "n_errors", "min_turn", "max_turn"):
        seg[c] = seg[c].astype("int64")
    return seg[_SEG_COLUMNS]


def _finalize(seg: pd.DataFrame) -> pa.Table:
    """Segment rows (one per conversation) -> final document rows."""
    docs = [
        body + _metadata_block(cid, nt, ne, mn, mx)
        for cid, body, nt, ne, mn, mx in zip(
            seg["conv_id"], seg["seg_text"], seg["n_turns"],
            seg["n_errors"], seg["min_turn"], seg["max_turn"]
        )
    ]
    return pa.Table.from_arrays(
        [
            pa.array(seg["conv_id"].tolist(), pa.string()),
            pa.array(docs, pa.large_string()),
            pa.array(seg["n_turns"].astype("int64").tolist(), pa.int64()),
            pa.array(seg["n_errors"].astype("int64").tolist(), pa.int64()),
        ],
        schema=STITCH_SCHEMA,
    )


def _default_n_buckets() -> int:
    try:
        import ray

        total = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    except Exception:  # pragma: no cover
        total = 8
    # a few buckets per core: balances parallelism against per-bucket
    # overhead; at cluster scale pass n_buckets explicitly (e.g. thousands)
    return max(64, 4 * total)


def add_bucket_column(tbl: pa.Table, n_buckets: int) -> pa.Table:
    """bucket = crc32(conv_id) % n_buckets, hashed once per DISTINCT
    conv_id per chunk via dictionary encoding (not per row)."""
    from ..functions.hashing import bucket_column

    return bucket_column(tbl, "conv_id", n_buckets)


def stitch_conversations(extracted_ds, *, n_buckets: int | None = None):
    """extracted per-turn Dataset -> one stitched markdown document per
    conversation (hash-bucket plan; see module docstring)."""
    if n_buckets is None:
        n_buckets = _default_n_buckets()
    narrow = extracted_ds.select_columns(
        ["conv_id", "turn_idx", "role", "extracted_text", "ok"]
    )
    # NO materialize barrier: at corpus scale a full materialization of the
    # narrow projection (which includes extracted_text — essentially the
    # whole corpus) pins ~the dataset in the object store. The upstream
    # extraction stage must not hold idle CPU reservations through the
    # shuffle — stitch_pipeline runs extraction in task mode
    # (extract_stage.build_extract_kwargs) so slots release per batch and
    # the shuffle streams at full width.
    bucketed = narrow.map_batches(
        lambda t: add_bucket_column(t, n_buckets),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    def stitch_bucket(grp: pa.Table) -> pa.Table:
        df = grp.drop_columns(["bucket"]).to_pandas()
        return _finalize(_stitch_frame(df))

    return bucketed.groupby("bucket").map_groups(
        stitch_bucket, batch_format="pyarrow"
    )


def mega_conversation_candidates(ids_ds, *, n_buckets: int,
                                 bucket_fill: int = 2,
                                 batch_size: int = 65536) -> list[str]:
    """conv_ids that MAY hold >= 1/(bucket_fill*n_buckets) of all turns —
    i.e. a single conversation filling >= 1/bucket_fill of an average
    hash bucket's payload, the regime where the default stitch's
    one-bucket-per-conversation co-location stops bounding task memory.

    One streaming pass over a conv_id-only projection
    (functions/heavy_hitters.py ``hot_key_candidates``): guaranteed
    recall — every conversation at or above the threshold is returned —
    with bounded over-selection (near-misses down to ~0.75x the
    threshold may appear). Over-selection is safe here because the
    result only picks the PLAN (salted vs hash-bucket stitch,
    byte-identical outputs), so the exact recount pass is skipped.
    """
    from ..functions.heavy_hitters import hot_key_candidates

    return hot_key_candidates(
        ids_ds, "conv_id", phi_inv=bucket_fill * n_buckets,
        batch_size=batch_size)


# ---------------------------------------------------------------------------
# salted hash-shuffle path (giant-conversation safe; same output)
# ---------------------------------------------------------------------------


def add_chunk_column(batch: pa.Table) -> pa.Table:
    chunk = pc.cast(
        pc.floor(pc.divide(pc.cast(batch["turn_idx"], pa.float64()), SALT_SPAN)),
        pa.int32(),
    )
    return batch.append_column("chunk", chunk)


def _add_salted_bucket(batch: pa.Table, n_buckets: int) -> pa.Table:
    """bucket = hash(conv_id, chunk) % n_buckets — chunks of the same
    conversation land in DIFFERENT buckets, which is the whole point of
    salting (one giant conversation never concentrates in one task)."""
    from ..functions.hashing import bucket_column

    wide = bucket_column(batch, "conv_id", 1 << 30, "__h")
    h = wide["__h"].to_numpy(zero_copy_only=False)
    chunk = wide["chunk"].to_numpy(zero_copy_only=False).astype(np.int64)
    bucket = (h * 1000003 + chunk) % n_buckets
    return wide.drop_columns(["__h"]).append_column("bucket", pa.array(bucket))


def _stitch_chunks_bucket(grp: pa.Table) -> pa.Table:
    """All (conv, chunk) groups of one bucket -> one segment row each,
    via a single vectorized sort + groupby-agg (no per-chunk dispatch)."""
    df = grp.drop_columns(["bucket"]).to_pandas()
    df = df.sort_values(["conv_id", "chunk", "turn_idx"], kind="mergesort")
    marker = (
        "<!-- Turn " + df["turn_idx"].astype(str) + " (" + df["role"] + ") -->"
    )
    # fillna("") matches the hash-bucket path (_stitch_frame) — a null
    # extracted_text must not break the byte-identical equivalence
    text = df["extracted_text"].fillna("")
    piece = np.where(text != "", marker + "\n" + text, marker)
    tmp = pd.DataFrame(
        {
            "conv_id": df["conv_id"].to_numpy(),
            "chunk": df["chunk"].to_numpy().astype(np.int64),
            "piece": piece,
            "turn_idx": df["turn_idx"].to_numpy(),
            "err": (~df["ok"].astype(bool)).to_numpy(),
        }
    )
    seg = (
        tmp.groupby(["conv_id", "chunk"], sort=True)
        .agg(
            seg_text=("piece", "\n\n".join),
            n_turns=("piece", "size"),
            n_errors=("err", "sum"),
            min_turn=("turn_idx", "min"),
            max_turn=("turn_idx", "max"),
        )
        .reset_index()
    )
    for c in ("chunk", "n_turns", "n_errors", "min_turn", "max_turn"):
        seg[c] = seg[c].astype("int64")
    from ..functions.arrow_util import table_from_pandas

    return table_from_pandas(seg)


def _stitch_convs_bucket(grp: pa.Table) -> pa.Table:
    """All conversations of one bucket: concatenate their chunk segments
    in chunk order and finalize, vectorized per bucket."""
    df = grp.drop_columns(["bucket"]).to_pandas()
    df = df.sort_values(["conv_id", "chunk"], kind="mergesort")
    seg = (
        df.groupby("conv_id", sort=True)
        .agg(
            seg_text=("seg_text", "\n\n".join),
            n_turns=("n_turns", "sum"),
            n_errors=("n_errors", "sum"),
            min_turn=("min_turn", "min"),
            max_turn=("max_turn", "max"),
        )
        .reset_index()
    )
    for c in ("n_turns", "n_errors", "min_turn", "max_turn"):
        seg[c] = seg[c].astype("int64")
    return _finalize(seg[_SEG_COLUMNS])


def stitch_conversations_salted(extracted_ds, *, n_buckets: int | None = None):
    """Two-level salted formulation (see module docstring): chunks of a
    conversation are stitched in bucket tasks keyed by (conv_id, chunk)
    hash — bounding per-task payload to ~SALT_SPAN turns per chunk even
    for giant conversations — then chunk segments are concatenated per
    conversation in a second bucketed pass. Both levels use coarse
    hash-bucket co-location + vectorized in-task group handling (never a
    Ray dispatch per conversation or per chunk)."""
    if n_buckets is None:
        n_buckets = _default_n_buckets()
    narrow = extracted_ds.select_columns(
        ["conv_id", "turn_idx", "role", "extracted_text", "ok"]
    )
    chunked = narrow.map_batches(add_chunk_column, batch_format="pyarrow")
    salted = chunked.map_batches(
        lambda t: _add_salted_bucket(t, n_buckets), batch_format="pyarrow"
    )
    per_chunk = salted.groupby("bucket").map_groups(
        _stitch_chunks_bucket, batch_format="pyarrow"
    )
    by_conv = per_chunk.map_batches(
        lambda t: add_bucket_column(t, n_buckets), batch_format="pyarrow"
    )
    return by_conv.groupby("bucket").map_groups(
        _stitch_convs_bucket, batch_format="pyarrow"
    )
