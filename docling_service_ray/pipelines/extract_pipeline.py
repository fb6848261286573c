"""Flagship pipeline: transcript extraction + conversation stitching.

Pipeline shape (SURVEY.md §7.1)::

    read_parquet(transcripts/)                       # pruned columns
      .map_batches(ExtractTurns, pyarrow, actors)    # stage E
      [.groupby(conv_id,chunk).map_groups(stitch)    # stage G (optional)
       .groupby(conv_id).map_groups(concat)]
      .write_parquet(out/)                           # stage W

Never materializes the corpus: the streaming executor pipelines read ->
extract -> shuffle -> write with backpressure.
"""

from __future__ import annotations

import ray.data as rd

from ..stages.extract_stage import apply_extract
from ..stages.stitch import (
    _default_n_buckets,
    mega_conversation_candidates,
    stitch_conversations,
    stitch_conversations_salted,
)
from ..transcripts import ensure_transcripts

TRANSCRIPT_COLUMNS = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]


def read_transcripts(sf_dir: str, columns=None):
    """Transcript Dataset for a scale factor (generates+caches on first use).

    Prune ``columns`` to what the consumer needs — the read decodes only
    those parquet columns (100 TB rule: unused columns never leave storage).
    """
    path = ensure_transcripts(sf_dir)
    from ..sources.tables import stripped_schema

    cols = columns or TRANSCRIPT_COLUMNS
    return rd.read_parquet(path, columns=cols,
                           schema=stripped_schema(path, cols))


def extract_pipeline(sf_dir: str, *, concurrency=None, batch_size: int = 256,
                     columns=None, mode: str = "actors", outputs=None,
                     project=None):
    """Per-turn extraction Dataset: input columns + extracted_text, spans,
    stats, ok, error, extractor_path (``outputs`` prunes the appended
    extraction columns, ``project`` the final emitted columns —
    projection pushdown into the UDF)."""
    ds = read_transcripts(sf_dir, columns=columns)
    return apply_extract(
        ds, concurrency=concurrency, batch_size=batch_size, mode=mode,
        outputs=outputs, project=project,
    )


def stitch_route(sf_dir: str, n_buckets: int | None = None
                 ) -> tuple[str, list[str]]:
    """Pick the stitch plan for a corpus: ``("salted", megas)`` when any
    conversation may exceed ~1/2 an average bucket's payload (the SURVEY
    §7.1 skew contract), else ``("hash", [])``.

    Detection is one streaming pass over a conv_id-only column read —
    the text never leaves storage — with guaranteed recall; over-selection
    only switches to the salted plan, whose output is byte-identical
    (tests/test_pipeline.py::test_stitch_variants_identical).
    """
    if n_buckets is None:
        n_buckets = _default_n_buckets()
    ids = read_transcripts(sf_dir, columns=["conv_id"])
    megas = mega_conversation_candidates(ids, n_buckets=n_buckets)
    return ("salted" if megas else "hash"), megas


def stitch_pipeline(sf_dir: str, *, concurrency=None, batch_size: int = 1024,
                    route: str = "auto"):
    """One stitched markdown document per conversation.

    Extraction runs in TASK mode here: a fixed actor pool would hold its
    CPU reservation through the downstream shuffle (starving it), and the
    former workaround — materializing the whole extracted corpus before
    the shuffle — is a spill storm at 100 TB. Tasks release slots per
    batch, so extract and shuffle pipeline concurrently with no barrier.

    ``route``: "auto" (default) profiles conversation sizes on a cheap
    conv_id-only pass (:func:`stitch_route`) and takes the salted
    two-level stitch when a mega conversation could overflow a bucket
    task; "hash" / "salted" force a plan (byte-identical outputs).
    """
    if route == "auto":
        route, _ = stitch_route(sf_dir)
    stitcher = (stitch_conversations_salted if route == "salted"
                else stitch_conversations)
    return stitcher(
        extract_pipeline(
            sf_dir,
            concurrency=concurrency,
            batch_size=batch_size,
            columns=["conv_id", "turn_idx", "role", "text"],
            mode="tasks",
            # stitch consumes only text+ok: skip span/stats/table/position
            # assembly and keep those bytes (and the raw input text) out
            # of the ordering shuffle
            outputs=["extracted_text", "ok"],
            project=["conv_id", "turn_idx", "role", "extracted_text", "ok"],
        )
    )


def extracted_turns_sorted(sf_dir: str):
    """Per-turn extraction in globally stable (conv_id, turn_idx) order —
    the shape the oracle equality test compares against. The global sort is
    only for test/verification output; production consumers use the
    unsorted stream or the per-conversation stitched documents."""
    ds = extract_pipeline(sf_dir)
    flat = ds.select_columns(
        ["conv_id", "turn_idx", "extracted_text", "ok", "error", "extractor_path"]
    )
    return flat.sort(["conv_id", "turn_idx"])
