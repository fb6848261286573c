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
from ..stages.stitch import stitch_conversations
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


def stitch_pipeline(sf_dir: str, *, concurrency=None, batch_size: int = 1024):
    """One stitched markdown document per conversation.

    Extraction runs in TASK mode here: a fixed actor pool would hold its
    CPU reservation through the downstream shuffle (starving it), and the
    former workaround — materializing the whole extracted corpus before
    the shuffle — is a spill storm at 100 TB. Tasks release slots per
    batch, so extract and shuffle pipeline concurrently with no barrier.
    """
    return stitch_conversations(
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
