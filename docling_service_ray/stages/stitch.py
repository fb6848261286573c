"""Conversation stitching with explicit skew handling.

Restores stable turn ordering (the north-rule invariant) STRUCTURALLY —
sort within group — rather than with global ``preserve_order`` (SURVEY.md
§4 "Ordering"). Two-level stitch bounds per-task group size so a
mega-conversation (Zipf head) never materializes in one task:

  level 1: groupby (conv_id, chunk = turn_idx // SALT_SPAN)
           -> sort chunk by turn_idx, stitch turns -> one row per chunk
  level 2: groupby conv_id over the (much smaller) chunk rows
           -> sort by chunk index, concatenate, append metadata block

SALT_SPAN is the explicit salting the north rule demands; the reference
never needed it (1 doc = 1 task). Turn markers mirror the per-page markers
of the reference serializer (``app/main.py:467``); the appended
``json.dumps(..., indent=2)`` metadata block mirrors M13
(``app/main.py:535-546``) including its byte-exact formatting.
"""

from __future__ import annotations

import json

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

SALT_SPAN = 64  # turns per stitch chunk; bounds per-task group size

METADATA_START = "<!-- DOCLING_METADATA_START -->"
METADATA_END = "<!-- DOCLING_METADATA_END -->"


def turn_marker(turn_idx: int, role: str) -> str:
    return f"<!-- Turn {turn_idx} ({role}) -->"


def add_chunk_column(batch: pa.Table) -> pa.Table:
    chunk = pc.cast(
        pc.floor(pc.divide(pc.cast(batch["turn_idx"], pa.float64()), SALT_SPAN)),
        pa.int32(),
    )
    return batch.append_column("chunk", chunk)


def _stitch_chunk(group: pd.DataFrame) -> pd.DataFrame:
    g = group.sort_values("turn_idx", kind="mergesort")
    parts = []
    n_errors = 0
    for turn_idx, role, text, ok in zip(
        g["turn_idx"], g["role"], g["extracted_text"], g["ok"]
    ):
        if not ok:
            n_errors += 1
        marker = turn_marker(int(turn_idx), role)
        parts.append(marker + "\n" + text if text else marker)
    return pd.DataFrame(
        {
            "conv_id": [g["conv_id"].iloc[0]],
            "chunk": [int(g["chunk"].iloc[0])],
            "chunk_text": ["\n\n".join(parts)],
            "n_turns": [len(g)],
            "n_errors": [n_errors],
            "min_turn": [int(g["turn_idx"].min())],
            "max_turn": [int(g["turn_idx"].max())],
        }
    )


def _stitch_conversation(group: pd.DataFrame) -> pd.DataFrame:
    g = group.sort_values("chunk", kind="mergesort")
    body = "\n\n".join(t for t in g["chunk_text"] if t)
    n_turns = int(g["n_turns"].sum())
    n_errors = int(g["n_errors"].sum())
    meta = {
        "conv_id": g["conv_id"].iloc[0],
        "total_turns": n_turns,
        "total_errors": n_errors,
        "first_turn": int(g["min_turn"].min()),
        "last_turn": int(g["max_turn"].max()),
    }
    # byte-exact metadata framing, mirroring reference app/main.py:537-546
    block = (
        "\n\n---\n"
        + METADATA_START
        + "\n```json\n"
        + json.dumps(meta, indent=2)
        + "\n```\n"
        + METADATA_END
    )
    return pd.DataFrame(
        {
            "conv_id": [meta["conv_id"]],
            "document": [body + block],
            "n_turns": [n_turns],
            "n_errors": [n_errors],
        }
    )


def stitch_conversations(extracted_ds):
    """extracted per-turn Dataset -> one stitched markdown document per
    conversation. Exactly one logical shuffle key (conv_id); the chunk
    level reuses it as a compound key so both groupbys hash the same way.
    """
    narrow = extracted_ds.select_columns(
        ["conv_id", "turn_idx", "role", "extracted_text", "ok"]
    )
    chunked = narrow.map_batches(add_chunk_column, batch_format="pyarrow")
    per_chunk = chunked.groupby(["conv_id", "chunk"]).map_groups(
        _stitch_chunk, batch_format="pandas"
    )
    return per_chunk.groupby("conv_id").map_groups(
        _stitch_conversation, batch_format="pandas"
    )
