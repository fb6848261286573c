"""Resumable checkpointed execution of a Dataset pipeline.

Shards the input file list into partitions; each partition runs as its own
(internally parallel) Dataset pipeline and writes to its own output
directory plus one lineage manifest record. On restart, partitions whose
manifest says ``completed`` are skipped — no reprocessing (north-rule
resume requirement).

Sizing note for real clusters: a partition here is a unit of RESUME, not of
parallelism — each partition's pipeline fans out across the whole cluster,
so partitions should be large (e.g. 1k input files / tens of GB each at
100 TB scale) and few, keeping the skip-scan cheap while bounding lost work
to one partition.
"""

from __future__ import annotations

import os
import time
from datetime import datetime, timezone

import ray.data as rd

from .manifest import Manifest, PartitionRecord


def shard_files(input_files: list, n_partitions: int) -> list:
    """Deterministic round-robin sharding of sorted input files."""
    files = sorted(input_files)
    shards = [files[i::n_partitions] for i in range(n_partitions)]
    return [s for s in shards if s]


def _dir_bytes(path: str) -> int:
    total = 0
    for root, _dirs, names in os.walk(path):
        for n in names:
            total += os.path.getsize(os.path.join(root, n))
    return total


def run_checkpointed(
    input_files: list,
    out_dir: str,
    pipeline_fn,
    *,
    n_partitions: int = 8,
    error_col: str = "ok",
    on_partition_complete=None,
):
    """Run ``pipeline_fn(Dataset) -> Dataset`` over each partition of
    ``input_files``, writing parquet + manifest per partition.

    ``on_partition_complete(PartitionRecord)``, if given, fires after each
    partition's manifest is durable — the driver-side analog of the
    reference's completion webhook (``app/main.py:879-915``), minus the
    network.

    Returns the list of partition ids processed THIS call (skipped ones
    excluded). Output layout::

        out_dir/part-00000/*.parquet
        out_dir/_manifest/part-00000.json
    """
    os.makedirs(out_dir, exist_ok=True)
    manifest = Manifest(out_dir)
    done = manifest.completed_ids()
    shards = shard_files(input_files, n_partitions)

    processed = []
    for i, files in enumerate(shards):
        pid = f"part-{i:05d}"
        if pid in done:
            continue
        t0 = time.monotonic()
        part_dir = os.path.join(out_dir, pid)
        ds = pipeline_fn(rd.read_parquet(files))
        # count rows/errors while writing: project the error column into a
        # tiny driver-side aggregate AFTER the write (files are the truth)
        ds.write_parquet(part_dir)
        written = rd.read_parquet(part_dir)
        n_rows = written.count()
        n_errors = 0
        if error_col and error_col in [f for f in written.schema().names]:
            n_errors = n_rows - int(
                written.select_columns([error_col])
                .map_batches(
                    lambda t: {"s": [int(sum(t[error_col].to_pylist()))]},
                    batch_format="pyarrow",
                )
                .to_pandas()["s"]
                .sum()
            )
        rec = PartitionRecord(
            partition_id=pid,
            input_files=files,
            n_rows=n_rows,
            n_errors=n_errors,
            bytes_out=_dir_bytes(part_dir),
            wall_ms=int((time.monotonic() - t0) * 1000),
            status="completed",
            written_at=datetime.now(timezone.utc).isoformat(),
        )
        manifest.write(rec)
        if on_partition_complete is not None:
            on_partition_complete(rec)
        processed.append(pid)
    return processed
