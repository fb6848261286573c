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
import shutil
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


def _partition_stats(part_dir: str, error_col: str | None) -> tuple[int, int]:
    """(n_rows, n_errors) for a written partition, WITHOUT re-reading the
    data: row counts come from parquet footer metadata (no data pages
    touched); error counts read ONLY the boolean error column (one
    column-pruned scan, ~1 bit/row) and reduce with pc.sum. The files are
    the truth — counts survive task retries, unlike in-pipeline
    accumulators which double-count re-executed batches."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    n_rows = 0
    n_ok = 0
    has_err_col = False
    for root, _dirs, names in os.walk(part_dir):
        for name in sorted(names):
            if not name.endswith(".parquet"):
                continue
            f = pq.ParquetFile(os.path.join(root, name))
            n_rows += f.metadata.num_rows
            if error_col and error_col in f.schema_arrow.names:
                has_err_col = True
                col = f.read(columns=[error_col])[error_col]
                n_ok += int(pc.sum(pc.cast(col, "int64")).as_py() or 0)
    return n_rows, (n_rows - n_ok) if has_err_col else 0


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
        # A crash during/after write_parquet but before manifest.write
        # leaves partial parquet files; Ray's writer appends uniquely-named
        # files alongside them on rerun, duplicating rows. The manifest only
        # guards COMPLETED partitions, so any non-skipped partition's dir is
        # stale by definition — clear it before rerunning.
        shutil.rmtree(part_dir, ignore_errors=True)
        ds = pipeline_fn(rd.read_parquet(files))
        ds.write_parquet(part_dir)
        n_rows, n_errors = _partition_stats(part_dir, error_col)
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
