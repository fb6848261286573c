"""Batch extraction job entrypoint — the ``ray job submit`` target.

    ray job submit --working-dir /root/repo -- \
        python tools/run_extract_job.py --sf-dir /root/testdata/sf0.01 \
        --out /tmp/extract_out --partitions 8 [--stitch]

Runs the flagship per-turn extraction (optionally + stitching) through the
checkpointed runner: per-partition parquet output + lineage manifest;
re-running after a failure skips completed partitions. Standalone-safe:
initialises Ray only if no session exists (driver-embedded contexts own
their session).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    p.add_argument("--out", required=True)
    p.add_argument("--partitions", type=int, default=8)
    p.add_argument("--stitch", action="store_true",
                   help="emit stitched conversation documents instead of per-turn rows")
    p.add_argument("--num-cpus", type=int, default=int(os.environ.get("RAY_GRAFT_CPUS", "32")))
    args = p.parse_args()

    import ray

    owns_session = not ray.is_initialized()
    if owns_session:
        ray.init(address="local", num_cpus=args.num_cpus,
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from docling_service_ray.stages.extract_stage import apply_extract
    from docling_service_ray.stages.stitch import stitch_conversations
    from docling_service_ray.state import Manifest, run_checkpointed
    from docling_service_ray.transcripts import ensure_transcripts

    tdir = ensure_transcripts(args.sf_dir)
    files = [os.path.join(tdir, f) for f in sorted(os.listdir(tdir))
             if f.endswith(".parquet")]

    def pipeline(ds):
        # task mode when a shuffle follows: an actor pool would hold its
        # CPU reservation through the stitch shuffle (see extract_stage)
        extracted = apply_extract(ds, mode="tasks" if args.stitch else "actors")
        if args.stitch:
            return stitch_conversations(extracted)
        return extracted.select_columns(
            ["conv_id", "turn_idx", "role", "extracted_text", "spans",
             "stats", "tables", "positions", "ok", "error", "extractor_path"]
        )

    t0 = time.monotonic()
    done = run_checkpointed(
        files, args.out, pipeline,
        n_partitions=args.partitions,
        error_col=None if args.stitch else "ok",
        on_partition_complete=lambda rec: print(
            f"partition {rec.partition_id}: {rec.n_rows} rows, "
            f"{rec.n_errors} errors, {rec.wall_ms} ms",
            file=sys.stderr,
        ),
    )
    recs = Manifest(args.out).records()
    print(json.dumps(
        {
            "processed_partitions": done,
            "total_partitions": len(recs),
            "total_rows": sum(r.n_rows for r in recs),
            "total_errors": sum(r.n_errors for r in recs),
            "bytes_out": sum(r.bytes_out for r in recs),
            "wall_sec": round(time.monotonic() - t0, 2),
        }
    ))
    if owns_session:
        ray.shutdown()


if __name__ == "__main__":
    main()
