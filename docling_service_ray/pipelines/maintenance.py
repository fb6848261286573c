"""Maintenance jobs: retention + size-budget eviction of checkpoint output.

Re-expression of the reference's storage-cleanup CLI
(``app/storage_cleanup.py:12-53``) and inline eviction
(``app/main.py:943-992``) as a policy over OUTPUT PARTITIONS instead of
individual files:

- retention: partitions older than ``retention_days`` are evictable (O4);
- budget: oldest-first eviction until total bytes <= budget (O3, the
  "keep newest by recency" running-sum limit);
- exclusion: partitions named in ``protect`` (e.g. just written) are never
  evicted (D3 exclusion-set semantics, ``app/main.py:943-947``).

The plan is computed from the lineage manifest (no filesystem walk of data
files) and returned as a list; ``apply=True`` deletes. Deciding from the
manifest keeps this O(#partitions) regardless of corpus size.
"""

from __future__ import annotations

import os
import shutil
from datetime import datetime, timedelta, timezone

from ..state.manifest import Manifest


def eviction_plan(
    out_dir: str,
    *,
    retention_days: float | None = None,
    max_total_bytes: int | None = None,
    protect: set | None = None,
    now: datetime | None = None,
) -> list:
    """Partition ids to evict, oldest-first (by manifest written_at)."""
    protect = protect or set()
    now = now or datetime.now(timezone.utc)
    recs = [r for r in Manifest(out_dir).records() if r.status == "completed"]
    recs.sort(key=lambda r: (r.written_at, r.partition_id))  # oldest first

    evict = []
    kept = list(recs)
    if retention_days is not None:
        cutoff = now - timedelta(days=retention_days)
        for r in recs:
            ts = datetime.fromisoformat(r.written_at) if r.written_at else now
            if ts < cutoff and r.partition_id not in protect:
                evict.append(r.partition_id)
        kept = [r for r in recs if r.partition_id not in set(evict)]

    if max_total_bytes is not None:
        total = sum(r.bytes_out for r in kept)
        for r in kept:  # oldest first
            if total <= max_total_bytes:
                break
            if r.partition_id in protect:
                continue
            evict.append(r.partition_id)
            total -= r.bytes_out
    return evict


def apply_eviction(out_dir: str, partition_ids: list) -> None:
    manifest_dir = os.path.join(out_dir, "_manifest")
    for pid in partition_ids:
        part_dir = os.path.join(out_dir, pid)
        if os.path.isdir(part_dir):
            shutil.rmtree(part_dir)
        rec = os.path.join(manifest_dir, f"{pid}.json")
        if os.path.exists(rec):
            os.remove(rec)


def main(argv: list | None = None) -> int:
    """CLI mirror of the reference's cleanup entrypoint
    (``python -m app.storage_cleanup <root>``, ``app/storage_cleanup.py:
    79-91``): ``python -m docling_service_ray.pipelines.maintenance
    <out_dir> [--retention-days D] [--max-total-mb M] [--apply]``.

    Dry-run by default: prints the eviction plan; ``--apply`` deletes.
    """
    import argparse
    import json

    p = argparse.ArgumentParser()
    p.add_argument("out_dir")
    p.add_argument("--retention-days", type=float, default=None)
    p.add_argument("--max-total-mb", type=float, default=None)
    p.add_argument("--protect", nargs="*", default=[])
    p.add_argument("--apply", action="store_true")
    args = p.parse_args(argv)

    plan = eviction_plan(
        args.out_dir,
        retention_days=args.retention_days,
        max_total_bytes=(
            int(args.max_total_mb * 1024 * 1024)
            if args.max_total_mb is not None
            else None
        ),
        protect=set(args.protect),
    )
    if args.apply:
        apply_eviction(args.out_dir, plan)
    print(json.dumps({"evicted" if args.apply else "plan": plan}))
    return 0


if __name__ == "__main__":  # pragma: no cover - exercised via tests
    raise SystemExit(main())
