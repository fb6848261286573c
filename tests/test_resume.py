"""Checkpoint/lineage + resume + eviction tests (SURVEY.md §5d)."""

import json
import os
import shutil

import pytest

SF = "/root/testdata/sf0.001"
OUT = "/tmp/graft_test_resume"


@pytest.fixture()
def out_dir():
    shutil.rmtree(OUT, ignore_errors=True)
    yield OUT
    shutil.rmtree(OUT, ignore_errors=True)


def _input_files():
    from docling_service_ray.transcripts import ensure_transcripts

    d = ensure_transcripts(SF)
    return [os.path.join(d, f) for f in sorted(os.listdir(d)) if f.endswith(".parquet")]


def _pipeline(ds):
    from docling_service_ray.stages.extract_stage import apply_extract

    return apply_extract(ds, concurrency=2).select_columns(
        ["conv_id", "turn_idx", "extracted_text", "ok"]
    )


def test_run_and_resume_skips_completed(ray_session, out_dir):
    from docling_service_ray.state import Manifest, run_checkpointed

    files = _input_files()
    first = run_checkpointed(files, out_dir, _pipeline, n_partitions=2)
    assert len(first) == 2
    recs = Manifest(out_dir).records()
    assert all(r.status == "completed" for r in recs)
    assert sum(r.n_rows for r in recs) > 0
    assert all(r.input_files for r in recs)  # lineage present

    # mtime snapshot of written parquet
    def mtimes():
        out = {}
        for pid in ("part-00000", "part-00001"):
            d = os.path.join(out_dir, pid)
            out[pid] = {f: os.path.getmtime(os.path.join(d, f)) for f in os.listdir(d)}
        return out

    before = mtimes()
    second = run_checkpointed(files, out_dir, _pipeline, n_partitions=2)
    assert second == []  # nothing reprocessed
    assert mtimes() == before  # outputs untouched


def test_resume_after_partial_failure(ray_session, out_dir):
    from docling_service_ray.state import Manifest, run_checkpointed

    files = _input_files()
    calls = {"n": 0}

    def failing_pipeline(ds):
        calls["n"] += 1
        if calls["n"] == 2:  # second partition dies mid-run
            raise RuntimeError("injected fault")
        return _pipeline(ds)

    with pytest.raises(RuntimeError):
        run_checkpointed(files, out_dir, failing_pipeline, n_partitions=2)
    assert Manifest(out_dir).completed_ids() == {"part-00000"}

    done = run_checkpointed(files, out_dir, _pipeline, n_partitions=2)
    assert done == ["part-00001"]  # only the failed partition reran
    assert Manifest(out_dir).completed_ids() == {"part-00000", "part-00001"}

    # final output equals a clean single-shot run, row-for-row
    import ray.data as rd

    total = sum(
        rd.read_parquet(os.path.join(out_dir, p)).count()
        for p in ("part-00000", "part-00001")
    )
    clean = _pipeline(rd.read_parquet(files)).count()
    assert total == clean


def test_manifest_counts_errors(ray_session, out_dir):
    """n_rows/n_errors in the manifest come from parquet footers + a
    pruned error-column read — verify they count real ok=False rows."""
    import pyarrow as pa

    from docling_service_ray.state import Manifest, run_checkpointed

    files = _input_files()

    def pipeline_with_errors(ds):
        def poison(t: pa.Table) -> pa.Table:
            n = t.num_rows
            ok = [i % 5 != 0 for i in range(n)]  # every 5th row fails
            return pa.table(
                {"conv_id": t["conv_id"], "ok": pa.array(ok, pa.bool_())}
            )

        return ds.map_batches(poison, batch_format="pyarrow")

    run_checkpointed(files, out_dir, pipeline_with_errors, n_partitions=2)
    recs = Manifest(out_dir).records()
    total = sum(r.n_rows for r in recs)
    errors = sum(r.n_errors for r in recs)
    assert total > 0
    # every batch marks ceil(n/5) rows as failed; across all batches the
    # error share is between 1/5 and ~1/4 for small batches
    assert 0 < errors < total
    assert errors >= total // 5


def test_resume_after_crash_mid_write(ray_session, out_dir):
    """A crash AFTER write_parquet but BEFORE the manifest write leaves
    stale partial output; the rerun must clear it, not merge with it
    (Ray's writer appends uniquely-named files, silently doubling rows)."""
    import ray.data as rd

    from docling_service_ray.state import Manifest, run_checkpointed

    files = _input_files()
    run_checkpointed(files, out_dir, _pipeline, n_partitions=2)
    recs = {r.partition_id: r for r in Manifest(out_dir).records()}
    clean_total = sum(r.n_rows for r in recs.values())

    # simulate the crash window: partition output fully written (plus a
    # stale partial file from the interrupted attempt), manifest missing
    os.remove(os.path.join(out_dir, "_manifest", "part-00001.json"))
    part_dir = os.path.join(out_dir, "part-00001")
    existing = [f for f in os.listdir(part_dir) if f.endswith(".parquet")]
    shutil.copy(
        os.path.join(part_dir, existing[0]),
        os.path.join(part_dir, "stale_partial_0000.parquet"),
    )

    done = run_checkpointed(files, out_dir, _pipeline, n_partitions=2)
    assert done == ["part-00001"]
    total = sum(
        rd.read_parquet(os.path.join(out_dir, p)).count()
        for p in ("part-00000", "part-00001")
    )
    assert total == clean_total  # no duplicated rows from stale files
    recs2 = {r.partition_id: r for r in Manifest(out_dir).records()}
    assert recs2["part-00001"].n_rows == recs["part-00001"].n_rows


def test_eviction_policy(out_dir):
    from docling_service_ray.pipelines.maintenance import (
        apply_eviction,
        eviction_plan,
    )
    from docling_service_ray.state.manifest import Manifest, PartitionRecord

    man = Manifest(out_dir)
    for i, day in enumerate(["2026-01-01", "2026-02-01", "2026-03-01"]):
        os.makedirs(os.path.join(out_dir, f"part-{i:05d}"), exist_ok=True)
        man.write(
            PartitionRecord(
                partition_id=f"part-{i:05d}",
                input_files=[f"in-{i}"],
                n_rows=10,
                bytes_out=100,
                status="completed",
                written_at=f"{day}T00:00:00+00:00",
            )
        )
    from datetime import datetime, timezone

    now = datetime(2026, 3, 10, tzinfo=timezone.utc)
    # retention 60d evicts only the january partition
    plan = eviction_plan(out_dir, retention_days=60, now=now)
    assert plan == ["part-00000"]
    # budget 150 bytes additionally evicts the next-oldest
    plan = eviction_plan(out_dir, retention_days=60, max_total_bytes=150, now=now)
    assert plan == ["part-00000", "part-00001"]
    # protection skips the protected partition; budget still enforced by
    # evicting the next-oldest unprotected one (just-written exclusion, D3)
    plan = eviction_plan(
        out_dir, retention_days=60, max_total_bytes=150, now=now,
        protect={"part-00001"},
    )
    assert plan == ["part-00000", "part-00002"]

    apply_eviction(out_dir, ["part-00000"])
    assert not os.path.exists(os.path.join(out_dir, "part-00000"))
    assert Manifest(out_dir).completed_ids() == {"part-00001", "part-00002"}


def test_maintenance_cli(out_dir):
    """CLI mirror of the reference cleanup entrypoint: dry-run plan, then
    --apply deletes."""
    import io
    import json as _json
    from contextlib import redirect_stdout

    from docling_service_ray.pipelines.maintenance import main
    from docling_service_ray.state.manifest import Manifest, PartitionRecord

    man = Manifest(out_dir)
    for i, day in enumerate(["2026-01-01", "2026-02-01"]):
        os.makedirs(os.path.join(out_dir, f"part-{i:05d}"), exist_ok=True)
        man.write(
            PartitionRecord(
                partition_id=f"part-{i:05d}", bytes_out=100,
                status="completed", written_at=f"{day}T00:00:00+00:00",
            )
        )
    buf = io.StringIO()
    with redirect_stdout(buf):
        main([out_dir, "--max-total-mb", str(150 / 1024 / 1024)])
    assert _json.loads(buf.getvalue()) == {"plan": ["part-00000"]}
    assert os.path.isdir(os.path.join(out_dir, "part-00000"))  # dry run

    buf = io.StringIO()
    with redirect_stdout(buf):
        main([out_dir, "--max-total-mb", str(150 / 1024 / 1024), "--apply"])
    assert _json.loads(buf.getvalue()) == {"evicted": ["part-00000"]}
    assert not os.path.isdir(os.path.join(out_dir, "part-00000"))


def test_manifest_torn_write_ignored(out_dir):
    from docling_service_ray.state.manifest import Manifest, PartitionRecord

    man = Manifest(out_dir)
    man.write(PartitionRecord(partition_id="part-00000", status="completed"))
    # simulate a torn write
    with open(os.path.join(out_dir, "_manifest", "part-00001.json"), "w") as f:
        f.write('{"partition_id": "part-0')
    assert man.completed_ids() == {"part-00000"}
