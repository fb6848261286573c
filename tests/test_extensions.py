"""User-extension surface tests: format registry, pluggable sink,
completion hook (SURVEY.md §2.10)."""

import os
import shutil

import pytest


def test_register_format_roundtrip():
    from docling_service_ray.extract import core

    def probe(text):
        return text.startswith("@@CSV@@")

    def extractor(text):
        rows = [ln for ln in text.split("\n")[1:] if ln.strip()]
        blocks = ["| " + " | ".join(r.split(",")) + " |" for r in rows]
        return ["\n".join(blocks)], [(0, len(text), "table")], 0

    core.register_format("csvish", probe, extractor)
    try:
        r = core.extract_turn("@@CSV@@\na,b\nc,d")
        assert r.extractor_path == "csvish"
        assert r.extracted_text == "| a | b |\n| c | d |"
        # built-in routing untouched
        assert core.extract_turn("plain text here").extractor_path == "plain"
    finally:
        core._FORMAT_PROBES[:] = [p for p in core._FORMAT_PROBES if p[0] != "csvish"]
        core._EXTRACTORS.pop("csvish", None)


def test_write_output_local_fs(ray_session):
    import ray.data as rd

    from docling_service_ray.sources.sinks import make_filesystem, write_output

    out = "/tmp/graft_test_sink"
    shutil.rmtree(out, ignore_errors=True)
    ds = rd.from_items([{"a": i} for i in range(10)])
    write_output(ds, out, filesystem=make_filesystem("local"))
    assert rd.read_parquet(out).count() == 10
    shutil.rmtree(out, ignore_errors=True)


def test_make_filesystem_s3_constructible():
    # endpoint-override S3 path (R2 analog) must construct without network
    from docling_service_ray.sources.sinks import make_filesystem

    fs = make_filesystem(
        "s3",
        endpoint_override="https://example.invalid",
        access_key="x",
        secret_key="y",
    )
    assert fs is not None
    with pytest.raises(ValueError):
        make_filesystem("gopher")


def test_completion_hook(ray_session):
    from docling_service_ray.state import run_checkpointed
    from docling_service_ray.transcripts import ensure_transcripts

    d = ensure_transcripts("/root/testdata/sf0.001")
    files = [os.path.join(d, f) for f in sorted(os.listdir(d)) if f.endswith(".parquet")]
    out = "/tmp/graft_test_hook"
    shutil.rmtree(out, ignore_errors=True)
    seen = []
    run_checkpointed(
        files[:2], out, lambda ds: ds.select_columns(["conv_id", "turn_idx"]),
        n_partitions=2, error_col=None,
        on_partition_complete=lambda rec: seen.append(rec.partition_id),
    )
    assert seen == ["part-00000", "part-00001"]
    shutil.rmtree(out, ignore_errors=True)
