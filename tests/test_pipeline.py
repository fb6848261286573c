"""End-to-end flagship pipeline tests: pipeline output must equal the
pure-Python oracle byte-for-byte per turn, under stable (conv_id,
turn_idx) ordering (the north-rule invariant)."""

import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def extracted(ray_session):
    from docling_service_ray.pipelines.extract_pipeline import extracted_turns_sorted

    return extracted_turns_sorted(SF).to_pandas()


def test_oracle_equality(extracted):
    from docling_service_ray.transcripts import oracle_frame

    oracle = oracle_frame(SF)
    got = extracted.reset_index(drop=True)
    assert len(got) == len(oracle)
    assert list(got["conv_id"]) == list(oracle["conv_id"])
    assert list(got["turn_idx"]) == list(oracle["turn_idx"])
    # byte-for-byte per-turn text equality
    mismatches = [
        i
        for i, (a, b) in enumerate(zip(got["extracted_text"], oracle["extracted_text"]))
        if a != b
    ]
    assert mismatches == [], f"first mismatch row {mismatches[:3]}"
    assert list(got["ok"]) == list(oracle["ok"])


def test_ordering_restored_not_inherited(ray_session):
    # the generator writes turns SHUFFLED; raw read must be out of order
    from docling_service_ray.pipelines.extract_pipeline import read_transcripts

    raw = read_transcripts(SF).to_pandas()
    conv = raw[raw["conv_id"] == "conv-0000001"]["turn_idx"].tolist()
    assert conv != sorted(conv), "fixture must not be pre-sorted"


def test_stitch_documents(ray_session):
    from docling_service_ray.pipelines.extract_pipeline import stitch_pipeline
    from docling_service_ray.transcripts import n_turns_for

    docs = stitch_pipeline(SF).to_pandas().set_index("conv_id")
    # one row per conversation
    assert len(docs) == 50
    # mega conversation stitched across salt chunks, all turns present
    mega = docs.loc["conv-0000000"]
    assert mega["n_turns"] == n_turns_for(0) == 400
    body = mega["document"]
    # turn markers in ascending order
    import re

    markers = [int(m) for m in re.findall(r"<!-- Turn (\d+) \(", body)]
    assert markers == sorted(markers)
    assert markers[0] == 0 and markers[-1] == 399
    # metadata block framing is byte-exact
    assert "<!-- DOCLING_METADATA_START -->" in body
    assert body.rstrip().endswith("<!-- DOCLING_METADATA_END -->")
    assert '"total_turns": 400' in body


def test_stitch_variants_identical(ray_session):
    """The fast hash-bucket stitch and the salted two-level groupby stitch
    must produce byte-identical documents."""
    from docling_service_ray.pipelines.extract_pipeline import extract_pipeline
    from docling_service_ray.stages.stitch import (
        stitch_conversations,
        stitch_conversations_salted,
    )

    ds = extract_pipeline(SF)
    a = (
        stitch_conversations(ds, n_buckets=7)  # odd bucket count on purpose
        .to_pandas()
        .sort_values("conv_id")
        .reset_index(drop=True)
    )
    b = (
        stitch_conversations_salted(ds)
        .to_pandas()
        .sort_values("conv_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)


def test_extract_mode_equivalence(ray_session):
    """Task-mode extraction (used by the stitch path so the shuffle
    streams) must equal actor-mode output exactly."""
    from docling_service_ray.pipelines.extract_pipeline import extract_pipeline

    cols = ["conv_id", "turn_idx", "extracted_text", "ok"]
    a = (
        extract_pipeline(SF, mode="actors", concurrency=2)
        .select_columns(cols).to_pandas()
        .sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    )
    b = (
        extract_pipeline(SF, mode="tasks")
        .select_columns(cols).to_pandas()
        .sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)


def test_extract_resource_plumbing():
    """ST2 analog (reference app/main.py:161-180): GPU/resource overrides
    must flow into the constructed map_batches kwargs so the stage is
    cluster-placeable (sandbox has no GPU to exercise)."""
    from docling_service_ray.stages.extract_stage import (
        ExtractTurns,
        build_extract_kwargs,
        extract_batch,
    )

    kw = build_extract_kwargs(num_gpus=0.5, resources={"extractor_node": 1},
                              concurrency=4)
    assert kw["fn"] is ExtractTurns
    assert kw["num_gpus"] == 0.5
    assert kw["resources"] == {"extractor_node": 1}
    assert kw["concurrency"] == 4
    assert kw["batch_format"] == "pyarrow" and kw["zero_copy_batch"]

    kw_t = build_extract_kwargs(mode="tasks")
    assert kw_t["fn"] is extract_batch
    assert "concurrency" not in kw_t  # task pool: no actor reservation


def test_parallelism_invariance(ray_session):
    """Same result at different batch sizes / concurrency (determinism
    across execution plans — the single-node stand-in for cluster-size
    invariance)."""
    from docling_service_ray.pipelines.extract_pipeline import extract_pipeline

    a = (
        extract_pipeline(SF, concurrency=2, batch_size=64)
        .select_columns(["conv_id", "turn_idx", "extracted_text"])
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    b = (
        extract_pipeline(SF, concurrency=3, batch_size=512)
        .select_columns(["conv_id", "turn_idx", "extracted_text"])
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)


def test_stitch_auto_routes_mega_conversation(ray_session):
    """Flagship auto-route (VERDICT r04 #7): the sf0.001 fixture plants a
    mega conversation (conv-0000000, 400 of 7672 turns ~ 5.2% >> the
    half-bucket threshold), so the conv_id profiling pass must pick the
    salted plan — and the auto output must be byte-identical to the
    forced hash-bucket plan."""
    from docling_service_ray.pipelines.extract_pipeline import (
        stitch_pipeline,
        stitch_route,
    )

    route, megas = stitch_route(SF)
    assert route == "salted"
    assert "conv-0000000" in megas

    auto = (
        stitch_pipeline(SF, route="auto")
        .to_pandas().sort_values("conv_id").reset_index(drop=True)
    )
    forced_hash = (
        stitch_pipeline(SF, route="hash")
        .to_pandas().sort_values("conv_id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(auto, forced_hash)


def test_mega_candidates_uniform_corpus_routes_hash(ray_session):
    """No conversation near the half-bucket threshold -> empty candidate
    set -> the default hash-bucket stitch; one planted giant flips it,
    and detection recall is guaranteed (it MUST appear)."""
    import numpy as np
    import ray

    from docling_service_ray.stages.stitch import mega_conversation_candidates

    uniform = pd.DataFrame(
        {"conv_id": np.repeat([f"c{i:04d}" for i in range(200)], 10)}
    )
    ds = ray.data.from_pandas(uniform).repartition(5)
    assert mega_conversation_candidates(ds, n_buckets=64) == []

    planted = pd.concat(
        [uniform, pd.DataFrame({"conv_id": ["mega"] * 900})],
        ignore_index=True,
    )
    ds2 = ray.data.from_pandas(planted).repartition(5)
    assert "mega" in mega_conversation_candidates(ds2, n_buckets=64)
