"""Multimodal plumbing tests: binary payload schema, decode stage, size
filters, frame sampling (codec is the deterministic fake — see stage
docstring)."""

import pyarrow as pa
import pytest


@pytest.fixture(scope="module")
def payload_ds(ray_session):
    import ray.data as rd

    from docling_service_ray.stages.multimodal import attach_payload_batch

    rows = [
        {"doc_id": 0, "text": "short"},
        {"doc_id": 1, "text": "a much longer text " * 50},
        {"doc_id": 2, "text": ""},
    ]
    return rd.from_items(rows).map_batches(
        attach_payload_batch, batch_format="pyarrow"
    )


def test_payload_schema(payload_ds):
    schema = payload_ds.schema()
    assert schema.base_schema.field("payload").type == pa.binary()


def test_decode_metadata(payload_ds):
    from docling_service_ray.stages.multimodal import DecodeImage

    out = payload_ds.map_batches(
        DecodeImage, batch_format="pyarrow", concurrency=1
    ).to_pandas()
    assert out["decode_ok"].all()
    metas = out.sort_values("doc_id")["image_meta"].tolist()
    assert all(m["width"] >= 32 and m["height"] >= 32 for m in metas)
    assert all(m["codec"] == "fakeimg" for m in metas)
    # determinism: same text -> same checksum
    from docling_service_ray.stages.multimodal import encode_fake_image

    assert (
        encode_fake_image("x", 40, 40) == encode_fake_image("x", 40, 40)
    )


def test_decode_unknown_codec(ray_session):
    import ray.data as rd

    from docling_service_ray.stages.multimodal import DecodeImage

    bad = rd.from_items([{"doc_id": 9, "payload": b"\x00notanimage"}])
    out = bad.map_batches(DecodeImage, batch_format="pyarrow", concurrency=1).to_pandas()
    assert not out["decode_ok"].iloc[0]
    assert "NotImplementedError" in out["decode_error"].iloc[0]


def test_resize_filter(ray_session):
    import ray.data as rd

    from docling_service_ray.stages.multimodal import (
        DecodeImage,
        ResizeFilter,
        encode_fake_image,
    )

    rows = [
        {"doc_id": 0, "payload": encode_fake_image("big", 200, 200)},
        {"doc_id": 1, "payload": encode_fake_image("tiny", 49, 200)},  # < 50px
        {"doc_id": 2, "payload": encode_fake_image("thin", 50, 50)},   # at threshold
    ]
    ds = rd.from_items(rows).map_batches(
        DecodeImage, batch_format="pyarrow", concurrency=1
    )
    kept = (
        ds.map_batches(ResizeFilter, batch_format="pyarrow", concurrency=1)
        .to_pandas()["doc_id"]
        .tolist()
    )
    # 49px fails min size; 50x50 is AT both thresholds and survives
    # (mirrors the reference's strict < comparisons, app/main.py:574-577)
    assert kept == [0, 2]


def test_frame_sampling(payload_ds):
    from docling_service_ray.stages.multimodal import sample_frames_batch

    out = payload_ds.map_batches(
        lambda t: sample_frames_batch(t, every_n_bytes=64, max_frames=4),
        batch_format="pyarrow",
    ).to_pandas()
    frames = out.sort_values("doc_id")["frames"].tolist()
    assert all(1 <= len(f) <= 4 for f in frames)


def test_feature_extract_stage(ray_session):
    """64-dim L1-normalized byte-histogram features, deterministic,
    composable after decode/filter."""
    import numpy as np
    import ray.data as rd

    from docling_service_ray.stages.multimodal import (
        FeatureExtract,
        attach_payload_batch,
    )

    ds = rd.from_items([{"doc_id": i, "text": f"doc body number {i} " * 20}
                        for i in range(8)])
    with_payload = ds.map_batches(attach_payload_batch, batch_format="pyarrow")
    out = with_payload.map_batches(
        FeatureExtract, batch_format="pyarrow", concurrency=1
    ).to_pandas()
    feats = np.stack([np.asarray(v) for v in out["features"]])
    assert feats.shape == (8, 64)
    assert np.allclose(feats.sum(axis=1), 1.0)  # L1-normalized
    # deterministic: re-running produces identical vectors
    out2 = with_payload.map_batches(
        FeatureExtract, batch_format="pyarrow", concurrency=1
    ).to_pandas()
    feats2 = np.stack([np.asarray(v) for v in out2["features"]])
    assert np.array_equal(feats, feats2)
