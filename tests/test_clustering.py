"""Distributed k-means + SemDeDup vs planted ground truth."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _blob_table(n_blobs=3, per_blob=40, dim=8, spread=0.05, sep=10.0, seed=3):
    """Well-separated Gaussian blobs; returns (table, true_labels)."""
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(n_blobs, dim)) * sep
    vecs, labels = [], []
    for b in range(n_blobs):
        pts = centers[b] + rng.normal(size=(per_blob, dim)) * spread
        vecs.extend(pts.astype(np.float32).tolist())
        labels.extend([b] * per_blob)
    ids = list(range(len(vecs)))
    return (
        pa.table({"vec_id": pa.array(ids, pa.int64()),
                  "embedding": pa.array(vecs, pa.list_(pa.float32()))}),
        np.array(labels),
    )


def test_kmeans_recovers_planted_blobs(ray_session):
    import ray.data as rd

    from docling_service_ray.stages.clustering import kmeans_assign, kmeans_fit

    tbl, truth = _blob_table()
    ds = rd.from_arrow(tbl)
    cents, hist = kmeans_fit(ds, 3, iters=10)
    assert len(hist) >= 1
    assert all(b <= a * (1 + 1e-9) for a, b in zip(hist, hist[1:]))

    adf = kmeans_assign(ds, cents).to_pandas().sort_values("vec_id")
    # the found partition must equal the planted partition (up to
    # cluster relabelling): every blob maps to exactly one cluster id
    got = adf["cluster"].to_numpy()
    mapping = {}
    for t, g in zip(truth, got):
        assert mapping.setdefault(t, g) == g, "blob split across clusters"
    assert len(set(mapping.values())) == 3, "clusters merged"
    assert (adf["dist2"] >= 0).all()


def test_kmeans_deterministic(ray_session):
    import ray.data as rd

    from docling_service_ray.stages.clustering import kmeans_fit

    tbl, _ = _blob_table(seed=9)
    c1, h1 = kmeans_fit(rd.from_arrow(tbl), 3, iters=6)
    c2, h2 = kmeans_fit(rd.from_arrow(tbl), 3, iters=6)
    np.testing.assert_array_equal(c1, c2)
    assert h1 == h2


def test_semantic_dedup_drops_planted_copies(ray_session):
    import ray.data as rd

    from docling_service_ray.stages.clustering import semantic_dedup

    rng = np.random.default_rng(17)
    base = rng.normal(size=(60, 16))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    ids, vecs = [], []
    for i, v in enumerate(base):
        ids.append(i)
        vecs.append(v.astype(np.float32).tolist())
        if i % 5 == 0:  # planted near-identical copy
            ids.append(1000 + i)
            w = v + rng.normal(size=16) * 1e-3
            vecs.append((w / np.linalg.norm(w)).astype(np.float32).tolist())
    ds = rd.from_arrow(
        pa.table({"vec_id": pa.array(ids, pa.int64()),
                  "embedding": pa.array(vecs, pa.list_(pa.float32()))})
    )
    out = semantic_dedup(ds, k=4, threshold=0.98).to_pandas()
    assert len(out) == len(ids)
    by_id = out.set_index("vec_id")
    for i in range(0, 60, 5):
        assert not by_id.loc[1000 + i, "keep"], i
        assert by_id.loc[1000 + i, "dup_of"] == i
        assert by_id.loc[i, "keep"]
    # random unit vectors in 16-dim essentially never hit cos >= 0.98
    dropped = set(out.loc[~out["keep"], "vec_id"])
    assert dropped == {1000 + i for i in range(0, 60, 5)}
