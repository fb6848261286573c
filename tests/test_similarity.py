"""Similarity-search tests: brute-force exactness vs a numpy reference,
IVF recall floor."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def emb(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(11)
    vecs = rng.standard_normal((200, 32)).astype(np.float64)
    rows = [
        {"vec_id": i, "embedding": vecs[i].astype(np.float32).tolist()}
        for i in range(len(vecs))
    ]
    # reference uses the SAME float32-rounded values the dataset carries
    return rd.from_items(rows), np.stack([np.array(r["embedding"], dtype=np.float64) for r in rows])


def _exact_topk(vecs, qid, k):
    q = vecs[qid] / np.linalg.norm(vecs[qid])
    m = vecs / np.linalg.norm(vecs, axis=1)[:, None]
    sims = m @ q
    sims[qid] = -np.inf
    order = np.lexsort((np.arange(len(sims)), -sims))
    return order[:k].tolist()


def test_brute_force_topk_exact(emb):
    from docling_service_ray.stages.similarity import brute_force_topk

    ds, vecs = emb
    out = brute_force_topk(ds, [0, 5, 9], k=8).to_pandas()
    for qid in (0, 5, 9):
        got = (
            out[out["query_id"] == qid]
            .sort_values("rank")["neighbor_id"]
            .tolist()
        )
        assert got == _exact_topk(vecs, qid, 8)


def test_ivf_topk_recall(emb):
    from docling_service_ray.stages.similarity import ivf_topk

    ds, vecs = emb
    out = ivf_topk(ds, [0, 5, 9], k=8, n_centroids=8, nprobe=4).to_pandas()
    recalls = []
    for qid in (0, 5, 9):
        got = set(out[out["query_id"] == qid]["neighbor_id"])
        exact = set(_exact_topk(vecs, qid, 8))
        recalls.append(len(got & exact) / 8)
    assert np.mean(recalls) >= 0.5, recalls


def test_ivf_deterministic(emb):
    from docling_service_ray.stages.similarity import ivf_topk

    ds, _ = emb
    a = ivf_topk(ds, [3], k=5).to_pandas().sort_values("rank")
    b = ivf_topk(ds, [3], k=5).to_pandas().sort_values("rank")
    assert a["neighbor_id"].tolist() == b["neighbor_id"].tolist()
