"""Similarity search over an embedding column (list<float>).

Baseline: brute-force cosine top-k — one float64 matmul per batch against
a broadcast query matrix (``ray.put`` once, read per actor), partial top-k
per batch, tiny final reduce per query. No all-to-all shuffle: the only
grouped stage sees k rows per (query, batch), not the corpus.

Scale path: IVF — deterministic k-means-lite coarse quantizer fit on a
sample, vectors assigned to inverted lists (a bucket column), queries probe
the nprobe nearest lists only.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..functions.hashing import stable_seed


def _normalize(mat: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(mat, axis=1)
    n[n == 0] = 1.0
    return mat / n[:, None]


def _take_queries(ds, qset, id_col) -> pd.DataFrame:
    """Materialize just the query vectors (vectorized is_in filter)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    vals = pa.array(qset, pa.int64())
    flt = ds.map_batches(
        lambda t: t.filter(pc.is_in(pc.cast(t[id_col], pa.int64()), value_set=vals)),
        batch_format="pyarrow",
    )
    return (
        flt.select_columns([id_col, "embedding"])
        .to_pandas()
        .sort_values(id_col)
        .reset_index(drop=True)
    )


def brute_force_topk(ds, query_ids, k: int = 10, *, id_col: str = "vec_id"):
    """Exact cosine top-k for each query id (queries drawn from ds itself).

    Returns a Dataset of (query_id, neighbor_id, rank) with rank 1..k,
    self-matches excluded, ties broken by neighbor_id ascending.
    """
    import ray

    qset = sorted(int(q) for q in query_ids)
    qdf = _take_queries(ds, qset, id_col)
    qids = qdf[id_col].to_numpy()
    qmat = _normalize(np.stack(qdf["embedding"].to_numpy()).astype(np.float64))
    qref = ray.put((qids, qmat))

    def partial_topk(batch: pd.DataFrame) -> pd.DataFrame:
        q_ids, q_mat = ray.get(qref)
        bids = batch[id_col].to_numpy()
        bmat = _normalize(np.stack(batch["embedding"].to_numpy()).astype(np.float64))
        sims = q_mat @ bmat.T  # (nq, nb)
        out_q, out_n, out_s = [], [], []
        kk = min(k + 1, sims.shape[1])  # +1 headroom for self-match
        for qi in range(sims.shape[0]):
            row = sims[qi]
            idx = np.argpartition(-row, kk - 1)[:kk]
            # deterministic order: sim desc, neighbor_id asc
            order = np.lexsort((bids[idx], -row[idx]))
            idx = idx[order]
            out_q.extend([q_ids[qi]] * len(idx))
            out_n.extend(bids[idx].tolist())
            out_s.extend(row[idx].tolist())
        return pd.DataFrame(
            {"query_id": out_q, "neighbor_id": out_n, "sim": out_s}
        )

    partials = ds.map_batches(partial_topk, batch_format="pandas", batch_size=4096)

    def final_topk(group: pd.DataFrame) -> pd.DataFrame:
        qid = int(group["query_id"].iloc[0])
        g = group[group["neighbor_id"] != qid]
        g = g.sort_values(["sim", "neighbor_id"], ascending=[False, True]).head(k)
        return pd.DataFrame(
            {
                "query_id": np.full(len(g), qid, dtype="int64"),
                "neighbor_id": g["neighbor_id"].to_numpy().astype("int64"),
                "rank": np.arange(1, len(g) + 1, dtype="int64"),
            }
        )

    return partials.groupby("query_id").map_groups(final_topk, batch_format="pandas")


def fit_ivf_centroids(ds, n_centroids: int = 16, iters: int = 5, sample_n: int = 2048):
    """Deterministic k-means-lite on a driver-side sample (the coarse
    quantizer is tiny, model-fit once, broadcast — converter-cache pattern)."""
    sample = ds.select_columns(["embedding"]).limit(sample_n).to_pandas()
    mat = _normalize(np.stack(sample["embedding"].to_numpy()).astype(np.float64))
    rng = stable_seed("ivf", n_centroids)
    idx = rng.choice(len(mat), size=min(n_centroids, len(mat)), replace=False)
    cents = mat[np.sort(idx)].copy()
    for _ in range(iters):
        assign = np.argmax(mat @ cents.T, axis=1)
        for c in range(len(cents)):
            members = mat[assign == c]
            if len(members):
                v = members.mean(axis=0)
                nv = np.linalg.norm(v)
                if nv > 0:
                    cents[c] = v / nv
    return cents


def ivf_topk(ds, query_ids, k: int = 10, *, id_col: str = "vec_id",
             n_centroids: int = 16, nprobe: int = 8):
    """IVF-bucketed approximate top-k: assign every vector to its nearest
    centroid (bucket column), then scan only the nprobe closest buckets per
    query. Approximate by construction; recall depends on nprobe.

    Measured recall@10 on the synthetic (unclustered, worst-case) 64-dim
    corpus at 16 centroids: nprobe 4 -> 0.54, 6 -> 0.72, 8 -> 0.84,
    10 -> 0.90. Real embedding corpora cluster, shifting the whole curve
    up; the default probes half the lists for a scan cost of ~n/2."""
    import ray

    cents = fit_ivf_centroids(ds, n_centroids)
    cref = ray.put(cents)

    qset = sorted(int(q) for q in query_ids)
    qdf = _take_queries(ds, qset, id_col)
    qids = qdf[id_col].to_numpy()
    qmat = _normalize(np.stack(qdf["embedding"].to_numpy()).astype(np.float64))
    # buckets each query probes
    probe = np.argsort(-(qmat @ cents.T), axis=1)[:, :nprobe]
    probe_map: dict[int, list[int]] = {}
    for qi, buckets in zip(qids, probe):
        for b in buckets:
            probe_map.setdefault(int(b), []).append(int(qi))
    qref = ray.put((dict(zip(qids.tolist(), qmat)), probe_map))

    def assign(batch: pd.DataFrame) -> pd.DataFrame:
        c = ray.get(cref)
        mat = _normalize(np.stack(batch["embedding"].to_numpy()).astype(np.float64))
        bucket = np.argmax(mat @ c.T, axis=1).astype("int64")
        return pd.DataFrame(
            {
                id_col: batch[id_col].to_numpy(),
                "bucket": bucket,
                "embedding": batch["embedding"],
            }
        )

    bucketed = ds.map_batches(assign, batch_format="pandas")

    def scan_bucket(group: pd.DataFrame) -> pd.DataFrame:
        qvecs, pm = ray.get(qref)
        bucket = int(group["bucket"].iloc[0])
        queries = pm.get(bucket, [])
        if not queries:
            return pd.DataFrame(
                {"query_id": [], "neighbor_id": [], "sim": []}
            ).astype({"query_id": "int64", "neighbor_id": "int64", "sim": "float64"})
        ids = group[id_col].to_numpy()
        mat = _normalize(np.stack(group["embedding"].to_numpy()).astype(np.float64))
        out_q, out_n, out_s = [], [], []
        for q in queries:
            sims = mat @ qvecs[q]
            kk = min(k + 1, len(sims))
            idx = np.argpartition(-sims, kk - 1)[:kk]
            out_q.extend([q] * len(idx))
            out_n.extend(ids[idx].tolist())
            out_s.extend(sims[idx].tolist())
        return pd.DataFrame({"query_id": out_q, "neighbor_id": out_n, "sim": out_s})

    partials = bucketed.groupby("bucket").map_groups(scan_bucket, batch_format="pandas")

    def final_topk(group: pd.DataFrame) -> pd.DataFrame:
        qid = int(group["query_id"].iloc[0])
        g = group[group["neighbor_id"] != qid]
        g = g.sort_values(["sim", "neighbor_id"], ascending=[False, True]).head(k)
        return pd.DataFrame(
            {
                "query_id": np.full(len(g), qid, dtype="int64"),
                "neighbor_id": g["neighbor_id"].to_numpy().astype("int64"),
                "rank": np.arange(1, len(g) + 1, dtype="int64"),
            }
        )

    return partials.groupby("query_id").map_groups(final_topk, batch_format="pandas")
