"""Distributed k-means and SemDeDup-style semantic deduplication.

The reference has no clustering at all (its only grouping is the exact
content-hash dict, ``scripts/r2_migrate_xxhash.py:171``); these are
engine-completeness operators a 100 TB training-data pipeline needs:
k-means is the coarse quantizer behind IVF ANN and the partitioner
behind SemDeDup ("Semantic deduplication" — cluster embeddings, then
drop near-identical members within each cluster, keeping one).

Scale shape (Lloyd iterations, the MPI/Spark formulation):

- **init**: deterministic k-means++ on a driver-side sample — the
  standard scalable init; the sample (``sample_n`` rows) is the only
  full vector set the driver ever holds.
- **each iteration**: centroids are ``ray.put`` ONCE and read map-side;
  every block computes its assignment locally and emits k partial rows
  (per-centroid vector sum + count + inertia) — a map-only pass whose
  driver-collected volume is O(blocks × k × dim), independent of n.
  No shuffle anywhere in the loop.
- **assignment/semantic-dedup**: one more map with the broadcast
  centroids; SemDeDup's within-cluster pairwise scan runs per cluster
  via ``groupby(cluster).map_groups`` — cardinality k (small, safe for
  per-group dispatch), but group SIZE is n/k, so k must scale with the
  corpus (SemDeDup's own regime: k ≈ n/5000) to bound the O((n/k)²·dim)
  per-group work and memory.

Determinism: float sums are accumulated in a sorted (centroid, block)
order so repeated runs bit-match; ties in assignment break to the lowest
centroid id (argmin).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.hashing import stable_seed

_EMPTY_DROP = "drop"
_EMPTY_KEEP = "keep"


def _kmeanspp_init(X: np.ndarray, k: int, rng: np.random.Generator) -> np.ndarray:
    """Classic k-means++ seeding on the (driver-side) sample."""
    n = len(X)
    first = int(rng.integers(n))
    cents = [X[first]]
    d2 = ((X - cents[0]) ** 2).sum(axis=1)
    for _ in range(1, min(k, n)):
        total = d2.sum()
        if total <= 0:
            idx = int(rng.integers(n))
        else:
            idx = int(rng.choice(n, p=d2 / total))
        cents.append(X[idx])
        d2 = np.minimum(d2, ((X - cents[-1]) ** 2).sum(axis=1))
    return np.stack(cents)


def _assign_block(X: np.ndarray, cents: np.ndarray):
    """(assignment, squared distance) for a block — one BLAS matmul."""
    d = (
        (X ** 2).sum(axis=1)[:, None]
        - 2.0 * (X @ cents.T)
        + (cents ** 2).sum(axis=1)[None, :]
    )
    a = d.argmin(axis=1)
    return a, np.maximum(d[np.arange(len(a)), a], 0.0)


def kmeans_fit(ds, k: int, *, vec_col: str = "embedding", iters: int = 10,
               sample_n: int = 4096, tol: float = 1e-6,
               seed_tag: str = "kmeans"):
    """Lloyd k-means over a Dataset vector column.

    Returns ``(centroids ndarray [k, dim], inertia_history list[float])``.
    Each iteration is one map-only pass over the full dataset (see module
    docstring); empty clusters keep their previous centroid.
    """
    import ray

    sample = ds.select_columns([vec_col]).limit(sample_n).to_pandas()
    X0 = np.stack(sample[vec_col].to_numpy()).astype(np.float64)
    cents = _kmeanspp_init(X0, k, stable_seed(seed_tag, k, len(X0)))
    k_eff, dim = cents.shape

    _FAN = 64

    @ray.remote
    def fold(chunk_idx: int, *tbls):
        """Deterministic partial-sum fold: concatenate, sort by
        (cid, bid), reduce per cid in that fixed order, re-tag with the
        chunk index so the next tree level keeps a total order. Output is
        k rows regardless of input size — the fan-in bounds task memory."""
        df = pd.concat([t.to_pandas() for t in tbls]).sort_values(
            ["cid", "bid"], kind="mergesort")
        rows = []
        for cid, g in df.groupby("cid", sort=True):
            rows.append({
                "cid": int(cid),
                "bid": int(chunk_idx),
                "count": int(g["count"].sum()),
                "inertia": float(np.add.reduce(g["inertia"].to_numpy())),
                "vsum": np.add.reduce(np.stack(g["vsum"].to_numpy())),
            })
        out = pd.DataFrame(rows)
        import pyarrow as pa

        return pa.table({
            "cid": pa.array(out["cid"].to_numpy(), pa.int64()),
            "bid": pa.array(out["bid"].to_numpy(), pa.int64()),
            "count": pa.array(out["count"].to_numpy(), pa.int64()),
            "inertia": pa.array(out["inertia"].to_numpy(), pa.float64()),
            "vsum": pa.array([list(v) for v in out["vsum"]],
                             pa.list_(pa.float64())),
        })

    history: list[float] = []
    for _ in range(iters):
        cref = ray.put(cents)

        def partial(df: pd.DataFrame) -> pd.DataFrame:
            C = ray.get(cref)
            X = np.stack(df[vec_col].to_numpy()).astype(np.float64)
            a, d2 = _assign_block(X, C)
            sums = np.zeros((len(C), X.shape[1]))
            np.add.at(sums, a, X)
            counts = np.bincount(a, minlength=len(C)).astype(np.int64)
            inert = np.zeros(len(C))
            np.add.at(inert, a, d2)
            # block id: stable content hash so the driver-side reduce can
            # sum floats in a deterministic order regardless of task order
            bid = hash((len(X), round(float(X[0, 0]), 9),
                        round(float(X[-1, -1]), 9))) & 0x7FFFFFFF
            return pd.DataFrame({
                "cid": np.arange(len(C), dtype=np.int64),
                "bid": np.full(len(C), bid, dtype=np.int64),
                "count": counts,
                "inertia": inert,
                "vsum": list(sums),
            })

        # distributed deterministic tree fold: per-block partials reduce
        # through fixed-fan-in tasks (each sorts by (cid, bid) before
        # summing), so the driver receives exactly k rows per round —
        # never the k x n_blocks partial table — and the float fold
        # order is a pure function of the block layout
        level = ds.map_batches(partial, batch_format="pandas").to_arrow_refs()
        while len(level) > 1:
            level = [
                fold.remote(i, *level[i * _FAN:(i + 1) * _FAN])
                for i in range(-(-len(level) // _FAN))
            ]
        parts = ray.get(fold.remote(0, *level)).to_pandas()
        parts = parts.sort_values("cid", kind="mergesort")
        new_cents = cents.copy()
        inertia = float(np.add.reduce(parts["inertia"].to_numpy()))
        for cid, cnt, vsum in zip(parts["cid"], parts["count"],
                                  parts["vsum"]):
            if cnt > 0:
                new_cents[cid] = np.asarray(vsum) / int(cnt)
        history.append(inertia)
        done = (
            len(history) >= 2
            and abs(history[-2] - history[-1]) <= tol * max(history[-2], 1e-12)
        )
        cents = new_cents
        if done:
            break
    return cents, history


def kmeans_assign(ds, centroids: np.ndarray, *, id_col: str = "vec_id",
                  vec_col: str = "embedding"):
    """``(id, cluster, dist2)`` — map-only assignment against broadcast
    centroids (ray.put once, read per block)."""
    import ray

    cref = ray.put(np.asarray(centroids, dtype=np.float64))

    def assign(df: pd.DataFrame) -> pd.DataFrame:
        C = ray.get(cref)
        X = np.stack(df[vec_col].to_numpy()).astype(np.float64)
        a, d2 = _assign_block(X, C)
        return pd.DataFrame({
            id_col: df[id_col].to_numpy(),
            "cluster": a.astype(np.int64),
            "dist2": d2,
        })

    return ds.map_batches(assign, batch_format="pandas")


def semantic_dedup(ds, *, k: int = 16, threshold: float = 0.95,
                   id_col: str = "vec_id", vec_col: str = "embedding",
                   iters: int = 5):
    """SemDeDup: k-means partition, then within each cluster greedily
    drop members whose cosine similarity to an already-kept member is
    ``>= threshold`` (keep order: ascending id, so the smallest id of a
    near-identical set survives).

    Returns ``(id, cluster, keep, dup_of)`` for every input row;
    ``dup_of`` is -1 for kept rows. Near-identical vectors land in the
    same cluster with overwhelming probability (they are ~the same
    point), which is the SemDeDup bet — pairs split across a centroid
    boundary are missed, the documented recall trade of the method.
    """
    cents, _ = kmeans_fit(ds, k, vec_col=vec_col, iters=iters,
                          seed_tag="semdedup")
    import ray

    cref = ray.put(np.asarray(cents, dtype=np.float64))

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        C = ray.get(cref)
        X = np.stack(df[vec_col].to_numpy()).astype(np.float64)
        a, _ = _assign_block(X, C)
        return pd.DataFrame({
            id_col: df[id_col].to_numpy(),
            "cluster": a.astype(np.int64),
            vec_col: df[vec_col].to_numpy(),
        })

    tagged = ds.map_batches(tag, batch_format="pandas")

    def dedup_cluster(grp: pd.DataFrame) -> pd.DataFrame:
        grp = grp.sort_values(id_col, kind="mergesort")
        X = np.stack(grp[vec_col].to_numpy()).astype(np.float64)
        norms = np.linalg.norm(X, axis=1)
        norms[norms == 0] = 1.0
        Xn = X / norms[:, None]
        ids = grp[id_col].to_numpy()
        m = len(ids)
        keep = np.ones(m, dtype=bool)
        dup_of = np.full(m, -1, dtype=np.int64)
        for i in range(m):
            if not keep[i]:
                continue
            # one vectorized row: kill every later, still-kept near-dup
            sims = Xn[i + 1:] @ Xn[i]
            hit = np.flatnonzero(sims >= threshold) + i + 1
            hit = hit[keep[hit]]
            keep[hit] = False
            dup_of[hit] = ids[i]
        return pd.DataFrame({
            id_col: ids,
            "cluster": grp["cluster"].to_numpy(),
            "keep": keep,
            "dup_of": np.where(keep, np.int64(-1), dup_of),
        })

    return tagged.groupby("cluster").map_groups(
        dedup_cluster, batch_format="pandas"
    )
