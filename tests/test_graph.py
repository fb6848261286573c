"""Distributed connected components vs a local union-find oracle."""

import numpy as np
import pyarrow as pa
import pytest


def _uf_components(edges, nodes):
    """Local union-find: node -> min id of its component."""
    parent = {n: n for n in nodes}
    for a, b in edges:
        parent.setdefault(a, a)
        parent.setdefault(b, b)

    def find(x):
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:
            parent[x], x = root, parent[x]
        return root

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    comp = {}
    for n in parent:
        comp.setdefault(find(n), []).append(n)
    return {n: min(members) for members in comp.values() for n in members}


def _cc_df(edges_tbl, **kw):
    import ray.data as rd

    from docling_service_ray.functions.graph import connected_components

    return (
        connected_components(rd.from_arrow(edges_tbl), **kw)
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )


def test_chain_isolated_and_reps(ray_session):
    import ray.data as rd

    from docling_service_ray.functions.graph import (
        cluster_representatives,
        connected_components,
    )

    edges = pa.table({"a": [1, 2, 3, 5], "b": [0, 1, 2, 4]})
    nodes = rd.from_arrow(pa.table({"id": list(range(7))}))
    comp = connected_components(
        rd.from_arrow(edges), nodes=nodes, node_col="id", id_type=pa.int64()
    )
    df = comp.to_pandas().sort_values("node").reset_index(drop=True)
    assert df["node"].tolist() == list(range(7))
    # chain of 4 needs multiple propagation rounds to reach the far end
    assert df["component"].tolist() == [0, 0, 0, 0, 4, 4, 6]
    reps = sorted(cluster_representatives(comp).to_pandas()["node"])
    assert reps == [0, 4, 6]


def test_random_graph_matches_union_find(ray_session):
    # random edges restricted to id-blocks of 6: components have bounded
    # diameter (<= 5), keeping the round count — and test wall-time — flat
    # while still exercising merges, cycles, and singletons
    rng = np.random.default_rng(7)
    n_blocks, blk = 60, 6
    base = rng.integers(0, n_blocks, 250) * blk
    a = base + rng.integers(0, blk, 250)
    b = base + rng.integers(0, blk, 250)
    keep = a != b
    edge_list = list(zip(a[keep].tolist(), b[keep].tolist()))
    expected = _uf_components(edge_list, nodes=set())

    df = _cc_df(pa.table({"a": a[keep], "b": b[keep]}))
    got = dict(zip(df["node"], df["component"]))
    assert got == expected


def test_random_graph_partitioned_regime(ray_session):
    # broadcast tail disabled: pins the partitioned-state big-frontier
    # regime (edges/labels split once, only pushes move) to union-find
    rng = np.random.default_rng(11)
    n_blocks, blk = 40, 5
    base = rng.integers(0, n_blocks, 150) * blk
    a = base + rng.integers(0, blk, 150)
    b = base + rng.integers(0, blk, 150)
    keep = a != b
    expected = _uf_components(list(zip(a[keep].tolist(), b[keep].tolist())),
                              nodes=set())
    df = _cc_df(pa.table({"a": a[keep], "b": b[keep]}),
                broadcast_frontier_max=0)
    got = dict(zip(df["node"], df["component"]))
    assert got == expected


def test_random_graph_join_fallback_regime(ray_session):
    # both fast regimes disabled: pins the legacy per-round bucketed-join
    # fallback (kept for frontier regrowth) to the same oracle
    rng = np.random.default_rng(11)
    n_blocks, blk = 40, 5
    base = rng.integers(0, n_blocks, 150) * blk
    a = base + rng.integers(0, blk, 150)
    b = base + rng.integers(0, blk, 150)
    keep = a != b
    expected = _uf_components(list(zip(a[keep].tolist(), b[keep].tolist())),
                              nodes=set())
    df = _cc_df(pa.table({"a": a[keep], "b": b[keep]}),
                broadcast_frontier_max=0, use_partitioned=False)
    got = dict(zip(df["node"], df["component"]))
    assert got == expected


def test_string_ids_partitioned_regime(ray_session):
    df = _cc_df(pa.table({"a": ["x", "y", "q"], "b": ["y", "z", "r"]}),
                broadcast_frontier_max=0, n_buckets=3)
    got = dict(zip(df["node"], df["component"]))
    assert got == {"x": "x", "y": "x", "z": "x", "q": "q", "r": "q"}


def test_partitioned_single_bucket(ray_session):
    # n_buckets=1 exercises the num_returns=1 degenerate path
    df = _cc_df(pa.table({"a": [1, 2, 10], "b": [2, 3, 11]}),
                broadcast_frontier_max=0, n_buckets=1)
    got = dict(zip(df["node"], df["component"]))
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_string_ids(ray_session):
    df = _cc_df(pa.table({"a": ["x", "y", "q"], "b": ["y", "z", "r"]}))
    got = dict(zip(df["node"], df["component"]))
    assert got == {"x": "x", "y": "x", "z": "x", "q": "q", "r": "q"}


def test_empty_edges_only_nodes(ray_session):
    import ray.data as rd

    from docling_service_ray.functions.graph import connected_components

    edges = rd.from_arrow(
        pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())})
    )
    nodes = rd.from_arrow(pa.table({"id": [3, 1, 2]}))
    df = (
        connected_components(edges, nodes=nodes, node_col="id",
                             id_type=pa.int64())
        .to_pandas().sort_values("node")
    )
    assert df["node"].tolist() == df["component"].tolist() == [1, 2, 3]


def test_max_rounds_raises(ray_session):
    from docling_service_ray.functions.graph import connected_components
    import ray.data as rd

    # a 12-chain has diameter 11 > 2 rounds
    edges = rd.from_arrow(
        pa.table({"a": list(range(1, 12)), "b": list(range(0, 11))})
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(edges, max_rounds=2, id_type=pa.int64())


def test_bad_id_dtype_rejected(ray_session):
    import ray.data as rd

    from docling_service_ray.functions.graph import connected_components

    edges = rd.from_arrow(pa.table({"a": [1.5], "b": [2.5]}))
    with pytest.raises(TypeError, match="integer or string"):
        connected_components(edges)


def test_neardup_clusters_planted(ray_session):
    """minhash pairs -> components: every planted copy lands in its
    original's cluster, labelled by the original (min id)."""
    import ray.data as rd

    from docling_service_ray.stages.dedup import neardup_clusters

    # doc-UNIQUE tokens: base docs share nothing, so the only verified
    # pairs are (original, planted copy) — components are exact pairs and
    # min-label propagation converges in one round. (A periodic shared
    # vocabulary would make the base docs genuine near-dups of each
    # other: chains, big diameters, slow rounds, wrong expectations.)
    base = [
        " ".join(f"d{i}w{j}" for j in range(60))
        for i in range(40)
    ]
    rows = {"doc_id": [], "text": []}
    for i, t in enumerate(base):
        rows["doc_id"].append(i)
        rows["text"].append(t)
        if i % 4 == 0:  # plant a near-identical copy
            words = t.split()
            words[5] = "plantedvariant"
            rows["doc_id"].append(1000 + i)
            rows["text"].append(" ".join(words))
    ds = rd.from_arrow(pa.table(rows))
    comp = neardup_clusters(ds, threshold=0.8).to_pandas()
    got = dict(zip(comp["node"], comp["cluster"]))
    for i in range(0, 40, 4):
        assert got.get(1000 + i) == i, (i, got.get(1000 + i))


def test_partitioned_rounds_resume_from_frontier(ray_session):
    """The regrowth re-entry path resumes the partitioned regime from an
    EXISTING frontier (not every-node-fresh): hand a mid-propagation
    label state + its changed-set to _partitioned_cc_rounds and it must
    converge to the true components, counting only the rounds it ran."""
    import pyarrow as pa
    import ray

    from docling_service_ray.functions.graph import _partitioned_cc_rounds

    # chain 0-1-2-3-4 after one completed round: label[i] = i-1 (i>0)
    edges_sym = ray.data.from_arrow(pa.table({
        "node": [0, 1, 1, 2, 2, 3, 3, 4],
        "nbr":  [1, 0, 2, 1, 3, 2, 4, 3],
    })).materialize()
    labels = ray.data.from_arrow(pa.table({
        "node": [0, 1, 2, 3, 4], "label": [0, 0, 1, 2, 3],
    })).materialize()
    frontier = ray.data.from_arrow(pa.table({
        "node": [1, 2, 3, 4], "label": [0, 1, 2, 3],
    })).materialize()

    out_labels, out_frontier, used = _partitioned_cc_rounds(
        edges_sym, labels, frontier=frontier, n_buckets=3,
        id_type=pa.int64(), stop_below=0, max_rounds=16)
    df = out_labels.to_pandas().sort_values("node")
    assert df["label"].tolist() == [0, 0, 0, 0, 0]
    assert out_frontier.count() == 0
    # resume must NOT restart from scratch: remaining chain needs 3 more
    # pushes (0->2, ->3, ->4) plus the empty-frontier confirming round
    assert 3 <= used <= 5


# ---------------------------------------------------------------------------
# triangle counting (wedge-closing)
# ---------------------------------------------------------------------------

def _ref_triangles(n, edge_list):
    """Brute-force reference: per-node triangle membership counts."""
    import itertools

    es = set(map(tuple, edge_list))
    adj = {i: set() for i in range(n)}
    for u, v in es:
        adj[u].add(v)
        adj[v].add(u)
    counts = [0] * n
    for a, b, c in itertools.combinations(range(n), 3):
        if b in adj[a] and c in adj[a] and c in adj[b]:
            counts[a] += 1
            counts[b] += 1
            counts[c] += 1
    return np.array(counts, dtype=np.int64)


def _run_triangles(n, edge_list, n_buckets=4, repartition=None):
    import ray.data as rd

    from docling_service_ray.functions.graph import triangle_counts

    nodes = rd.from_items([{"node": i} for i in range(n)])
    edges = rd.from_items([{"a": u, "b": v} for u, v in edge_list])
    if repartition:
        nodes, edges = nodes.repartition(repartition), \
            edges.repartition(repartition)
    out = triangle_counts(edges, nodes, n_buckets=n_buckets) \
        .to_pandas().set_index("node").sort_index()
    return out["n_triangles"].to_numpy()


def test_triangles_random_graph_matches_reference(ray_session):
    rng = np.random.default_rng(13)
    n = 30
    seen = set()
    for u, v in rng.integers(0, n, size=(120, 2)):
        u, v = int(min(u, v)), int(max(u, v))
        if u != v:
            seen.add((u, v))
    edge_list = sorted(seen)
    got = _run_triangles(n, edge_list)
    np.testing.assert_array_equal(got, _ref_triangles(n, edge_list))


def test_triangles_planted_cliques_and_isolates(ray_session):
    """Two K4s + one isolated node + a triangle-free path."""
    k4 = lambda base: [(base + i, base + j)  # noqa: E731
                       for i in range(4) for j in range(i + 1, 4)]
    edge_list = k4(0) + k4(4) + [(8, 9), (9, 10)]  # 11 = isolate
    got = _run_triangles(12, edge_list)
    want = np.array([3, 3, 3, 3, 3, 3, 3, 3, 0, 0, 0, 0], dtype=np.int64)
    np.testing.assert_array_equal(got, want)


def test_triangles_parallelism_invariant(ray_session):
    rng = np.random.default_rng(17)
    n = 24
    seen = set()
    for u, v in rng.integers(0, n, size=(90, 2)):
        u, v = int(min(u, v)), int(max(u, v))
        if u != v:
            seen.add((u, v))
    edge_list = sorted(seen)
    a = _run_triangles(n, edge_list, n_buckets=1)
    b = _run_triangles(n, edge_list, n_buckets=7, repartition=5)
    np.testing.assert_array_equal(a, b)
