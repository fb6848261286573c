"""Integer fixed-point PageRank vs an independent dense numpy reference
(same published update rule, written directly from the formula)."""

import numpy as np
import pandas as pd
import pytest


def ref_pagerank(n, edge_list, iters=10, dnum=85, dden=100, scale=1_000_000):
    """Dense single-process reference: nodes are 0..n-1."""
    outdeg = np.zeros(n, np.int64)
    for s, _ in edge_list:
        outdeg[s] += 1
    r = np.full(n, scale, np.int64)
    tele = (scale * (dden - dnum)) // dden
    for _ in range(iters):
        dang = int(np.sum((dnum * r[outdeg == 0]) // dden))
        new = np.full(n, tele + dang // n, np.int64)
        for s, d in edge_list:
            new[d] += (dnum * r[s]) // (dden * outdeg[s])
        r = new
    return r


def _run(ray_session, n, edge_list, iters=10, n_buckets=4, repartition=None):
    import ray.data as rd

    from docling_service_ray.functions.graph import pagerank_int

    nodes = rd.from_items([{"node": i} for i in range(n)])
    edges = rd.from_items([{"a": s, "b": d} for s, d in edge_list]) \
        if edge_list else rd.from_items([{"a": 0, "b": 0}]).filter(
            lambda r: False)
    if repartition:
        nodes, edges = nodes.repartition(repartition), \
            edges.repartition(repartition)
    out = pagerank_int(edges, nodes, iters=iters, n_buckets=n_buckets) \
        .to_pandas().set_index("node").sort_index()
    return out["rank_ppm"].to_numpy()


def test_pagerank_matches_reference_random_graph(ray_session):
    rng = np.random.default_rng(7)
    n = 60
    edge_list = [(int(s), int(d))
                 for s, d in rng.integers(0, n, size=(300, 2))]
    got = _run(ray_session, n, edge_list)
    want = ref_pagerank(n, edge_list)
    np.testing.assert_array_equal(got, want)  # bitwise: integer arithmetic


def test_pagerank_parallelism_and_bucket_invariant(ray_session):
    rng = np.random.default_rng(11)
    n = 40
    edge_list = [(int(s), int(d))
                 for s, d in rng.integers(0, n, size=(150, 2))]
    a = _run(ray_session, n, edge_list, n_buckets=1)
    b = _run(ray_session, n, edge_list, n_buckets=7, repartition=5)
    np.testing.assert_array_equal(a, b)


def test_pagerank_all_dangling(ray_session):
    """No edges: every node keeps teleport + its share of the dangling
    mass, identically."""
    n = 8
    got = _run(ray_session, n, [], iters=3)
    want = ref_pagerank(n, [], iters=3)
    np.testing.assert_array_equal(got, want)
    assert len(set(got)) == 1


def test_pagerank_mass_sink(ray_session):
    """Star s->hub: the hub accumulates strictly more rank than leaves,
    and multi-edges send multiply."""
    n = 6
    edge_list = [(i, 0) for i in range(1, 6)] + [(1, 0)]  # node 1 doubled
    got = _run(ray_session, n, edge_list)
    want = ref_pagerank(n, edge_list)
    np.testing.assert_array_equal(got, want)
    assert got[0] > got[1]


def test_pagerank_zero_iterations_is_initial_mass(ray_session):
    got = _run(ray_session, 5, [(0, 1)], iters=0)
    assert list(got) == [1_000_000] * 5


def test_pagerank_empty_nodes(ray_session):
    import ray.data as rd

    from docling_service_ray.functions.graph import pagerank_int

    nodes = rd.from_items([{"node": 1}]).filter(lambda r: False)
    edges = rd.from_items([{"a": 0, "b": 1}]).filter(lambda r: False)
    out = pagerank_int(edges, nodes)
    assert len(out) == 0 and out.column_names == ["node", "rank_ppm"]
