"""Distributed set-op primitives + distinct-count sketch."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def ab(ray_session):
    import ray.data as rd

    a = rd.from_items([{"k": i} for i in [1, 2, 3, 4, 5, 5, 2]])
    b = rd.from_items([{"k": i} for i in [4, 5, 6, 7, 7]])
    return a, b


def test_union_distinct(ab):
    from docling_service_ray.functions.setops import union_distinct

    a, b = ab
    got = sorted(union_distinct(a, b, "k").to_pandas()["k"])
    assert got == [1, 2, 3, 4, 5, 6, 7]


def test_intersect(ab):
    from docling_service_ray.functions.setops import intersect

    a, b = ab
    assert sorted(intersect(a, b, "k").to_pandas()["k"]) == [4, 5]


def test_except_keys(ab):
    from docling_service_ray.functions.setops import except_keys

    a, b = ab
    assert sorted(except_keys(a, b, "k").to_pandas()["k"]) == [1, 2, 3]
    assert sorted(except_keys(b, a, "k").to_pandas()["k"]) == [6, 7]


def test_setops_randomized_vs_python_sets(ray_session):
    """Seeded random multisets: distributed results must equal Python set
    algebra exactly (duplicates, disjoint, nested, negative keys)."""
    import ray.data as rd

    from docling_service_ray.functions.setops import (
        except_keys,
        intersect,
        union_distinct,
    )

    rng = np.random.default_rng(1234)
    for trial in range(4):
        xs = rng.integers(-50, 50, size=rng.integers(1, 200)).tolist()
        ys = rng.integers(-50, 50, size=rng.integers(1, 200)).tolist()
        a = rd.from_items([{"k": int(v)} for v in xs])
        b = rd.from_items([{"k": int(v)} for v in ys])
        sa, sb = set(xs), set(ys)
        assert sorted(union_distinct(a, b, "k").to_pandas()["k"]) == sorted(sa | sb)
        got_i = sorted(intersect(a, b, "k").to_pandas().get("k", []))
        assert got_i == sorted(sa & sb)
        got_e = sorted(except_keys(a, b, "k").to_pandas().get("k", []))
        assert got_e == sorted(sa - sb)


def test_bag_ops(ab):
    from docling_service_ray.functions.setops import except_all, intersect_all

    a, b = ab  # a = {1,2×2,3,4,5×2}, b = {4,5,6,7×2}
    assert sorted(intersect_all(a, b, "k").to_pandas()["k"]) == [4, 5]
    assert sorted(except_all(a, b, "k").to_pandas()["k"]) == [1, 2, 2, 3, 5]
    assert sorted(except_all(b, a, "k").to_pandas()["k"]) == [6, 7, 7]


def test_bag_ops_randomized_vs_counter(ray_session):
    """Seeded random multisets: ALL-semantics must equal Counter algebra
    (min / saturating difference of multiplicities), across many blocks so
    partial counts genuinely combine."""
    from collections import Counter

    import ray.data as rd

    from docling_service_ray.functions.setops import except_all, intersect_all

    rng = np.random.default_rng(77)
    for trial in range(3):
        xs = rng.integers(-20, 20, size=rng.integers(50, 300)).tolist()
        ys = rng.integers(-20, 20, size=rng.integers(50, 300)).tolist()
        a = rd.from_items([{"k": int(v)} for v in xs]).repartition(8)
        b = rd.from_items([{"k": int(v)} for v in ys]).repartition(8)
        ca, cb = Counter(xs), Counter(ys)
        exp_i = sorted(
            k for k in ca.keys() & cb.keys() for _ in range(min(ca[k], cb[k]))
        )
        exp_e = sorted(k for k in ca for _ in range(max(ca[k] - cb.get(k, 0), 0)))
        assert sorted(intersect_all(a, b, "k").to_pandas().get("k", [])) == exp_i
        assert sorted(except_all(a, b, "k").to_pandas().get("k", [])) == exp_e


def test_union_by_name_null_padding_and_promotion(ray_session):
    """Missing columns become genuine NULLs; int32|int64 promotes; column
    order is side-a then side-b-only."""
    import pyarrow as pa
    import ray.data as rd

    from docling_service_ray.functions.setops import union_by_name

    a = rd.from_arrow(pa.table({
        "id": pa.array([1, 2], pa.int32()),
        "name": pa.array(["x", "y"]),
    }))
    b = rd.from_arrow(pa.table({
        "id": pa.array([3], pa.int64()),
        "score": pa.array([2.5]),
    }))
    df = union_by_name(a, b).to_pandas().sort_values("id").reset_index(drop=True)
    assert list(df.columns) == ["id", "name", "score"]
    assert df["id"].tolist() == [1, 2, 3]
    assert df["name"].tolist()[:2] == ["x", "y"] and df["name"].isna().iloc[2]
    assert df["score"].isna().iloc[0] and df["score"].iloc[2] == 2.5


def test_kmv_sketch_accuracy(ray_session):
    """KMV estimate within ~10% at 8x the sketch size; exact below k."""
    import ray.data as rd

    from docling_service_ray.pipelines.training import approx_distinct_tokens
    from docling_service_ray.sources import tables as T

    # synthesize docs with a known vocabulary through the registered query
    # path by monkeypatching the table read
    n_vocab = 8192
    words = [f"tok{i:05d}" for i in range(n_vocab)]
    rows = [
        {"text": " ".join(words[i::64])} for i in range(64)
    ]  # each word appears exactly once across docs
    orig = T.read_table
    try:
        T.read_table = lambda sf, name, **kw: rd.from_items(rows)
        import docling_service_ray.pipelines.training as tr

        orig_tr = tr.read_table
        tr.read_table = T.read_table
        est = approx_distinct_tokens("ignored").to_pandas()["n_distinct_est"][0]
        tr.read_table = orig_tr
    finally:
        T.read_table = orig
    assert abs(est - n_vocab) / n_vocab < 0.10
