"""Quantile compactor sketch: weight conservation, the compaction
certificate (measured rank error <= tracked bound), exactness below
capacity, determinism, merge algebra, and the distributed fold."""

import numpy as np
import pandas as pd
import pytest

from docling_service_ray.functions.qcompactor import CompactorSketch

QS = [0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99]


def true_rank(sorted_x: np.ndarray, v: int) -> int:
    """Number of elements <= v (the rank the sketch's answer targets)."""
    return int(np.searchsorted(sorted_x, v, side="right"))


def measured_rank_error(x: np.ndarray, sk: CompactorSketch) -> int:
    xs = np.sort(x)
    n = len(xs)
    worst = 0
    for q, est in zip(QS, sk.quantile(QS)):
        target = max(1, int(np.ceil(q * n)))
        # a value covers the whole rank run of its duplicates; the error
        # is the distance from the target to the nearest covered rank
        lo = int(np.searchsorted(xs, est, side="left")) + 1
        hi = true_rank(xs, est)
        if lo <= target <= hi:
            err = 0
        else:
            err = min(abs(target - lo), abs(target - hi))
        worst = max(worst, err)
    return worst


DISTS = {
    "uniform": lambda n: np.random.default_rng(1).integers(0, 1 << 40, n),
    "zipfish": lambda n: (1 << 30) // np.random.default_rng(2).integers(
        1, 1000, n),
    "sorted": lambda n: np.arange(n) * 7,
    "reversed": lambda n: np.arange(n)[::-1] * 3,
    "constant": lambda n: np.full(n, 42),
}


def test_weight_conservation_and_certificate():
    for name, gen in DISTS.items():
        x = gen(30000).astype(np.int64)
        sk = CompactorSketch(k=64)
        for chunk in np.array_split(x, 37):
            sk.update(chunk)
        assert sk.total_weight() == len(x), name
        bound = sk.error_bound()
        assert bound > 0  # k=64 over 30k values must compact
        assert measured_rank_error(x, sk) <= bound, name


def test_exact_below_capacity():
    x = np.array([5, 1, 9, 3, 3, 7], dtype=np.int64)
    sk = CompactorSketch(k=16).update(x)
    assert sk.error_bound() == 0
    assert sk.total_weight() == 6
    np.testing.assert_array_equal(
        sk.quantile([0.5, 1.0]), [np.sort(x)[2], 9])


def test_deterministic():
    x = np.random.default_rng(9).integers(0, 10**9, 5000)
    rows_a = CompactorSketch(k=32).update(x).to_rows()
    rows_b = CompactorSketch(k=32).update(x).to_rows()
    pd.testing.assert_frame_equal(rows_a, rows_b)


def test_merge_weight_and_certificate():
    rng = np.random.default_rng(4)
    xa = rng.integers(0, 1 << 35, 20000)
    xb = rng.integers(1 << 34, 1 << 36, 15000)
    sa = CompactorSketch(k=64).update(xa)
    sb = CompactorSketch(k=64).update(xb)
    bound_before = sa.error_bound() + sb.error_bound()
    sa.merge(sb)
    both = np.concatenate([xa, xb])
    assert sa.total_weight() == len(both)
    assert sa.error_bound() >= bound_before  # counters add, then compress
    assert measured_rank_error(both, sa) <= sa.error_bound()


def test_merge_rejects_mismatched_k():
    with pytest.raises(ValueError):
        CompactorSketch(k=32).merge(CompactorSketch(k=64))


def test_rows_roundtrip():
    x = np.random.default_rng(11).integers(0, 1 << 30, 8000)
    sk = CompactorSketch(k=32).update(x)
    back = CompactorSketch.from_rows(sk.to_rows(), k=32)
    assert back.total_weight() == sk.total_weight()
    assert back.error_bound() == sk.error_bound()
    np.testing.assert_array_equal(back.quantile(QS), sk.quantile(QS))


def test_distributed_fold(ray_session):
    import ray.data as rd

    from docling_service_ray.functions.qcompactor import (
        compactor_sketch_column,
    )

    x = np.random.default_rng(21).integers(0, 1 << 38, 20000).astype(np.int64)
    ds = rd.from_pandas(pd.DataFrame({"v": x})).repartition(8)
    sk = compactor_sketch_column(ds, "v", k=64)
    assert sk.total_weight() == len(x)
    assert measured_rank_error(x, sk) <= sk.error_bound()
    # two runs over the same layout agree exactly (no RNG anywhere)
    sk2 = compactor_sketch_column(ds, "v", k=64)
    np.testing.assert_array_equal(sk.quantile(QS), sk2.quantile(QS))
    assert sk2.error_bound() == sk.error_bound()


def test_error_artifact_query(ray_session):
    from docling_service_ray.pipelines.training import (
        quantile_compactor_error,
    )

    out = quantile_compactor_error("/root/testdata/sf0.001").to_pandas()
    assert len(out) == len(QS)
    assert (out["rank_err"] <= out["certified_bound"]).all()
    assert (out["certified_bound"] < out["n"]).all()  # non-vacuous


def test_distributed_fold_ignores_nulls(ray_session):
    """SQL percentile semantics: NULLs do not count toward the weight
    or move any quantile."""
    import ray.data as rd

    from docling_service_ray.functions.qcompactor import (
        compactor_sketch_column,
    )

    x = np.random.default_rng(5).integers(0, 1 << 30, 5000).astype(float)
    with_nulls = np.where(np.arange(len(x)) % 7 == 0, np.nan, x)
    ds = rd.from_pandas(pd.DataFrame({"v": with_nulls})).repartition(4)
    sk = compactor_sketch_column(ds, "v", k=64)
    clean = x[np.arange(len(x)) % 7 != 0].astype(np.int64)
    assert sk.total_weight() == len(clean)
    assert measured_rank_error(clean, sk) <= sk.error_bound()
