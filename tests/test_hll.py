"""HyperLogLog: mergeability, error bound, small-range exactness,
determinism, and the distributed one-pass / grouped builders."""

import numpy as np
import pandas as pd
import pytest

from docling_service_ray.functions.hllsketch import (
    _bit_length_u64,
    estimate,
    merge,
    registers_batch,
)


def test_bit_length_exact():
    """Exact over the full uint64 range, including above 2^53 where a
    float64 log2 round-trip would be wrong."""
    xs = np.array([0, 1, 2, 3, 255, 256, (1 << 53) + 1, (1 << 63) + 5,
                   (1 << 64) - 1], dtype=np.uint64)
    want = np.array([0, 1, 2, 2, 8, 9, 54, 64, 64])
    np.testing.assert_array_equal(_bit_length_u64(xs), want)
    np.testing.assert_array_equal(
        _bit_length_u64(xs), [int(x).bit_length() for x in xs])


def test_mergeable():
    """max(regs(A), regs(B)) == regs(A ∪ B) — the property that makes
    per-batch partials + one max-fold correct."""
    a = [f"a{i}" for i in range(300)]
    b = [f"b{i}" for i in range(300)] + a[:50]
    ra = registers_batch(np.array(a), p=10)
    rb = registers_batch(np.array(b), p=10)
    both = registers_batch(np.array(a + b), p=10)
    np.testing.assert_array_equal(merge(ra, rb), both)


def test_duplicates_do_not_move_the_estimate():
    vals = [f"k{i}" for i in range(500)]
    once = registers_batch(np.array(vals), p=10)
    thrice = registers_batch(np.array(vals * 3), p=10)
    np.testing.assert_array_equal(once, thrice)


def test_error_within_theory_bound():
    """stderr = 1.04/sqrt(m); 5 sigma gives a deterministic-input bound
    that holds with huge margin for any reasonable hash."""
    for n in (100, 1000, 20000):
        regs = registers_batch(np.array([f"v{i}" for i in range(n)]), p=12)
        est = estimate(regs)
        assert abs(est - n) / n < 5 * 1.04 / np.sqrt(1 << 12)


def test_small_range_linear_counting_near_exact():
    """Far below 2.5·m the linear-counting correction is near-exact."""
    regs = registers_batch(np.array([f"x{i}" for i in range(30)]), p=12)
    assert abs(estimate(regs) - 30) <= 1


def test_deterministic_across_calls():
    a = registers_batch(np.array(["alpha", "beta", "gamma"]), p=8)
    b = registers_batch(np.array(["alpha", "beta", "gamma"]), p=8)
    np.testing.assert_array_equal(a, b)


def test_distributed_builder_matches_local(ray_session):
    """One-pass distributed fold == local registers over the exact
    global token set (mergeability through the real pipeline)."""
    import ray.data as rd

    from docling_service_ray.functions.hllsketch import hll_distinct_tokens

    texts = ["red green blue", "red red green", "", "  ", "blue red violet"]
    ds = rd.from_items([{"text": t} for t in texts]).repartition(3)
    got = hll_distinct_tokens(ds, p=10)
    toks = sorted(set(" ".join(t for t in texts if t.strip()).split()))
    want = estimate(registers_batch(np.array(toks), p=10))
    assert got == want
    assert got == 4  # linear counting is exact at this scale


def test_grouped_builder(ray_session):
    import ray.data as rd

    from docling_service_ray.functions.hllsketch import hll_distinct_by_group

    rows = (
        [{"lang": "en", "text": "cat dog cat bird"}] * 3
        + [{"lang": "fr", "text": "chat chien"}]
        + [{"lang": "fr", "text": "chat oiseau poisson"}]
    )
    out = hll_distinct_by_group(
        rd.from_items(rows).repartition(3), group_col="lang", p=10
    ).to_pandas()
    got = dict(zip(out["lang"], out["n_distinct_est"]))
    assert got == {"en": 3, "fr": 4}  # linear counting exact here


def test_error_artifact_query(ray_session):
    from docling_service_ray.pipelines.training import hll_distinct_error

    out = hll_distinct_error("/root/testdata/sf0.001").to_pandas()
    assert "__total__" in set(out["lang"])
    assert (out["exact"] > 0).all()
    # p=12 theory stderr is 1.6%; 8% is a >5-sigma deterministic bound
    assert (out["rel_err_pct"] < 8.0).all()
    tot = out[out["lang"] == "__total__"].iloc[0]
    per_lang = out[out["lang"] != "__total__"]
    # shared vocabulary across langs: union distinct <= sum of per-lang
    assert tot["exact"] <= per_lang["exact"].sum()


def test_p_range_guard():
    with pytest.raises(ValueError, match=r"p=3 outside"):
        registers_batch(np.array(["x"]), p=3)
    with pytest.raises(ValueError, match=r"p=19 outside"):
        registers_batch(np.array(["x"]), p=19)
