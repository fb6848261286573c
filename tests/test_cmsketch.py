"""Count-Min sketch: never-underestimates theorem, mergeability, exact
recovery below capacity, and the distributed one-pass builder."""

import numpy as np
import pandas as pd
import pytest

from docling_service_ray.functions.cmsketch import (
    estimate,
    sketch_batch,
)


def test_never_underestimates_and_exact_when_sparse():
    rng = np.random.default_rng(3)
    keys = [f"k{i}" for i in range(200)]
    counts = rng.integers(1, 100, len(keys))
    m = sketch_batch(np.array(keys), counts, d=4, w=1024)
    est = estimate(m, np.array(keys))
    assert (est >= counts).all()  # the CM theorem
    # 200 keys into 4x1024 cells: collisions possible but bounded; the
    # TOTAL overestimate mass is at most the colliding mass
    assert (est - counts).sum() <= counts.sum()


def test_mergeable():
    """sketch(A) + sketch(B) == sketch(A ++ B) elementwise — the property
    that makes per-batch partials + one elementwise sum correct."""
    rng = np.random.default_rng(7)
    ka = [f"a{i}" for i in range(50)]
    kb = [f"b{i}" for i in range(50)] + ka[:10]
    ca = rng.integers(1, 20, len(ka))
    cb = rng.integers(1, 20, len(kb))
    ma = sketch_batch(np.array(ka), ca, d=4, w=256)
    mb = sketch_batch(np.array(kb), cb, d=4, w=256)
    both = sketch_batch(np.array(list(ka) + list(kb)),
                        np.concatenate([ca, cb]), d=4, w=256)
    np.testing.assert_array_equal(ma + mb, both)


def test_unseen_keys_bounded_by_row_mass():
    m = sketch_batch(np.array(["x"]), [7], d=4, w=64)
    est = estimate(m, np.array(["never-seen-1", "never-seen-2"]))
    assert (est >= 0).all() and (est <= 7).all()


def test_deterministic_across_processes_constants():
    """Hash coefficients are content-derived (no PYTHONHASHSEED): the
    same input always lands in the same cells."""
    a = sketch_batch(np.array(["alpha", "beta"]), [3, 5], d=4, w=128)
    b = sketch_batch(np.array(["alpha", "beta"]), [3, 5], d=4, w=128)
    np.testing.assert_array_equal(a, b)


def test_distributed_builder_matches_local(ray_session):
    """One-pass distributed sketch == local sketch of the exact global
    token counts (mergeability, exercised through the real pipeline)."""
    import ray.data as rd

    from docling_service_ray.functions.cmsketch import cm_sketch_tokens

    texts = ["red green blue", "red red green", "", "  ", "blue red"]
    ds = rd.from_items([{"text": t} for t in texts]).repartition(3)
    m = cm_sketch_tokens(ds, d=4, w=64)
    toks = pd.Series(" ".join(t for t in texts if t.strip()).split())
    vc = toks.value_counts()
    want = sketch_batch(vc.index.to_numpy(), vc.to_numpy(), d=4, w=64)
    np.testing.assert_array_equal(m, want)
    est = estimate(m, np.array(["red", "green", "blue"]))
    assert (est >= np.array([4, 2, 2])).all()


def test_error_artifact_query(ray_session):
    from docling_service_ray.pipelines.training import cm_sketch_error

    out = cm_sketch_error("/root/testdata/sf0.001").to_pandas()
    assert 0 < len(out) <= 50  # sf0.001 vocab may be < 50
    assert (out["overestimate"] >= 0).all()  # theorem, end to end
    assert (out["est"] == out["exact"] + out["overestimate"]).all()
