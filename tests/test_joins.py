"""Join-primitive tests against in-memory pandas references."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


@pytest.fixture(scope="module")
def tables(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(3)
    left = pd.DataFrame(
        {
            "k": rng.integers(0, 50, 300),
            "lv": rng.integers(0, 1000, 300),
        }
    )
    right = pd.DataFrame(
        {
            "k": rng.integers(0, 60, 120),
            "rv": rng.integers(0, 1000, 120),
        }
    )
    return rd.from_pandas(left), rd.from_pandas(right), left, right


def test_bucketed_hash_join(tables):
    from docling_service_ray.functions.joins import bucketed_hash_join

    lds, rds, left, right = tables
    got = (
        bucketed_hash_join(lds, rds, "k", n_buckets=8)
        .to_pandas()
        .sort_values(["k", "lv", "rv"])
        .reset_index(drop=True)
    )
    exp = (
        left.merge(right, on="k", how="inner")
        .sort_values(["k", "lv", "rv"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got[["k", "lv", "rv"]].astype("int64"), exp.astype("int64")
    )


def test_bucketed_join_collision_raises(tables):
    from docling_service_ray.functions.joins import bucketed_hash_join

    lds, _, _, _ = tables
    with pytest.raises(ValueError):
        bucketed_hash_join(lds, lds, "k")  # 'lv' collides with itself


def test_broadcast_anti_and_semi(tables, ray_session):
    from docling_service_ray.functions.joins import broadcast_anti_filter

    lds, _, left, _ = tables
    keys = {1, 2, 3}
    anti = broadcast_anti_filter(lds, "k", keys).to_pandas()
    semi = broadcast_anti_filter(lds, "k", keys, keep_matches=True).to_pandas()
    assert not anti["k"].isin(keys).any()
    assert semi["k"].isin(keys).all()
    assert len(anti) + len(semi) == len(left)


def test_grouped_topk(tables):
    from docling_service_ray.functions.joins import grouped_topk

    lds, _, left, _ = tables
    got = (
        grouped_topk(lds, "k", "lv", 2, descending=True, tiebreak_col="lv")
        .to_pandas()
        .sort_values(["k", "rank"])
        .reset_index(drop=True)
    )
    exp = (
        left.sort_values(["k", "lv"], ascending=[True, False], kind="mergesort")
        .groupby("k")
        .head(2)
    )
    assert len(got) == len(exp)
    # every kept row is within the true top-2 values of its group
    for k, grp in left.groupby("k"):
        top_vals = set(grp["lv"].nlargest(2))
        got_vals = set(got[got["k"] == k]["lv"])
        assert got_vals <= set(grp["lv"])
        assert got_vals == top_vals or len(got_vals) == len(top_vals)


def test_asof_join_per_key(ray_session):
    import ray.data as rd

    from docling_service_ray.functions.joins import asof_join_per_key

    left = pd.DataFrame(
        {"k": [1, 1, 2, 2], "ts": [10, 20, 10, 5], "lid": [100, 101, 102, 103]}
    )
    right = pd.DataFrame(
        {"k": [1, 1, 2], "ts": [5, 15, 8], "rid": [200, 201, 202]}
    )
    got = asof_join_per_key(
        rd.from_pandas(left), rd.from_pandas(right), "k", "ts",
        left_cols=["lid"], right_cols=["rid"],
    ).to_pandas().sort_values("lid").reset_index(drop=True)
    # k=1 ts=10 -> rid 200; ts=20 -> rid 201; k=2 ts=10 -> rid 202;
    # k=2 ts=5 has no match (right ts=8 > 5) -> dropped
    assert got["lid"].tolist() == [100, 101, 102]
    assert got["rid_matched"].astype(int).tolist() == [200, 201, 202]


def test_bucketed_semi_anti_join(ray_session):
    import ray.data as rd

    from docling_service_ray.functions.joins import bucketed_semi_anti_join

    left = rd.from_items(
        [{"k": i, "v": f"row{i}"} for i in range(10)]
    )
    right = rd.from_items(
        [{"probe": k} for k in (2, 3, 3, 5, 99)]  # dup + unmatched keys
    )
    anti = bucketed_semi_anti_join(left, right, "k", right_key="probe")
    assert sorted(anti.to_pandas()["k"]) == [0, 1, 4, 6, 7, 8, 9]
    semi = bucketed_semi_anti_join(left, right, "k", right_key="probe",
                                   keep_matches=True)
    got = semi.to_pandas().sort_values("k").reset_index(drop=True)
    assert got["k"].tolist() == [2, 3, 5]
    assert got["v"].tolist() == ["row2", "row3", "row5"]  # columns intact


# ---------------------------------------------------------------------------
# skew_salted_join
# ---------------------------------------------------------------------------
def _salted_case(ray_session, n_blocks):
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray

    from docling_service_ray.functions.joins import skew_salted_join

    rng = np.random.default_rng(3)
    # planted skew: key 7 dominates the big side
    keys = np.concatenate([np.full(5000, 7), rng.integers(100, 200, 2000)])
    big_df = pd.DataFrame({"k": keys.astype("int64"),
                           "v": np.arange(len(keys), dtype="int64")})
    small_df = pd.DataFrame({
        "k": np.arange(0, 220, dtype="int64"),
        "label": [f"L{i}" for i in range(220)],
    })
    big = ray.data.from_pandas(big_df).repartition(n_blocks)
    small = ray.data.from_pandas(small_df)
    out = skew_salted_join(
        big, small, "k", hot_keys={7, 150}, n_salt=4,
        bschema=pa.schema([("k", pa.int64()), ("v", pa.int64())]),
        sschema=pa.schema([("k", pa.int64()), ("label", pa.string())]),
    ).to_pandas()
    expected = big_df.merge(small_df, on="k")
    return (
        out.sort_values(["k", "v"]).reset_index(drop=True)[["k", "v", "label"]],
        expected.sort_values(["k", "v"]).reset_index(drop=True),
    )


def test_salted_join_matches_pandas(ray_session):
    import pandas as pd

    got, exp = _salted_case(ray_session, 8)
    pd.testing.assert_frame_equal(got, exp)


def test_salted_join_block_layout_invariant(ray_session):
    import pandas as pd

    a, _ = _salted_case(ray_session, 1)
    b, _ = _salted_case(ray_session, 17)
    pd.testing.assert_frame_equal(a, b)


def test_full_outer_join_both_sided_nulls(ray_session):
    import ray.data as rd

    from docling_service_ray.functions.joins import bucketed_hash_join

    left = rd.from_arrow(pa.table({"k": [1, 2, 3], "lv": [10, 20, 30]}))
    right = rd.from_arrow(pa.table({"k": [2, 3, 4], "rv": [200, 300, 400]}))
    out = (
        bucketed_hash_join(left, right, "k", how="full")
        .to_pandas().sort_values("k").reset_index(drop=True)
    )
    assert out["k"].tolist() == [1, 2, 3, 4]
    assert out["lv"].fillna(-1).tolist() == [10, 20, 30, -1]
    assert out["rv"].fillna(-1).tolist() == [-1, 200, 300, 400]


def test_join_rejects_unknown_how(ray_session):
    import ray.data as rd

    from docling_service_ray.functions.joins import bucketed_hash_join

    ds = rd.from_arrow(pa.table({"k": [1]}))
    with pytest.raises(ValueError, match="unsupported join type"):
        bucketed_hash_join(ds, ds, "k", how="cross")


def test_dense_lookup_guard_raises(ray_session):
    import ray.data as rd

    from docling_service_ray.functions.joins import dense_lookup_array_ref

    ds = rd.from_arrow(pa.table({"k": [1, 10_000_000], "v": [1, 2]}))
    with pytest.raises(ValueError, match="bucketed_hash_join"):
        dense_lookup_array_ref(ds, "k", "v", max_bytes=1024)


def test_dense_lookup_builds_distributed(ray_session):
    import ray
    import ray.data as rd

    from docling_service_ray.functions.joins import dense_lookup_array_ref

    ds = rd.from_arrow(
        pa.table({"k": [1, 5, 3], "v": [11, 55, 33]})
    ).repartition(3)
    arr = ray.get(dense_lookup_array_ref(ds, "k", "v"))
    assert arr[1] == 11 and arr[3] == 33 and arr[5] == 55
    assert arr[0] == -1 and arr[2] == -1 and arr[4] == -1


# ---------------------------------------------------------------------------
# funnel analysis (staged conditional mins)
# ---------------------------------------------------------------------------

def test_funnel_stages_planted(ray_session, tmp_path):
    """Planted users covering every funnel depth, tie-timestamps (strict
    `>` must NOT advance), out-of-order arrival, and repeat events."""
    import pandas as pd
    import pyarrow.parquet as pq

    from docling_service_ray.pipelines.relational import funnel_stages

    T = pd.Timestamp("2026-01-01")
    s = pd.Timedelta(seconds=1)
    rows = []

    def ev(u, et, t):
        rows.append({"event_id": len(rows), "ts": t, "user_id": u,
                     "event_type": et, "value": 0.0, "props": ""})

    # u1: full funnel, delivered out of order
    ev(1, "purchase", T + 5 * s); ev(1, "view", T); ev(1, "click", T + 2 * s)
    # u2: click at the SAME ts as first view -> strict gate blocks stage 2
    ev(2, "view", T); ev(2, "click", T)
    # u3: view then purchase but never clicks -> stage 1
    ev(3, "view", T); ev(3, "purchase", T + 9 * s)
    # u4: clicks/purchases but never views -> stage 0
    ev(4, "click", T); ev(4, "purchase", T + s)
    # u5: LATER click qualifies even though an earlier one predates view
    ev(5, "click", T - 5 * s); ev(5, "view", T); ev(5, "click", T + s)
    ev(5, "purchase", T + 2 * s)
    # u6: purchase lands between view and click -> only stage 2
    ev(6, "view", T); ev(6, "purchase", T + s); ev(6, "click", T + 2 * s)

    df = pd.DataFrame(rows)
    sf = tmp_path / "sf"
    sf.mkdir()
    pq.write_table(
        pa.Table.from_pandas(df.astype({"ts": "datetime64[us]"}),
                             preserve_index=False),
        sf / "events.parquet",
    )
    out = funnel_stages(str(sf)).to_pandas().set_index("user_id")["stage"]
    assert out.to_dict() == {1: 3, 2: 1, 3: 1, 4: 0, 5: 3, 6: 2}


def test_cohort_retention_planted(ray_session, tmp_path):
    """Planted cohorts: pre-signup activity excluded, never-signed-up
    users dropped, one count per user per active week."""
    import pandas as pd
    import pyarrow.parquet as pq

    from docling_service_ray.pipelines.relational import cohort_retention

    WEEK = pd.Timedelta(days=7)
    W = pd.Timestamp("2026-01-05")  # any anchor; buckets are epoch-weeks
    rows = []

    def ev(u, et, t):
        rows.append({"event_id": len(rows), "ts": t, "user_id": u,
                     "event_type": et, "value": 0.0, "props": ""})

    # u1: signup week 0; active weeks 0 (twice — counts once), 1, 3
    ev(1, "signup", W); ev(1, "click", W + pd.Timedelta(hours=1))
    ev(1, "view", W + WEEK); ev(1, "view", W + 3 * WEEK)
    # u2: signup week 1; active week 1 only
    ev(2, "signup", W + WEEK)
    # u3: never signs up -> dropped entirely
    ev(3, "view", W); ev(3, "click", W + WEEK)
    # u4: signup week 0 with PRE-signup activity (excluded), active week 0
    ev(4, "view", W - WEEK); ev(4, "signup", W + pd.Timedelta(hours=2))

    df = pd.DataFrame(rows)
    sf = tmp_path / "sf"
    sf.mkdir()
    pq.write_table(
        pa.Table.from_pandas(df.astype({"ts": "datetime64[us]"}),
                             preserve_index=False),
        sf / "events.parquet",
    )
    out = cohort_retention(str(sf)).to_pandas()
    w0 = out[out.cohort_week == out.cohort_week.min()]
    got = {(int(r.cohort_week - out.cohort_week.min()), int(r.week_idx)):
           int(r.n_users) for r in out.itertuples()}
    # cohort week0: u1+u4 at idx 0, u1 at idx 1 and 3; cohort week1: u2 at 0
    assert got == {(0, 0): 2, (0, 1): 1, (0, 3): 1, (1, 0): 1}
    assert len(w0) == 3


def test_funnel_and_cohort_deterministic_across_runs(ray_session, tmp_path):
    """Both event-analytics ops are bitwise stable across repeated
    executions on a random corpus (the bucketed plans contain no
    order-sensitive float reductions)."""
    import pandas as pd
    import pyarrow.parquet as pq

    from docling_service_ray.pipelines.relational import (
        cohort_retention,
        funnel_stages,
    )

    rng = np.random.default_rng(23)
    T = pd.Timestamp("2026-02-02")
    types = ["view", "click", "purchase", "signup", "error"]
    n = 400
    df = pd.DataFrame({
        "event_id": np.arange(n),
        "ts": [T + pd.Timedelta(minutes=int(m))
               for m in rng.integers(0, 60 * 24 * 30, n)],
        "user_id": rng.integers(0, 25, n),
        "event_type": rng.choice(types, n),
        "value": np.zeros(n),
        "props": [""] * n,
    }).astype({"ts": "datetime64[us]"})
    sf = tmp_path / "sf"
    sf.mkdir()
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   sf / "events.parquet")

    for fn, keys in ((funnel_stages, ["user_id"]),
                     (cohort_retention, ["cohort_week", "week_idx"])):
        a = fn(str(sf)).to_pandas().sort_values(keys).reset_index(drop=True)
        b = fn(str(sf)).to_pandas().sort_values(keys).reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b)
