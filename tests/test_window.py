"""Unit tests for functions/window.py: per-key isolation, ordering, and
each window kind — independent of the DuckDB parity gate."""

import pandas as pd
import pyarrow as pa
import pytest
import ray

from docling_service_ray.functions.window import partitioned_window


def _ds(rows):
    return ray.data.from_arrow(pa.Table.from_pylist(rows))


ROWS = [
    {"k": "b", "o": 2, "x": 10},
    {"k": "a", "o": 1, "x": 1},
    {"k": "a", "o": 3, "x": 2},
    {"k": "b", "o": 1, "x": 5},
    {"k": "a", "o": 2, "x": 4},
]


def _run(specs, **kw):
    out = partitioned_window(_ds(ROWS), "k", ["o"], specs, **kw).to_pandas()
    return out.sort_values(["k", "o"]).reset_index(drop=True)


def test_row_number_and_cumsum(ray_session):
    df = _run([("rn", "row_number", None, None), ("cum", "cumsum", "x", None)])
    assert df["rn"].tolist() == [1, 2, 3, 1, 2]
    assert df["cum"].tolist() == [1, 5, 7, 5, 15]
    assert df["rn"].dtype == "int64" and df["cum"].dtype == "int64"


def test_lag_and_diff_fill(ray_session):
    df = _run([("prev", "lag", "x", -1), ("gap", "diff", "o", -1)])
    assert df["prev"].tolist() == [-1, 1, 4, -1, 5]
    # first row of each key gets the fill, not a leak from the prior key
    assert df["gap"].tolist() == [-1, 1, 1, -1, 1]


def test_lag_without_fill_is_nullable(ray_session):
    df = _run([("prev", "lag", "x", None)])
    assert pd.isna(df["prev"].iloc[0]) and df["prev"].iloc[1] == 1.0


def test_many_buckets_no_key_split(ray_session):
    # more buckets than keys: every key still lands whole in one task
    df = _run([("rn", "row_number", None, None)], n_buckets=257)
    assert df.groupby("k")["rn"].max().tolist() == [3, 2]


def test_unknown_kind_raises(ray_session):
    with pytest.raises(ValueError, match="unknown window kind"):
        partitioned_window(_ds(ROWS), "k", ["o"], [("y", "median_of", "x", None)])


def test_lead_first_last(ray_session):
    df = _run([("nxt", "lead", "x", -1),
               ("fst", "first_value", "x", None),
               ("lst", "last_value", "x", None)])
    # k=a ordered: x = 1, 4, 2 ; k=b ordered: x = 5, 10
    assert df["nxt"].tolist() == [4, 2, -1, 10, -1]
    assert df["fst"].tolist() == [1, 1, 1, 5, 5]
    assert df["lst"].tolist() == [2, 2, 2, 10, 10]


def test_lead_without_fill_is_nullable(ray_session):
    df = _run([("nxt", "lead", "x", None)])
    assert df["nxt"].iloc[0] == 4 and pd.isna(df["nxt"].iloc[2])
    assert pd.isna(df["nxt"].iloc[4])


def test_percent_rank_cume_dist_with_ties(ray_session):
    rows = [{"k": "a", "o": i, "d": v} for i, v in
            enumerate([3, 3, 5, 5, 5, 9])] + [{"k": "b", "o": 0, "d": 7}]
    out = partitioned_window(
        _ds(rows), "k", ["d", "o"],
        [("pr", "percent_rank", "d", None), ("cd", "cume_dist", "d", None)],
        keep_columns=["k", "o", "d"],
    ).to_pandas().sort_values(["k", "o"]).reset_index(drop=True)
    # SQL semantics: rank over ties / (n-1); last-peer position / n
    assert out["pr"].tolist() == [0.0, 0.0, 0.4, 0.4, 0.4, 1.0, 0.0]
    assert out["cd"].tolist() == [
        2 / 6, 2 / 6, 5 / 6, 5 / 6, 5 / 6, 1.0, 1.0]


def test_parallelism_invariance(ray_session):
    # same input split across many blocks -> identical window output
    big = [{"k": f"k{i % 7}", "o": i, "x": i * 3 % 11} for i in range(200)]
    a = (
        partitioned_window(_ds(big), "k", ["o"],
                           [("cum", "cumsum", "x", None)])
        .to_pandas().sort_values(["k", "o"]).reset_index(drop=True)
    )
    split = ray.data.from_arrow(pa.Table.from_pylist(big)).repartition(16)
    b = (
        partitioned_window(split, "k", ["o"], [("cum", "cumsum", "x", None)])
        .to_pandas().sort_values(["k", "o"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)


def test_int64_lag_diff_exact_above_2_53(ray_session):
    # values above 2^53 stay exact (no float64 shift sentinel)
    base = 2**60
    rows = [{"k": "a", "o": i, "x": base + i} for i in range(4)]
    out = partitioned_window(_ds(rows), "k", ["o"],
                             [("prev", "lag", "x", 0),
                              ("gap", "diff", "x", -1),
                              ("prev_na", "lag", "x", None)])
    # check at the ARROW level: pandas' default arrow->pandas conversion
    # downcasts nullable int64 to float64, which is exactly the lossy
    # path this test exists to rule out of the engine itself
    tbl = pa.concat_tables(
        out.iter_batches(batch_size=1 << 16, batch_format="pyarrow")
    ).sort_by("o")
    assert tbl["prev"].type == pa.int64()
    assert tbl["prev"].to_pylist() == [0, base, base + 1, base + 2]
    assert tbl["gap"].to_pylist() == [-1, 1, 1, 1]
    assert tbl["prev_na"].type == pa.int64()
    assert tbl["prev_na"].to_pylist() == [None, base, base + 1, base + 2]


def _mega_rows(n_mega=5000, n_small=40):
    import numpy as np

    rng = np.random.default_rng(3)
    rows = [{"k": "mega", "o": int(o), "x": int(v)}
            for o, v in zip(range(n_mega), rng.integers(0, 100, n_mega))]
    for i in range(n_small):
        rows.append({"k": f"s{i % 5}", "o": i, "x": int(i * 7 % 13)})
    return rows


def test_salted_mega_key_equals_unsalted(ray_session):
    # one key >> salt width: the salted plan (per-salt windows + broadcast
    # offset merge) must equal the unsalted plan exactly, incl. lag/diff
    # boundaries at every salt edge and untouched non-hot keys
    from docling_service_ray.functions.window import salted_partitioned_window

    rows = _mega_rows()
    specs = [("rn", "row_number", None, None),
             ("cum", "cumsum", "x", None),
             ("prev", "lag", "x", 0),
             ("gap", "diff", "x", -1),
             ("roll7", "rolling_sum", "x", 7)]
    unsalted = (
        partitioned_window(_ds(rows), "k", ["o"], specs)
        .to_pandas().sort_values(["k", "o"]).reset_index(drop=True)
    )
    salted = (
        salted_partitioned_window(
            _ds(rows).repartition(16), "k", "o", specs,
            hot_keys=["mega"], salt_width=100)
        .to_pandas().sort_values(["k", "o"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        unsalted, salted[unsalted.columns], check_dtype=False)


def test_salted_slices_actually_split(ray_session):
    # the mega key's salt slices must land in MORE than one shuffle group
    # (otherwise the variant isn't doing its job); verified via the salt
    # bucket spread of the tag stage
    from docling_service_ray.functions.window import salted_partitioned_window

    rows = _mega_rows(n_mega=2000, n_small=0)
    out = salted_partitioned_window(
        _ds(rows), "k", "o", [("rn", "row_number", None, None)],
        hot_keys=["mega"], salt_width=100)
    df = out.to_pandas().sort_values("o").reset_index(drop=True)
    assert df["rn"].tolist() == list(range(1, 2001))


def test_rolling_sum_rank_dense_rank(ray_session):
    rows = [
        {"k": "a", "o": 1, "x": 5, "d": 10},
        {"k": "a", "o": 2, "x": 3, "d": 10},
        {"k": "a", "o": 3, "x": 2, "d": 20},
        {"k": "a", "o": 4, "x": 7, "d": 20},
        {"k": "a", "o": 5, "x": 1, "d": 30},
        {"k": "b", "o": 1, "x": 9, "d": 10},
        {"k": "b", "o": 2, "x": 4, "d": 15},
    ]
    df = (
        partitioned_window(
            _ds(rows), "k", ["o"],
            [("roll2", "rolling_sum", "x", 2),
             ("rnk", "rank", "d", None),
             ("drnk", "dense_rank", "d", None)],
            keep_columns=["k", "o", "x", "d"])
        .to_pandas().sort_values(["k", "o"]).reset_index(drop=True)
    )
    assert df["roll2"].tolist() == [5, 8, 5, 9, 8, 9, 13]
    assert df["rnk"].tolist() == [1, 1, 3, 3, 5, 1, 2]
    assert df["drnk"].tolist() == [1, 1, 2, 2, 3, 1, 2]


def test_salted_rejects_unsupported_kinds(ray_session):
    from docling_service_ray.functions.window import salted_partitioned_window

    with pytest.raises(NotImplementedError, match="cross-salt"):
        salted_partitioned_window(
            _ds(ROWS), "k", "o", [("r", "rank", "x", None)],
            hot_keys=["a"], salt_width=2)
    with pytest.raises(NotImplementedError, match="cross-salt"):
        salted_partitioned_window(
            _ds(ROWS), "k", "o", [("t", "ntile", None, 2)],
            hot_keys=["a"], salt_width=2)


def test_ntile(ray_session):
    rows = ([{"k": "a", "o": i, "x": i} for i in range(5)]
            + [{"k": "b", "o": i, "x": i} for i in range(2)])
    df = (
        partitioned_window(_ds(rows), "k", ["o"],
                           [("t2", "ntile", None, 2),
                            ("t4", "ntile", None, 4)])
        .to_pandas().sort_values(["k", "o"]).reset_index(drop=True)
    )
    # 5 rows / 2 tiles: first tile gets 3; 5 / 4: sizes 2,1,1,1
    assert df[df["k"] == "a"]["t2"].tolist() == [1, 1, 1, 2, 2]
    assert df[df["k"] == "a"]["t4"].tolist() == [1, 1, 2, 3, 4]
    # 2 rows / 4 tiles: one row per tile
    assert df[df["k"] == "b"]["t4"].tolist() == [1, 2]


def test_salted_rolling_window_spans_multiple_salts(ray_session):
    # window (7) larger than the salt width (3): the leading rows of each
    # salt reach back across SEVERAL previous salts; the driver's running
    # tail walk must keep the full W-1 history
    from docling_service_ray.functions.window import salted_partitioned_window

    rows = [{"k": "m", "o": i, "x": (i * 13) % 17} for i in range(50)]
    specs = [("roll7", "rolling_sum", "x", 7)]
    unsalted = (
        partitioned_window(_ds(rows), "k", ["o"], specs)
        .to_pandas().sort_values("o").reset_index(drop=True)
    )
    salted = (
        salted_partitioned_window(
            _ds(rows).repartition(8), "k", "o", specs,
            hot_keys=["m"], salt_width=3)
        .to_pandas().sort_values("o").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        unsalted, salted[unsalted.columns], check_dtype=False)


def test_detect_hot_keys_feeds_salted_window(ray_session):
    # the AUTO path: detect_hot_keys profiles the planted mega key and its
    # result drives salted_partitioned_window directly — same answer as
    # the unsalted plan, no hand-tuned hot list
    from docling_service_ray.functions.heavy_hitters import detect_hot_keys
    from docling_service_ray.functions.window import salted_partitioned_window

    rows = _mega_rows()
    ds = _ds(rows).repartition(16)
    hot = detect_hot_keys(ds, "k", phi_inv=3)  # mega holds 5000/5040 rows
    assert hot == ["mega"]
    specs = [("rn", "row_number", None, None),
             ("cum", "cumsum", "x", None)]
    unsalted = (
        partitioned_window(_ds(rows), "k", ["o"], specs)
        .to_pandas().sort_values(["k", "o"]).reset_index(drop=True)
    )
    auto = (
        salted_partitioned_window(ds, "k", "o", specs,
                                  hot_keys=hot, salt_width=100)
        .to_pandas().sort_values(["k", "o"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(unsalted, auto[unsalted.columns],
                                  check_dtype=False)


def test_trailing_range_frame_ties_and_invariance(ray_session, tmp_path):
    """RANGE-frame trailing-hour sum: ts-peers share one frame (SQL RANGE
    semantics — the frame depends only on (user, ts)), boundary at
    exactly ts - 1h is INCLUSIVE, and output is invariant to the input
    block layout."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from docling_service_ray.pipelines.relational import trailing_hour_value

    H = 3_600_000_000
    base = 1_700_000_000_000_000
    rows = [
        # user 1: two ts-PEERS at base, one exactly 1h later (inclusive
        # boundary pulls the peers in), one 1h+1us later (drops them)
        (1, 1, base, 10.0),
        (2, 1, base, 20.0),
        (3, 1, base + H, 5.0),
        (4, 1, base + H + 1, 7.0),
        # user 2: isolated event
        (5, 2, base, 1.0),
    ]
    df = pd.DataFrame(rows, columns=["event_id", "user_id", "ts_i", "value"])
    df["ts"] = pd.to_datetime(df["ts_i"], unit="us")
    tbl = pa.table({
        "event_id": pa.array(df["event_id"], pa.int64()),
        "user_id": pa.array(df["user_id"], pa.int64()),
        "ts": pa.array(df["ts"], pa.timestamp("us")),
        "value": pa.array(df["value"], pa.float64()),
    })
    sf = tmp_path / "sf"
    sf.mkdir()
    pq.write_table(tbl, sf / "events.parquet")

    out = trailing_hour_value(str(sf)).to_pandas() \
        .sort_values("event_id").reset_index(drop=True)
    want = {
        1: (30_000_000, 2),   # both peers at base share the frame
        2: (30_000_000, 2),
        3: (35_000_000, 3),   # base peers at exactly -1h are INCLUDED
        4: (12_000_000, 2),   # base peers fell out; ts=base+H stays
        5: (1_000_000, 1),
    }
    for eid, (s, n) in want.items():
        row = out[out["event_id"] == eid].iloc[0]
        assert (row["trailing_micros"], row["trailing_n"]) == (s, n), eid

    # block-layout invariance: same table written as 3 row groups
    sf2 = tmp_path / "sf2"
    sf2.mkdir()
    pq.write_table(tbl, sf2 / "events.parquet", row_group_size=2)
    out2 = trailing_hour_value(str(sf2)).to_pandas() \
        .sort_values("event_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(out, out2)


def test_hourly_gap_fill_planted(ray_session, tmp_path):
    """Dense grid: gap hours appear with zero counts and the
    forward-filled last observation; the span guard raises loudly."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq
    import pytest as _pytest

    from docling_service_ray.pipelines.relational import hourly_gap_fill

    H = 3_600_000_000
    base_h = 500_000
    rows = [
        # user 1: hours 0 and 3 observed -> grid 0..3, gaps at 1, 2
        (1, base_h * H, 2.0),
        (1, base_h * H + 10, 3.0),          # same hour, sums to 5.0
        (1, (base_h + 3) * H, 7.0),
        # user 2: single hour -> span 1, no gaps
        (2, (base_h + 9) * H, 1.5),
    ]
    df = pd.DataFrame(rows, columns=["user_id", "ts_us", "value"])
    tbl = pa.table({
        "user_id": pa.array(df["user_id"], pa.int64()),
        "ts": pa.array(pd.to_datetime(df["ts_us"], unit="us"),
                       pa.timestamp("us")),
        "value": pa.array(df["value"], pa.float64()),
    })
    sf = tmp_path / "sf"
    sf.mkdir()
    pq.write_table(tbl, sf / "events.parquet")

    out = hourly_gap_fill(str(sf)).to_pandas() \
        .sort_values(["user_id", "hour_bucket"]).reset_index(drop=True)
    got = {(r.user_id, r.hour_bucket): (r.n_events, r.value_micros,
                                        r.ffill_micros)
           for r in out.itertuples()}
    assert len(out) == 5  # 4-hour grid for user 1 + 1 for user 2
    assert got[(1, base_h)] == (2, 5_000_000, 5_000_000)
    assert got[(1, base_h + 1)] == (0, 0, 5_000_000)   # gap: ffill carries
    assert got[(1, base_h + 2)] == (0, 0, 5_000_000)
    assert got[(1, base_h + 3)] == (1, 7_000_000, 7_000_000)
    assert got[(2, base_h + 9)] == (1, 1_500_000, 1_500_000)

    with _pytest.raises(ValueError, match="max_span_hours"):
        hourly_gap_fill(str(sf), max_span_hours=2).to_pandas()
