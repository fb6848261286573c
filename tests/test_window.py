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
        partitioned_window(_ds(ROWS), "k", ["o"], [("y", "ntile", "x", None)])


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
