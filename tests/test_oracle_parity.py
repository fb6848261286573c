"""Local replica of the driver's correctness gate: every oracle-backed
queries() entry vs its DuckDB SQL at sf0.001 (row count + columns +
order-insensitive values)."""

import importlib.util
import os

import duckdb
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_spec = importlib.util.spec_from_file_location(
    "parity_check", os.path.join(REPO, "tools", "parity_check.py")
)
parity = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(parity)
# STRICT: the driver's value hash is representation-sensitive (int64 vs
# HUGEINT-float, us vs ns timestamps) — the local gate must be too
parity.STRICT = True


@pytest.fixture(scope="module")
def oracle_con():
    con = duckdb.connect()
    for t in parity.TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    return con


def _entry():
    spec = importlib.util.spec_from_file_location(
        "ray_entry", os.path.join(REPO, "__ray_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


ENTRY = _entry()
ORACLE_NAMES = sorted(ENTRY.oracle_sql().keys())


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_query_matches_oracle(name, ray_session, oracle_con):
    fn = ENTRY.queries()[name]
    got = parity.canon(parity.to_df(fn(SF)))
    exp = parity.canon(oracle_con.execute(ENTRY.oracle_sql()[name]).df())
    assert list(got.columns) == list(exp.columns)
    assert len(got) == len(exp)
    pd.testing.assert_frame_equal(got, exp, check_dtype=True)


def test_rows_only_queries_run(ray_session):
    qs, oracles = ENTRY.queries(), ENTRY.oracle_sql()
    rows_only = [n for n in qs if n not in oracles and n not in
                 ("extract_turns", "stitch_convs")]  # transcript ones covered elsewhere
    for name in rows_only:
        df = parity.to_df(qs[name](SF))
        assert df is not None


def test_entry_smoke(ray_session):
    ds = ENTRY.entry()
    df = parity.to_df(ds)
    assert len(df) > 0
    assert {"conv_id", "turn_idx", "extracted_text", "ok"} <= set(df.columns)
