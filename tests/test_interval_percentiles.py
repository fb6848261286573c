"""Oracle verification for the queries registered past the driver's
50-query window (interval join, grouped percentiles): the same DuckDB
side-by-side comparison the driver runs, executed here so they keep a
strict rows+schema+values signal every round."""

import duckdb
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"
TABLES = ("events", "documents")


def _oracle(sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF}/{t}.parquet')"
        )
    return con.execute(sql).df()


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif str(df[c].dtype).startswith(("int", "uint")):
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(
        drop=True
    )


@pytest.mark.parametrize(
    "name",
    ["interval_join_events", "grouped_percentiles", "chunk_documents",
     "bpe_token_counts"]
)
def test_window_overflow_queries_match_oracle(ray_session, name):
    import __ray_entry__ as entry

    got = entry.queries()[name](SF)
    got = got.to_pandas() if not isinstance(got, pd.DataFrame) else got
    want = _oracle(entry.oracle_sql()[name])
    pd.testing.assert_frame_equal(_canon(got), _canon(want))
