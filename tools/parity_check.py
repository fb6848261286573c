"""Replicates the driver's correctness gate locally: run each queries()
entry and its oracle_sql() side-by-side, compare row count, column names,
and order-insensitive values. Usage:

    python tools/parity_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, "/root/repo")

TABLES = (
    "region nation customer supplier part orders lineitem events documents "
    "embeddings".split()
)


def to_df(res) -> pd.DataFrame:
    try:
        import ray.data

        if isinstance(res, ray.data.Dataset):
            return res.to_pandas()
    except ImportError:
        pass
    if isinstance(res, pd.DataFrame):
        return res
    return res.to_pandas()  # pyarrow.Table


STRICT = False  # --strict: no dtype coercion — representation must match too


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    if not STRICT:
        for c in df.columns:
            if str(df[c].dtype).startswith("datetime"):
                df[c] = df[c].astype("datetime64[us]")
            elif df[c].dtype == object:
                df[c] = df[c].astype(str)
            elif str(df[c].dtype).startswith(("int", "uint")):
                df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def main():
    import ray

    global STRICT
    args = [a for a in sys.argv[1:] if a != "--strict"]
    STRICT = "--strict" in sys.argv[1:]
    sf = args[0] if args else "/root/testdata/sf0.001"
    only = set(args[1:])
    ray.init(address="local", num_cpus=8, include_dashboard=False,
             logging_level="ERROR", ignore_reinit_error=True)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as entrymod

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )

    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            got = canon(to_df(fn(sf)))
        except Exception as exc:
            failures.append(name)
            print(f"FAIL {name}: query raised {type(exc).__name__}: {exc}")
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"ok?  {name}: rows={len(got)} cols={list(got.columns)} "
                  f"[rows-only, {dt:.1f}s]")
            continue
        try:
            exp = canon(con.execute(oracles[name]).df())
        except Exception as exc:
            failures.append(name)
            print(f"FAIL {name}: oracle raised {exc}")
            continue
        if list(got.columns) != list(exp.columns):
            failures.append(name)
            print(f"FAIL {name}: cols {list(got.columns)} != {list(exp.columns)}")
            continue
        if len(got) != len(exp):
            failures.append(name)
            print(f"FAIL {name}: rows {len(got)} != {len(exp)}")
            continue
        try:
            pd.testing.assert_frame_equal(got, exp, check_dtype=STRICT)
            print(f"PASS {name}: rows={len(got)} [{dt:.1f}s]")
        except AssertionError as exc:
            failures.append(name)
            print(f"FAIL {name}: values differ: {str(exc)[:300]}")
    ray.shutdown()
    if failures:
        print("FAILURES:", failures)
        sys.exit(1)
    print("all green")


if __name__ == "__main__":
    main()
