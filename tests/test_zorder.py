"""Z-order keys: bit-exactness vs a naive reference, locality, and the
MEASURED row-group pruning benefit that justifies the operator."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from docling_service_ray.functions.zorder import zorder_key2


def naive_morton(x: int, y: int) -> int:
    z = 0
    for i in range(31):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


def test_matches_naive_bit_loop():
    rng = np.random.default_rng(3)
    xs = rng.integers(0, 1 << 31, 200).astype(np.uint64)
    ys = rng.integers(0, 1 << 31, 200).astype(np.uint64)
    got = zorder_key2(xs, ys)
    want = np.array([naive_morton(int(x), int(y)) for x, y in zip(xs, ys)],
                    dtype=np.int64)
    np.testing.assert_array_equal(got, want)
    assert (got >= 0).all()  # 31-bit inputs keep the key positive


def test_locality_beats_single_column_sort():
    """The operator's reason to exist, measured: write identical rows
    z-sorted vs leading-column-sorted with small row groups; a 2-D box
    predicate must touch FEWER row groups under the z layout (min/max
    stats pruning, counted from parquet metadata)."""
    rng = np.random.default_rng(7)
    n = 20_000
    df = pd.DataFrame({
        "x": rng.integers(0, 1024, n).astype(np.int64),
        "y": rng.integers(0, 1024, n).astype(np.int64),
    })
    df["z"] = zorder_key2(df["x"].to_numpy(np.uint64),
                          df["y"].to_numpy(np.uint64))

    def groups_touched(sorted_df, tmp, box):
        (xlo, xhi), (ylo, yhi) = box
        path = str(tmp)
        pq.write_table(pa.Table.from_pandas(sorted_df, preserve_index=False),
                       path, row_group_size=500)
        f = pq.ParquetFile(path)
        touched = 0
        for g in range(f.metadata.num_row_groups):
            meta = f.metadata.row_group(g)
            stats = {meta.column(i).path_in_schema: meta.column(i).statistics
                     for i in range(meta.num_columns)}
            if (stats["x"].min <= xhi and stats["x"].max >= xlo
                    and stats["y"].min <= yhi and stats["y"].max >= ylo):
                touched += 1
        return touched, f.metadata.num_row_groups

    import os
    import tempfile

    # predicate on the NON-leading dimension: any x, a narrow y stripe.
    # A leading-column sort cannot prune it at all (every group spans the
    # full y range); the z layout prunes on both axes at once.
    box = ((0, 1023), (100, 160))
    with tempfile.TemporaryDirectory() as td:
        zt, total = groups_touched(df.sort_values("z"),
                                   os.path.join(td, "z.parquet"), box)
        xt, xtotal = groups_touched(df.sort_values(["x", "y"]),
                                    os.path.join(td, "x.parquet"), box)
    assert xt == xtotal  # x-sort: zero pruning on a y-stripe predicate
    assert zt < xt, (zt, xt, total)
    assert zt <= total // 2  # z layout prunes at least half the groups


def test_interleave_orders_quadrants():
    """Coarse sanity of the bit layout: the top interleaved bits order
    the four quadrants of the plane."""
    half = 1 << 30
    q00 = int(zorder_key2(np.array([0], np.uint64),
                          np.array([0], np.uint64))[0])
    q10 = int(zorder_key2(np.array([half], np.uint64),
                          np.array([0], np.uint64))[0])
    q01 = int(zorder_key2(np.array([0], np.uint64),
                          np.array([half], np.uint64))[0])
    q11 = int(zorder_key2(np.array([half], np.uint64),
                          np.array([half], np.uint64))[0])
    assert q00 < q10 < q01 < q11
