"""Range partitioner: exact boundaries, balanced shards, ordered layout."""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray

from docling_service_ray.functions.partitioning import (
    assign_range_partition,
    exact_quantile_boundaries,
    range_partitioned_write,
)


def _ds(values, n_blocks=4):
    t = pa.table({"k": pa.array(values, pa.int64()),
                  "v": pa.array(range(len(values)), pa.int64())})
    return ray.data.from_arrow(t).repartition(n_blocks)


def test_boundaries_are_exact_quantiles(ray_session):
    vals = list(range(1, 101))  # 1..100
    b = exact_quantile_boundaries(_ds(vals), "k", 4)
    assert b == [25, 50, 75]


def test_assignment_balanced_and_consistent(ray_session):
    rng = np.random.default_rng(11)
    vals = rng.integers(0, 10000, 8000).tolist()
    ds = _ds(vals)
    b = exact_quantile_boundaries(ds, "k", 8)
    assert b == sorted(b)
    out = assign_range_partition(ds, "k", b).to_pandas()
    # every row in the declared range
    for i, grp in out.groupby("part"):
        if i > 0:
            assert (grp["k"] >= b[i - 1]).all()
        if i < len(b):
            assert (grp["k"] < b[i]).all()
    # exact-quantile cuts on near-unique values -> balanced within 20%
    sizes = out.groupby("part").size()
    assert len(sizes) == 8
    assert sizes.max() <= 1.2 * sizes.min()


def test_range_partitioned_write_ordered_layout(ray_session, tmp_path):
    vals = list(range(1000))
    path = str(tmp_path / "ranged")
    bounds = range_partitioned_write(_ds(vals), "k", 4, path)
    dirs = sorted(d for d in os.listdir(path) if d.startswith("part="))
    assert len(dirs) == 4
    # reading shard directories in index order yields globally ordered
    # ranges: max(shard i) < min(shard i+1)
    prev_max = -1
    for d in sorted(dirs, key=lambda s: int(s.split("=")[1])):
        t = pq.read_table(os.path.join(path, d), columns=["k"])
        ks = t["k"].to_numpy()
        assert ks.min() > prev_max
        prev_max = ks.max()
    assert bounds == sorted(bounds)


def test_exact_boundaries_guard_raises(ray_session):
    import ray.data as rd

    from docling_service_ray.functions.partitioning import (
        exact_quantile_boundaries,
    )

    ds = rd.range(500).map_batches(
        lambda df: df.rename(columns={"id": "v"}), batch_format="pandas"
    )
    with pytest.raises(ValueError, match="sampled_quantile_boundaries"):
        exact_quantile_boundaries(ds, "v", 4, max_distinct=100)


def test_sampled_boundaries_deterministic_across_processes(tmp_path):
    """Two FRESH interpreters (forced-different PYTHONHASHSEED, so any
    builtin-hash() leak in the seeding would diverge) must produce
    byte-identical boundaries on the same block layout."""
    import json
    import subprocess
    import sys

    script = r"""
import json, sys
import numpy as np, pandas as pd, ray
import ray.data as rd
from docling_service_ray.functions.partitioning import (
    sampled_quantile_boundaries)
ray.init(address="local", num_cpus=2, include_dashboard=False,
         ignore_reinit_error=True, logging_level="ERROR")
rng = np.random.default_rng(7)
ds = rd.from_pandas(pd.DataFrame({"v": rng.normal(0, 1, 20000)}))
ds = ds.repartition(8)
b = sampled_quantile_boundaries(ds, "v", 4, sample_k=2048)
print("BOUNDS=" + json.dumps([float(x) for x in b]))
ray.shutdown()
"""
    outs = []
    for seed in ("1", "31337"):
        env = dict(os.environ, PYTHONHASHSEED=seed, RAY_ADDRESS="")
        r = subprocess.run([sys.executable, "-c", script], env=env,
                           capture_output=True, text=True, timeout=300,
                           cwd="/root/repo")
        assert r.returncode == 0, r.stderr[-2000:]
        line = [l for l in r.stdout.splitlines() if l.startswith("BOUNDS=")]
        assert line, r.stdout
        outs.append(json.loads(line[0][len("BOUNDS="):]))
    assert outs[0] == outs[1]


def test_sampled_boundaries_balance(ray_session):
    import numpy as np
    import ray.data as rd

    from docling_service_ray.functions.partitioning import (
        assign_range_partition,
        sampled_quantile_boundaries,
    )

    # 50k-row skewed continuous domain (every value distinct)
    rng = np.random.default_rng(5)
    vals = np.concatenate([rng.normal(0, 1, 40000), rng.normal(50, 5, 10000)])
    ds = rd.from_pandas(pd.DataFrame({"v": vals})).repartition(16)
    bounds = sampled_quantile_boundaries(ds, "v", 4, sample_k=8192)
    assert len(bounds) == 3 and bounds == sorted(bounds)
    parts = assign_range_partition(ds, "v", bounds).to_pandas()
    shares = parts["part"].value_counts(normalize=True)
    # each quantile shard holds ~25%; sampling error well under 5 points
    assert shares.min() > 0.20 and shares.max() < 0.30
