"""Bloom membership stage: no false negatives, bounded false positives,
parallelism-invariant build."""

import numpy as np
import pyarrow as pa
import ray

from docling_service_ray.stages.bloom import (
    bloom_probe_filter,
    build_bloom,
)

M_BITS = 1 << 18
K = 4


def _ids_ds(ids, n_blocks=1):
    ds = ray.data.from_arrow(pa.table({"k": pa.array(ids, pa.int64())}))
    return ds.repartition(n_blocks) if n_blocks > 1 else ds


def test_no_false_negatives(ray_session):
    ids = list(range(0, 20000, 2))
    bm = build_bloom(_ids_ds(ids, 8), "k", m_bits=M_BITS, k_hashes=K)
    # every inserted key must be a (possible) member -> anti-filter empty
    left = bloom_probe_filter(_ids_ds(ids, 4), "k", bm).count()
    assert left == 0


def test_fp_rate_near_theory(ray_session):
    members = list(range(0, 20000, 2))
    probes = list(range(1, 20001, 2))
    bm = build_bloom(_ids_ds(members, 8), "k", m_bits=M_BITS, k_hashes=K)
    kept = bloom_probe_filter(_ids_ds(probes, 4), "k", bm).count()
    fp = len(probes) - kept
    n, m = len(members), M_BITS
    theory = (1 - np.exp(-K * n / m)) ** K
    assert fp / len(probes) < max(2 * theory, 0.01)


def test_semi_mode_keeps_members(ray_session):
    members = [1, 2, 3, 4, 5]
    bm = build_bloom(_ids_ds(members), "k", m_bits=M_BITS, k_hashes=K)
    got = (
        bloom_probe_filter(_ids_ds([3, 4, 1000003]), "k", bm,
                           keep_matches=True)
        .to_pandas()["k"].tolist()
    )
    assert set(got) >= {3, 4} and 1000003 not in got or got == [3, 4]


def test_build_parallelism_invariant(ray_session):
    ids = list(range(5000))
    a = build_bloom(_ids_ds(ids, 1), "k", m_bits=M_BITS, k_hashes=K)
    b = build_bloom(_ids_ds(ids, 13), "k", m_bits=M_BITS, k_hashes=K)
    assert np.array_equal(a, b)


def test_string_keys(ray_session):
    ds = ray.data.from_arrow(
        pa.table({"k": pa.array([f"doc-{i}" for i in range(1000)])})
    )
    bm = build_bloom(ds, "k", m_bits=M_BITS, k_hashes=K)
    assert bloom_probe_filter(ds, "k", bm).count() == 0
