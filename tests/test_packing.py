"""Sequence packing invariants (stages/packing.py)."""

import pytest


@pytest.fixture(scope="module")
def chunks_ds(ray_session):
    import ray.data as rd

    from docling_service_ray.functions.hashing import stable_seed

    rng = stable_seed("packtest")
    rows = [
        {"doc_id": d, "chunk_idx": c, "n_chunk_chars": int(rng.integers(50, 501))}
        for d in range(40)
        for c in range(int(rng.integers(1, 6)))
    ]
    return rd.from_items(rows), rows


BUDGET = 1000


def test_pack_invariants(chunks_ds):
    from docling_service_ray.stages.packing import pack_chunks

    ds, rows = chunks_ds
    out = pack_chunks(ds, budget=BUDGET, n_buckets=4).to_pandas()
    # every chunk packed exactly once
    assert len(out) == len(rows)
    assert not out.duplicated(["doc_id", "chunk_idx"]).any()
    # no pack exceeds the budget (all chunk sizes <= budget here)
    per_pack = out.groupby("pack_id")["n_chunk_chars"].sum()
    assert (per_pack <= BUDGET).all()


def test_pack_deterministic_across_parallelism(chunks_ds):
    from docling_service_ray.stages.packing import pack_chunks

    ds, _ = chunks_ds
    a = (
        pack_chunks(ds, budget=BUDGET, n_buckets=4)
        .to_pandas()
        .sort_values(["doc_id", "chunk_idx"])
        .reset_index(drop=True)
    )
    b = (
        pack_chunks(ds.repartition(7), budget=BUDGET, n_buckets=4)
        .to_pandas()
        .sort_values(["doc_id", "chunk_idx"])
        .reset_index(drop=True)
    )
    assert a["pack_id"].tolist() == b["pack_id"].tolist()


def test_oversized_chunk_gets_own_pack(ray_session):
    import ray.data as rd

    from docling_service_ray.stages.packing import pack_chunks

    ds = rd.from_items(
        [
            {"doc_id": 0, "chunk_idx": 0, "n_chunk_chars": 5000},  # > budget
            {"doc_id": 0, "chunk_idx": 1, "n_chunk_chars": 100},
        ]
    )
    out = pack_chunks(ds, budget=BUDGET, n_buckets=4).to_pandas().set_index("chunk_idx")
    assert out.loc[0, "pack_id"] != out.loc[1, "pack_id"]


def test_pack_stats(chunks_ds):
    from docling_service_ray.stages.packing import pack_chunks, pack_stats

    ds, rows = chunks_ds
    packed = pack_chunks(ds, budget=BUDGET, n_buckets=4)
    stats = pack_stats(packed, budget=BUDGET).to_pandas()
    assert int(stats["n_chunks"].sum()) == len(rows)
    assert (stats["fill_pct"] <= 100).all()
    # FFD should fill reasonably on uniform(50,500) sizes (4 buckets so
    # each holds enough chunks to pack against each other)
    assert stats["fill_pct"].mean() > 70
