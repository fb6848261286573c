"""End-to-end curation pipeline vs a hand-built corpus with one planted
victim per drop stage."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _letters(n: int) -> str:
    """Digit-free token stem (the quality score PENALIZES digits — a
    corpus of d10w47-style tokens flunks its own quality gate)."""
    import string

    n += 1
    s = ""
    while n:
        s += string.ascii_lowercase[n % 26]
        n //= 26
    return s


def _corpus():
    """Corpus with doc-unique, digit-free vocabularies so the only
    near-dups are the planted ones. Planted victims:

    - 900: low quality (all digits, no spaces)  -> quality filter
    - 901: exact duplicate of doc 1             -> exact dedup
    - 902: near-duplicate of doc 2 (1 word off) -> minhash dedup
    - 903: shares a 3-gram with the probe       -> decontamination
    """
    docs = {}
    for i in range(12):
        words = [f"{_letters(i)}q{_letters(j)}" for j in range(120)]
        # sprinkle common stopwords so quality_pm clears the bar
        for k in range(0, 120, 6):
            words[k] = ["the", "and", "for", "that", "with"][k // 6 % 5]
        docs[i] = " ".join(words)
    docs[900] = "1234567890" * 30
    docs[901] = docs[1]
    w2 = docs[2].split()
    w2[11] = "neardupmarker"
    docs[902] = " ".join(w2)
    # the contaminated doc's overlap gram exists ONLY in 903 + the probe
    docs[903] = " ".join(
        [f"xx{_letters(j)}" for j in range(50)]
        + ["contamgram", "alphatok", "betatok"]
        + [f"yy{_letters(j)}" for j in range(50)]
    )
    probe_text = "contamgram alphatok betatok"
    return docs, probe_text


def _run(docs, probe_text):
    import ray.data as rd

    from docling_service_ray.pipelines.curation import curate

    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(list(docs), pa.int64()),
        "text": pa.array(list(docs.values()), pa.string()),
    }))
    probe = rd.from_arrow(pa.table({
        "doc_id": pa.array([10_000], pa.int64()),
        "text": pa.array([probe_text], pa.string()),
    }))
    packed, kept_ids = curate(ds, probe, pack_budget=700)
    return packed.to_pandas(), sorted(kept_ids.to_pandas()["doc_id"])


def test_curation_drops_each_planted_victim(ray_session):
    docs, probe_text = _corpus()
    packed, kept = _run(docs, probe_text)

    assert 900 not in kept, "low-quality doc survived the quality filter"
    assert 901 not in kept, "exact duplicate survived"
    assert 902 not in kept, "near duplicate survived"
    assert 903 not in kept, "contaminated doc survived decontamination"
    assert set(kept) == set(range(12)), kept

    # chunk provenance matches the kept set exactly
    assert set(packed["doc_id"]) == set(kept)
    # every pack within budget except singleton oversized chunks
    by_pack = packed.groupby("pack_id")["n_chunk_chars"].agg(["sum", "count"])
    over = by_pack[by_pack["sum"] > 700]
    assert (over["count"] == 1).all(), "multi-chunk pack exceeds budget"
    # every kept doc fully chunked: chunk_idx contiguous from 0
    for d, grp in packed.groupby("doc_id"):
        idx = sorted(grp["chunk_idx"])
        assert idx == list(range(len(idx))), (d, idx)


def test_curation_deterministic(ray_session):
    docs, probe_text = _corpus()
    p1, k1 = _run(docs, probe_text)
    p2, k2 = _run(docs, probe_text)
    assert k1 == k2
    key = ["doc_id", "chunk_idx"]
    pd.testing.assert_frame_equal(
        p1.sort_values(key).reset_index(drop=True)[p2.columns],
        p2.sort_values(key).reset_index(drop=True),
    )
