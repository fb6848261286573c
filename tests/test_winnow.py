"""Winnowing fingerprints: the SIGMOD'03 guarantee, a naive reference,
and the distributed overlap miner on planted verbatim overlap."""

import numpy as np
import pytest

from docling_service_ray.stages.winnow import (
    kgram_hashes,
    winnow_fingerprints,
    winnow_select,
)

K, W = 5, 4


def naive_fingerprints(text, k=K, w=W):
    """Independent reference: per-position k-gram hash loop + explicit
    window-minimum scan."""
    kh = kgram_hashes(text, k)  # hash fn is the unit under test elsewhere
    if len(kh) == 0:
        return set()
    if len(kh) < w:
        return {int(kh.min())}
    out = set()
    for i in range(len(kh) - w + 1):
        out.add(int(min(kh[i:i + w])))
    return out


@pytest.mark.parametrize("text", [
    "", "a", "abcd", "abcde", "abcdef",
    "the quick brown fox jumps over the lazy dog",
    "aaaaaaaaaaaaaaaa",  # degenerate repeats
    "päragraph with ünicode and\nnewlines\tand tabs " * 3,
])
def test_matches_naive_reference(text):
    got = set(int(x) for x in winnow_fingerprints(text, k=K, w=W))
    assert got == naive_fingerprints(text)


def test_shared_substring_guarantee():
    """Any substring of length >= w + k - 1 shared by two documents
    yields at least one common fingerprint (the winnowing theorem)."""
    rng = np.random.default_rng(5)
    alpha = "abcdefghijklmnopqrstuvwxyz "
    mk = lambda n: "".join(rng.choice(list(alpha), n))  # noqa: E731
    shared = mk(W + K - 1)  # exactly the guarantee threshold
    for _ in range(25):
        a = mk(40) + shared + mk(40)
        b = mk(40) + shared + mk(40)
        fa = set(int(x) for x in winnow_fingerprints(a, k=K, w=W))
        fb = set(int(x) for x in winnow_fingerprints(b, k=K, w=W))
        assert fa & fb, "guarantee violated"


def test_density_bound():
    """Expected fingerprint density is ~2/(w+1) per k-gram; assert a
    generous upper bound so a selection bug (selecting everything)
    fails loudly."""
    rng = np.random.default_rng(9)
    text = "".join(rng.choice(list("abcdefghijklmnop"), 5000))
    n_kgrams = len(text) - K + 1
    n_fps = len(winnow_fingerprints(text, k=K, w=W))
    assert n_fps <= n_kgrams * 3.0 / (W + 1)


def test_no_false_selection_on_short_docs():
    assert len(winnow_fingerprints("abc", k=K, w=W)) == 0  # < k chars
    assert len(winnow_fingerprints("abcde", k=K, w=W)) == 1  # 1 kgram


def test_overlap_pairs_planted(ray_session):
    """Distributed miner: a verbatim paragraph planted into two of four
    documents links exactly that pair."""
    import ray.data as rd

    from docling_service_ray.stages.winnow import winnow_overlap_pairs

    rng = np.random.default_rng(11)
    alpha = "abcdefghijklmnopqrstuvwxyz "
    mk = lambda n: "".join(rng.choice(list(alpha), n))  # noqa: E731
    plagiarized = mk(60)
    docs = [
        {"doc_id": 0, "text": mk(200) + plagiarized + mk(200)},
        {"doc_id": 1, "text": mk(200)},
        {"doc_id": 2, "text": mk(150) + plagiarized + mk(250)},
        {"doc_id": 3, "text": mk(200)},
    ]
    ds = rd.from_items(docs)
    pairs = winnow_overlap_pairs(ds, min_shared=3).to_pandas()
    found = set(zip(pairs["a"], pairs["b"]))
    assert (0, 2) in found
    assert all(p == (0, 2) for p in found)


def test_overlap_pairs_parallelism_invariant(ray_session):
    import ray.data as rd

    from docling_service_ray.stages.winnow import winnow_overlap_pairs

    rng = np.random.default_rng(13)
    alpha = "abcdefgh "
    mk = lambda n: "".join(rng.choice(list(alpha), n))  # noqa: E731
    shared = mk(50)
    docs = [{"doc_id": i, "text": mk(100) + (shared if i % 2 == 0 else "")
             + mk(100)} for i in range(8)]
    a = winnow_overlap_pairs(rd.from_items(docs), min_shared=2) \
        .to_pandas().sort_values(["a", "b"]).reset_index(drop=True)
    b = winnow_overlap_pairs(rd.from_items(docs).repartition(5),
                             min_shared=2) \
        .to_pandas().sort_values(["a", "b"]).reset_index(drop=True)
    import pandas as pd

    pd.testing.assert_frame_equal(a, b)
