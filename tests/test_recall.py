"""Measured recall/precision of the approximate family (VERDICT item:
planted-duplicate truth + exact-vs-approx comparisons, asserted here and
recorded per-round by the driver via the *_recall queries)."""

import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def queries(ray_session):
    import __ray_entry__ as entry

    return entry.queries()


def test_neardup_recall_planted(queries):
    rows = {
        r["method"]: r
        for r in queries["neardup_recall"](SF).to_dict("records")
    }
    assert set(rows) == {"minhash_lsh", "ngram_jaccard", "simhash"}
    assert rows["minhash_lsh"]["n_truth"] > 0
    # the planted perturbation sits well above every verify threshold;
    # banding recall at that similarity is ~1 for the jaccard methods
    assert rows["minhash_lsh"]["recall_pct"] >= 95
    assert rows["ngram_jaccard"]["recall_pct"] >= 95
    # simhash pigeonhole (hamming<=3) is the coarsest method in the family
    assert rows["simhash"]["recall_pct"] >= 75
    for r in rows.values():
        assert r["precision_pct"] >= 70


def test_ann_ivf_recall(queries):
    row = queries["ann_ivf_recall"](SF).to_dict("records")[0]
    # unclustered random embeddings are IVF's worst case; nprobe=8/16
    # measures ~0.84 there (see similarity.ivf_topk docstring)
    assert row["recall_pct"] >= 70


def test_embedding_lsh_recall(queries):
    row = queries["embedding_lsh_recall"](SF).to_dict("records")[0]
    assert row["n_exact_pairs"] > 0
    # 4-table sign-LSH: 1-(1-r)^4 with r~0.63 single-table -> >=0.95
    assert row["recall_pct"] >= 90


def test_quantile_sketch_error(queries):
    row = queries["quantile_sketch_error"](SF).to_dict("records")[0]
    assert row["n_rows"] > 0
    # sf0.001 has fewer rows than sample_k, so the "sample" is the full
    # column and the measured rank error collapses to the quantization
    # floor; at any corpus size the O(N/sqrt(k)) bound puts it under a
    # few percent
    assert row["max_rank_err_pct"] < 3.0
