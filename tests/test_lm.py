"""Bigram LM: count exactness, reference-exact scoring, the quality
signal direction (repetitive < salad), guards, determinism."""

import math

import numpy as np
import pandas as pd
import pytest

from docling_service_ray.stages.lm import BigramScore, _doc_pairs


def ref_score(text: str, uni: dict, bi: dict, v: int) -> tuple[int, float]:
    """Pure-Python reference: Laplace bigram cross-entropy in bits."""
    toks = text.strip().split()
    pairs = list(zip(toks, toks[1:]))
    if not pairs:
        return 0, 0.0
    s = 0.0
    for w1, w2 in pairs:
        p = (bi.get(f"{w1} {w2}", 0) + 1) / (uni.get(w1, 0) + v)
        s += -math.log2(p)
    return len(pairs), s / len(pairs)


def test_doc_pairs_alignment():
    row, left, right = _doc_pairs(pd.Series(["a b c", "", "  ", "x y"]))
    np.testing.assert_array_equal(row, [0, 0, 3])
    assert list(left) == ["a", "b", "x"]
    assert list(right) == ["b", "c", "y"]


def test_train_counts_exact(ray_session):
    import ray.data as rd

    from docling_service_ray.stages.lm import train_bigram_lm

    texts = ["the cat sat", "the cat ran", "dog", ""]
    model = train_bigram_lm(
        rd.from_items([{"text": t} for t in texts]).repartition(3))
    assert model["uni"] == {"the": 2, "cat": 2, "sat": 1, "ran": 1, "dog": 1}
    assert model["bi"] == {"the cat": 2, "cat sat": 1, "cat ran": 1}
    assert model["v"] == 5


def test_scoring_matches_reference(ray_session):
    import ray.data as rd

    from docling_service_ray.stages.lm import score_corpus, train_bigram_lm

    texts = ["the cat sat on the mat", "the cat sat", "mat the on",
             "zz unknown words here", "solo", ""]
    ds = rd.from_items(
        [{"doc_id": i, "text": t} for i, t in enumerate(texts)]
    ).repartition(2)
    model = train_bigram_lm(rd.from_items([{"text": t} for t in texts]))
    out = score_corpus(ds, model).to_pandas().sort_values("doc_id")
    for i, t in enumerate(texts):
        n, x = ref_score(t, model["uni"], model["bi"], model["v"])
        row = out[out["doc_id"] == i].iloc[0]
        assert row["n_pairs"] == n, t
        assert row["xent_bits"] == pytest.approx(x, abs=1e-12), t


def test_quality_signal_direction():
    """With equally common unigrams, a document of seen bigrams scores
    lower cross-entropy than a scramble of never-seen bigrams (the
    unigram frequencies are held equal so the Laplace denominator does
    not confound the comparison)."""
    uni = {"a": 100, "b": 100, "c": 100, "d": 100}
    bi = {"a b": 100, "c d": 100}
    model = {"uni": uni, "bi": bi, "v": 4}
    sc = BigramScore(model)
    out = sc(pd.DataFrame({"doc_id": [0, 1],
                           "text": ["a b c d", "a c b d"]}))
    assert out.loc[0, "xent_bits"] < out.loc[1, "xent_bits"]


def test_max_vocab_guard(ray_session):
    import ray.data as rd

    from docling_service_ray.stages.lm import train_bigram_lm

    ds = rd.from_items([{"text": "one two three four five"}])
    with pytest.raises(ValueError, match="max_vocab"):
        train_bigram_lm(ds, max_vocab=3)


def test_registered_query_runs_and_is_deterministic(ray_session):
    from docling_service_ray.pipelines.training import lm_perplexity

    a = lm_perplexity("/root/testdata/sf0.001").to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    b = lm_perplexity("/root/testdata/sf0.001").to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    assert (a["xent_bits"] >= 0).all()
    assert (a.loc[a["n_pairs"] == 0, "xent_bits"] == 0).all()
