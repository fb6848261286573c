"""Heavy-hitters completeness: the truncated-summary candidate set must
contain every word at/above the frequency threshold (the MG guarantee),
and the recounted output must equal the exact full-histogram answer."""

import numpy as np
import pandas as pd

from docling_service_ray.functions.heavy_hitters import (
    TOTAL_SENTINEL,
    recount_batch,
    select_candidates,
    summary_batch,
    truncate_counts,
)


def _exact_heavy(texts, phi_inv):
    words = (
        pd.Series(texts).str.strip().replace("", np.nan).dropna()
        .str.split(r"\s+").explode()
    )
    vc = words.value_counts()
    n = len(words)
    return set(vc[vc * phi_inv >= n].index), vc, n


def _zipf_texts(rng, n_docs=300, vocab=2000):
    # skewed corpus: a few hot words + a long tail
    ranks = rng.zipf(1.3, size=(n_docs, 120)) % vocab
    return [" ".join(f"w{r}" for r in row) for row in ranks]


def test_truncate_is_underestimate_with_bound():
    vc = pd.Series({f"w{i}": 1000 // (i + 1) for i in range(50)})
    cap = 10
    est = truncate_counts(vc, cap)
    assert len(est) <= cap
    assert ((vc[est.index] - est) >= 0).all()
    # dropped mass per item bounded by the (cap+1)-th largest count
    offset = vc.sort_values(ascending=False).iloc[cap]
    assert ((vc[est.index] - est) <= offset).all()


def test_candidates_complete_and_recount_exact():
    rng = np.random.default_rng(7)
    texts = _zipf_texts(rng)
    phi_inv, cap = 100, 400
    # simulate many independent batches
    parts = [
        summary_batch(pd.Series(texts[i:i + 30]), cap)
        for i in range(0, len(texts), 30)
    ]
    merged = (
        pd.concat(parts).groupby("word", as_index=False)["est"].sum()
    )
    cands, total = select_candidates(merged, phi_inv, cap)
    truth, vc, n = _exact_heavy(texts, phi_inv)
    assert total == n
    assert truth <= cands, f"missing heavy hitters: {truth - cands}"
    # exact recount over candidates reproduces the exact answer
    rec = (
        pd.concat(
            [recount_batch(pd.Series(texts[i:i + 30]), cands)
             for i in range(0, len(texts), 30)]
        )
        .groupby("word")["cnt"].sum()
    )
    got = set(rec[rec * phi_inv >= total].index)
    assert got == truth
    for w in truth:
        assert rec[w] == vc[w]


def test_sentinel_never_collides_with_tokens():
    # hostile doc whose tokens spell the sentinel and the word namespace:
    # the "w" prefix keeps them apart, so N stays exact
    s = summary_batch(pd.Series(["a b c", TOTAL_SENTINEL, "wN N wa"]), 10)
    assert (s["word"] == TOTAL_SENTINEL).sum() == 1
    assert int(s.loc[s["word"] == TOTAL_SENTINEL, "est"].iloc[0]) == 7
    cands, total = select_candidates(
        s.groupby("word", as_index=False)["est"].sum(), 10, 40
    )
    assert total == 7 and "N" in cands and "wN" in cands
