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


# ---------------------------------------------------------------------------
# detect_hot_keys: auto hot-key source for the salted plans
# ---------------------------------------------------------------------------
def test_detect_hot_keys_planted_skew_exact(ray_session):
    import numpy as np
    import pandas as pd
    import ray

    from docling_service_ray.functions.heavy_hitters import detect_hot_keys

    rng = np.random.default_rng(11)
    # planted: key 7 = 5000 rows, key 9 = 1200 rows, 100..200 cold (<=60)
    keys = np.concatenate([
        np.full(5000, 7), np.full(1200, 9),
        rng.integers(100, 200, 3800),
    ]).astype("int64")
    ds = ray.data.from_pandas(pd.DataFrame({"k": keys})).repartition(9)
    n = len(keys)
    # threshold 10% of N=10000 -> exactly {7, 9}? 9 has 1200 >= 1000 yes
    hot = detect_hot_keys(ds, "k", phi_inv=10, capacity=64)
    assert hot == [7, 9]                      # hottest first, exact
    assert all(isinstance(h, (int, np.integer)) for h in hot)  # dtype kept
    # tighter threshold: only the mega key survives
    assert detect_hot_keys(ds, "k", phi_inv=5) == [7]
    # no key reaches 90%: empty
    assert detect_hot_keys(ds, "k", phi_inv=1) == []


def test_detect_hot_keys_feeds_salted_join_and_beats_unsalted(ray_session):
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray

    from docling_service_ray.functions.hashing import bucket_column
    from docling_service_ray.functions.heavy_hitters import detect_hot_keys
    from docling_service_ray.functions.joins import skew_salted_join

    rng = np.random.default_rng(5)
    keys = np.concatenate([np.full(4000, 7),
                           rng.integers(100, 200, 1500)]).astype("int64")
    big_df = pd.DataFrame({"k": keys, "v": np.arange(len(keys), dtype="int64")})
    small_df = pd.DataFrame({"k": np.arange(0, 220, dtype="int64"),
                             "label": [f"L{i}" for i in range(220)]})
    big = ray.data.from_pandas(big_df).repartition(7)
    small = ray.data.from_pandas(small_df)

    hot = detect_hot_keys(big, "k", phi_inv=4)   # 4000/5500 > 1/4
    assert hot == [7]

    out = skew_salted_join(
        big, small, "k", hot_keys=set(hot), n_salt=4,
        bschema=pa.schema([("k", pa.int64()), ("v", pa.int64())]),
        sschema=pa.schema([("k", pa.int64()), ("label", pa.string())]),
    ).to_pandas().sort_values(["k", "v"]).reset_index(drop=True)
    expected = (big_df.merge(small_df, on="k")
                .sort_values(["k", "v"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(out[["k", "v", "label"]], expected)

    # structural win over the unsalted plan: the hot key's 4000 big-side
    # rows land in ONE bucket unsalted; salted across 4 salts no
    # co-location bucket holds more than ~1/4 of them (same (key, salt)
    # bucket scheme skew_salted_join uses internally)
    from collections import Counter

    n_buckets = 64
    hot_rows = big_df[big_df["k"] == 7]
    t = bucket_column(pa.table({"k": hot_rows["k"].to_numpy()}),
                      "k", 1 << 30, "__h")
    h = t["__h"].to_numpy()
    assert len(set((h % n_buckets).tolist())) == 1   # all in one bucket
    salts = np.arange(len(hot_rows)) % 4
    salted = (h + salts * 1000003) % n_buckets
    worst = max(Counter(salted.tolist()).values())
    assert worst <= len(hot_rows) / 4 + 1


def test_bigram_series_never_crosses_documents():
    import pandas as pd

    from docling_service_ray.pipelines.training import _bigram_series

    texts = pd.Series(["a b c", "c d", "", None, "  x  ", "e  f"])
    pairs = sorted(_bigram_series(texts).tolist())
    # no ("c c") pair across rows 0->1, no pair for 1-token / empty rows,
    # multi-space splits like single space
    assert pairs == ["a b", "b c", "c d", "e f"]


def test_frequent_bigrams_planted(ray_session):
    import pandas as pd
    import ray

    import docling_service_ray.pipelines.training as tr

    # 'hot pair' appears 30/102 pairs (>1/800); everything else unique-ish
    docs = ["hot pair"] * 30 + [f"w{i} u{i} v{i}" for i in range(36)]
    df = pd.DataFrame({"doc_id": range(len(docs)), "text": docs})
    tmp = "/tmp/bigram_sf"
    import os
    os.makedirs(tmp, exist_ok=True)
    import pyarrow as pa
    import pyarrow.parquet as pq
    pq.write_table(pa.table({"doc_id": pa.array(df["doc_id"], pa.int64()),
                             "text": df["text"].tolist()}),
                   f"{tmp}/documents.parquet")
    out = tr.QUERIES["frequent_bigrams"](tmp)
    out = out.to_pandas() if hasattr(out, "to_pandas") else out
    got = dict(zip(out["bigram"], out["cnt"]))
    assert got["hot pair"] == 30
    # the unique-ish pairs each appear once out of 102: below 1/800? no —
    # 1/102 > 1/800, so EVERY pair qualifies here; check total rows exact
    assert len(out) == 73  # 'hot pair' + 36 docs x 2 pairs each
