"""Training-data pipeline queries: text analysis, dedup family, similarity
search, and the flagship transcript pipelines — with DuckDB oracles where
the semantics are SQL-expressible, rows-only otherwise (stateful /
model-scoring / approximate ops).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..sources.tables import read_table

QUERIES: dict = {}
ORACLES: dict = {}


def register(name: str, sql: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if sql is not None:
            ORACLES[name] = sql
        return fn

    return deco


# ---------------------------------------------------------------------------
# text analysis
# ---------------------------------------------------------------------------
@register(
    "token_counts",
    # regexp_replace, not trim(): SQL trim strips spaces ONLY, while the
    # engine strips all whitespace — tabs/newlines at the edges must count
    # the same on both sides
    "SELECT doc_id, CASE WHEN regexp_replace(text, '^\\s+|\\s+$', '', 'g') = '' "
    "THEN 0 ELSE len(regexp_split_to_array("
    "regexp_replace(text, '^\\s+|\\s+$', '', 'g'), '\\s+')) END AS n_tokens "
    "FROM documents",
)
def token_counts(sf_dir: str):
    from ..stages.text_analysis import token_count_arrow

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(token_count_arrow, batch_format="pyarrow",
                          zero_copy_batch=True)


@register(
    "char_classes",
    "SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars_m, "
    "CAST(length(text) - length(replace(text, ' ', '')) AS BIGINT) AS n_spaces, "
    "CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS BIGINT) AS n_digits, "
    "CAST(length(text) - length(regexp_replace(text, '[aeiou]', '', 'g')) AS BIGINT) AS n_vowels "
    "FROM documents",
)
def char_classes(sf_dir: str):
    from ..stages.text_analysis import char_class_arrow

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(char_class_arrow, batch_format="pyarrow",
                          zero_copy_batch=True)


@register(
    "fingerprints",
    "SELECT doc_id, md5(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS fp "
    "FROM documents",
)
def fingerprints(sf_dir: str):
    from ..stages.text_analysis import fingerprint_arrow

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(fingerprint_arrow, batch_format="pyarrow",
                          zero_copy_batch=True)


@register("winnow_fps")  # rows-only (rolling-hash artifact)
def winnow_fps(sf_dir: str):
    """Winnowing LOCAL fingerprints (MOSS, SIGMOD'03): rolling-hash char
    k-grams + window minima — unlike the whole-document md5
    ``fingerprints``, shared substrings >= w+k-1 chars are guaranteed a
    common fingerprint. Exploded (doc_id, fp); density ~2/(w+1) per
    char. Guarantee/density/reference tests in tests/test_winnow.py."""
    from ..stages.winnow import fingerprint_batch

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(lambda b: fingerprint_batch(b),
                          batch_format="pandas")


@register("winnow_overlap")  # rows-only (pairs from rolling-hash artifact)
def winnow_overlap(sf_dir: str):
    """Verbatim-overlap pair mining over winnowing fingerprints
    (plagiarism/boilerplate detection): fingerprint-posting groupby,
    in-posting pair generation with a loud stop-fingerprint cap, one
    pair-keyed count aggregation — the LSH-banding plan shape. The
    synthetic corpus is a small-vocabulary word salad, so most
    fingerprints are corpus-wide boilerplate; the tight ``max_bucket``
    drops them (the stop-fingerprint mechanism working as designed) and
    only genuinely rare shared strings pair up."""
    from ..stages.winnow import winnow_overlap_pairs

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return winnow_overlap_pairs(ds, k=8, min_shared=3, max_bucket=50)


# The composite quality formula as a reusable subquery (carries `text`
# through so downstream oracles can fingerprint/group on it). Shared by
# quality_scores, dedup_keep_best and unpivot_quality so the three stay
# bit-identical by construction.
_QUALITY_CORE_SQL = (
    "WITH __t AS (SELECT doc_id, text, "
    "CAST(length(text) AS BIGINT) AS n_chars, "
    "CAST(length(text) - length(replace(text, ' ', '')) AS BIGINT) AS n_spaces, "
    "CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS BIGINT) "
    "AS n_digits, "
    "CAST(len(regexp_extract_all(text, '\\bthe\\b')) "
    "+ len(regexp_extract_all(text, '\\band\\b')) "
    "+ len(regexp_extract_all(text, '\\bof\\b')) "
    "+ len(regexp_extract_all(text, '\\bto\\b')) "
    "+ len(regexp_extract_all(text, '\\bin\\b')) AS BIGINT) AS stop_hits, "
    "CASE WHEN regexp_replace(text, '^\\s+|\\s+$', '', 'g') = '' THEN 0 "
    "ELSE len(regexp_split_to_array("
    "regexp_replace(text, '^\\s+|\\s+$', '', 'g'), '\\s+')) END AS n_tokens "
    "FROM documents), "
    "__u AS (SELECT doc_id, text, "
    "(n_spaces * 1000) // GREATEST(n_chars, 1) AS space_pm, "
    "(n_digits * 1000) // GREATEST(n_chars, 1) AS digit_pm, "
    "(stop_hits * 1000) // GREATEST(n_tokens, 1) AS stopword_pm, "
    "CASE WHEN n_chars BETWEEN 100 AND 20000 THEN 1000 ELSE 0 END AS len_score_pm "
    "FROM __t) "
    "SELECT doc_id, text, CAST(space_pm AS BIGINT) AS space_pm, "
    "CAST(digit_pm AS BIGINT) AS digit_pm, "
    "CAST(stopword_pm AS BIGINT) AS stopword_pm, "
    "CAST(GREATEST(LEAST(space_pm, 200) * 2 + LEAST(stopword_pm, 250) * 2 "
    "+ len_score_pm - digit_pm, 0) AS BIGINT) AS quality_pm FROM __u"
)


@register(
    "quality_scores",
    "SELECT doc_id, space_pm, digit_pm, stopword_pm, quality_pm "
    f"FROM ({_QUALITY_CORE_SQL}) __q",
)
def quality_scores(sf_dir: str):
    """Composite integer fixed-point quality score (training-data filter
    feature; zero-copy Arrow RE2 kernels, bit-exact SQL mirror)."""
    from ..stages.text_analysis import quality_score_arrow

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(quality_score_arrow, batch_format="pyarrow",
                          zero_copy_batch=True)


@register(
    "dedup_keep_best",
    "SELECT doc_id, quality_pm FROM ("
    "SELECT doc_id, quality_pm, ROW_NUMBER() OVER ("
    "PARTITION BY substr(regexp_replace(lower(text), '\\s+', ' ', 'g'), 1, 16) "
    "ORDER BY quality_pm DESC, doc_id) AS rn "
    f"FROM ({_QUALITY_CORE_SQL}) __q) __r WHERE rn = 1",
)
def dedup_keep_best(sf_dir: str):
    """Keep-BEST dedup (curation counterpart of first-wins dedup_exact):
    documents sharing a normalized 16-char prefix fingerprint collapse to
    the member with the highest quality_pm, ties to the smallest doc_id —
    grouped argmax with a total deterministic winner rule. One shuffle;
    only (id, fingerprint, score) rows move, never the text."""
    from ..stages.dedup import keep_best_dedup

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return keep_best_dedup(ds)


@register(
    "unpivot_quality",
    f"WITH __q AS ({_QUALITY_CORE_SQL}) "
    "SELECT doc_id, 'space_pm' AS metric, space_pm AS value FROM __q "
    "UNION ALL SELECT doc_id, 'digit_pm' AS metric, digit_pm AS value FROM __q "
    "UNION ALL SELECT doc_id, 'stopword_pm' AS metric, stopword_pm AS value "
    "FROM __q "
    "UNION ALL SELECT doc_id, 'quality_pm' AS metric, quality_pm AS value "
    "FROM __q",
)
def unpivot_quality(sf_dir: str):
    """UNPIVOT/melt — the inverse reshape of event_type_pivot: the four
    wide per-document score columns become (doc_id, metric, value) long
    rows. Map-only and zero-shuffle: each Arrow batch emits one slice per
    metric column, reusing the doc_id and value buffers zero-copy (the
    only new allocation is the constant metric column)."""
    from ..stages.text_analysis import quality_score_arrow

    METRICS = ("space_pm", "digit_pm", "stopword_pm", "quality_pm")
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def melt(tbl: pa.Table) -> pa.Table:
        scored = quality_score_arrow(tbl)
        n = scored.num_rows
        parts = [
            pa.table({
                "doc_id": scored["doc_id"],
                "metric": pa.repeat(pa.scalar(m, pa.string()), n),
                "value": scored[m],
            })
            for m in METRICS
        ]
        return pa.concat_tables(parts)

    return ds.map_batches(melt, batch_format="pyarrow", zero_copy_batch=True)


@register(
    "pii_scrub",
    "SELECT event_id, "
    "regexp_replace(regexp_replace(props, "
    "'[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'), "
    "'[0-9]{2,}', '<NUM>', 'g') AS scrubbed, "
    "CAST(len(regexp_extract_all(props, "
    "'[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails, "
    "CAST(len(regexp_extract_all(regexp_replace(props, "
    "'[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'), "
    "'[0-9]{2,}')) AS BIGINT) AS n_numruns FROM events",
)
def pii_scrub(sf_dir: str):
    """PII-style redaction over a text column (emails -> <EMAIL>, digit
    runs -> <NUM>) with per-row redaction counts — vectorized pandas str
    kernels, byte-exact SQL mirror."""
    from ..stages.text_analysis import scrub_batch

    ds = read_table(sf_dir, "events", columns=["event_id", "props"])

    def run(batch: pd.DataFrame) -> pd.DataFrame:
        out = scrub_batch(batch, text_col="props")
        return out[["event_id", "scrubbed", "n_emails", "n_numruns"]]

    return ds.map_batches(run, batch_format="pandas")


@register(
    "langid",
    # exact SQL mirror of LangId.classify: same tokenizer char class, same
    # stopword profiles, same CJK-ratio gate, same first-wins tie order
    "WITH w AS (SELECT doc_id, text, "
    "len(regexp_extract_all(text, '[一-鿿]')) AS cjk, "
    "CASE WHEN regexp_replace(text, '^\\s+|\\s+$', '', 'g') = '' THEN 0 "
    "ELSE len(regexp_split_to_array("
    "regexp_replace(text, '^\\s+|\\s+$', '', 'g'), '\\s+')) END AS n_ws, "
    "list_transform(regexp_extract_all(text, '[a-zA-Zäöüéèàç]+'), "
    "x -> lower(x)) AS words FROM documents), "
    "h AS (SELECT doc_id, text, cjk, n_ws, len(words) AS n_words, "
    "len(list_filter(words, x -> x IN ('the','and','of','to','a','in',"
    "'is','that','it','for'))) AS h_en, "
    "len(list_filter(words, x -> x IN ('le','la','et','de','un','une',"
    "'est','que','pour','dans'))) AS h_fr, "
    "len(list_filter(words, x -> x IN ('el','la','y','de','un','una',"
    "'es','que','por','en'))) AS h_es, "
    "len(list_filter(words, x -> x IN ('der','die','und','das','ein',"
    "'ist','nicht','mit','für','auf'))) AS h_de FROM w) "
    "SELECT doc_id, CASE WHEN length(text) = 0 THEN 'unknown' "
    "WHEN cjk * 2 > n_ws THEN 'zh' "
    "WHEN n_words = 0 THEN 'unknown' "
    "WHEN h_en = 0 AND h_fr = 0 AND h_es = 0 AND h_de = 0 THEN 'unknown' "
    "WHEN h_en >= GREATEST(h_fr, h_es, h_de) THEN 'en' "
    "WHEN h_fr >= GREATEST(h_es, h_de) THEN 'fr' "
    "WHEN h_es >= h_de THEN 'es' ELSE 'de' END AS lang_pred FROM h",
)
def langid(sf_dir: str):
    from ..stages.text_analysis import LangId

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(
        LangId, batch_format="pyarrow", concurrency=2
    ).select_columns(["doc_id", "lang_pred"])


# ---------------------------------------------------------------------------
# dedup family
# ---------------------------------------------------------------------------
@register("dedup_minhash")  # approximate candidate generation — rows-only
def dedup_minhash(sf_dir: str):
    # fully distributed: candidates bucketed, pairs deduped vectorized,
    # texts joined back via bucketed hash joins — no corpus broadcast
    from ..stages.dedup import minhash_lsh_pairs

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return minhash_lsh_pairs(ds, threshold=0.8)


@register(
    "edit_distance_pairs",
    # DuckDB levenshtein is BYTE-based; the engine mirrors it on the
    # UTF-8 bytes of the first-40-char prefix (corpus is ASCII, so
    # chars == bytes here, but the engine is byte-exact regardless)
    "SELECT a.doc_id AS a, b.doc_id AS b, "
    "CAST(levenshtein(substr(a.text, 1, 40), substr(b.text, 1, 40)) "
    "AS BIGINT) AS dist "
    "FROM documents a JOIN documents b ON a.doc_id < b.doc_id "
    "WHERE levenshtein(substr(a.text, 1, 40), substr(b.text, 1, 40)) <= 5",
)
def edit_distance_pairs_query(sf_dir: str):
    """Exact prefix edit-distance pair mining: lockstep-vectorized
    Levenshtein DP (one L^2 loop per batch across ALL pair lanes),
    guarded all-pairs baseline of the near-dup family."""
    from ..stages.dedup import edit_distance_pairs

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return edit_distance_pairs(ds, prefix_chars=40, max_dist=5)


@register("dedup_simhash")  # rows-only
def dedup_simhash(sf_dir: str):
    from ..stages.dedup import SimHasher, simhash_pairs

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    signed = ds.map_batches(SimHasher, batch_format="pandas", concurrency=2)
    return simhash_pairs(signed, max_hamming=3)


@register("dedup_ngram_jaccard")  # rows-only
def dedup_ngram_jaccard(sf_dir: str):
    from ..stages.dedup import ngram_jaccard_pairs

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return ngram_jaccard_pairs(ds, threshold=0.7)


@register(
    "dedup_embedding",
    "SELECT a.vec_id AS vec_id, ("
    "SELECT COUNT(*) FROM embeddings b WHERE b.vec_id <> a.vec_id "
    "AND list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), "
    "CAST(b.embedding AS DOUBLE[])) >= 0.95) AS n_dups "
    "FROM embeddings a",
)
def dedup_embedding(sf_dir: str):
    from ..stages.dedup import embedding_dup_counts

    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    return embedding_dup_counts(ds, threshold=0.95)


@register(
    "embedding_nn",
    "SELECT vec_id, neighbor_id AS nn_id FROM ("
    "SELECT a.vec_id AS vec_id, b.vec_id AS neighbor_id, ROW_NUMBER() OVER ("
    "PARTITION BY a.vec_id ORDER BY list_cosine_similarity("
    "CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])) DESC, "
    "b.vec_id) AS rnk FROM embeddings a CROSS JOIN embeddings b "
    "WHERE a.vec_id <> b.vec_id) WHERE rnk = 1",
)
def embedding_nn(sf_dir: str):
    """Exact 1-NN per vector (all-pairs, batched matmul against the
    broadcast matrix). Guarded like the exact dedup ops: past
    MAX_EXACT_EMBED_ROWS this raises and points at ann_ivf_topk."""
    import ray

    from ..stages.dedup import _guard_exact_embed
    from ..stages.similarity import _normalize

    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    ref_tbl = ds.to_pandas()
    _guard_exact_embed(len(ref_tbl), "embedding_nn", "ivf_topk")
    ids = ref_tbl["vec_id"].to_numpy()
    mat = _normalize(np.stack(ref_tbl["embedding"].to_numpy()).astype(np.float64))
    ref = ray.put((ids, mat))

    def nn(batch: pd.DataFrame) -> pd.DataFrame:
        all_ids, all_mat = ray.get(ref)
        # column order ascending by id => np.argmax's first-max rule IS the
        # "tie-break by neighbor_id asc" rule
        order = np.argsort(all_ids, kind="mergesort")
        oid, omat = all_ids[order], all_mat[order]
        bids = batch["vec_id"].to_numpy()
        bmat = _normalize(np.stack(batch["embedding"].to_numpy()).astype(np.float64))
        sims = bmat @ omat.T
        sims[bids[:, None] == oid[None, :]] = -np.inf  # mask self
        nn_ids = oid[np.argmax(sims, axis=1)]
        return pd.DataFrame(
            {"vec_id": bids.astype("int64"), "nn_id": nn_ids.astype("int64")}
        )

    return ds.map_batches(nn, batch_format="pandas", batch_size=1024)


@register("dedup_embedding_lsh")  # approximate scale path — rows-only
def dedup_embedding_lsh(sf_dir: str):
    """Sign-LSH bucket occupancy + in-bucket near-dup pair count per
    bucket. (Bucket occupancy rather than bare pairs so the result is
    non-empty and schema-stable even on corpora with no near-duplicates —
    the random test embeddings have none.)"""
    from ..stages.dedup import embedding_neardup_lsh_stats

    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    return embedding_neardup_lsh_stats(ds, threshold=0.95)


@register("corpus_dedup_pipeline")  # rows-only (LSH component is approximate)
def corpus_dedup_pipeline(sf_dir: str):
    """The dedup pipeline a training-data team actually runs, end to end
    (see stages.dedup.dedup_corpus for the scale shape)."""
    from ..stages.dedup import dedup_corpus

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return dedup_corpus(ds, threshold=0.8)


# ---------------------------------------------------------------------------
# similarity search
# ---------------------------------------------------------------------------
ANN_QUERY_IDS = [0, 1, 2, 3, 4]
ANN_K = 10


@register(
    "ann_topk",
    "WITH q AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qe "
    "FROM embeddings WHERE vec_id IN (0, 1, 2, 3, 4)), "
    "s AS (SELECT q.qid AS query_id, e.vec_id AS neighbor_id, "
    "list_cosine_similarity(q.qe, CAST(e.embedding AS DOUBLE[])) AS sim "
    "FROM q CROSS JOIN embeddings e WHERE e.vec_id <> q.qid) "
    "SELECT query_id, neighbor_id, rank FROM ("
    "SELECT query_id, neighbor_id, ROW_NUMBER() OVER ("
    "PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rank FROM s) "
    f"WHERE rank <= {ANN_K}",
)
def ann_topk(sf_dir: str):
    from ..stages.similarity import brute_force_topk

    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    return brute_force_topk(ds, ANN_QUERY_IDS, k=ANN_K)


@register("ann_ivf_topk")  # approximate (nprobe recall) — rows-only
def ann_ivf_topk(sf_dir: str):
    from ..stages.similarity import ivf_topk

    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    return ivf_topk(ds, ANN_QUERY_IDS, k=ANN_K)


# ---------------------------------------------------------------------------
# sampling / shuffling (training-data splits; reference has none — §2.6)
# ---------------------------------------------------------------------------
@register(
    "sample_10pct",
    "SELECT doc_id, lang, n_chars FROM documents WHERE doc_id % 10 = 0",
)
def sample_10pct(sf_dir: str):
    """Deterministic systematic sample (hash/modulo, reproducible across
    runs and cluster sizes — preferred over random_sample for lineage)."""
    import pyarrow as pa

    ds = read_table(sf_dir, "documents", columns=["doc_id", "lang", "n_chars"])

    def keep(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        return t.filter(pa.array(ids % 10 == 0))

    return ds.map_batches(keep, batch_format="pyarrow")


@register(
    "stratified_sample",
    "SELECT lang, doc_id, rank FROM (SELECT lang, doc_id, ROW_NUMBER() OVER ("
    "PARTITION BY lang ORDER BY doc_id) AS rank FROM documents) WHERE rank <= 5",
)
def stratified_sample(sf_dir: str):
    """Per-stratum head: first 5 docs per language (grouped top-k with
    ascending order)."""
    from ..functions.joins import grouped_topk

    ds = read_table(sf_dir, "documents", columns=["lang", "doc_id"])
    top = grouped_topk(ds, "lang", "doc_id", 5, descending=False,
                       tiebreak_col="doc_id", n_buckets=8)
    return top.select_columns(["lang", "doc_id", "rank"])


@register(
    "global_shuffle",
    "SELECT doc_id, lang FROM documents",  # order-insensitive compare:
)  # content must be invariant under the shuffle
def global_shuffle(sf_dir: str):
    ds = read_table(sf_dir, "documents", columns=["doc_id", "lang"])
    return ds.random_shuffle(seed=42)


# ---------------------------------------------------------------------------
# exact percentiles from a distributed value-count histogram
# ---------------------------------------------------------------------------
@register(
    "chars_percentiles",
    "WITH h AS (SELECT n_chars AS v, COUNT(*) AS c FROM documents GROUP BY v), "
    "s AS (SELECT v, SUM(c) OVER (ORDER BY v) AS cum, "
    "(SELECT COUNT(*) FROM documents) AS n FROM h) "
    "SELECT CAST(25 AS BIGINT) AS pct, CAST(MIN(v) AS BIGINT) AS value "
    "FROM s WHERE cum >= CEIL(0.25 * n) "
    "UNION ALL SELECT 50, CAST(MIN(v) AS BIGINT) FROM s WHERE cum >= CEIL(0.50 * n) "
    "UNION ALL SELECT 75, CAST(MIN(v) AS BIGINT) FROM s WHERE cum >= CEIL(0.75 * n) "
    "UNION ALL SELECT 90, CAST(MIN(v) AS BIGINT) FROM s WHERE cum >= CEIL(0.90 * n)",
)
def chars_percentiles(sf_dir: str):
    """Exact percentiles (pct p = smallest v with cumulative count >=
    ceil(p*N)) computed scalably: the cluster reduces the corpus to a
    VALUE-COUNT histogram (cardinality of the value domain, not the row
    count); only the histogram reaches the driver. The same shape handles
    any integer-valued metric at 100 TB."""
    import math

    from ..functions.agg import bucketed_group_agg

    ds = read_table(sf_dir, "documents", columns=["n_chars"])
    hist = bucketed_group_agg(
        ds, ["n_chars"], {"c": ("n_chars", "size")}, n_buckets=16
    ).to_pandas().sort_values("n_chars")
    n = int(hist["c"].sum())
    cum = hist["c"].cumsum()
    out = []
    for pct in (25, 50, 75, 90):
        k = math.ceil(pct / 100 * n)
        out.append(
            {"pct": pct, "value": int(hist.loc[cum >= k, "n_chars"].iloc[0])}
        )
    import pyarrow as pa

    return pa.Table.from_arrays(
        [
            pa.array([r["pct"] for r in out], pa.int64()),
            pa.array([r["value"] for r in out], pa.int64()),
        ],
        names=["pct", "value"],
    )


# ---------------------------------------------------------------------------
# corpus token histogram (vocabulary pre-aggregation before the shuffle)
# ---------------------------------------------------------------------------
@register(
    "token_histogram",
    # regexp_replace, not trim(): strip ALL whitespace like the engine does
    "SELECT word, cnt FROM (SELECT word, COUNT(*) AS cnt FROM ("
    "SELECT unnest(regexp_split_to_array("
    "regexp_replace(text, '^\\s+|\\s+$', '', 'g'), '\\s+')) AS word "
    "FROM documents WHERE regexp_replace(text, '^\\s+|\\s+$', '', 'g') <> '') "
    "GROUP BY word) "
    "ORDER BY cnt DESC, word LIMIT 100",
)
def token_histogram(sf_dir: str):
    """Top-100 corpus vocabulary. Per-batch value_counts collapses tokens
    to (word, partial count) BEFORE the shuffle — the vocabulary is far
    smaller than the token stream, so the groupby moves kilobytes, not the
    corpus (§2.5 pre-aggregation discipline)."""
    from ray.data.aggregate import Sum

    ds = read_table(sf_dir, "documents", columns=["text"])

    def partial_counts(batch: pd.DataFrame) -> pd.DataFrame:
        s = batch["text"].fillna("").str.strip()
        s = s[s != ""]
        vc = s.str.split(r"\s+").explode().value_counts()
        return pd.DataFrame({"word": vc.index, "cnt": vc.to_numpy().astype("int64")})

    partials = ds.map_batches(partial_counts, batch_format="pandas")
    totals = partials.groupby("word").aggregate(Sum("cnt", alias_name="cnt"))
    return totals.sort(["cnt", "word"], descending=[True, False]).limit(100)


# ---------------------------------------------------------------------------
# vocabulary build + token-id corpus encoding (the tokenize step of a
# training pipeline: frequency vocab -> broadcast dict -> int-id streams)
# ---------------------------------------------------------------------------
def build_vocab(ds, text_col: str = "text", top_n: int = 256) -> pd.DataFrame:
    """Frequency vocabulary of a text column: the ``top_n`` words by
    (count desc, word asc) with dense ``token_id`` 0..top_n-1 in that
    order. Tokens collapse to (word, partial count) per batch BEFORE the
    shuffle (vocabulary exchange, never the token stream); the driver
    holds exactly ``top_n`` rows — the documented, bounded contract of a
    broadcast vocabulary."""
    from ray.data.aggregate import Sum

    def partial_counts(batch: pd.DataFrame) -> pd.DataFrame:
        s = batch[text_col].fillna("").str.strip()
        s = s[s != ""]
        vc = s.str.split(r"\s+").explode().value_counts()
        return pd.DataFrame({"word": vc.index,
                             "cnt": vc.to_numpy().astype("int64")})

    top = (
        ds.map_batches(partial_counts, batch_format="pandas")
        .groupby("word").aggregate(Sum("cnt", alias_name="cnt"))
        .sort(["cnt", "word"], descending=[True, False])
        .limit(top_n)
        .to_pandas()
    )
    top["token_id"] = np.arange(len(top), dtype=np.int64)
    return top[["word", "cnt", "token_id"]]


_TRIM_DOC = "regexp_replace(text, '^\\s+|\\s+$', '', 'g')"

_VOCAB_SQL = (
    "WITH tok AS (SELECT unnest(regexp_split_to_array("
    f"{_TRIM_DOC}, '\\s+')) AS word FROM documents "
    f"WHERE {_TRIM_DOC} <> ''), "
    "v AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS cnt FROM tok "
    "GROUP BY word) "
    "SELECT word, cnt, CAST(ROW_NUMBER() OVER "
    "(ORDER BY cnt DESC, word) - 1 AS BIGINT) AS token_id FROM v "
    "ORDER BY cnt DESC, word LIMIT 16"
)


@register("vocab_ids", _VOCAB_SQL)
def vocab_ids(sf_dir: str):
    """Top-16 frequency vocabulary with dense token ids (exact SQL
    mirror: ROW_NUMBER over (cnt DESC, word))."""
    ds = read_table(sf_dir, "documents", columns=["text"])
    return build_vocab(ds, top_n=16)


@register(
    "encoded_docs",
    "WITH tok AS (SELECT doc_id, unnest(regexp_split_to_array("
    f"{_TRIM_DOC}, '\\s+')) AS word, generate_subscripts("
    f"regexp_split_to_array({_TRIM_DOC}, '\\s+'), 1) AS i "
    f"FROM documents WHERE {_TRIM_DOC} <> ''), "
    "v AS (SELECT word, COUNT(*) AS cnt FROM tok GROUP BY word), "
    "ids AS (SELECT word, ROW_NUMBER() OVER "
    "(ORDER BY cnt DESC, word) - 1 AS token_id FROM v "
    "ORDER BY cnt DESC, word LIMIT 16) "
    "SELECT t.doc_id, string_agg(CAST(COALESCE(ids.token_id, -1) "
    "AS VARCHAR), ',' ORDER BY t.i) AS ids, "
    "CAST(COUNT(*) AS BIGINT) AS n_tokens "
    "FROM tok t LEFT JOIN ids USING (word) GROUP BY t.doc_id",
)
def encoded_docs(sf_dir: str):
    """Corpus tokenization to int ids: frequency vocab (top 16, so OOV is real on this corpus) built
    distributed, broadcast ONCE via ray.put, then a map-only encode pass
    emits each non-empty document's token-id sequence (OOV = -1; comma
    string so the DuckDB oracle reproduces it byte-exactly). Two passes
    over the text — the same two passes the SQL makes — and the only
    driver materialization is the bounded vocab."""
    import ray

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    vocab = build_vocab(ds, top_n=16)
    ref = ray.put(dict(zip(vocab["word"], vocab["token_id"])))

    def enc(df: pd.DataFrame) -> pd.DataFrame:
        m = ray.get(ref)
        s = df["text"].fillna("").str.strip()
        keep = s != ""
        df, s = df[keep], s[keep]
        toks = s.str.split(r"\s+")
        ex = toks.explode()
        ids = ex.map(m).fillna(-1).astype(np.int64).astype(str)
        joined = ids.groupby(level=0).agg(",".join)
        return pd.DataFrame({
            "doc_id": df["doc_id"].to_numpy(),
            "ids": joined.reindex(df.index).to_numpy(),
            "n_tokens": toks.str.len().to_numpy().astype("int64"),
        })

    return ds.map_batches(enc, batch_format="pandas")


# ---------------------------------------------------------------------------
# corpus-frequency rarity scoring (two-pass: vocab build + doc scoring)
# ---------------------------------------------------------------------------
@register(
    "token_rarity",
    "WITH tok AS (SELECT doc_id, unnest(regexp_split_to_array("
    "regexp_replace(text, '^\\s+|\\s+$', '', 'g'), '\\s+')) AS word "
    "FROM documents WHERE regexp_replace(text, '^\\s+|\\s+$', '', 'g') <> ''), "
    "v AS (SELECT word, COUNT(*) AS c FROM tok GROUP BY word) "
    "SELECT t.doc_id, CAST(SUM(v.c) AS BIGINT) AS rarity_sum "
    "FROM tok t JOIN v USING (word) GROUP BY t.doc_id",
)
def token_rarity(sf_dir: str):
    """Per-document corpus-frequency mass: for every token instance, add
    the corpus-wide count of that token (low sum per token = rare
    vocabulary — a training-data quality/novelty signal). Exact integers
    end to end.

    Scale shape: token instances collapse to (doc_id, word, n) per batch
    BEFORE any shuffle; the vocabulary is built by a word-keyed
    aggregation; doc scoring joins the collapsed doc-tokens to the vocab
    through the bucketed hash join (word is the only co-location key —
    the corpus text itself never re-shuffles) and re-aggregates per doc.
    """
    import pyarrow as pa
    from ray.data.aggregate import Sum

    from ..functions.agg import bucketed_group_agg
    from ..functions.joins import bucketed_hash_join

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def doc_tokens(batch: pd.DataFrame) -> pa.Table:
        s = batch.set_index("doc_id")["text"].fillna("").str.strip()
        s = s[s != ""]
        exploded = s.str.split(r"\s+").explode()
        vc = (
            exploded.groupby([exploded.index, exploded.to_numpy()])
            .size()
            .reset_index()
        )
        vc.columns = ["doc_id", "word", "n"]
        return pa.table(
            {
                "doc_id": pa.array(vc["doc_id"].to_numpy().astype(np.int64)),
                "word": pa.array(vc["word"].astype(str).tolist(), pa.string()),
                "n": pa.array(vc["n"].to_numpy().astype(np.int64)),
            }
        )

    # materialize the collapsed (doc, word, n) table once: BOTH the vocab
    # aggregation and the join's left side consume it, and the join would
    # additionally schema-probe the vocab shuffle — explicit schemas +
    # one materialize keep tokenization and the vocab agg single-pass
    doc_word = ds.map_batches(doc_tokens, batch_format="pandas").materialize()
    # vocabulary: total count per word (pre-collapsed input, word-keyed agg)
    vocab = bucketed_group_agg(
        doc_word.select_columns(["word", "n"]),
        ["word"],
        {"c": ("n", "sum")},
        n_buckets=32,
    )
    dw_schema = pa.schema(
        [("doc_id", pa.int64()), ("word", pa.string()), ("n", pa.int64())]
    )
    joined = bucketed_hash_join(
        doc_word, vocab, "word", n_buckets=32, lschema=dw_schema,
        rschema=pa.schema([("word", pa.string()), ("c", pa.int64())]),
    )

    def score(batch: pa.Table) -> pa.Table:
        n = batch["n"].to_numpy(zero_copy_only=False)
        c = batch["c"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "partial": pa.array((n * c).astype(np.int64)),
            }
        )

    partials = joined.map_batches(score, batch_format="pyarrow")
    out = partials.groupby("doc_id").aggregate(
        Sum("partial", alias_name="rarity_sum")
    )
    return out


# ---------------------------------------------------------------------------
# distinct counting: exact (distributed pre-agg) + KMV sketch (scale path)
# ---------------------------------------------------------------------------
@register(
    "distinct_token_count",
    "SELECT CAST(COUNT(DISTINCT word) AS BIGINT) AS n_distinct FROM ("
    "SELECT unnest(regexp_split_to_array("
    "regexp_replace(text, '^\\s+|\\s+$', '', 'g'), '\\s+')) AS word "
    "FROM documents WHERE regexp_replace(text, '^\\s+|\\s+$', '', 'g') <> '')",
)
def distinct_token_count(sf_dir: str):
    """EXACT corpus-wide distinct-token count: tokens collapse to unique
    words per batch (the exchange moves vocabulary, not the token
    stream), one bucket groupby counts uniques per bucket, and only the
    per-bucket counts (n_buckets ints) reach the driver."""
    import pyarrow as pa

    from ..functions.hashing import bucket_column

    ds = read_table(sf_dir, "documents", columns=["text"])

    def words(batch: pd.DataFrame) -> pd.DataFrame:
        s = batch["text"].fillna("").str.strip()
        s = s[s != ""]
        uniq = s.str.split(r"\s+").explode().unique()
        return pd.DataFrame({"word": uniq})

    w = ds.map_batches(words, batch_format="pandas")
    bucketed = w.map_batches(
        lambda t: bucket_column(t, "word", 64, "__wb"), batch_format="pyarrow"
    )

    def count_bucket(grp: pa.Table) -> pa.Table:
        n = len(pd.unique(grp["word"].to_pandas()))
        return pa.table({"n": pa.array([n], pa.int64())})

    counts = bucketed.groupby("__wb").map_groups(
        count_bucket, batch_format="pyarrow"
    )
    total = int(counts.to_pandas()["n"].sum())
    return pa.table({"n_distinct": pa.array([total], pa.int64())})


@register("approx_distinct_tokens")  # sketch — rows-only (approximate)
def approx_distinct_tokens(sf_dir: str):
    """KMV (k-minimum-values) distinct-count sketch: each batch keeps its
    k smallest 64-bit token hashes; sketches merge by union+truncate (a
    few KB per batch regardless of corpus size); the estimator is
    (k-1) / max_kth_normalized. Deterministic (fixed hash), mergeable,
    and the 100 TB path for cardinalities where even the vocabulary
    exchange of the exact plan is too wide."""
    import pyarrow as pa

    from ..functions.hashing import hash64

    K = 1024
    MERGE_FAN = 32  # level-1 fold width
    ds = read_table(sf_dir, "documents", columns=["text"])

    def sketch(batch: pd.DataFrame) -> pd.DataFrame:
        s = batch["text"].fillna("").str.strip()
        s = s[s != ""]
        uniq = s.str.split(r"\s+").explode().unique()
        hs = np.sort(
            np.array(
                [hash64(t) & 0x7FFFFFFFFFFFFFFF for t in uniq], dtype=np.uint64
            )
        )[:K]
        # level-0 fold key: hash value mod fan-out. Any member of the
        # global K-min is by definition within its own bucket's K-min, so
        # per-bucket truncation loses nothing.
        return pd.DataFrame(
            {
                "h": hs.astype(np.int64),
                "__mb": (hs % np.uint64(MERGE_FAN)).astype(np.int64),
            }
        )

    def fold_bucket(grp: pa.Table) -> pa.Table:
        hs = np.unique(grp["h"].to_numpy(zero_copy_only=False).astype(np.uint64))
        return pa.table({"h": pa.array(np.sort(hs)[:K].astype(np.int64))})

    # two-level distributed fold: per-value-bucket union+truncate (the
    # shuffle fans the per-batch sketches over MERGE_FAN reduce tasks),
    # then ONE final union+truncate task — the driver receives exactly
    # K hashes, never the n_batches x K concatenation.
    parts = ds.map_batches(sketch, batch_format="pandas")
    level1 = parts.groupby("__mb").map_groups(
        fold_bucket, batch_format="pyarrow"
    )

    def final_fold(df: pd.DataFrame) -> pd.DataFrame:
        hs = np.unique(df["h"].to_numpy().astype(np.uint64))
        return pd.DataFrame({"h": np.sort(hs)[:K].astype(np.int64)})

    merged = (
        level1.repartition(1)
        .map_batches(final_fold, batch_format="pandas", batch_size=None)
        .to_pandas()["h"]
        .to_numpy()
        .astype(np.uint64)
    )
    if len(merged) < K:  # fewer distincts than k -> exact
        est = len(merged)
    else:
        est = int((K - 1) / (merged[-1] / float(1 << 63)))
    return pa.table({"n_distinct_est": pa.array([est], pa.int64())})


# ---------------------------------------------------------------------------
# BPE tokenizer training + encoding (iterative; rows-only — the merge
# selection is a learned artifact, not SQL-expressible; exact correctness
# vs an independent reference trainer in tests/test_bpe.py)
# ---------------------------------------------------------------------------
@register("cm_sketch_error")  # measured-error artifact (approximate)
def cm_sketch_error(sf_dir: str):
    """Count-Min sketch quality artifact (the CM companion of
    quantile_sketch_error / neardup_recall): one-pass 4×1024 sketch of
    the token stream, then the 50 EXACT most-frequent tokens are
    point-queried against it. Output rows carry (token, exact, est,
    overestimate); CM never underestimates, so min(overestimate) >= 0 by
    theorem and the driver row records the measured max/mean error mass.
    """
    from ray.data.aggregate import Sum

    from ..functions.cmsketch import cm_sketch_tokens, estimate

    ds = read_table(sf_dir, "documents", columns=["text"])
    m = cm_sketch_tokens(ds, d=4, w=1024)

    def token_partials(batch: pd.DataFrame) -> pd.DataFrame:
        s = batch["text"].fillna("").str.strip()
        s = s[s != ""]
        vc = s.str.split(r"\s+").explode().value_counts()
        return pd.DataFrame({"token": vc.index.astype(str),
                             "n": vc.to_numpy()})

    top = (
        ds.map_batches(token_partials, batch_format="pandas")
        .groupby("token").aggregate(Sum("n", alias_name="n"))
        .sort("n", descending=True).limit(50).to_pandas()
        .sort_values(["n", "token"], ascending=[False, True],
                     kind="mergesort")
    )
    exact = top.set_index("token")["n"].astype("int64")
    est = estimate(m, exact.index.to_numpy())
    over = est - exact.to_numpy()
    return pa.table({
        "token": pa.array(exact.index.to_numpy(), pa.string()),
        "exact": pa.array(exact.to_numpy(), pa.int64()),
        "est": pa.array(est, pa.int64()),
        "overestimate": pa.array(over, pa.int64()),
    })


@register("bpe_merges")  # rows-only (iterative trainer)
def bpe_merges(sf_dir: str):
    """Learn 16 BPE merges over the documents corpus (word-frequency
    formulation: corpus collapses once to a vocabulary-sized (word, count)
    table; every merge round runs over that table only — see
    stages/bpe.py). Deterministic: winner rule is total (max count, then
    lexicographically smallest pair)."""
    from ..stages.bpe import bpe_train

    ds = read_table(sf_dir, "documents", columns=["text"])
    return bpe_train(ds, n_merges=16)


@register("bpe_encoded_lengths")  # rows-only (depends on learned merges)
def bpe_encoded_lengths(sf_dir: str):
    """Train BPE merges, broadcast the merge table once (ray.put), encode
    every document in an actor pool with a per-actor word→tokens memo;
    returns (doc_id, n_words, n_bpe_tokens). The compression ratio
    n_bpe_tokens/n_words < chars/words is the trainer's fitness signal."""
    import ray

    from ..stages.bpe import BpeEncode, bpe_train

    train = read_table(sf_dir, "documents", columns=["text"])
    merges_ref = ray.put(bpe_train(train, n_merges=16))
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(
        BpeEncode,
        fn_constructor_args=(merges_ref,),
        batch_format="pandas",
        concurrency=(1, 4),
    )


# ---------------------------------------------------------------------------
# multimodal plumbing (codec stubbed; schema/actor plumbing real — rows-only)
# ---------------------------------------------------------------------------
@register(
    "multimodal_meta",
    # exact SQL mirror of the deterministic FAKEIMG payload pipeline:
    # attach (w from char length, h from the first-64-byte sum — the
    # corpus is ASCII so chars == bytes), decode header, ResizeFilter
    # (>= 50 px both sides + >= 0.5% of a 612x792 page). n_bytes =
    # 7 magic + 4 header + 32 * max((w*h)//64, 1) digest repeats.
    "WITH m AS (SELECT doc_id, 32 + (length(text) % 480) AS w, "
    "32 + (CASE WHEN length(text) = 0 THEN 0 ELSE "
    "COALESCE(list_sum(list_transform(generate_series(1, LEAST(length(text), 64)), "
    "i -> ascii(substr(text, CAST(i AS INTEGER), 1)))), 0) % 480 END) AS h "
    "FROM documents) "
    "SELECT doc_id, CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height, "
    "CAST(11 + 32 * GREATEST((w * h) // 64, 1) AS BIGINT) AS n_bytes "
    "FROM m WHERE w >= 50 AND h >= 50 "
    "AND (w * h) / (612.0 * 792.0) >= 0.005",
)
def multimodal_meta(sf_dir: str):
    from ..stages.multimodal import DecodeImage, ResizeFilter, attach_payload_batch

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    with_payload = ds.map_batches(
        attach_payload_batch, batch_format="pyarrow", batch_size=256
    )
    # two chained actor pools: fractional num_cpus so both pools + the read
    # task fit even a 4-CPU session (full-CPU pools here deadlock the
    # streaming executor by starving the read — observed, not theoretical)
    decoded = with_payload.map_batches(
        DecodeImage, batch_format="pyarrow", batch_size=256, concurrency=2,
        num_cpus=0.5,
    )
    filtered = decoded.map_batches(
        ResizeFilter, batch_format="pyarrow", batch_size=256, concurrency=2,
        num_cpus=0.5,
    )

    def project(batch: pd.DataFrame) -> pd.DataFrame:
        meta = pd.DataFrame(list(batch["image_meta"]))
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"].astype("int64"),
                "width": meta["width"].astype("int64"),
                "height": meta["height"].astype("int64"),
                "n_bytes": meta["n_bytes"].astype("int64"),
            }
        )

    return filtered.map_batches(project, batch_format="pandas")


@register(
    "png_meta",
    # exact SQL mirror of the REAL-PNG roundtrip (stages/multimodal.py
    # attach_png_payload_batch -> PngDecodeMeta, codec =
    # extract/pngcodec.py): dimensions derive from text length, and the
    # planted gradient pixel[i] = i % 256 has the closed-form sum
    # (n // 256) * 32640 + r*(r-1)/2 with r = n % 256. If either the
    # encoder or the decoder (inflate + all five scanline de-filters)
    # is wrong, pixel_sum diverges.
    "WITH m AS (SELECT doc_id, 1 + length(text) % 48 AS w, "
    "1 + (length(text) * 7) % 40 AS h FROM documents), "
    "s AS (SELECT doc_id, w, h, w * h * 3 AS n FROM m) "
    "SELECT doc_id, CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height, "
    "CAST(3 AS BIGINT) AS channels, "
    "CAST((n // 256) * 32640 + ((n % 256) * ((n % 256) - 1)) // 2 AS BIGINT) "
    "AS pixel_sum FROM s",
)
def png_meta(sf_dir: str):
    """M8 made real: per-doc PNG encode (stdlib zlib, cycling scanline
    filters) -> actor-pool full decode -> oracle-checked dimensions +
    exact pixel sum. Reference PNG-encodes extracted images keyed by
    content hash (app/main.py:711-718)."""
    from ..stages.multimodal import PngDecodeMeta, attach_png_payload_batch

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    with_payload = ds.map_batches(
        attach_png_payload_batch, batch_format="pyarrow", batch_size=256
    )
    return with_payload.map_batches(
        PngDecodeMeta, batch_format="pyarrow", batch_size=256, concurrency=2,
        num_cpus=0.5,
    ).select_columns(["doc_id", "width", "height", "channels", "pixel_sum"])


@register(
    "wav_meta",
    # exact SQL mirror of the REAL-WAV roundtrip (attach_wav_payload_batch
    # -> WavDecodeMeta, codec = extract/wavcodec.py): channels/frames
    # derive from text length; the planted gradient sample[i] = i - 32768
    # has the closed-form sum of squares
    # S2(v) - 32768*v*(v-1) + v*2^30 with v = frames*channels
    "WITH m AS (SELECT doc_id, 1 + length(text) % 2 AS ch, "
    "100 + (length(text) * 13) % 1000 AS nf FROM documents), "
    "s AS (SELECT doc_id, ch, nf, ch * nf AS v FROM m) "
    "SELECT doc_id, CAST(16000 AS BIGINT) AS rate, "
    "CAST(ch AS BIGINT) AS channels, CAST(nf AS BIGINT) AS n_frames, "
    "CAST(nf * 1000000 // 16000 AS BIGINT) AS duration_us, "
    "CAST((v - 1) * v * (2 * v - 1) // 6 - 32768 * v * (v - 1) "
    "+ v * 1073741824 AS BIGINT) AS pcm_sumsq FROM s",
)
def wav_meta(sf_dir: str):
    """Real audio decode: per-doc PCM-16 WAV encode -> actor-pool RIFF
    parse + sample read -> oracle-checked rate/channels/frames/exact
    duration + integer sample energy."""
    from ..stages.multimodal import WavDecodeMeta, attach_wav_payload_batch

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    with_payload = ds.map_batches(
        attach_wav_payload_batch, batch_format="pyarrow", batch_size=256
    )
    return with_payload.map_batches(
        WavDecodeMeta, batch_format="pyarrow", batch_size=256, concurrency=2,
        num_cpus=0.5,
    ).select_columns(
        ["doc_id", "rate", "channels", "n_frames", "duration_us",
         "pcm_sumsq"]
    )


@register(
    "gif_meta",
    # exact SQL mirror of the REAL-GIF roundtrip (attach_gif_payload_batch
    # -> GifDecodeMeta, codec = extract/gifcodec.py: full LZW encode +
    # decode with dictionary growth): grayscale palette pal[k]=(k,k,k)
    # over the gradient index i % 256 => pixel_sum = 3 * gradient sum
    "WITH m AS (SELECT doc_id, 1 + (length(text) * 3) % 50 AS w, "
    "1 + (length(text) * 11) % 30 AS h FROM documents), "
    "s AS (SELECT doc_id, w, h, w * h AS n FROM m) "
    "SELECT doc_id, CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height, "
    "CAST(3 AS BIGINT) AS channels, "
    "CAST(3 * ((n // 256) * 32640 + ((n % 256) * ((n % 256) - 1)) // 2) "
    "AS BIGINT) AS pixel_sum FROM s",
)
def gif_meta(sf_dir: str):
    """Third real codec roundtrip: per-doc GIF (real LZW both ways) ->
    actor-pool decode -> oracle-checked dims + exact pixel sum."""
    from ..stages.multimodal import GifDecodeMeta, attach_gif_payload_batch

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    with_payload = ds.map_batches(
        attach_gif_payload_batch, batch_format="pyarrow", batch_size=256
    )
    return with_payload.map_batches(
        GifDecodeMeta, batch_format="pyarrow", batch_size=256, concurrency=2,
        num_cpus=0.5,
    ).select_columns(["doc_id", "width", "height", "channels", "pixel_sum"])


@register("multimodal_features")  # rows-only (binary payload featurization)
def multimodal_features(sf_dir: str):
    """Full multimodal chain: attach payload -> decode -> size/zone
    filter -> per-payload feature vector (64-dim byte histogram, the
    deterministic stand-in for a visual encoder) -> scalar projection.
    All stages are the real Ray plumbing (actor pools, binary columns,
    list<float> features); only the codec/model inner step is a fake."""
    import numpy as np

    from ..stages.multimodal import (
        DecodeImage,
        FeatureExtract,
        ResizeFilter,
        attach_payload_batch,
    )

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    with_payload = ds.map_batches(
        attach_payload_batch, batch_format="pyarrow", batch_size=256
    )
    decoded = with_payload.map_batches(
        DecodeImage, batch_format="pyarrow", batch_size=256, concurrency=2,
        num_cpus=0.5,
    )
    filtered = decoded.map_batches(
        ResizeFilter, batch_format="pyarrow", batch_size=256, concurrency=2,
        num_cpus=0.5,
    )
    feats = filtered.map_batches(
        FeatureExtract, batch_format="pyarrow", batch_size=256, concurrency=2,
        num_cpus=0.5,
    )

    def project(batch: pd.DataFrame) -> pd.DataFrame:
        f = [np.asarray(v) for v in batch["features"]]
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"].astype("int64"),
                "top_bin": pd.array([int(v.argmax()) for v in f], dtype="int64"),
                "n_nonzero": pd.array(
                    [int((v > 0).sum()) for v in f], dtype="int64"
                ),
            }
        )

    return feats.map_batches(project, batch_format="pandas")


# ---------------------------------------------------------------------------
# flagship transcript pipelines (non-SQL-expressible: custom extractor)
# ---------------------------------------------------------------------------
@register("extract_turns")  # rows-only (oracle is the pure-Python extractor,
def extract_turns(sf_dir: str):  # enforced byte-for-byte in tests/)
    from .extract_pipeline import extract_pipeline

    ds = extract_pipeline(sf_dir)
    return ds.select_columns(
        ["conv_id", "turn_idx", "ok", "extractor_path"]
    )


@register("extract_meta")  # rows-only (metadata of the custom extractor;
def extract_meta(sf_dir: str):  # golden-tested byte-exact in tests/)
    """Typed M4/M10 metadata columns from the extraction stage: per-table
    dims (tables: list<struct>) and normalized round(.,4) positions
    (positions: list<struct>), projected to scalar summaries."""
    from .extract_pipeline import extract_pipeline

    ds = extract_pipeline(sf_dir)

    def project(batch: pd.DataFrame) -> pd.DataFrame:
        tables = batch["tables"]
        positions = batch["positions"]
        first_rows = [
            (int(t[0]["n_rows"]) if len(t) else -1) for t in tables
        ]
        first_cols = [
            (int(t[0]["n_cols"]) if len(t) else -1) for t in tables
        ]
        return pd.DataFrame(
            {
                "conv_id": batch["conv_id"],
                "turn_idx": batch["turn_idx"].astype("int64"),
                "n_tables": [len(t) for t in tables],
                "first_table_rows": first_rows,
                "first_table_cols": first_cols,
                "n_positions": [len(p) for p in positions],
            }
        )

    return ds.map_batches(project, batch_format="pandas")


@register("stitch_convs")  # rows-only
def stitch_convs(sf_dir: str):
    from .extract_pipeline import stitch_pipeline

    ds = stitch_pipeline(sf_dir)

    def project(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "conv_id": batch["conv_id"],
                "n_turns": batch["n_turns"].astype("int64"),
                "n_errors": batch["n_errors"].astype("int64"),
                "doc_chars": batch["document"].str.len().astype("int64"),
            }
        )

    return ds.map_batches(project, batch_format="pandas")


# ---------------------------------------------------------------------------
# recall measurement for the approximate family (planted duplicates /
# exact-vs-approx). Turns the "runs" signal of the rows-only methods into
# a MEASURED recall/precision artifact the driver records every round.
# ---------------------------------------------------------------------------
_PLANT_OFFSET = 1_000_000
_PLANT_EVERY = 5       # plant a near-dup for every 5th eligible doc
_PLANT_MIN_WORDS = 50  # below this a 1-word edit dips under the verify bar


def _planted_corpus(ds):
    """documents + deterministic planted near-dups.

    Every ``_PLANT_EVERY``-th doc with >= ``_PLANT_MIN_WORDS`` words gets
    a copy (id + _PLANT_OFFSET) with its 8th word replaced — word-3-gram
    Jaccard (n-5)/(n+1) >= 0.88 at n=50, above every verify threshold in
    the family. Truth pairs are exactly (id, id+offset)."""

    def plant(df: pd.DataFrame) -> pd.DataFrame:
        rows_id, rows_text = [], []
        for i, t in zip(df["doc_id"], df["text"]):
            rows_id.append(int(i))
            rows_text.append(str(t))
            words = str(t).split()
            if int(i) % _PLANT_EVERY == 0 and len(words) >= _PLANT_MIN_WORDS:
                words[7] = "plantedvariantmarker"
                rows_id.append(int(i) + _PLANT_OFFSET)
                rows_text.append(" ".join(words))
        return pd.DataFrame({"doc_id": rows_id, "text": rows_text})

    return ds.map_batches(plant, batch_format="pandas")


def _pair_metrics(found_df: pd.DataFrame, truth: set) -> tuple:
    """(n_found, n_hit, recall_pct, precision_pct) for a pair list vs a
    truth set; precision is over found pairs that involve a planted id
    (organic near-dups in the base corpus are not false positives)."""
    found = set(zip(found_df["a"], found_df["b"])) if len(found_df) else set()
    planted_found = {
        p for p in found if p[0] >= _PLANT_OFFSET or p[1] >= _PLANT_OFFSET
    }
    hits = planted_found & truth
    recall = 100 * len(hits) // max(len(truth), 1)
    precision = 100 * len(hits) // max(len(planted_found), 1)
    return len(found), len(hits), recall, precision


@register("neardup_recall")  # rows-only by design: MEASURES the
def neardup_recall(sf_dir: str):  # approximate methods against planted truth
    """One row per near-dup method: recall/precision on planted dups.

    The planted corpus and truth set are deterministic; the pair lists
    collected here are small by LSH construction (this is a diagnostic
    summary, not a corpus-scale data path)."""
    from ..stages.dedup import (
        SimHasher,
        minhash_lsh_pairs,
        ngram_jaccard_pairs,
        simhash_pairs,
    )

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    corpus = _planted_corpus(ds).materialize()
    truth = set(
        (i - _PLANT_OFFSET, i)
        for i in corpus.to_pandas()["doc_id"]
        if i >= _PLANT_OFFSET
    )

    results = []
    mh = minhash_lsh_pairs(corpus, threshold=0.8).to_pandas()
    results.append(("minhash_lsh", *_pair_metrics(mh, truth)))
    ng = ngram_jaccard_pairs(corpus, threshold=0.7).to_pandas()
    results.append(("ngram_jaccard", *_pair_metrics(ng, truth)))
    signed = corpus.map_batches(SimHasher, batch_format="pandas", concurrency=2)
    sh = simhash_pairs(signed, max_hamming=3).to_pandas()
    results.append(("simhash", *_pair_metrics(sh, truth)))

    out = pd.DataFrame(
        results,
        columns=["method", "n_found", "n_hit", "recall_pct", "precision_pct"],
    )
    out["n_truth"] = len(truth)
    return out[["method", "n_truth", "n_found", "n_hit", "recall_pct",
                "precision_pct"]]


@register("ann_ivf_recall")  # rows-only: recall@k of IVF vs brute force
def ann_ivf_recall(sf_dir: str):
    """Recall@k of the IVF index against the exact brute-force top-k on
    the same query set — the standard ANN quality metric, measured."""
    from ..stages.similarity import brute_force_topk, ivf_topk

    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    exact = brute_force_topk(ds, ANN_QUERY_IDS, k=ANN_K).to_pandas()
    approx = ivf_topk(ds, ANN_QUERY_IDS, k=ANN_K).to_pandas()
    e = set(zip(exact["query_id"], exact["neighbor_id"]))
    a = set(zip(approx["query_id"], approx["neighbor_id"]))
    return pd.DataFrame(
        {
            "k": [ANN_K],
            "n_queries": [len(ANN_QUERY_IDS)],
            "recall_pct": [100 * len(e & a) // max(len(e), 1)],
        }
    )


@register("embedding_lsh_recall")  # rows-only: sign-LSH vs exact pairs
def embedding_lsh_recall(sf_dir: str):
    """Recall of the sign-LSH near-dup scale path against the exact
    all-pairs oracle, on the corpus augmented with planted perturbed
    copies (the random test embeddings have no organic near-dups)."""
    from ..functions.hashing import stable_seed
    from ..stages.dedup import embedding_neardup_lsh, embedding_neardup_pairs

    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])

    def plant(df: pd.DataFrame) -> pd.DataFrame:
        ids, vecs = [], []
        for i, v in zip(df["vec_id"], df["embedding"]):
            arr = np.asarray(v, dtype=np.float64)
            ids.append(int(i))
            vecs.append(arr)
            if int(i) % _PLANT_EVERY == 0:
                rng = stable_seed("embplant", int(i))
                ids.append(int(i) + _PLANT_OFFSET)
                vecs.append(arr + 0.01 * rng.standard_normal(arr.shape))
        return pd.DataFrame({"vec_id": ids, "embedding": vecs})

    corpus = ds.map_batches(plant, batch_format="pandas").materialize()
    exact = embedding_neardup_pairs(corpus, threshold=0.95).to_pandas()
    approx = embedding_neardup_lsh(corpus, threshold=0.95).to_pandas()
    e = set(zip(exact["a"], exact["b"]))
    a = set(zip(approx["a"], approx["b"])) if len(approx) else set()
    return pd.DataFrame(
        {
            "n_exact_pairs": [len(e)],
            "n_lsh_pairs": [len(a)],
            "recall_pct": [100 * len(e & a) // max(len(e), 1)],
        }
    )


@register("quantile_sketch_error")  # rows-only: it IS the measurement
def quantile_sketch_error(sf_dir: str):
    """Measured max rank error of ``sampled_quantile_boundaries`` (the
    unbounded-domain scale path of the range partitioner) against the
    EXACT ranks, on the highest-cardinality column in the corpus (event
    timestamps). Same discipline as the near-dup/ANN recall queries: the
    approximation's quality bound — O(N/sqrt(sample_k)) rank error —
    becomes a driver-recorded artifact instead of a docstring claim.

    Exact ranks are computed distributed: per-batch partial
    ``count(x <= boundary)`` rows, bucket-agg summed — only
    ``n_parts - 1`` rows ever reach the driver."""
    from ..functions.agg import bucketed_group_agg
    from ..functions.partitioning import sampled_quantile_boundaries

    n_parts, sample_k = 16, 16384
    vals = read_table(sf_dir, "events", columns=["ts"]).map_batches(
        lambda t: pa.table({"ts_us": pc.cast(t["ts"], pa.int64())}),
        batch_format="pyarrow",
    ).materialize()  # two consumers: the sampler and the rank pass
    n = vals.count()
    bounds = np.asarray(
        sampled_quantile_boundaries(vals, "ts_us", n_parts,
                                    sample_k=sample_k),
        np.int64,
    )

    def rank_partial(batch: pa.Table) -> pa.Table:
        x = np.sort(batch["ts_us"].to_numpy())
        cnt = np.searchsorted(x, bounds, side="right").astype(np.int64)
        return pa.table({
            "bi": pa.array(np.arange(len(bounds), dtype=np.int64)),
            "cnt": pa.array(cnt),
        })

    ranks = bucketed_group_agg(
        vals.map_batches(rank_partial, batch_format="pyarrow"),
        ["bi"], {"rank": ("cnt", "sum")}, n_buckets=4,
    ).to_pandas().sort_values("bi")
    target = np.arange(1, n_parts) / n_parts
    err = float(np.abs(ranks["rank"].to_numpy() / n - target).max())
    return pd.DataFrame(
        {
            "n_rows": [n],
            "n_parts": [n_parts],
            "sample_k": [sample_k],
            "max_rank_err_pct": [100.0 * err],
        }
    )


# ---------------------------------------------------------------------------
# interval (range-predicate) join + grouped exact percentiles.
# Registered AFTER the driver's 50-query window by design (the window's
# composition stays stable across rounds); their oracle verification runs
# in tests/test_interval_percentiles.py via the same DuckDB comparison
# the driver uses.
# ---------------------------------------------------------------------------
INTERVAL_WINDOW_US = 3_600_000_000  # 1 hour

_INTERVAL_SQL = (
    "SELECT a.event_id AS anchor_id, CAST(COUNT(e.event_id) AS BIGINT) "
    "AS n_in_window FROM events a JOIN events e "
    "ON e.ts >= a.ts AND e.ts < a.ts + INTERVAL 1 HOUR "
    "WHERE a.event_type = 'purchase' GROUP BY a.event_id"
)


@register("interval_join_events", _INTERVAL_SQL)
def interval_join_events(sf_dir: str):
    """Range-predicate join (no shared key): per purchase event, the
    count of ALL events inside its 1-hour window — time-bucket
    replication plan, see functions.joins.interval_join_count."""
    import pyarrow.compute as pc

    from ..functions.joins import interval_join_count

    ev = read_table(sf_dir, "events", columns=["event_id", "event_type", "ts"])
    anchors = ev.map_batches(
        lambda t: t.filter(pc.equal(t["event_type"], "purchase")).select(
            ["event_id", "ts"]
        ),
        batch_format="pyarrow",
    )
    out = interval_join_count(
        anchors, ev, anchor_id="event_id", ts_col="ts",
        window_us=INTERVAL_WINDOW_US,
    )
    return out.map_batches(
        lambda df: df.rename(columns={"event_id": "anchor_id"}),
        batch_format="pandas",
    )


_GROUPED_PCT_SQL = (
    "WITH h AS (SELECT lang, n_chars AS v, COUNT(*) AS c FROM documents "
    "GROUP BY lang, v), "
    "s AS (SELECT lang, v, SUM(c) OVER (PARTITION BY lang ORDER BY v) AS cum, "
    "SUM(c) OVER (PARTITION BY lang) AS n FROM h) "
    "SELECT lang, CAST(50 AS BIGINT) AS pct, CAST(MIN(v) AS BIGINT) AS value "
    "FROM s WHERE cum >= CEIL(0.50 * n) GROUP BY lang "
    "UNION ALL SELECT lang, 90, CAST(MIN(v) AS BIGINT) FROM s "
    "WHERE cum >= CEIL(0.90 * n) GROUP BY lang"
)


@register("grouped_percentiles", _GROUPED_PCT_SQL)
def grouped_percentiles(sf_dir: str):
    """Exact per-group percentiles (p = smallest v with cumulative count
    >= ceil(p*n_group)): the corpus reduces to a (group, value)-count
    histogram, the histogram hash-buckets by group, and each bucket
    resolves every percentile for its groups with one vectorized
    cumsum pass — groups never co-locate on the driver, so group
    cardinality can be corpus-scale."""
    import math

    import pyarrow as pa

    from ..functions.agg import bucketed_group_agg
    from ..functions.hashing import bucket_column

    ds = read_table(sf_dir, "documents", columns=["lang", "n_chars"])
    hist = bucketed_group_agg(
        ds, ["lang", "n_chars"], {"c": ("n_chars", "size")}, n_buckets=16
    )
    bucketed = hist.map_batches(
        lambda t: bucket_column(t, "lang", 16, "__gp"), batch_format="pyarrow"
    )

    def pct_bucket(df: pd.DataFrame) -> pa.Table:
        df = df.drop(columns="__gp").sort_values(["lang", "n_chars"])
        df["cum"] = df.groupby("lang")["c"].cumsum()
        n = df.groupby("lang")["c"].transform("sum")
        out_lang, out_pct, out_val = [], [], []
        for pct in (50, 90):
            k = np.ceil(pct / 100.0 * n)
            hit = df[df["cum"] >= k].groupby("lang", sort=False).first()
            out_lang.extend(hit.index.tolist())
            out_pct.extend([pct] * len(hit))
            out_val.extend(int(v) for v in hit["n_chars"])
        return pa.table(
            {
                "lang": pa.array(out_lang, pa.string()),
                "pct": pa.array(out_pct, pa.int64()),
                "value": pa.array(out_val, pa.int64()),
            }
        )

    return bucketed.groupby("__gp").map_groups(
        lambda g: pct_bucket(g.to_pandas()), batch_format="pyarrow"
    )


# ---------------------------------------------------------------------------
# document chunking (the standard pre-tokenization step: one doc -> many
# overlapping fixed-size chunks). Registered past the 50-query window;
# oracle-verified by tests/test_interval_percentiles.py + the parity tool.
# ---------------------------------------------------------------------------
CHUNK_CHARS = 500
CHUNK_OVERLAP = 100
_CHUNK_STRIDE = CHUNK_CHARS - CHUNK_OVERLAP

_CHUNK_SQL = (
    f"WITH c AS (SELECT doc_id, text, unnest(range(0, "
    f"CAST(CEIL(length(text) / {_CHUNK_STRIDE}.0) AS BIGINT))) AS i "
    f"FROM documents) "
    f"SELECT doc_id, CAST(i AS BIGINT) AS chunk_idx, "
    f"substr(text, CAST(i * {_CHUNK_STRIDE} + 1 AS BIGINT), {CHUNK_CHARS}) "
    f"AS chunk_text, "
    f"CAST(length(substr(text, CAST(i * {_CHUNK_STRIDE} + 1 AS BIGINT), "
    f"{CHUNK_CHARS})) AS BIGINT) AS n_chunk_chars FROM c"
)


@register("chunk_documents", _CHUNK_SQL)
def chunk_documents(sf_dir: str):
    """One-to-many chunking: fixed-size character chunks with overlap,
    deterministic boundaries (start_k = k * stride while start < len;
    the final chunk is short rather than padded; empty docs emit no
    chunks). Runs as a per-batch expansion inside map_batches — chunk
    rows never exist driver-side, and downstream stages (tokenize,
    pack, embed) stream over the expanded Dataset."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def chunk(df: pd.DataFrame) -> pd.DataFrame:
        ids, idxs, texts = [], [], []
        for i, t in zip(df["doc_id"], df["text"]):
            t = str(t)
            for k, start in enumerate(range(0, len(t), _CHUNK_STRIDE)):
                ids.append(i)
                idxs.append(k)
                texts.append(t[start : start + CHUNK_CHARS])
        out = pd.DataFrame(
            {
                "doc_id": pd.array(ids, dtype="int64"),
                "chunk_idx": pd.array(idxs, dtype="int64"),
                "chunk_text": texts,
            }
        )
        out["n_chunk_chars"] = out["chunk_text"].str.len().astype("int64")
        return out

    return ds.map_batches(chunk, batch_format="pandas")


@register("pack_chunks")  # rows-only (stateful greedy packing — not SQL)
def pack_chunks_query(sf_dir: str):
    """Chunk the corpus, then pack chunks into 2000-char training
    sequences (first-fit-decreasing per bucket); returns per-pack fill
    stats. Invariants (every chunk packed exactly once, no pack over
    budget, determinism across parallelism) are asserted in
    tests/test_packing.py."""
    from ..stages.packing import pack_chunks, pack_stats

    chunks = chunk_documents(sf_dir)
    packed = pack_chunks(chunks, budget=2000)
    return pack_stats(packed, budget=2000)


_BPE_SQL_PATTERN = (
    "''(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^\\sA-Za-z0-9]+|\\s+"
)


@register(
    "bpe_token_counts",
    "SELECT doc_id, CAST(len(regexp_extract_all(text, "
    f"'{_BPE_SQL_PATTERN}')) AS BIGINT) AS n_bpe_tokens FROM documents",
)
def bpe_token_counts(sf_dir: str):
    """BPE-ish token-budget estimate per document (GPT-2-style ASCII
    pre-tokenizer; same pattern evaluated by the DuckDB oracle)."""
    from ..stages.text_analysis import bpe_token_count_batch

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(
        bpe_token_count_batch, batch_format="pandas"
    ).select_columns(["doc_id", "n_bpe_tokens"])


# ---------------------------------------------------------------------------
# graph: connected components / duplicate clusters
# ---------------------------------------------------------------------------
@register(
    "pagerank",
    # Star graph within each 4-block of contiguous doc ids (d -> d - d%4
    # for d % 4 != 0; heads are dangling). By class symmetry every
    # non-head has the same rank, every full head (3 in-neighbours) has
    # the same rank, and the tail head (ktail = N-1-4*(H-1) in-neighbours)
    # its own — so the oracle reproduces the ENGINE'S exact integer
    # fixed-point iteration with a 3-scalar recursive CTE (the engine
    # runs the general distributed algorithm; the oracle exploits the
    # closed-form class structure, same trick as connected_components).
    "WITH RECURSIVE p AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, "
    "CAST((COUNT(*) + 3) // 4 AS BIGINT) AS h, "
    "CAST(COUNT(*) - 1 - 4 * ((COUNT(*) + 3) // 4 - 1) AS BIGINT) AS ktail "
    "FROM documents), "
    "it(i, rn, rh3, rhk) AS ("
    "SELECT 0, CAST(1000000 AS BIGINT), CAST(1000000 AS BIGINT), "
    "CAST(1000000 AS BIGINT) "
    "UNION ALL SELECT i + 1, "
    "150000 + ((SELECT h - 1 FROM p) * ((85 * rh3) // 100) "
    "+ ((85 * rhk) // 100)) // (SELECT n FROM p), "
    "150000 + ((SELECT h - 1 FROM p) * ((85 * rh3) // 100) "
    "+ ((85 * rhk) // 100)) // (SELECT n FROM p) + 3 * ((85 * rn) // 100), "
    "150000 + ((SELECT h - 1 FROM p) * ((85 * rh3) // 100) "
    "+ ((85 * rhk) // 100)) // (SELECT n FROM p) "
    "+ (SELECT ktail FROM p) * ((85 * rn) // 100) "
    "FROM it WHERE i < 10) "
    "SELECT doc_id AS node, CAST(CASE "
    "WHEN doc_id % 4 <> 0 THEN (SELECT rn FROM it WHERE i = 10) "
    "WHEN doc_id = 4 * ((SELECT h FROM p) - 1) "
    "THEN (SELECT rhk FROM it WHERE i = 10) "
    "ELSE (SELECT rh3 FROM it WHERE i = 10) END AS BIGINT) AS rank_ppm "
    "FROM documents",
)
def pagerank_query(sf_dir: str):
    """Distributed integer fixed-point PageRank (10 rounds, damping
    85/100, partitioned-state regime — see functions/graph.py
    ``pagerank_int``) on a deterministic star-of-4 graph derived from
    doc ids. The oracle knows the per-class closed form; the engine runs
    the general algorithm over the explicit edge list."""
    from ..functions.graph import pagerank_int

    ds = read_table(sf_dir, "documents", columns=["doc_id"])

    def mk_edges(t: pa.Table) -> pa.Table:
        d = t["doc_id"].to_numpy(zero_copy_only=False)
        d = d[d % 4 != 0]
        return pa.table({"src": pa.array(d, pa.int64()),
                         "dst": pa.array(d - d % 4, pa.int64())})

    edges = ds.map_batches(mk_edges, batch_format="pyarrow")
    return pagerank_int(edges, ds, src="src", dst="dst",
                        node_col="doc_id", iters=10)


@register(
    "triangle_counts",
    # complete graph within each 4-block of contiguous doc ids: a node in
    # K_m sits in C(m-1, 2) triangles — closed form via a window count,
    # while the engine runs the general wedge-closing algorithm
    "SELECT doc_id AS node, "
    "CAST(((m - 1) * (m - 2)) // 2 AS BIGINT) AS n_triangles FROM ("
    "SELECT doc_id, COUNT(*) OVER (PARTITION BY doc_id // 4) AS m "
    "FROM documents) t",
)
def triangle_counts_query(sf_dir: str):
    """Per-node triangle counts (wedge-closing self-join — see
    functions/graph.py ``triangle_counts``) on the within-4-block
    complete graph derived from doc ids."""
    from ..functions.graph import triangle_counts

    ds = read_table(sf_dir, "documents", columns=["doc_id"])
    n_total = ds.count()

    def mk_edges(t: pa.Table) -> pa.Table:
        d = t["doc_id"].to_numpy(zero_copy_only=False)
        us, vs = [], []
        for off in (1, 2, 3):
            keep = (d % 4 <= 3 - off) & (d + off < n_total)
            us.append(d[keep])
            vs.append(d[keep] + off)
        return pa.table({"a": pa.array(np.concatenate(us), pa.int64()),
                         "b": pa.array(np.concatenate(vs), pa.int64())})

    edges = ds.map_batches(mk_edges, batch_format="pyarrow")
    return triangle_counts(edges, ds, node_col="doc_id")


@register(
    "connected_components",
    # chain edges (d, d-1) for d % 4 != 0 over contiguous doc ids =>
    # components are runs of 4 consecutive ids; min member = d - d % 4
    # (diameter 3 — the duplicate-cluster regime the operator targets;
    # each extra hop costs a full propagation round = 2 shuffles)
    "SELECT doc_id AS node, CAST(doc_id - doc_id % 4 AS BIGINT) AS component "
    "FROM documents",
)
def connected_components_query(sf_dir: str):
    """Distributed connected components (min-label propagation, delta
    frontiers) on a deterministic chain graph derived from doc ids —
    chains of length 4, so convergence takes multiple propagation rounds
    (the oracle knows the closed form, the engine runs the general
    algorithm).
    """
    import pyarrow as pa

    from ..functions.graph import connected_components

    ds = read_table(sf_dir, "documents", columns=["doc_id"])

    def mk_edges(t: pa.Table) -> pa.Table:
        d = t["doc_id"].to_numpy(zero_copy_only=False)
        d = d[d % 4 != 0]
        return pa.table({"a": pa.array(d, pa.int64()),
                         "b": pa.array(d - 1, pa.int64())})

    edges = ds.map_batches(mk_edges, batch_format="pyarrow")
    return connected_components(
        edges, nodes=ds, node_col="doc_id", id_type=pa.int64()
    )


@register("neardup_clusters")  # rows-only: transitive duplicate clusters
def neardup_clusters_query(sf_dir: str):
    """Cluster assignment for every document in a verified near-dup pair
    (planted corpus): minhash pairs -> connected components. Pairs are
    approximate (LSH), so the strong gate is the planted-cluster pytest
    (tests/test_graph.py) plus the recall row in ``neardup_recall``."""
    from ..stages.dedup import neardup_clusters

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    corpus = _planted_corpus(ds)
    return neardup_clusters(corpus, threshold=0.8)


@register(
    "passage_dedup",
    # disjoint 10-word windows per doc (trailing partial dropped); one row
    # per distinct passage with its copy count and the lexicographically
    # first (doc, widx) occurrence — the kept one
    "WITH toks AS ("
    "  SELECT doc_id,"
    "         unnest(string_split_regex(regexp_replace(text, '^\\s+|\\s+$', '', 'g'), '\\s+')) AS w,"
    "         generate_subscripts(string_split_regex(regexp_replace(text, '^\\s+|\\s+$', '', 'g'), '\\s+'), 1) AS i"
    "  FROM documents), "
    "win AS ("
    "  SELECT doc_id, CAST((i - 1) // 10 AS BIGINT) AS widx,"
    "         string_agg(w, ' ' ORDER BY i) AS passage"
    "  FROM toks GROUP BY doc_id, (i - 1) // 10"
    "  HAVING count(*) = 10), "
    "agg AS ("
    "  SELECT passage, CAST(count(*) AS BIGINT) AS n_copies,"
    "         min(doc_id) AS keep_doc"
    "  FROM win GROUP BY passage) "
    "SELECT a.passage, a.n_copies, a.keep_doc, min(w.widx) AS keep_widx "
    "FROM agg a JOIN win w ON w.passage = a.passage AND w.doc_id = a.keep_doc "
    "GROUP BY a.passage, a.n_copies, a.keep_doc",
)
def passage_dedup_query(sf_dir: str):
    """Exact repeated-passage dedup (C4/RefinedWeb-style span removal,
    keep first occurrence) — see :func:`..stages.dedup.passage_dedup`."""
    from ..stages.dedup import passage_dedup

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return passage_dedup(ds, width=10)


_TRIM = "regexp_replace(text, '^\\s+|\\s+$', '', 'g')"


@register(
    "tfidf_topk",
    # fixed-point tf-over-df score (integer-exact on both sides; rank-
    # equivalent to tf-idf's "frequent here, rare elsewhere" signal
    # without float log divergence): score = tf * 1e6 // df
    "WITH toks AS ("
    f"  SELECT doc_id, unnest(string_split_regex({_TRIM}, '\\s+')) AS tok"
    f"  FROM documents WHERE {_TRIM} <> ''), "
    "tf AS (SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf"
    "       FROM toks GROUP BY doc_id, tok), "
    "df AS (SELECT tok, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY tok), "
    "scored AS ("
    "  SELECT t.doc_id, t.tok, t.tf, d.df, t.tf * 1000000 // d.df AS score"
    "  FROM tf t JOIN df d USING (tok)) "
    "SELECT doc_id, tok, tf, df, score, rank FROM ("
    "  SELECT *, ROW_NUMBER() OVER ("
    "    PARTITION BY doc_id ORDER BY score DESC, tok ASC) AS rank"
    "  FROM scored) WHERE rank <= 3",
)
def tfidf_topk(sf_dir: str):
    """Top-3 characteristic terms per document by fixed-point tf-over-df.

    Plan: ONE token explode -> bucketed (doc, tok) count = tf ->
    df derived FROM the tf rows (per-token row count — the explode never
    runs twice) -> bucketed join on token -> grouped top-k per doc.
    tf is materialized once because both the df aggregation and the join
    consume it."""
    import pyarrow as pa

    from ..functions.agg import bucketed_group_agg
    from ..functions.arrow_util import arrow_schema_of
    from ..functions.joins import bucketed_hash_join, grouped_topk

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def toks(df: pd.DataFrame) -> pd.DataFrame:
        out_d, out_t = [], []
        for i, t in zip(df["doc_id"], df["text"]):
            for w in str(t).split():
                out_d.append(i)
                out_t.append(w)
        return pd.DataFrame({"doc_id": pd.array(out_d, dtype="int64"),
                             "tok": out_t})

    tf = bucketed_group_agg(
        ds.map_batches(toks, batch_format="pandas"),
        ["doc_id", "tok"], {"tf": ("tok", "size")},
    ).materialize()
    df_tbl = bucketed_group_agg(
        tf.select_columns(["tok"]), ["tok"], {"df": ("tok", "size")},
    )
    scored = bucketed_hash_join(
        tf, df_tbl, "tok",
        lschema=arrow_schema_of(tf),  # materialized: metadata read
        rschema=pa.schema([("tok", pa.string()), ("df", pa.int64())]),
    ).map_batches(
        lambda d: d.assign(score=(d["tf"] * 1_000_000) // d["df"]),
        batch_format="pandas",
    )
    return grouped_topk(scored, "doc_id", "score", 3, tiebreak_col="tok")


@register(
    "term_postings",
    # inverted index over frequent terms: one row per token appearing in
    # >= 50 distinct docs, with the ORDERED posting list (comma-joined
    # doc ids) — the ordered-list-aggregation output shape none of the
    # scalar aggregates exercise
    "WITH toks AS (SELECT DISTINCT doc_id, tok FROM ("
    f"  SELECT doc_id, unnest(string_split_regex({_TRIM}, '\\s+')) AS tok"
    f"  FROM documents WHERE {_TRIM} <> '')) "
    "SELECT tok, CAST(COUNT(*) AS BIGINT) AS df, "
    "string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS postings "
    "FROM toks GROUP BY tok HAVING COUNT(*) >= 50",
)
def term_postings(sf_dir: str):
    """Inverted-index build: distinct (token, doc) pairs collapse per
    batch, ONE bucket shuffle on token, per-token ordered posting list.
    The search-index analog of the reference's content-addressed key
    map (app/main.py:717-718), emitted as a queryable table."""
    from ..functions.hashing import bucket_column

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        out_d, out_t = [], []
        for i, t in zip(df["doc_id"], df["text"]):
            for w in set(str(t).split()):  # within-doc distinct
                out_d.append(i)
                out_t.append(w)
        return pd.DataFrame(
            {"doc_id": pd.array(out_d, dtype="int64"), "tok": out_t}
        ).drop_duplicates()

    bucketed = ds.map_batches(pairs, batch_format="pandas").map_batches(
        lambda t: bucket_column(t, "tok", 32, "__pb"), batch_format="pyarrow",
    )

    def posting_bucket(grp: pa.Table) -> pa.Table:
        df = (grp.drop_columns(["__pb"]).to_pandas()
              .drop_duplicates()  # cross-batch duplicate pairs
              .sort_values(["tok", "doc_id"], kind="mergesort"))
        g = df.groupby("tok", sort=True)
        sizes = g.size()
        keep = sizes[sizes >= 50]
        post = g["doc_id"].agg(lambda s: ",".join(map(str, s)))
        return pa.table({
            "tok": pa.array(keep.index.to_numpy().tolist(), pa.string()),
            "df": pa.array(keep.to_numpy().astype(np.int64)),
            "postings": pa.array(post.loc[keep.index].tolist(), pa.string()),
        })

    return bucketed.groupby("__pb").map_groups(
        posting_bucket, batch_format="pyarrow"
    )


@register(
    "repetition_ratio",
    # within-doc duplicated-passage fraction (disjoint 5-word windows,
    # trailing partial dropped), per mille — a doc-local quality signal
    "WITH toks AS ("
    f"  SELECT doc_id, unnest(string_split_regex({_TRIM}, '\\s+')) AS w,"
    f"         generate_subscripts(string_split_regex({_TRIM}, '\\s+'), 1) AS i"
    "  FROM documents), "
    "win AS ("
    "  SELECT doc_id, string_agg(w, ' ' ORDER BY i) AS p"
    "  FROM toks GROUP BY doc_id, (i - 1) // 5"
    "  HAVING count(*) = 5) "
    "SELECT doc_id, CAST((count(*) - count(DISTINCT p)) * 1000 // count(*) "
    "AS BIGINT) AS rep_pm FROM win GROUP BY doc_id",
)
def repetition_ratio(sf_dir: str):
    """Within-document repetition: the per-mille fraction of a doc's
    disjoint 5-word windows that are duplicates of an earlier window.
    MAP-ONLY — the metric is doc-local, so no exchange at any scale
    (contrast :func:`passage_dedup`, the cross-corpus variant)."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def rep(df: pd.DataFrame) -> pd.DataFrame:
        # fully vectorized window dedup: factorize tokens to int codes,
        # view each disjoint 5-token window as a (doc, c0..c4) int row,
        # and count distinct rows per doc with ONE np.unique(axis=0) over
        # the whole batch — no Python loop over docs or windows. A window
        # of codes equals another iff the joined strings are equal (codes
        # are injective over tokens and windows have fixed arity), so
        # this matches the string_agg-based SQL oracle exactly.
        toks = df["text"].astype(str).str.split()
        counts = toks.str.len().to_numpy().astype(np.int64)
        nwin = counts // 5
        ex = toks.explode()
        tokens = ex.to_numpy()[ex.notna().to_numpy()]
        row = np.repeat(np.arange(len(df)), counts)
        pos = np.arange(counts.sum()) - np.repeat(
            np.cumsum(counts) - counts, counts
        )
        full = pos < np.repeat(nwin * 5, counts)
        codes = pd.factorize(tokens[full])[0].reshape(-1, 5)
        wrow = row[full][::5]
        uniq = np.unique(np.column_stack([wrow, codes]), axis=0)
        ndist = np.bincount(uniq[:, 0], minlength=len(df))
        keep = nwin > 0
        return pd.DataFrame({
            "doc_id": df["doc_id"].to_numpy()[keep],
            "rep_pm": ((nwin[keep] - ndist[keep]) * 1000 // nwin[keep]
                       ).astype("int64"),
        })

    return ds.map_batches(rep, batch_format="pandas")


@register("curation_pipeline")  # rows-only: the end-to-end composition
def curation_pipeline_query(sf_dir: str):
    """The flagship training-data curation flow: quality filter -> exact
    + minhash near-dedup -> decontamination vs the probe slice (every
    50th doc) -> overlapping chunking -> first-fit-decreasing packing.
    Returns per-pack fill stats. Stage-by-stage invariants (dropped docs
    absent, packs within budget, determinism) are pinned in
    tests/test_curation.py; each constituent stage also has its own
    strict-oracle query."""
    import pyarrow as pa

    from .curation import curate
    from ..stages.packing import pack_stats

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def split(want_probe: bool):
        def filt(t: pa.Table) -> pa.Table:
            import numpy as np

            is_probe = t["doc_id"].to_numpy(zero_copy_only=False) % 50 == 0
            return t.filter(pa.array(is_probe if want_probe else ~is_probe))

        return ds.map_batches(filt, batch_format="pyarrow")

    packed, _ = curate(split(False), split(True))
    return pack_stats(packed, budget=2000)


@register("kmeans_clusters")  # rows-only: iterative, not SQL-expressible
def kmeans_clusters_query(sf_dir: str):
    """Distributed Lloyd k-means over the embeddings table: fit k=8
    centroids (map-only partial-sum iterations, centroids broadcast per
    round), then assign every vector. Planted-blob recovery and bitwise
    determinism are pinned in tests/test_clustering.py."""
    from ..stages.clustering import kmeans_assign, kmeans_fit

    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    cents, _ = kmeans_fit(ds, 8, iters=4)
    return kmeans_assign(ds, cents).select_columns(["vec_id", "cluster"])


@register("semdedup_embeddings")  # rows-only: planted near-identical copies
def semdedup_embeddings_query(sf_dir: str):
    """SemDeDup over the embeddings table with planted near-identical
    copies (every 25th vector, id + 1_000_000, tiny perturbation): the
    copies must come back keep=False with dup_of = the original. The
    strong gate is the planted-copy pytest; this query records the
    corpus-scale row shape for the driver."""
    import numpy as np

    from ..stages.clustering import semantic_dedup

    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])

    def plant(df: pd.DataFrame) -> pd.DataFrame:
        ids, vecs = [], []
        for i, v in zip(df["vec_id"], df["embedding"]):
            ids.append(int(i))
            vecs.append(v)
            if int(i) % 25 == 0:
                w = np.asarray(v, dtype=np.float32)
                w = w + np.float32(1e-4) * (1.0 + w * 0)
                ids.append(int(i) + 1_000_000)
                vecs.append(w.tolist())
        return pd.DataFrame({"vec_id": ids, "embedding": vecs})

    planted = ds.map_batches(plant, batch_format="pandas")
    return semantic_dedup(planted, k=8, threshold=0.999, iters=3)


# ---------------------------------------------------------------------------
# decontamination
# ---------------------------------------------------------------------------
@register(
    "contamination",
    # probe set = every 50th document's word-3-grams; a corpus doc is
    # contaminated when it shares >= 1 distinct 3-gram with the probe
    "WITH toks AS ("
    "  SELECT doc_id,"
    "         unnest(string_split_regex(regexp_replace(text, '^\\s+|\\s+$', '', 'g'), '\\s+')) AS w,"
    "         generate_subscripts(string_split_regex(regexp_replace(text, '^\\s+|\\s+$', '', 'g'), '\\s+'), 1) AS i"
    "  FROM documents), "
    "grams AS ("
    "  SELECT t1.doc_id, t1.w || ' ' || t2.w || ' ' || t3.w AS g"
    "  FROM toks t1"
    "  JOIN toks t2 ON t2.doc_id = t1.doc_id AND t2.i = t1.i + 1"
    "  JOIN toks t3 ON t3.doc_id = t1.doc_id AND t3.i = t1.i + 2), "
    "probe AS (SELECT DISTINCT g FROM grams WHERE doc_id % 50 = 0), "
    "hits AS (SELECT DISTINCT d.doc_id, d.g FROM grams d JOIN probe USING (g)"
    "         WHERE d.doc_id % 50 <> 0) "
    "SELECT doc_id, CAST(count(*) AS BIGINT) AS n_hits FROM hits GROUP BY doc_id",
)
def contamination(sf_dir: str):
    """Train/test decontamination: corpus docs sharing any word-3-gram
    with the probe slice (every 50th doc stands in for a benchmark set).
    Distributed semi-join on gram strings — see
    :func:`..stages.text_analysis.ngram_contamination`."""
    import pyarrow as pa

    from ..stages.text_analysis import ngram_contamination

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def split(want_probe: bool):
        def filt(t: pa.Table) -> pa.Table:
            is_probe = t["doc_id"].to_numpy(zero_copy_only=False) % 50 == 0
            return t.filter(pa.array(is_probe if want_probe else ~is_probe))

        return ds.map_batches(filt, batch_format="pyarrow")

    return ngram_contamination(split(False), split(True), n=3)


# ---------------------------------------------------------------------------
# Deterministic hash sampling: exact uniform k-sample without replacement.
# Rank every row by md5(id) and keep the k smallest — a seeded, shuffle-free,
# reproducible sample whose oracle is plain ORDER BY md5 LIMIT k. Partial
# top-k per batch means only k rows per batch ever reach the final merge.
# ---------------------------------------------------------------------------
@register(
    "hash_sample_k",
    "SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS fp FROM documents "
    "ORDER BY fp, doc_id LIMIT 100",
)
def hash_sample_k(sf_dir: str, k: int = 100):
    from ..functions.hashing import md5_hex_array

    ds = read_table(sf_dir, "documents", columns=["doc_id"])

    def partial_topk(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"]
        fp = md5_hex_array(pc.cast(ids, pa.string()))
        t = pa.table({"doc_id": ids, "fp": fp})
        idx = pc.sort_indices(
            t, sort_keys=[("fp", "ascending"), ("doc_id", "ascending")]
        )
        return t.take(idx[: min(k, t.num_rows)])

    partials = ds.map_batches(partial_topk, batch_format="pyarrow",
                              batch_size=65536)
    # partials are <= k rows per input batch; the global sort is tiny
    return partials.sort(["fp", "doc_id"]).limit(k)


# ---------------------------------------------------------------------------
# Weighted Bernoulli sampling: keep each doc with probability proportional
# to its length, deterministically (md5-derived uniform). All comparisons
# are fixed-width lowercase-hex string compares — bit-identical in Python
# and SQL, no float randomness, embarrassingly parallel (no shuffle).
# ---------------------------------------------------------------------------
_WS_K = 200_000_000_000_000  # p(select) = n_chars * K / 16^15 (~5% at 300 chars)
_WS_MAX = 16**15 - 1


@register(
    "weighted_sample",
    "SELECT doc_id, n_chars FROM documents "
    f"WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 15) "
    f"< printf('%015x', LEAST(n_chars * {_WS_K}, {_WS_MAX}))",
)
def weighted_sample(sf_dir: str):
    from ..functions.hashing import md5_hex_array

    ds = read_table(sf_dir, "documents", columns=["doc_id", "n_chars"])

    def pick(batch: pa.Table) -> pa.Table:
        fp = md5_hex_array(pc.cast(batch["doc_id"], pa.string()))
        u15 = np.array([f[:15] for f in fp.to_pylist()])
        thresh = np.minimum(
            batch["n_chars"].to_numpy(zero_copy_only=False) * _WS_K, _WS_MAX
        )
        thr15 = np.array(["%015x" % t for t in thresh])
        return batch.filter(pa.array(u15 < thr15))

    return ds.map_batches(pick, batch_format="pyarrow", batch_size=65536)


# ---------------------------------------------------------------------------
# Grouped moments: mean/variance per group from exact integer partial sums
# (sum, sum-of-squares, count are associative int64 -> order-independent;
# the float mean/var are derived ONCE from identical scalars on both sides).
# ---------------------------------------------------------------------------
@register(
    "doc_stats_by_lang",
    "WITH s AS (SELECT lang, COUNT(*) AS n_docs, "
    "CAST(SUM(n_chars) AS BIGINT) AS sum_chars, "
    "CAST(SUM(n_chars * n_chars) AS BIGINT) AS sumsq_chars, "
    "MIN(n_chars) AS min_chars, MAX(n_chars) AS max_chars "
    "FROM documents GROUP BY lang) "
    "SELECT lang, n_docs, sum_chars, min_chars, max_chars, "
    "CAST(sum_chars AS DOUBLE) / n_docs AS mean_chars, "
    "(CAST(sumsq_chars AS DOUBLE) - CAST(sum_chars AS DOUBLE) "
    "* CAST(sum_chars AS DOUBLE) / n_docs) / n_docs AS var_chars FROM s",
)
def doc_stats_by_lang(sf_dir: str):
    from ray.data.aggregate import Max, Min, Sum

    ds = read_table(sf_dir, "documents", columns=["lang", "n_chars"])

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        x = batch["n_chars"].astype("int64")
        batch = batch.assign(sq=x * x)
        out = (
            batch.groupby("lang", sort=False)
            .agg(
                n_docs=("n_chars", "size"),
                sum_chars=("n_chars", "sum"),
                sumsq_chars=("sq", "sum"),
                min_chars=("n_chars", "min"),
                max_chars=("n_chars", "max"),
            )
            .reset_index()
        )
        for c in out.columns[1:]:
            out[c] = out[c].astype("int64")
        return out

    partials = ds.map_batches(partial, batch_format="pandas", batch_size=65536)
    agg = partials.groupby("lang").aggregate(
        Sum("n_docs", alias_name="n_docs"),
        Sum("sum_chars", alias_name="sum_chars"),
        Sum("sumsq_chars", alias_name="sumsq_chars"),
        Min("min_chars", alias_name="min_chars"),
        Max("max_chars", alias_name="max_chars"),
    )

    def finalize(batch: pd.DataFrame) -> pd.DataFrame:
        n = batch["n_docs"].to_numpy()
        s = batch["sum_chars"].to_numpy().astype(np.float64)
        sq = batch["sumsq_chars"].to_numpy().astype(np.float64)
        # EXACT mirror of the oracle expression tree: (sq - s*s/n) / n
        batch["mean_chars"] = s / n
        batch["var_chars"] = (sq - s * s / n) / n
        return batch[["lang", "n_docs", "sum_chars", "min_chars",
                      "max_chars", "mean_chars", "var_chars"]]

    return agg.map_batches(finalize, batch_format="pandas")


# ---------------------------------------------------------------------------
# Histogram binning (width_bucket): fixed-width bins over a numeric column,
# per-batch bincount partials -> one tiny groupby. The shuffle carries only
# (bin, count) pairs.
# ---------------------------------------------------------------------------
_HIST_WIDTH = 100
_HIST_CAP = 50


@register(
    "chars_histogram",
    f"SELECT CAST(LEAST(n_chars // {_HIST_WIDTH}, {_HIST_CAP}) AS BIGINT) "
    "AS bin, COUNT(*) AS n_docs FROM documents GROUP BY bin",
)
def chars_histogram(sf_dir: str):
    from ray.data.aggregate import Sum

    ds = read_table(sf_dir, "documents", columns=["n_chars"])

    def partial(batch: pa.Table) -> pa.Table:
        x = batch["n_chars"].to_numpy(zero_copy_only=False)
        bins = np.minimum(x // _HIST_WIDTH, _HIST_CAP)
        counts = np.bincount(bins, minlength=_HIST_CAP + 1)
        nz = np.nonzero(counts)[0]
        return pa.table(
            {"bin": pa.array(nz.astype(np.int64)),
             "n_docs": pa.array(counts[nz].astype(np.int64))}
        )

    partials = ds.map_batches(partial, batch_format="pyarrow", batch_size=65536)
    return partials.groupby("bin").aggregate(Sum("n_docs", alias_name="n_docs"))


# ---------------------------------------------------------------------------
# Group-wise deterministic sampling: k docs per group, ranked by md5 —
# reproducible stratified downsampling with a pure-SQL oracle. Reuses
# grouped_topk's two-phase plan (per-batch partial prune -> one bucket
# shuffle of survivors), so the shuffle carries <= k rows per group per
# batch, never the corpus.
# ---------------------------------------------------------------------------
@register(
    "per_lang_sample",
    "SELECT lang, doc_id, fp, CAST(rn AS BIGINT) AS \"rank\" FROM ("
    "SELECT lang, doc_id, md5(CAST(doc_id AS VARCHAR)) AS fp, "
    "ROW_NUMBER() OVER (PARTITION BY lang "
    "ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn "
    "FROM documents) WHERE rn <= 5",
)
def per_lang_sample(sf_dir: str, k: int = 5):
    from ..functions.hashing import md5_hex_array
    from ..functions.joins import grouped_topk

    ds = read_table(sf_dir, "documents", columns=["lang", "doc_id"])

    def add_fp(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "fp", md5_hex_array(pc.cast(batch["doc_id"], pa.string()))
        )

    with_fp = ds.map_batches(add_fp, batch_format="pyarrow", batch_size=65536)
    out = grouped_topk(with_fp, "lang", "fp", k,
                       descending=False, tiebreak_col="doc_id")
    return out.select_columns(["lang", "doc_id", "fp", "rank"])


# ---------------------------------------------------------------------------
# Z-score normalization: classic two-pass feature scaling. Pass 1 reduces
# to three exact int64 scalars (n, sum, sumsq of value-cents — associative,
# order-independent); pass 2 is an embarrassingly-parallel map with the
# scalars closed over. Only 3 numbers ever touch the driver. z is
# scale-invariant, so computing moments in exact cents loses nothing.
# ---------------------------------------------------------------------------
@register(
    "value_zscores",
    "WITH v AS (SELECT event_id, "
    "CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS cents FROM events), "
    "m AS (SELECT COUNT(*) AS n, CAST(SUM(cents) AS BIGINT) AS s, "
    "CAST(SUM(cents * cents) AS BIGINT) AS sq FROM v) "
    "SELECT event_id, "
    "(CAST(cents AS DOUBLE) - CAST(s AS DOUBLE) / n) / "
    "sqrt((CAST(sq AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n) "
    "/ n) AS z FROM v, m",
)
def value_zscores(sf_dir: str):
    from ray.data.aggregate import Sum

    from ..functions.money import to_cents

    ds = read_table(sf_dir, "events", columns=["event_id", "value"])

    def to_v(batch: pa.Table) -> pa.Table:
        return pa.table(
            {"event_id": batch["event_id"], "cents": to_cents(batch["value"])}
        )

    v = ds.map_batches(to_v, batch_format="pyarrow", batch_size=65536)

    def partial(batch: pa.Table) -> pa.Table:
        x = batch["cents"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "n": pa.array([len(x)], pa.int64()),
                "s": pa.array([int(x.sum())], pa.int64()),
                "sq": pa.array([int((x * x).sum())], pa.int64()),
            }
        )

    m = (
        v.map_batches(partial, batch_format="pyarrow", batch_size=65536)
        .aggregate(Sum("n", alias_name="n"), Sum("s", alias_name="s"),
                   Sum("sq", alias_name="sq"))
    )
    n, s, sq = int(m["n"]), int(m["s"]), int(m["sq"])
    # EXACT mirror of the oracle expression tree, derived once from the
    # three integer scalars: mean = s/n; std = sqrt((sq - s*s/n)/n)
    mean = float(s) / n
    std = np.sqrt((float(sq) - float(s) * float(s) / n) / n)

    def zmap(batch: pa.Table) -> pa.Table:
        x = batch["cents"].to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table(
            {"event_id": batch["event_id"], "z": pa.array((x - mean) / std)}
        )

    return v.map_batches(zmap, batch_format="pyarrow", batch_size=65536)


# ---------------------------------------------------------------------------
# Bloom membership measurement (rows-only: Bloom filters aren't
# SQL-expressible): build over the even-doc_id half, probe both halves,
# report exact confusion counts. False negatives MUST be zero (the Bloom
# contract the dedup prefilter relies on); the FP rate is the measured
# quality signal, asserted against theory in tests/test_bloom.py.
# ---------------------------------------------------------------------------
@register("bloom_prefilter")
def bloom_prefilter(sf_dir: str):
    from ..stages.bloom import bloom_probe_filter, build_bloom

    ds = read_table(sf_dir, "documents", columns=["doc_id"])

    def split(even: bool):
        def f(batch: pa.Table) -> pa.Table:
            ids = batch["doc_id"]
            m = pc.equal(pc.bit_wise_and(ids, 1), 0 if even else 1)
            return batch.filter(m)

        return ds.map_batches(f, batch_format="pyarrow")

    members, probes = split(True), split(False)
    bloom = build_bloom(members, "doc_id", m_bits=1 << 20, k_hashes=4)
    n_members = members.count()
    n_probes = probes.count()
    # definite-new rows among true members -> false negatives (must be 0)
    fn = bloom_probe_filter(members, "doc_id", bloom).count()
    # rows NOT filtered out among true non-members -> false positives
    fp = n_probes - bloom_probe_filter(probes, "doc_id", bloom).count()
    return pd.DataFrame(
        {
            "n_members": [n_members],
            "n_probes": [n_probes],
            "false_negatives": [fn],
            "false_positives": [fp],
            "fp_rate_ppm": [int(fp * 1_000_000 / max(n_probes, 1))],
        }
    )


# ---------------------------------------------------------------------------
# COUNT(DISTINCT) per group: two-level aggregation — the first shuffle
# collapses to distinct (source, lang) pairs (partials pre-collapse per
# batch), the second counts pairs per source. The corpus never shuffles
# twice; level-2 input is |sources| x |langs| rows.
# ---------------------------------------------------------------------------
@register(
    "langs_per_source",
    "SELECT source, CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs, "
    "COUNT(*) AS n_docs FROM documents GROUP BY source",
)
def langs_per_source(sf_dir: str):
    from ray.data.aggregate import Sum

    ds = read_table(sf_dir, "documents", columns=["source", "lang"])

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        out = (
            batch.groupby(["source", "lang"], sort=False)
            .size()
            .rename("n")
            .reset_index()
        )
        out["n"] = out["n"].astype("int64")
        return out

    pairs = (
        ds.map_batches(partial, batch_format="pandas", batch_size=65536)
        .groupby(["source", "lang"])
        .aggregate(Sum("n", alias_name="n_docs"))
    )

    def collapse(batch: pd.DataFrame) -> pd.DataFrame:
        out = (
            batch.groupby("source", sort=False)
            .agg(n_langs=("lang", "size"), n_docs=("n_docs", "sum"))
            .reset_index()
        )
        out["n_langs"] = out["n_langs"].astype("int64")
        out["n_docs"] = out["n_docs"].astype("int64")
        return out

    # level-2 input is dimension-cardinality (|sources| x |langs| rows);
    # collapse INSIDE map_groups — batch boundaries of a later map_batches
    # would not align with group boundaries
    return pairs.groupby("source").map_groups(collapse, batch_format="pandas")


# ---------------------------------------------------------------------------
# Scalar-subquery filter: keep docs at or above the corpus (lower) median
# length. Median = smallest v with cumulative count >= (N+1)//2, computed
# from the distributed value-count histogram (only the value DOMAIN reaches
# the driver — same scale shape as chars_percentiles), then broadcast into
# a simple pushdown-able predicate.
# ---------------------------------------------------------------------------
@register(
    "above_median_docs",
    "WITH h AS (SELECT n_chars AS v, COUNT(*) AS c FROM documents "
    "GROUP BY n_chars), "
    "s AS (SELECT v, SUM(c) OVER (ORDER BY v) AS cum, "
    "(SELECT (COUNT(*) + 1) // 2 FROM documents) AS half FROM h), "
    "m AS (SELECT MIN(v) AS cutoff FROM s WHERE cum >= half) "
    "SELECT doc_id, n_chars FROM documents, m WHERE n_chars >= cutoff",
)
def above_median_docs(sf_dir: str):
    from ..functions.agg import bucketed_group_agg

    ds = read_table(sf_dir, "documents", columns=["doc_id", "n_chars"])
    hist = (
        bucketed_group_agg(
            ds.select_columns(["n_chars"]), ["n_chars"],
            {"c": ("n_chars", "size")}, n_buckets=16,
        )
        .to_pandas()
        .sort_values("n_chars")
    )
    half = (int(hist["c"].sum()) + 1) // 2
    cutoff = int(hist.loc[hist["c"].cumsum() >= half, "n_chars"].iloc[0])

    def keep(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.greater_equal(batch["n_chars"], cutoff))

    return ds.map_batches(keep, batch_format="pyarrow", batch_size=65536)


# ---------------------------------------------------------------------------
# Exact heavy hitters WITHOUT a vocabulary shuffle: truncated per-batch
# summaries (bounded underestimate) -> provably complete candidate set ->
# broadcast exact recount. Final counts are exact, so the oracle is plain
# HAVING cnt * phi_inv >= total. See functions/heavy_hitters.py for the
# guarantee arithmetic; the summary shuffle moves <= capacity rows per
# batch instead of the batch vocabulary.
# ---------------------------------------------------------------------------
_HH_PHI_INV = 200  # heavy = frequency >= N/200 (0.5%)
_HH_CAPACITY = 4 * _HH_PHI_INV


@register(
    "frequent_tokens",
    "WITH tok AS (SELECT unnest(regexp_split_to_array("
    "regexp_replace(text, '^\\s+|\\s+$', '', 'g'), '\\s+')) AS word "
    "FROM documents WHERE regexp_replace(text, '^\\s+|\\s+$', '', 'g') <> ''), "
    "t AS (SELECT CAST(COUNT(*) AS BIGINT) AS total FROM tok) "
    "SELECT word, CAST(cnt AS BIGINT) AS cnt FROM "
    "(SELECT word, COUNT(*) AS cnt FROM tok GROUP BY word), t "
    f"WHERE cnt * {_HH_PHI_INV} >= total",
)
def frequent_tokens(sf_dir: str):
    import ray
    from ray.data.aggregate import Sum

    from ..functions.heavy_hitters import (
        recount_batch,
        select_candidates,
        summary_batch,
    )

    ds = read_table(sf_dir, "documents", columns=["text"])

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        return summary_batch(batch["text"], _HH_CAPACITY)

    merged = (
        ds.map_batches(partial, batch_format="pandas", batch_size=65536)
        .groupby("word")
        .aggregate(Sum("est", alias_name="est"))
        .to_pandas()  # sketch-cardinality by construction (<= ~capacity
        #              surviving words + sentinel), NOT the vocabulary
    )
    candidates, total = select_candidates(merged, _HH_PHI_INV, _HH_CAPACITY)
    if not candidates:
        return pa.table({"word": pa.array([], pa.string()),
                         "cnt": pa.array([], pa.int64())})
    cand_ref = ray.put(candidates)

    def recount(batch: pd.DataFrame) -> pd.DataFrame:
        return recount_batch(batch["text"], ray.get(cand_ref))

    exact = (
        ds.map_batches(recount, batch_format="pandas", batch_size=65536)
        .groupby("word")
        .aggregate(Sum("cnt", alias_name="cnt"))
        .to_pandas()  # <= |candidates| rows
    )
    keep = exact[exact["cnt"].to_numpy() * _HH_PHI_INV >= total]
    keep = keep.sort_values("word").reset_index(drop=True)
    return pa.table({"word": pa.array(keep["word"], pa.string()),
                     "cnt": pa.array(keep["cnt"].to_numpy(), pa.int64())})


_HH_BIGRAM_PHI_INV = 800
_HH_BIGRAM_CAPACITY = 4 * _HH_BIGRAM_PHI_INV


def _bigram_series(texts: pd.Series) -> pd.Series:
    """All within-document adjacent token pairs ('left right'), vectorized
    positionally (no per-group dispatch): explode tokens, compute each
    token's within-row position from the row lengths, and pair token i
    with token i+1 wherever i+1 is still in the same row."""
    s = texts.fillna("").str.strip()
    s = s[s != ""]
    toks = s.str.split(r"\s+")
    counts = toks.str.len().to_numpy().astype(np.int64)
    ex = toks.explode()
    tokens = ex.to_numpy()[ex.notna().to_numpy()]
    pos = np.arange(counts.sum()) - np.repeat(np.cumsum(counts) - counts,
                                              counts)
    left_mask = pos < np.repeat(counts - 1, counts)
    left = tokens[left_mask]
    right = tokens[np.flatnonzero(left_mask) + 1]
    return pd.Series(left, dtype="object") + " " + pd.Series(right,
                                                             dtype="object")


@register(
    "frequent_bigrams",
    # same heavy-hitter contract over COMPOSED keys: bigrams whose count
    # is >= 1/800 of all within-document adjacent pairs (bigram mass is
    # spread ~3x thinner than unigram mass on this corpus)
    "WITH tok AS (SELECT doc_id, unnest(regexp_split_to_array("
    f"{_TRIM_DOC}, '\\s+')) AS word, generate_subscripts("
    f"regexp_split_to_array({_TRIM_DOC}, '\\s+'), 1) AS i "
    f"FROM documents WHERE {_TRIM_DOC} <> ''), "
    "big AS (SELECT a.word || ' ' || b.word AS bigram FROM tok a "
    "JOIN tok b ON a.doc_id = b.doc_id AND b.i = a.i + 1), "
    "t AS (SELECT CAST(COUNT(*) AS BIGINT) AS total FROM big) "
    "SELECT bigram, CAST(cnt AS BIGINT) AS cnt FROM "
    "(SELECT bigram, COUNT(*) AS cnt FROM big GROUP BY bigram), t "
    f"WHERE cnt * {_HH_BIGRAM_PHI_INV} >= total",
)
def frequent_bigrams(sf_dir: str):
    """Exact frequent PHRASES (adjacent token pairs) with the same
    no-vocabulary-shuffle plan as :func:`frequent_tokens`: the
    Misra-Gries machinery is key-agnostic, so composing tokens into
    bigrams map-side is the only change — the summary exchange still
    moves <= capacity rows per batch, never the bigram vocabulary
    (which is far larger than the unigram one at corpus scale)."""
    import ray
    from ray.data.aggregate import Sum

    from ..functions.heavy_hitters import key_summary_batch, select_candidates

    ds = read_table(sf_dir, "documents", columns=["text"])

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        return key_summary_batch(_bigram_series(batch["text"]), _HH_BIGRAM_CAPACITY)

    merged = (
        ds.map_batches(partial, batch_format="pandas", batch_size=65536)
        .groupby("word")
        .aggregate(Sum("est", alias_name="est"))
        .to_pandas()
    )
    candidates, total = select_candidates(merged, _HH_BIGRAM_PHI_INV, _HH_BIGRAM_CAPACITY)
    if not candidates:
        return pa.table({"bigram": pa.array([], pa.string()),
                         "cnt": pa.array([], pa.int64())})
    cand_ref = ray.put(candidates)

    def recount(batch: pd.DataFrame) -> pd.DataFrame:
        pairs = _bigram_series(batch["text"])
        hits = pairs[pairs.isin(ray.get(cand_ref))]
        vc = hits.value_counts()
        return pd.DataFrame({"bigram": vc.index.astype(str),
                             "cnt": vc.to_numpy().astype("int64")})

    exact = (
        ds.map_batches(recount, batch_format="pandas", batch_size=65536)
        .groupby("bigram")
        .aggregate(Sum("cnt", alias_name="cnt"))
        .to_pandas()
    )
    keep = exact[exact["cnt"].to_numpy() * _HH_BIGRAM_PHI_INV >= total]
    keep = keep.sort_values("bigram").reset_index(drop=True)
    return pa.table({"bigram": pa.array(keep["bigram"], pa.string()),
                     "cnt": pa.array(keep["cnt"].to_numpy(), pa.int64())})


# ---------------------------------------------------------------------------
# Range partitioning with exact quantile boundaries: per-doc partition
# assignment (quartiles of n_chars). Mechanism = the sorted-output-layout
# primitive (functions/partitioning.py); oracle = explicit CASE over the
# same exact type-1 quantile cut points.
# ---------------------------------------------------------------------------
@register(
    "range_partition_docs",
    "WITH h AS (SELECT n_chars AS v, COUNT(*) AS c FROM documents "
    "GROUP BY n_chars), "
    "s AS (SELECT v, SUM(c) OVER (ORDER BY v) AS cum, "
    "(SELECT COUNT(*) FROM documents) AS n FROM h), "
    "b AS (SELECT "
    "(SELECT MIN(v) FROM s WHERE cum >= CEIL(0.25 * n)) AS b25, "
    "(SELECT MIN(v) FROM s WHERE cum >= CEIL(0.50 * n)) AS b50, "
    "(SELECT MIN(v) FROM s WHERE cum >= CEIL(0.75 * n)) AS b75 FROM s LIMIT 1) "
    "SELECT doc_id, n_chars, CAST(CASE WHEN n_chars >= b75 THEN 3 "
    "WHEN n_chars >= b50 THEN 2 WHEN n_chars >= b25 THEN 1 ELSE 0 END "
    "AS BIGINT) AS part FROM documents, b",
)
def range_partition_docs(sf_dir: str):
    from ..functions.partitioning import (
        assign_range_partition,
        exact_quantile_boundaries,
    )

    ds = read_table(sf_dir, "documents", columns=["doc_id", "n_chars"])
    bounds = exact_quantile_boundaries(ds, "n_chars", 4)
    return assign_range_partition(ds, "n_chars", bounds)


# ---------------------------------------------------------------------------
# Grouped Pearson correlation: corr(n_chars, n_spaces) per lang. New
# mechanism vs the moment family above: CROSS-moment partials (sum xy)
# folded map-side, one tiny groupby-sum exchange, correlation assembled
# from six exact int64 scalars per group. The SQL mirrors the identical
# float expression tree (never DuckDB's corr(), whose internal Welford
# order would differ in the last ulp).
# Reference analogy: per-doc stats correlation (app/main.py counters);
# the grouped-partial shape follows §2.5 pre-aggregation guidance.
# ---------------------------------------------------------------------------
@register(
    "corr_by_lang",
    "WITH v AS (SELECT lang, n_chars AS x, "
    "length(text) - length(replace(text, ' ', '')) AS y FROM documents), "
    "s AS (SELECT lang, COUNT(*) AS n_docs, "
    "CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy, "
    "CAST(SUM(x * y) AS BIGINT) AS sxy, "
    "CAST(SUM(x * x) AS BIGINT) AS sxx, "
    "CAST(SUM(y * y) AS BIGINT) AS syy FROM v GROUP BY lang) "
    "SELECT lang, n_docs, "
    "(n_docs * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))"
    " / sqrt((n_docs * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) "
    "* CAST(sx AS DOUBLE)) * (n_docs * CAST(syy AS DOUBLE) "
    "- CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))) AS corr_chars_spaces "
    "FROM s",
)
def corr_by_lang(sf_dir: str):
    """Per-lang Pearson r between doc length and space count.

    Scale shape: the only exchange is the per-lang partial table
    (|langs| x blocks rows of six int64s) -- text never shuffles.
    int64 partials are exact for n_chars*rows products < 2^63 (holds
    to ~1e10 docs at 1e4 chars); beyond that the partials would need
    a two-word fold, called out here rather than silently truncated.
    """
    from ray.data.aggregate import Sum

    ds = read_table(sf_dir, "documents", columns=["lang", "text", "n_chars"])

    def partial(batch: pa.Table) -> pd.DataFrame:
        x = batch["n_chars"].to_numpy(zero_copy_only=False).astype(np.int64)
        nospace = pc.replace_substring(batch["text"], " ", "")
        y = (
            pc.subtract(
                pc.utf8_length(batch["text"]), pc.utf8_length(nospace)
            )
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        df = pd.DataFrame(
            {
                "lang": batch["lang"].to_pandas(),
                "x": x, "y": y, "xy": x * y, "xx": x * x, "yy": y * y,
            }
        )
        out = (
            df.groupby("lang", sort=False)
            .agg(
                n_docs=("x", "size"),
                sx=("x", "sum"), sy=("y", "sum"), sxy=("xy", "sum"),
                sxx=("xx", "sum"), syy=("yy", "sum"),
            )
            .reset_index()
        )
        for c in out.columns[1:]:
            out[c] = out[c].astype("int64")
        return out

    partials = ds.map_batches(partial, batch_format="pyarrow", batch_size=65536)
    agg = partials.groupby("lang").aggregate(
        Sum("n_docs", alias_name="n_docs"),
        Sum("sx", alias_name="sx"), Sum("sy", alias_name="sy"),
        Sum("sxy", alias_name="sxy"),
        Sum("sxx", alias_name="sxx"), Sum("syy", alias_name="syy"),
    )

    def finalize(batch: pd.DataFrame) -> pd.DataFrame:
        n = batch["n_docs"].to_numpy().astype(np.float64)
        sx = batch["sx"].to_numpy().astype(np.float64)
        sy = batch["sy"].to_numpy().astype(np.float64)
        sxy = batch["sxy"].to_numpy().astype(np.float64)
        sxx = batch["sxx"].to_numpy().astype(np.float64)
        syy = batch["syy"].to_numpy().astype(np.float64)
        # EXACT mirror of the oracle tree:
        # (n*sxy - sx*sy) / sqrt((n*sxx - sx*sx) * (n*syy - sy*sy))
        batch["corr_chars_spaces"] = (n * sxy - sx * sy) / np.sqrt(
            (n * sxx - sx * sx) * (n * syy - sy * sy)
        )
        return batch[["lang", "n_docs", "corr_chars_spaces"]]

    return agg.map_batches(finalize, batch_format="pandas")


# ---------------------------------------------------------------------------
# HyperLogLog distinct sketch (functions/hllsketch.py) — the cardinality
# companion of the CM frequency sketch: constant-space mergeable
# registers, exchange <= 2**p (register, rank) pairs per batch. The
# artifact query measures its error against the EXACT distinct path on
# the same corpus (the repo rule: every approximate method ships with
# its measured error).
# ---------------------------------------------------------------------------
@register("hll_distinct_error")  # measured-error artifact (approximate)
def hll_distinct_error(sf_dir: str):
    """HLL quality artifact: per-language approximate distinct-token
    counts (p=12 -> 4096 registers, theory stderr 1.04/sqrt(4096) =
    1.6%) against the exact per-language counts, plus a __total__ row
    for the corpus-wide sketch. Output rows carry (lang, exact, est,
    rel_err_pct).

    TWO executions total (fixed per-execution cost dominates plans this
    small — the dedup_minhash lesson): the HLL side folds ONE
    (lang, reg, rank) partial table and derives the corpus-total
    registers on the driver by mergeability (elementwise max across
    langs — the folded table is <= |langs| x 2**p rows by construction);
    the exact side computes per-lang AND total distincts in ONE bucketed
    pass (words are hash-partitioned, so a bucket's distinct-word count
    sums to the corpus total, and its per-(lang, word) count sums to the
    per-lang totals).
    """
    from ..functions.agg import bucketed_group_agg
    from ..functions.hashing import bucket_column
    from ..functions.hllsketch import estimate, registers_batch

    P = 12
    ds = read_table(sf_dir, "documents", columns=["lang", "text"])

    def hll_partial(batch: pd.DataFrame) -> pd.DataFrame:
        out = []
        s = batch["text"].fillna("").str.strip()
        for grp, sub in s.groupby(batch["lang"].astype(str)):
            sub = sub[sub != ""]
            toks = sub.str.split(r"\s+").explode().unique()
            regs = registers_batch(toks, p=P)
            nz = np.flatnonzero(regs)
            out.append(pd.DataFrame({"lang": grp,
                                     "reg": nz.astype(np.int64),
                                     "rank": regs[nz].astype(np.int64)}))
        if not out:
            return pd.DataFrame({"lang": pd.Series([], dtype=str),
                                 "reg": pd.Series([], dtype=np.int64),
                                 "rank": pd.Series([], dtype=np.int64)})
        return pd.concat(out, ignore_index=True)

    folded = bucketed_group_agg(
        ds.map_batches(hll_partial, batch_format="pandas"),
        ["reg", "lang"], {"rank": ("rank", "max")}, n_buckets=64,
    ).to_pandas()  # <= |langs| x 2**p rows by construction
    ests = {}
    total_regs = np.zeros(1 << P, dtype=np.uint8)
    for lang, grp in folded.groupby("lang"):
        regs = np.zeros(1 << P, dtype=np.uint8)
        regs[grp["reg"].to_numpy()] = grp["rank"].to_numpy()
        ests[lang] = estimate(regs)
        np.maximum(total_regs, regs, out=total_regs)  # merge = max
    ests["__total__"] = estimate(total_regs)

    def lang_words(batch: pd.DataFrame) -> pd.DataFrame:
        s = batch["text"].fillna("").str.strip()
        keep = s != ""
        df = pd.DataFrame({"lang": batch["lang"][keep].astype(str),
                           "word": s[keep].str.split(r"\s+")})
        df = df.explode("word")
        return df.drop_duplicates()

    bucketed = (
        ds.map_batches(lang_words, batch_format="pandas")
        .map_batches(lambda t: bucket_column(t, "word", 64, "__wb"),
                     batch_format="pyarrow")
    )

    def count_bucket(grp: pa.Table) -> pa.Table:
        df = grp.select(["lang", "word"]).to_pandas().drop_duplicates()
        out = df.groupby("lang", sort=False).size().reset_index(name="n")
        # the bucket partitions the word space, so its distinct-word
        # count contributes additively to the corpus total
        out = pd.concat([out, pd.DataFrame(
            {"lang": ["__total__"], "n": [df["word"].nunique()]})],
            ignore_index=True)
        return pa.table({"lang": pa.array(out["lang"], pa.string()),
                         "n": pa.array(out["n"].astype("int64"), pa.int64())})

    exact = bucketed_group_agg(
        bucketed.groupby("__wb").map_groups(count_bucket,
                                            batch_format="pyarrow"),
        ["lang"], {"exact": ("n", "sum")}, n_buckets=16,
    ).to_pandas()  # <= |langs| + 1 rows
    exact["est"] = exact["lang"].map(ests).fillna(0).astype("int64")
    exact["exact"] = exact["exact"].astype("int64")
    exact["rel_err_pct"] = (
        (exact["est"] - exact["exact"]).abs()
        / exact["exact"].clip(lower=1) * 100.0
    )
    exact = exact.sort_values("lang", kind="mergesort").reset_index(drop=True)
    return pa.table({
        "lang": pa.array(exact["lang"], pa.string()),
        "exact": pa.array(exact["exact"], pa.int64()),
        "est": pa.array(exact["est"], pa.int64()),
        "rel_err_pct": pa.array(exact["rel_err_pct"], pa.float64()),
    })


# ---------------------------------------------------------------------------
# Quantile compactor sketch (functions/qcompactor.py) — deterministic
# KLL/MRL-family hierarchy with a tracked compaction certificate. The
# artifact measures rank error against the exact histogram path AND
# against the sketch's own certified bound (the repo rule: every
# approximate method ships with its measured error).
# ---------------------------------------------------------------------------
@register("quantile_compactor_error")  # measured-error artifact (approximate)
def quantile_compactor_error(sf_dir: str):
    """Compactor-sketch quality artifact over documents.n_chars: the
    one-pass distributed sketch (k=128 — small on purpose, to force
    compactions at this scale) answers 7 quantiles; each answer's TRUE
    rank comes from the exact (value, count) histogram (n_chars is a
    bounded domain, so the exact path applies). Output rows carry
    (q, est_value, exact_value, rank_err, certified_bound, n);
    rank_err <= certified_bound is the compaction-certificate theorem,
    checked end-to-end here and in tests/test_qcompactor.py.
    """
    from ..functions.agg import bucketed_group_agg
    from ..functions.qcompactor import compactor_sketch_column

    qs = [0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99]
    ds = read_table(sf_dir, "documents", columns=["n_chars"])
    sk = compactor_sketch_column(ds, "n_chars", k=128)
    est = sk.quantile(qs)

    hist = (
        bucketed_group_agg(ds, ["n_chars"], {"c": ("n_chars", "size")},
                           n_buckets=16)
        .to_pandas()  # bounded domain: one row per distinct length
        .sort_values("n_chars")
    )
    vals = hist["n_chars"].to_numpy(dtype=np.int64)
    cum = hist["c"].to_numpy(dtype=np.int64).cumsum()
    n = int(cum[-1])
    rows = []
    for q, e in zip(qs, est):
        target = max(1, int(np.ceil(q * n)))
        exact_v = vals[np.searchsorted(cum, target, side="left")]
        # covered rank run of the estimated value in the exact histogram
        i = int(np.searchsorted(vals, e, side="left"))
        hi = int(cum[i]) if i < len(vals) and vals[i] == e else int(
            cum[i - 1] if i else 0)
        lo = int(cum[i - 1]) + 1 if i else 1
        if vals[min(i, len(vals) - 1)] != e:
            lo = hi  # value absent from the histogram (cannot happen:
            #          sketch values are input values; kept as a guard)
        err = 0 if lo <= target <= hi else min(abs(target - lo),
                                               abs(target - hi))
        rows.append((q, int(e), int(exact_v), int(err)))
    df = pd.DataFrame(rows, columns=["q", "est_value", "exact_value",
                                     "rank_err"])
    df["certified_bound"] = np.int64(sk.error_bound())
    df["n"] = np.int64(n)
    return pa.table(df)


# ---------------------------------------------------------------------------
# Bigram-LM perplexity scoring (stages/lm.py) — the CCNet/KenLM-style
# quality filter: train counts in one distributed pass, broadcast once,
# score per document in an actor pool. Rows-only: the per-doc float
# cross-entropy is not SQL-expressible order-stably; exact correctness
# is pinned against a pure-Python reference in tests/test_lm.py.
# ---------------------------------------------------------------------------
@register("lm_perplexity")  # rows-only (float LM score; reference-exact in tests)
def lm_perplexity(sf_dir: str):
    """Per-document bigram cross-entropy (bits/pair) under a Laplace-
    smoothed bigram LM trained on the same corpus — the self-perplexity
    quality signal: repetitive/template documents score LOW, token-salad
    documents score HIGH. Output (doc_id, n_pairs, xent_bits)."""
    from ..stages.lm import score_corpus, train_bigram_lm

    train = read_table(sf_dir, "documents", columns=["text"])
    model = train_bigram_lm(train)
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return score_corpus(ds, model)


# ---------------------------------------------------------------------------
# Data mixing: sample the corpus DOWN to target per-source proportions —
# the mixture-weighting step of LLM training-data assembly (source
# reweighting a la The Pile / CCNet mixes). Mechanism on top of the
# per-stratum hash top-k (stratified_sample): the per-source QUOTA is
# computed first (capped proportional allocation in exact integer
# arithmetic: n_s = least(c_s, w_s*T // W)), then each source keeps its
# n_s smallest md5-ranked docs — deterministic, reproducible, and
# batch-prunable (a batch never needs to keep more than n_s rows per
# source, so the shuffle moves at most |sources| x n_s rows).
# ---------------------------------------------------------------------------
@register(
    "source_mixture_sample",
    "WITH c AS (SELECT source, COUNT(*) AS c FROM documents GROUP BY source), "
    "w AS (SELECT source, c, CAST(substr(source, 4) AS BIGINT) % 3 + 1 AS w "
    "FROM c), "
    "tot AS (SELECT CAST(SUM(c) // 2 AS BIGINT) AS t, "
    "CAST(SUM(w) AS BIGINT) AS sw FROM w), "
    "a AS (SELECT source, LEAST(c, w * (SELECT t FROM tot) // "
    "(SELECT sw FROM tot)) AS quota FROM w), "
    "r AS (SELECT source, doc_id, "
    "row_number() OVER (PARTITION BY source "
    "ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rank FROM documents) "
    "SELECT r.source, r.doc_id, CAST(r.rank AS BIGINT) AS rank, "
    "CAST(a.quota AS BIGINT) AS quota "
    "FROM r JOIN a USING (source) WHERE r.rank <= a.quota",
)
def source_mixture_sample(sf_dir: str):
    """Mixture weights here derive from the source NAME (srcN -> N%3+1)
    so the allocation is self-contained; a real mix passes its own
    weight table. T = N//2 total target; shortfall from capped sources
    is NOT redistributed (documented capped-proportional semantics)."""
    from ..functions.agg import bucketed_group_agg
    from ..functions.hashing import bucket_column, md5_hex_array

    ds = read_table(sf_dir, "documents", columns=["source", "doc_id"])
    counts = bucketed_group_agg(
        ds, ["source"], {"c": ("source", "size")}, n_buckets=16
    ).to_pandas()  # one row per source
    w = counts["source"].str[3:].astype(np.int64) % 3 + 1
    T = int(counts["c"].sum()) // 2
    W = int(w.sum())
    quota = dict(zip(counts["source"],
                     np.minimum(counts["c"].to_numpy(),
                                w.to_numpy() * T // W).astype(np.int64)))

    def prune(batch: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame({
            "source": batch["source"].to_pandas(),
            "doc_id": batch["doc_id"].to_numpy(zero_copy_only=False),
            "fp": md5_hex_array(
                pc.cast(batch["doc_id"], pa.string())).to_pandas(),
        }).sort_values(["source", "fp", "doc_id"], kind="mergesort")
        # a batch never contributes more than quota_s rows per source
        r0 = df.groupby("source", sort=False).cumcount()
        return df[r0 < df["source"].map(quota).fillna(0)]

    pruned = ds.map_batches(prune, batch_format="pyarrow",
                            batch_size=65536)
    bucketed = pruned.map_batches(
        lambda t: bucket_column(t, "source", 16, "__sb"),
        batch_format="pyarrow",
    )

    def finalize(grp: pa.Table) -> pa.Table:
        df = grp.select(["source", "doc_id", "fp"]).to_pandas() \
            .sort_values(["source", "fp", "doc_id"], kind="mergesort")
        df["rank"] = df.groupby("source", sort=False).cumcount() + 1
        df["quota"] = df["source"].map(quota).fillna(0).astype(np.int64)
        df = df[df["rank"] <= df["quota"]]
        return pa.table({
            "source": pa.array(df["source"], pa.string()),
            "doc_id": pa.array(df["doc_id"].to_numpy(), pa.int64()),
            "rank": pa.array(df["rank"].to_numpy(), pa.int64()),
            "quota": pa.array(df["quota"].to_numpy(), pa.int64()),
        })

    return bucketed.groupby("__sb").map_groups(
        finalize, batch_format="pyarrow"
    )
