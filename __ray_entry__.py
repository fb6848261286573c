"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported: nothing
here (or in the library) calls ``ray.init()`` / ``ray.shutdown()``.

- ``entry()``     — flagship transcript-extraction pipeline at sf0.001.
- ``queries()``   — one callable per implemented operator/pipeline
                    (SURVEY.md §2 + training-data ops), each taking
                    ``sf_dir`` and returning a Dataset/DataFrame/Table.
- ``oracle_sql()``— DuckDB SQL equivalents with IDENTICAL column names and
                    integer-exact value semantics. Ops that SQL can't
                    express (custom extractor, approximate/LSH methods,
                    heuristic classifiers) are intentionally absent here
                    and get the weaker rows-only check; their strong
                    correctness gate is tests/ (byte-for-byte oracle
                    equality against the pure-Python extractor).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001: per-turn main-content
    extraction over the synthetic transcript corpus (generated
    deterministically on first use, cached under /tmp)."""
    from docling_service_ray.pipelines.extract_pipeline import extract_pipeline

    ds = extract_pipeline("/root/testdata/sf0.001")
    return ds.select_columns(
        ["conv_id", "turn_idx", "role", "extracted_text", "ok", "error",
         "extractor_path"]
    )


def _registry() -> tuple[dict, dict]:
    from docling_service_ray.pipelines import relational, training

    queries: dict[str, Callable[[str], Any]] = {}
    oracles: dict[str, str] = {}
    for mod in (relational, training):
        queries.update(mod.QUERIES)
        oracles.update(mod.ORACLES)
    # The driver evaluates at most the FIRST 50 registered queries
    # (insertion order). Priority: (1) the flagship extraction pipelines,
    # (2) the recall-measurement queries for the approximate family
    # (their driver rows ARE the measurement artifact), (3) every
    # oracle-backed query (strict rows+schema+hash signal), then (4) the
    # remaining rows-only ops — those have planted-dup/accuracy pytest
    # coverage and their QUALITY is now measured by the recall queries,
    # so they give up their window slots.
    #
    # There are now more oracle-backed queries than window slots, so a
    # few that share their entire mechanism with an in-window sibling are
    # demoted to group (4): they stay registered, oracle-checked by
    # tests/test_oracle_parity.py, but yield their driver slot to a query
    # that exercises a DISTINCT capability (set_union stands in for
    # intersect/except, session+sliding for hourly, stratified_sample for
    # sample_10pct, token_histogram for distinct_token_count,
    # count_by_event_type for chars_by_source).
    flagship = ("extract_turns", "extract_meta", "stitch_convs",
                "multimodal_features", "curation_pipeline")
    recall = ("neardup_recall", "ann_ivf_recall", "embedding_lsh_recall")
    demoted = ("set_intersect", "set_except", "hourly_windows",
               "chars_by_source", "distinct_token_count", "sample_10pct",
               "sliding_windows", "retention_filter", "canonical_refs",
               "top_recent", "dedup_actions",
               # round-3 additions pushed the oracle count past the window
               # again; each demotion names the in-window superset that
               # exercises the same mechanism:
               "orders_by_nation",     # broadcast-dim agg -> revenue_rollup
               "count_by_event_type",  # per-type counts -> event_type_pivot
               "token_counts",         # token counting -> bpe_token_counts
               "char_classes",         # char-class regexes -> quality_scores
               "fingerprints",         # md5 content hash -> hash_sample_k
               "global_shuffle",       # seeded reorder -> stratified_sample
               "chars_percentiles",    # percentile hist -> grouped_percentiles
               "regex_key_filter",     # vectorized regex filter -> pii_scrub
               "token_rarity",         # two-pass vocab join -> tfidf_topk
               "top3_orders_per_customer",  # grouped_topk -> per_lang_sample
               "hash_sample_k",        # md5-rank sampling -> per_lang_sample
               "distinct_lang_source", # distinct pairs -> langs_per_source
               "event_gaps",           # partitioned_window -> running_revenue
               "session_ids",          # sessionize bucket -> session_windows
               "chars_histogram",      # bincount partials -> token_histogram
               "weighted_sample",      # md5 sampling -> per_lang_sample +
                                       # stratified_sample (keeps
                                       # frequent_tokens in-window)
               "above_median_docs",    # quantile cutoff -> range_partition_docs
               "stratified_sample")    # grouped sampling -> per_lang_sample
    ordered = {k: queries[k] for k in flagship if k in queries}
    ordered.update({k: queries[k] for k in recall if k in queries})
    ordered.update({k: v for k, v in queries.items()
                    if k in oracles and k not in demoted})
    ordered.update(queries)
    return ordered, oracles


def queries() -> dict[str, Callable[[str], Any]]:
    return _registry()[0]


def oracle_sql() -> dict[str, str]:
    return _registry()[1]
