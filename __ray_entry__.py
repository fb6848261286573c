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
    # Round-5 rotation (VERDICT r04 Next-round #2): the 13 mechanisms that
    # had never received a driver-produced strict row (wav_meta, gif_meta,
    # order_neighbors, rolling_rank_revenue, revenue_cube,
    # full_outer_activity, term_postings, bag_intersect, bag_except,
    # schema_union, edit_distance_pairs, q5_region_revenue,
    # multimodal_meta) are promoted INTO the window; 13 rows strict-green
    # in CORRECTNESS_r04 give up their slots. Every arrow below names a
    # query that is IN-window this round.
    demoted = ("set_intersect",        # set ops -> bag_intersect
               "set_except",           # set ops -> bag_intersect
                                       # (same count-partial exchange)
               "set_union",            # count-partial set ops -> schema_union
               "chars_by_source",      # grouped sum -> doc_stats_by_lang
               "distinct_token_count", # vocab pre-agg -> frequent_bigrams
               "sample_10pct",         # bernoulli sample -> stratified_sample
               "sliding_windows",      # time windows -> hourly_windows
               "retention_filter",     # vectorized predicate -> validate_filter
               "top_recent",           # sort+limit -> q3_revenue
               "dedup_actions",        # first-wins actions -> incremental_dedup
               "dedup_exact",          # first-wins dedup -> incremental_dedup
                                       # (superset: exact dedup + manifest join)
               "count_by_event_type",  # per-type counts -> event_type_pivot
               "char_classes",         # char-class regexes -> unpivot_quality
                                       # (same Arrow RE2 scoring kernel)
               "fingerprints",         # md5 content hash -> incremental_dedup
               "global_shuffle",       # seeded reorder -> stratified_sample
               "regex_key_filter",     # vectorized regex filter -> pii_scrub
               "token_rarity",         # two-pass vocab join -> term_postings
               "tfidf_topk",           # word-keyed agg + join -> term_postings
               "top3_orders_per_customer",  # grouped topk -> frequent_bigrams
               "distinct_lang_source", # distinct pairs -> frequent_bigrams
               "session_ids",          # sessionize bucket -> order_neighbors
               "above_median_docs",    # quantile cutoff -> chars_percentiles
               "embedding_nn",         # broadcast-query matmul -> ann_topk
               "value_zscores",        # exact-int moment partials -> doc_stats_by_lang
               "session_windows",      # session windows -> hourly_windows
               "grouped_percentiles",  # percentile hist -> chars_percentiles
               "per_lang_sample",      # per-group sampling -> stratified_sample
               "repetition_ratio",     # map-only doc scoring -> unpivot_quality
               "bpe_token_counts",     # token counting -> unpivot_quality
               "token_counts",         # token counting -> unpivot_quality
               "range_partition_docs", # quantile boundaries -> chars_percentiles
               "langs_per_source",     # two-level agg -> frequent_bigrams
               "token_histogram",      # bincount partials -> chars_histogram
               "langid",               # map-only doc scoring -> unpivot_quality
                                       # (yields its slot to
                                       # auto_salted_segment_value — NEW
                                       # auto-hot-key detection mechanism)
               # round-5 demotions (all strict-green in CORRECTNESS_r04;
               # each mechanism stays represented by the named sibling):
               "canonical_refs",       # ref canonicalization -> rewrite_refs
                                       # (superset: canonicalize+join+rewrite)
               "orders_by_nation",     # broadcast dim join -> q5_region_revenue
               "running_revenue",      # row_number/cumsum -> rolling_rank_revenue
               "event_gaps",           # lag/diff windows -> order_neighbors
               "customer_order_stats", # left join + agg -> full_outer_activity
               "revenue_rollup",       # grouping sets -> revenue_cube
               "png_meta",             # real-codec roundtrip -> gif_meta/wav_meta
               "hash_sample_k",        # hash top-k sample -> stratified_sample
               "weighted_sample",      # weighted sample -> stratified_sample
               "vocab_ids",            # vocab build -> encoded_docs
                                       # (superset: builds the vocab AND
                                       # broadcast-encodes with it)
               "salted_join_priority", # hand-listed skew-salted join ->
                                       # auto_salted_segment_value (same
                                       # join plan, hot keys auto-detected)
               # round-5 late rotation: two NEW mechanisms (grouped-argmax
               # keep-best dedup; UNPIVOT/melt reshape) enter the window;
               # these two yield their slots:
               "quality_scores",       # scoring kernel -> dedup_keep_best
                                       # + unpivot_quality (both compose
                                       # the SAME kernel + SQL core and
                                       # add a mechanism on top)
               "bag_except",           # multiset partial-count exchange
                                       # -> bag_intersect (identical plan,
                                       # different combine arithmetic)
               "passage_dedup",        # passage-window hash first-wins ->
                                       # incremental_dedup (hash-grouped
                                       # first-wins) + chunk_documents
                                       # (the windowing step); slot goes
                                       # to pagerank (NEW mechanism:
                                       # integer fixed-point iterative
                                       # rank, partitioned-state rounds)
               "cohort_retention",     # epoch-week buckets + per-user
                                       # grouped agg -> hourly_windows
                                       # (same integer time-bucket
                                       # partials); the cohort join +
                                       # in-bucket distinct fold is
                                       # strict-checked in pytest
               "triangle_counts",      # wedge-closing via co-located
                                       # bucket-union merge ->
                                       # full_outer_activity (same
                                       # bucketed join plan); the graph
                                       # slots hold the two iterative
                                       # mechanisms (pagerank, CC);
                                       # strict-checked in pytest
               "zorder_keys",          # map-only derived sort key ->
                                       # output_keys (same read->map->
                                       # project plan); the LAYOUT value
                                       # (row-group pruning) is measured
                                       # in tests/test_zorder.py
               "source_mixture_sample", # mixture-quota allocation ->
                                       # stratified_sample (the same
                                       # per-stratum md5 top-k engine);
                                       # the exact-integer quota step is
                                       # strict-checked in pytest
               "hourly_gap_fill",      # dense time-grid resample ->
                                       # hourly_windows (same exact
                                       # micros time-bucket fold) +
                                       # full_outer_activity (the
                                       # null-fill join side); the
                                       # densify+ffill mechanism is
                                       # strict-checked in pytest
               "contamination",        # n-gram hash semi-join ->
                                       # term_postings (n-gram postings
                                       # exchange) + anti_join_customers
                                       # (existence-probe side); driver
                                       # rows in r02-r04 artifacts; slot
                                       # goes to trailing_hour_value
                                       # (NEW mechanism: RANGE-frame
                                       # time-interval window)
               "q1_pricing",           # grouped money agg -> revenue_cube
                                       # (same Sum-able cents partials,
                                       # at ALL grouping-set levels);
                                       # slot goes to json_props_stats
                                       # (NEW mechanism: typed JSON field
                                       # extraction via the Arrow RE2
                                       # named-group kernel)
               "frequent_tokens")      # Misra-Gries heavy hitters ->
                                       # frequent_bigrams (superset: the
                                       # SAME key-agnostic MG plan over a
                                       # COMPOSED key); slot goes to
                                       # funnel_stages (NEW mechanism:
                                       # staged conditional mins)
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
