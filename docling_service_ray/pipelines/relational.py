"""Reference-analog relational queries + their DuckDB oracle SQL.

Each operator from SURVEY.md §2 that is SQL-expressible gets BOTH a Ray
Data implementation and an ANSI-SQL oracle with IDENTICAL column names and
value semantics (integer units for money — see functions/money.py).

Registry shape: ``QUERIES[name] = fn(sf_dir) -> Dataset``;
``ORACLES[name] = sql``. __ray_entry__ aggregates these.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.arrow_util import table_from_pandas
import pyarrow.compute as pc

from ..functions.money import to_cents
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
# S1/M5 analog: validation filter at the read (predicate pushed into scan)
# ---------------------------------------------------------------------------
@register(
    "validate_filter",
    "SELECT doc_id, lang, source, n_chars FROM documents "
    "WHERE n_chars >= 100 AND n_chars <= 20000",
)
def validate_filter(sf_dir: str):
    # row-group/predicate pushdown at the read — upload-validation analog
    # (reference app/main.py:1074-1087)
    import pyarrow.dataset as pads

    return read_table(
        sf_dir,
        "documents",
        columns=["doc_id", "lang", "source", "n_chars"],
        filter=(pads.field("n_chars") >= 100) & (pads.field("n_chars") <= 20000),
    )


# ---------------------------------------------------------------------------
# M14/M16 analog: output-key composition + extension->MIME mapping
# ---------------------------------------------------------------------------
@register(
    "output_keys",
    "SELECT doc_id, "
    "'markdown/' || CAST(doc_id AS VARCHAR) || '/' || source || '.md' AS out_key, "
    "CASE CAST(substr(source, 4) AS INTEGER) % 3 WHEN 0 THEN 'application/pdf' "
    "WHEN 1 THEN 'text/html' ELSE 'text/plain' END AS mime "
    "FROM documents",
)
def output_keys(sf_dir: str):
    ds = read_table(sf_dir, "documents", columns=["doc_id", "source"])

    def compose(batch: pd.DataFrame) -> pd.DataFrame:
        # key composition mirrors reference app/main.py:864 ('markdown/{id}/{name}')
        out_key = "markdown/" + batch["doc_id"].astype(str) + "/" + batch["source"] + ".md"
        n = batch["source"].str[3:].astype(int) % 3
        mime = np.select(
            [n == 0, n == 1], ["application/pdf", "text/html"], "text/plain"
        )
        return pd.DataFrame(
            {"doc_id": batch["doc_id"], "out_key": out_key, "mime": mime}
        )

    return ds.map_batches(compose, batch_format="pandas")


# ---------------------------------------------------------------------------
# A3 analog: action counting
# ---------------------------------------------------------------------------
@register(
    "count_by_event_type",
    "SELECT event_type, COUNT(*) AS n FROM events GROUP BY event_type",
)
def count_by_event_type(sf_dir: str):
    from ray.data.aggregate import Count

    ds = read_table(sf_dir, "events", columns=["event_type"])
    return ds.groupby("event_type").aggregate(Count(alias_name="n"))


# ---------------------------------------------------------------------------
# A4 analog: size accounting per backend/source
# ---------------------------------------------------------------------------
@register(
    "chars_by_source",
    # CAST(SUM(..) AS BIGINT): DuckDB SUM(BIGINT) returns HUGEINT (int128),
    # which hash-mismatches the engine's int64 even when values are equal
    "SELECT source, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS total_chars "
    "FROM documents GROUP BY source",
)
def chars_by_source(sf_dir: str):
    from ray.data.aggregate import Count, Sum

    ds = read_table(sf_dir, "documents", columns=["source", "n_chars"])
    return ds.groupby("source").aggregate(
        Count(alias_name="n_docs"), Sum("n_chars", alias_name="total_chars")
    )


# ---------------------------------------------------------------------------
# O4 analog: retention cutoff filter
# ---------------------------------------------------------------------------
RETENTION_CUTOFF = "2024-01-15 00:00:00"


@register(
    "retention_filter",
    f"SELECT event_id, event_type, ts FROM events "
    f"WHERE ts >= TIMESTAMP '{RETENTION_CUTOFF}'",
)
def retention_filter(sf_dir: str):
    cutoff = pa.scalar(
        np.datetime64(RETENTION_CUTOFF.replace(" ", "T"), "us"), pa.timestamp("us")
    )
    ds = read_table(sf_dir, "events", columns=["event_id", "event_type", "ts"])
    return ds.map_batches(
        lambda t: t.filter(pc.greater_equal(t["ts"], cutoff)),
        batch_format="pyarrow",
    )


# ---------------------------------------------------------------------------
# O3 analog: eviction ordering — keep newest k (recency top-k)
# ---------------------------------------------------------------------------
@register(
    "top_recent",
    "SELECT event_id, ts FROM events ORDER BY ts DESC, event_id DESC LIMIT 100",
)
def top_recent(sf_dir: str):
    ds = read_table(sf_dir, "events", columns=["event_id", "ts"])
    return ds.sort(["ts", "event_id"], descending=True).limit(100)


# ---------------------------------------------------------------------------
# D1/D2 analog: exact content dedup, first-wins (+ action accounting)
# ---------------------------------------------------------------------------
@register(
    "dedup_exact",
    "SELECT CAST(MIN(doc_id) AS BIGINT) AS doc_id FROM documents GROUP BY md5(text)",
)
def dedup_exact(sf_dir: str):
    from ..stages.dedup import exact_dedup_keep_min

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return exact_dedup_keep_min(ds)


@register(
    "dedup_actions",
    "SELECT doc_id, CASE WHEN doc_id = MIN(doc_id) OVER (PARTITION BY md5(text)) "
    "THEN 'kept' ELSE 'deduplicated' END AS action FROM documents",
)
def dedup_actions(sf_dir: str):
    from ..stages.dedup import exact_dedup_actions

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return exact_dedup_actions(ds)


@register(
    "incremental_dedup",
    # prior-run manifest simulated as the hashes of every 7th document;
    # within-run duplicates resolve first, then the surviving row checks
    # the manifest (the migrate job's three-way action accounting,
    # scripts/r2_migrate_xxhash.py:243,265,303)
    "WITH h AS (SELECT doc_id, md5(text) AS content_hash FROM documents), "
    "seen AS (SELECT DISTINCT md5(text) AS content_hash FROM documents "
    "         WHERE doc_id % 7 = 0), "
    "f AS (SELECT doc_id, content_hash, "
    "      MIN(doc_id) OVER (PARTITION BY content_hash) AS keeper FROM h) "
    "SELECT doc_id, content_hash, "
    "CASE WHEN doc_id <> keeper THEN 'deduplicated' "
    "     WHEN content_hash IN (SELECT content_hash FROM seen) "
    "     THEN 'already_seen' ELSE 'kept' END AS action FROM f",
)
def incremental_dedup_query(sf_dir: str):
    """Cross-run exact dedup against a prior-run hash manifest — see
    :func:`..stages.dedup.incremental_dedup`."""
    import pyarrow as pa

    from ..stages.dedup import add_md5_column, incremental_dedup

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def prior(b):
        import numpy as np

        sel = b.loc[(b["doc_id"].to_numpy() % 7 == 0)]
        return add_md5_column(sel, "text")[["content_hash"]]

    seen = ds.map_batches(prior, batch_format="pandas")
    return incremental_dedup(ds, seen)


# ---------------------------------------------------------------------------
# M9 analog: canonical content-addressed keys + ref rewriting
# ---------------------------------------------------------------------------
@register(
    "canonical_refs",
    "SELECT doc_id, 'blocks/' || md5(text) || '.md' AS stored_key, "
    "CAST(MIN(doc_id) OVER (PARTITION BY md5(text)) AS BIGINT) AS canonical_id, "
    "CASE WHEN doc_id = MIN(doc_id) OVER (PARTITION BY md5(text)) "
    "THEN 'kept' ELSE 'deduplicated' END AS action FROM documents",
)
def canonical_refs(sf_dir: str):
    """Content-addressed key per document + first-wins canonical owner
    (key scheme of reference app/main.py:717-718; dedup-upload accounting
    of scripts/r2_migrate_xxhash.py:243-303)."""
    from ..stages.refs import canonical_keys

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return canonical_keys(ds)


@register(
    "rewrite_refs",
    "SELECT a.doc_id, 'see ' || 'blocks/' || md5(b.text) || '.md' AS rewritten "
    "FROM documents a JOIN documents b "
    "ON b.doc_id = (a.doc_id + 1) % (SELECT COUNT(*) FROM documents)",
)
def rewrite_refs_query(sf_dir: str):
    """URI rewriting (M9, reference app/main.py:402-413): each document
    carries a ``ref://<next_id>`` marker; the rewriter replaces it with
    the REFERENCED document's canonical content-addressed stored key."""
    from ..stages.refs import content_keys, rewrite_refs

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    n = docs.count()  # parquet metadata count — no scan

    def with_ref(df: pd.DataFrame) -> pd.DataFrame:
        ref_ids = (df["doc_id"].astype("int64") + 1) % n
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].astype("int64"),
                "text": "see ref://" + ref_ids.astype(str),
            }
        )

    with_refs = docs.map_batches(with_ref, batch_format="pandas")
    # content-addressed keys need no canonical-owner shuffle (see
    # refs.content_keys); rewrite semantics are identical
    keys = content_keys(docs)
    out = rewrite_refs(with_refs, keys, out_col="rewritten")
    return out.select_columns(["doc_id", "rewritten"])


# ---------------------------------------------------------------------------
# M15 analog: key-format predicate (vectorized regex filter)
# ---------------------------------------------------------------------------
@register(
    "regex_key_filter",
    "SELECT event_id, props FROM events "
    "WHERE regexp_matches(props, '\"k\": [0-9]*[02468]}')",
)
def regex_key_filter(sf_dir: str):
    ds = read_table(sf_dir, "events", columns=["event_id", "props"])
    return ds.map_batches(
        lambda t: t.filter(
            pc.match_substring_regex(t["props"], '"k": [0-9]*[02468]}')
        ),
        batch_format="pyarrow",
    )


# ---------------------------------------------------------------------------
# O1/M12 analog over events: per-key ordered stitching (groupby + in-group
# sort), SQL-checkable via string_agg ORDER BY
# ---------------------------------------------------------------------------
@register(
    "stitch_events",
    "SELECT user_id, string_agg(event_type, '|' ORDER BY ts, event_id) AS event_seq, "
    "COUNT(*) AS n_events FROM events GROUP BY user_id",
)
def stitch_events(sf_dir: str):
    from ..functions.hashing import bucket_column

    ds = read_table(sf_dir, "events", columns=["user_id", "event_type", "ts", "event_id"])
    # ONE groupby on a small-int bucket co-locates every user; each bucket
    # is stitched with a single vectorized pandas sort + groupby-agg (not
    # one Python dispatch per user — measured 10x cheaper in stitch/agg)
    bucketed = ds.map_batches(
        lambda t: bucket_column(t, "user_id", 64, "__bucket"),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    def stitch_bucket(grp: pa.Table) -> pa.Table:
        df = grp.drop_columns(["__bucket"]).to_pandas()
        df = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        out = (
            df.groupby("user_id", sort=True)
            .agg(event_seq=("event_type", "|".join), n_events=("event_id", "size"))
            .reset_index()
        )
        out["n_events"] = out["n_events"].astype("int64")
        return table_from_pandas(out)

    return bucketed.groupby("__bucket").map_groups(
        stitch_bucket, batch_format="pyarrow"
    )


# ---------------------------------------------------------------------------
# J1 analog: broadcast (map-side) join — small dims shipped once via ray.put
# ---------------------------------------------------------------------------
@register(
    "orders_by_nation",
    # CAST(SUM(..) AS BIGINT): avoid DuckDB's HUGEINT sum representation
    "SELECT n.n_name AS nation, COUNT(*) AS n_orders, "
    "CAST(SUM(CAST(FLOOR(o.o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) "
    "AS total_cents "
    "FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey "
    "JOIN nation n ON c.c_nationkey = n.n_nationkey GROUP BY n.n_name",
)
def orders_by_nation(sf_dir: str):
    import ray
    from ray.data.aggregate import Sum

    # Map-side lookup shipped as a FLAT INT ARRAY, not a Python dict: a
    # custkey-indexed int16 array of nation ids is ~2 bytes/customer (vs
    # ~100 B/entry for a dict) and lookup is one numpy fancy-index per
    # batch. custkeys are dense (TPC-H 1..N); a sparse/huge keyspace
    # makes dense_lookup_array_ref raise with instructions to route the
    # customer side through functions.joins.bucketed_hash_join instead.
    # Built DISTRIBUTED: per-block maxima + one reduce task stream the
    # customer table into the array; the driver only ever holds the
    # ObjectRef (never a customer row).
    from ..functions.joins import dense_lookup_array_ref

    nat = read_table(sf_dir, "nation", columns=["n_nationkey", "n_name"]).to_pandas()
    nation_names = nat.sort_values("n_nationkey")["n_name"].to_numpy()

    cust = read_table(sf_dir, "customer", columns=["c_custkey", "c_nationkey"])
    lookup_ref = dense_lookup_array_ref(cust, "c_custkey", "c_nationkey")

    def partial(batch: pa.Table) -> pa.Table:
        # lookup + PARTIAL aggregation per batch (pre-aggregate before the
        # shuffle — §2.5 guidance); bincount over nation ids, no hashing
        lookup = ray.get(lookup_ref)
        custkeys = batch["o_custkey"].to_numpy(zero_copy_only=False)
        nk = lookup[custkeys].astype(np.int64)
        cents = to_cents(batch["o_totalprice"]).to_numpy(zero_copy_only=False)
        n = len(nation_names)
        counts = np.bincount(nk, minlength=n)
        sums = np.bincount(nk, weights=cents.astype(np.float64), minlength=n)
        nz = np.nonzero(counts)[0]
        return pa.table(
            {
                "nation": pa.array(nation_names[nz].tolist(), pa.string()),
                "n_orders": pa.array(counts[nz].astype(np.int64)),
                "total_cents": pa.array(sums[nz].astype(np.int64)),
            }
        )

    ds = read_table(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])
    partials = ds.map_batches(partial, batch_format="pyarrow", batch_size=32768)
    return partials.groupby("nation").aggregate(
        Sum("n_orders", alias_name="n_orders"),
        Sum("total_cents", alias_name="total_cents"),
    )


# ---------------------------------------------------------------------------
# A1 analog headline aggregate: pricing summary (pre-aggregated, exact ints)
# ---------------------------------------------------------------------------
Q1_CUTOFF = "1998-09-02 00:00:00"


@register(
    "q1_pricing",
    # CAST(SUM(..) AS BIGINT): avoid DuckDB's HUGEINT sum representation
    "SELECT l_returnflag, l_linestatus, "
    "CAST(SUM(CAST(FLOOR(l_quantity * 100 + 0.5) AS BIGINT)) AS BIGINT) "
    "AS sum_qty_cents, "
    "CAST(SUM(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT) "
    "AS sum_base_cents, "
    "CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100 + 0.5) "
    "AS BIGINT)) AS BIGINT) AS sum_disc_cents, COUNT(*) AS n_rows "
    f"FROM lineitem WHERE l_shipdate <= TIMESTAMP '{Q1_CUTOFF}' "
    "GROUP BY l_returnflag, l_linestatus",
)
def q1_pricing(sf_dir: str):
    from ray.data.aggregate import Sum

    cutoff = pa.scalar(
        np.datetime64(Q1_CUTOFF.replace(" ", "T"), "us"), pa.timestamp("us")
    )
    ds = read_table(
        sf_dir,
        "lineitem",
        columns=["l_returnflag", "l_linestatus", "l_quantity",
                 "l_extendedprice", "l_discount", "l_shipdate"],
    )

    def partial(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.less_equal(batch["l_shipdate"], cutoff))
        disc_price = pc.multiply(
            batch["l_extendedprice"], pc.subtract(1.0, batch["l_discount"])
        )
        df = pd.DataFrame(
            {
                "l_returnflag": batch["l_returnflag"].to_pandas(),
                "l_linestatus": batch["l_linestatus"].to_pandas(),
                "sum_qty_cents": to_cents(batch["l_quantity"]).to_numpy(zero_copy_only=False),
                "sum_base_cents": to_cents(batch["l_extendedprice"]).to_numpy(zero_copy_only=False),
                "sum_disc_cents": to_cents(disc_price).to_numpy(zero_copy_only=False),
            }
        )
        agg = (
            df.groupby(["l_returnflag", "l_linestatus"], sort=True)
            .agg(
                sum_qty_cents=("sum_qty_cents", "sum"),
                sum_base_cents=("sum_base_cents", "sum"),
                sum_disc_cents=("sum_disc_cents", "sum"),
                n_rows=("sum_qty_cents", "size"),
            )
            .reset_index()
        )
        return table_from_pandas(agg)

    partials = ds.map_batches(partial, batch_format="pyarrow", batch_size=65536)
    return partials.groupby(["l_returnflag", "l_linestatus"]).aggregate(
        Sum("sum_qty_cents", alias_name="sum_qty_cents"),
        Sum("sum_base_cents", alias_name="sum_base_cents"),
        Sum("sum_disc_cents", alias_name="sum_disc_cents"),
        Sum("n_rows", alias_name="n_rows"),
    )


# ---------------------------------------------------------------------------
# big-big equi-join via explicit hash buckets (Q3-shaped): pre-aggregated
# lineitem revenue joined to filtered orders, top-10 by revenue
# ---------------------------------------------------------------------------
Q3_DATE = "1996-06-30 00:00:00"


@register(
    "q3_revenue",
    # CAST(SUM(..) AS BIGINT): avoid DuckDB's HUGEINT sum representation
    "SELECT o_orderkey, o_orderpriority, revenue_cents FROM ("
    "SELECT l.l_orderkey AS o_orderkey, o.o_orderpriority, "
    "CAST(SUM(CAST(FLOOR(l.l_extendedprice * (1 - l.l_discount) * 100 + 0.5) "
    "AS BIGINT)) AS BIGINT) AS revenue_cents "
    f"FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey "
    f"WHERE o.o_orderdate < TIMESTAMP '{Q3_DATE}' "
    f"AND l.l_shipdate > TIMESTAMP '{Q3_DATE}' "
    "GROUP BY l.l_orderkey, o.o_orderpriority) "
    "ORDER BY revenue_cents DESC, o_orderkey LIMIT 10",
)
def q3_revenue(sf_dir: str):
    from ray.data.aggregate import Sum

    from ..functions.joins import bucketed_hash_join

    cutoff = pa.scalar(
        np.datetime64(Q3_DATE.replace(" ", "T"), "us"), pa.timestamp("us")
    )
    # pre-aggregate the big side BEFORE the join (partial revenue per
    # orderkey inside map_batches, then a small groupby) — §2.5 discipline
    li = read_table(
        sf_dir, "lineitem",
        columns=["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"],
    )

    def li_partial(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.greater(batch["l_shipdate"], cutoff))
        rev = to_cents(
            pc.multiply(batch["l_extendedprice"], pc.subtract(1.0, batch["l_discount"]))
        )
        keys = batch["l_orderkey"].to_numpy(zero_copy_only=False)
        df = pd.DataFrame({"l_orderkey": keys, "revenue_cents": rev.to_numpy(zero_copy_only=False)})
        agg = df.groupby("l_orderkey", sort=True)["revenue_cents"].sum().reset_index()
        return table_from_pandas(agg)

    from ..functions.agg import bucketed_group_agg

    li_rev = bucketed_group_agg(
        li.map_batches(li_partial, batch_format="pyarrow", batch_size=65536),
        ["l_orderkey"],
        {"revenue_cents": ("revenue_cents", "sum")},
        n_buckets=32,
    ).map_batches(
        lambda t: t.rename_columns(["o_orderkey", "revenue_cents"]),
        batch_format="pyarrow",
    )

    orders = read_table(
        sf_dir, "orders", columns=["o_orderkey", "o_orderdate", "o_orderpriority"]
    ).map_batches(
        lambda t: t.filter(pc.less(t["o_orderdate"], cutoff)).drop_columns(
            ["o_orderdate"]
        ),
        batch_format="pyarrow",
    )

    # explicit schemas: li_rev's lineage contains the pre-aggregation
    # shuffle, and a schema probe would execute it twice (see
    # bucketed_hash_join docstring)
    joined = bucketed_hash_join(
        li_rev, orders, "o_orderkey", n_buckets=32,
        lschema=pa.schema(
            [("o_orderkey", pa.int64()), ("revenue_cents", pa.int64())]
        ),
        rschema=pa.schema(
            [("o_orderkey", pa.int64()), ("o_orderpriority", pa.string())]
        ),
    )

    # global top-10 WITHOUT a global sort: each batch keeps its local
    # top-10 (bounded: 10 x n_batches rows reach the driver), final pick
    # in pandas. A full sort for a LIMIT k is an all-to-all the plan
    # doesn't need.
    def local_top(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(
            ["revenue_cents", "o_orderkey"], ascending=[False, True],
            kind="mergesort",
        ).head(10)

    cand = joined.map_batches(local_top, batch_format="pandas").to_pandas()
    top = cand.sort_values(
        ["revenue_cents", "o_orderkey"], ascending=[False, True],
        kind="mergesort",
    ).head(10)
    return table_from_pandas(
        top[["o_orderkey", "o_orderpriority", "revenue_cents"]])


# ---------------------------------------------------------------------------
# broadcast anti-join (J3 existence-probe shape, done as a set filter)
# ---------------------------------------------------------------------------
BIG_ORDER_CENTS = 300_000 * 100


@register(
    "anti_join_customers",
    "SELECT c_custkey, c_name FROM customer c WHERE NOT EXISTS ("
    "SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey "
    f"AND CAST(FLOOR(o.o_totalprice * 100 + 0.5) AS BIGINT) > {BIG_ORDER_CENTS})",
)
def anti_join_customers(sf_dir: str):
    """NOT EXISTS probe done as the DISTRIBUTED bucketed anti-join: the
    probe side (customers with a big order) is filtered per batch but
    never collected into a driver set — at scale the predicate may be
    unselective and the key set O(customers). broadcast_anti_filter
    remains the right tool only for known-small probe sets."""
    from ..functions.joins import bucketed_semi_anti_join

    orders = read_table(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])

    def big_keys(batch: pa.Table) -> pa.Table:
        cents = to_cents(batch["o_totalprice"])
        keep = pc.greater(cents, BIG_ORDER_CENTS)
        return batch.filter(keep).select(["o_custkey"])

    probe = orders.map_batches(big_keys, batch_format="pyarrow")
    cust = read_table(sf_dir, "customer", columns=["c_custkey", "c_name"])
    return bucketed_semi_anti_join(cust, probe, "c_custkey",
                                   right_key="o_custkey")


# ---------------------------------------------------------------------------
# grouped top-k (O3 "keep newest k" generalized to per-group)
# ---------------------------------------------------------------------------
@register(
    "top3_orders_per_customer",
    "SELECT o_custkey, o_orderkey, rank FROM ("
    "SELECT o_custkey, o_orderkey, ROW_NUMBER() OVER ("
    "PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rank "
    "FROM orders) WHERE rank <= 3",
)
def top3_orders_per_customer(sf_dir: str):
    from ..functions.joins import grouped_topk

    orders = read_table(
        sf_dir, "orders", columns=["o_custkey", "o_orderkey", "o_totalprice"]
    )
    top = grouped_topk(
        orders, "o_custkey", "o_totalprice", 3,
        descending=True, tiebreak_col="o_orderkey",
    )
    return top.select_columns(["o_custkey", "o_orderkey", "rank"])


# ---------------------------------------------------------------------------
# set operations (union / intersect / except over key sets)
# ---------------------------------------------------------------------------
def _set_op_sides(sf_dir: str):
    docs = read_table(sf_dir, "documents", columns=["doc_id", "lang", "n_chars"])
    a = docs.map_batches(
        lambda t: t.filter(pc.equal(t["lang"], "en")).select(["doc_id"]),
        batch_format="pyarrow",
    )
    b = docs.map_batches(
        lambda t: t.filter(pc.greater(t["n_chars"], 500)).select(["doc_id"]),
        batch_format="pyarrow",
    )
    return a, b


@register(
    "set_union",
    "SELECT doc_id FROM documents WHERE lang = 'en' "
    "UNION SELECT doc_id FROM documents WHERE n_chars > 500",
)
def set_union(sf_dir: str):
    from ..functions.setops import union_distinct

    a, b = _set_op_sides(sf_dir)
    return union_distinct(a, b, "doc_id")


@register(
    "set_intersect",
    "SELECT doc_id FROM documents WHERE lang = 'en' "
    "INTERSECT SELECT doc_id FROM documents WHERE n_chars > 500",
)
def set_intersect(sf_dir: str):
    from ..functions.setops import intersect

    a, b = _set_op_sides(sf_dir)
    return intersect(a, b, "doc_id")


@register(
    "set_except",
    "SELECT doc_id FROM documents WHERE lang = 'en' "
    "EXCEPT SELECT doc_id FROM documents WHERE n_chars > 500",
)
def set_except(sf_dir: str):
    from ..functions.setops import except_keys

    a, b = _set_op_sides(sf_dir)
    return except_keys(a, b, "doc_id")


def _bag_op_sides(sf_dir: str):
    # both sides carry REAL multiplicities (customers place many orders
    # in each slice), so ALL-semantics differ from the distinct ops
    ds = read_table(sf_dir, "orders",
                    columns=["o_custkey", "o_orderpriority", "o_totalprice"])
    a = ds.filter(expr="o_orderpriority == '1-URGENT'").select_columns(
        ["o_custkey"])
    b = ds.filter(expr="o_totalprice > 100000.0").select_columns(
        ["o_custkey"])
    return a, b


@register(
    "bag_intersect",
    "SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT' "
    "INTERSECT ALL "
    "SELECT o_custkey FROM orders WHERE o_totalprice > 100000.0",
)
def bag_intersect(sf_dir: str):
    """Multiset INTERSECT ALL — each key min(count_a, count_b) times."""
    from ..functions.setops import intersect_all

    a, b = _bag_op_sides(sf_dir)
    return intersect_all(a, b, "o_custkey")


@register(
    "schema_union",
    # UNION ALL BY NAME across two different projections; nulls the
    # engine pads are coalesced to sentinels so the value hash is
    # dtype-stable on both sides (NULL int columns go float64 in pandas)
    "SELECT doc_id, lang, CAST(-1 AS BIGINT) AS n_chars "
    "FROM documents WHERE lang = 'en' "
    "UNION ALL "
    "SELECT doc_id, '' AS lang, n_chars "
    "FROM documents WHERE n_chars <= 200",
)
def schema_union(sf_dir: str):
    """Schema-drift union: two shards with different column sets align by
    name (missing columns null-padded map-side, zero shuffle)."""
    from ..functions.setops import union_by_name

    docs = read_table(sf_dir, "documents",
                      columns=["doc_id", "lang", "n_chars"])
    a = docs.filter(expr="lang == 'en'").select_columns(["doc_id", "lang"])
    b = docs.filter(expr="n_chars <= 200").select_columns(
        ["doc_id", "n_chars"])

    def fill(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "lang": pc.fill_null(t["lang"], ""),
                "n_chars": pc.fill_null(pc.cast(t["n_chars"], pa.int64()),
                                        -1),
            }
        )

    return union_by_name(a, b).map_batches(fill, batch_format="pyarrow")


@register(
    "bag_except",
    "SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT' "
    "EXCEPT ALL "
    "SELECT o_custkey FROM orders WHERE o_totalprice > 100000.0",
)
def bag_except(sf_dir: str):
    """Multiset EXCEPT ALL — each key max(count_a - count_b, 0) times."""
    from ..functions.setops import except_all

    a, b = _bag_op_sides(sf_dir)
    return except_all(a, b, "o_custkey")


# ---------------------------------------------------------------------------
# multi-join composition (Q5-shaped): big-big bucketed join chained with
# broadcast dims, pre-aggregated before the final shuffle
# ---------------------------------------------------------------------------
@register(
    "q5_region_revenue",
    "SELECT r.r_name AS region, COUNT(*) AS n_orders, "
    "CAST(SUM(CAST(FLOOR(o.o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) "
    "AS revenue_cents "
    "FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey "
    "JOIN nation n ON c.c_nationkey = n.n_nationkey "
    "JOIN region r ON n.n_regionkey = r.r_regionkey GROUP BY r.r_name",
)
def q5_region_revenue(sf_dir: str):
    """Join COMPOSITION demo: orders joins customer through the bucketed
    big-big hash join (both sides O(rows)); the nation->region dims are a
    broadcast int map; revenue pre-aggregates per batch before the final
    small groupby."""
    import ray
    from ray.data.aggregate import Sum

    from ..functions.joins import bucketed_hash_join

    nat = read_table(sf_dir, "nation", columns=["n_nationkey", "n_regionkey"]).to_pandas()
    reg = read_table(sf_dir, "region", columns=["r_regionkey", "r_name"]).to_pandas()
    region_names = reg.sort_values("r_regionkey")["r_name"].to_numpy()
    nation_to_region = np.full(int(nat["n_nationkey"].max()) + 1, -1, np.int16)
    nation_to_region[nat["n_nationkey"].to_numpy()] = nat[
        "n_regionkey"
    ].to_numpy().astype(np.int16)
    dims_ref = ray.put(nation_to_region)

    orders = read_table(
        sf_dir, "orders", columns=["o_custkey", "o_totalprice"]
    ).map_batches(
        lambda t: pa.table(
            {
                "c_custkey": t["o_custkey"],
                "cents": to_cents(t["o_totalprice"]),
            }
        ),
        batch_format="pyarrow",
    )
    cust = read_table(sf_dir, "customer", columns=["c_custkey", "c_nationkey"])
    joined = bucketed_hash_join(orders, cust, "c_custkey", n_buckets=32)

    def partial(batch: pa.Table) -> pa.Table:
        lookup = ray.get(dims_ref)
        rk = lookup[
            batch["c_nationkey"].to_numpy(zero_copy_only=False)
        ].astype(np.int64)
        cents = batch["cents"].to_numpy(zero_copy_only=False)
        n = len(region_names)
        counts = np.bincount(rk, minlength=n)
        sums = np.bincount(rk, weights=cents.astype(np.float64), minlength=n)
        nz = np.nonzero(counts)[0]
        return pa.table(
            {
                "region": pa.array(region_names[nz].tolist(), pa.string()),
                "n_orders": pa.array(counts[nz].astype(np.int64)),
                "revenue_cents": pa.array(sums[nz].astype(np.int64)),
            }
        )

    partials = joined.map_batches(partial, batch_format="pyarrow", batch_size=65536)
    return partials.groupby("region").aggregate(
        Sum("n_orders", alias_name="n_orders"),
        Sum("revenue_cents", alias_name="revenue_cents"),
    )


# ---------------------------------------------------------------------------
# distinct (set op)
# ---------------------------------------------------------------------------
@register(
    "distinct_lang_source",
    "SELECT DISTINCT lang, source FROM documents",
)
def distinct_lang_source(sf_dir: str):
    from ray.data.aggregate import Count

    ds = read_table(sf_dir, "documents", columns=["lang", "source"])
    return ds.groupby(["lang", "source"]).aggregate(Count(alias_name="_n")).select_columns(
        ["lang", "source"]
    )


# ---------------------------------------------------------------------------
# as-of join (per-key backward time match)
# ---------------------------------------------------------------------------
@register(
    "asof_clicks",
    "SELECT e.user_id, e.event_id AS error_event_id, "
    "c.event_id AS click_event_id "
    "FROM (SELECT * FROM events WHERE event_type = 'error') e "
    "ASOF JOIN (SELECT * FROM events WHERE event_type = 'click') c "
    "ON e.user_id = c.user_id AND c.ts <= e.ts",
)
def asof_clicks(sf_dir: str):
    from ..functions.joins import asof_join_per_key

    ev = read_table(sf_dir, "events", columns=["user_id", "event_id", "ts", "event_type"])
    errors = ev.map_batches(
        lambda t: t.filter(pc.equal(t["event_type"], "error")).drop_columns(["event_type"]),
        batch_format="pyarrow",
    )
    clicks = ev.map_batches(
        lambda t: t.filter(pc.equal(t["event_type"], "click")).drop_columns(["event_type"]),
        batch_format="pyarrow",
    )
    matched = asof_join_per_key(
        errors, clicks, "user_id", "ts",
        left_cols=["event_id"], right_cols=["event_id"], suffix="_matched",
    )

    def project(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "user_id": df["user_id"].astype("int64"),
                "error_event_id": df["event_id"].astype("int64"),
                "click_event_id": df["event_id_matched"].astype("int64"),
            }
        )

    return matched.map_batches(project, batch_format="pandas")


# ---------------------------------------------------------------------------
# session windows (gap-based sessionization per user)
# ---------------------------------------------------------------------------
SESSION_GAP_US = 3_600_000_000  # 1 hour


@register(
    "session_windows",
    "SELECT user_id, session_idx, COUNT(*) AS n_events, "
    "MIN(ts) AS session_start, MAX(ts) AS session_end FROM ("
    "SELECT user_id, ts, CAST(SUM(new_s) OVER ("
    "PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) "
    "AS BIGINT) - 1 "
    "AS session_idx FROM ("
    "SELECT user_id, ts, event_id, CASE WHEN "
    "lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL "
    "OR epoch_us(ts) - epoch_us(lag(ts) OVER ("
    f"PARTITION BY user_id ORDER BY ts, event_id)) > {SESSION_GAP_US} "
    "THEN 1 ELSE 0 END AS new_s FROM events)) "
    "GROUP BY user_id, session_idx",
)
def session_windows(sf_dir: str):
    from ..functions.hashing import bucket_column

    ds = read_table(sf_dir, "events", columns=["user_id", "event_id", "ts"])
    bucketed = ds.map_batches(
        lambda t: bucket_column(t, "user_id", 64, "__bucket"),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    def sessionize_bucket(grp: pa.Table) -> pa.Table:
        # whole bucket sessionized vectorized: one sort, one diff, one
        # cumsum, one groupby-agg — no per-user Python dispatch
        df = grp.drop_columns(["__bucket"]).to_pandas()
        df = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        us = df["ts"].astype("int64")
        new_user = df["user_id"].ne(df["user_id"].shift())
        new_s = (new_user | (us.diff() > SESSION_GAP_US)).astype("int64")
        # per-user session index: cumulative new-session count within user
        df = df.assign(
            session_idx=new_s.groupby(df["user_id"].to_numpy()).cumsum() - 1
        )
        out = (
            df.groupby(["user_id", "session_idx"], sort=True)
            .agg(
                n_events=("event_id", "size"),
                session_start=("ts", "min"),
                session_end=("ts", "max"),
            )
            .reset_index()
        )
        out["session_idx"] = out["session_idx"].astype("int64")
        out["n_events"] = out["n_events"].astype("int64")
        # us-precision timestamps: pandas emits ns by default, the oracle's
        # TIMESTAMP is us — representation must match for the value hash
        out["session_start"] = out["session_start"].astype("datetime64[us]")
        out["session_end"] = out["session_end"].astype("datetime64[us]")
        return table_from_pandas(out)

    return bucketed.groupby("__bucket").map_groups(
        sessionize_bucket, batch_format="pyarrow"
    )


# ---------------------------------------------------------------------------
# streaming-analog: sliding (hopping) windows — width 2h, hop 1h: every
# event lands in TWO windows; emitted vectorized per batch (row doubling),
# pre-bucketed aggregation
# ---------------------------------------------------------------------------
@register(
    "sliding_windows",
    "SELECT user_id, window_idx, COUNT(*) AS n_events FROM ("
    "SELECT user_id, epoch_us(ts) // 3600000000 AS window_idx FROM events "
    "UNION ALL "
    "SELECT user_id, epoch_us(ts) // 3600000000 - 1 AS window_idx FROM events"
    ") GROUP BY user_id, window_idx",
)
def sliding_windows(sf_dir: str):
    """Hopping windows (width 2 h, hop 1 h): window w spans
    [w*1h, w*1h + 2h), so an event at hour h belongs to windows h and
    h-1. The duplication happens VECTORIZED inside the batch (one
    np.concatenate, no flat_map row dispatch) before the bucketed
    aggregation."""
    from ..functions.agg import bucketed_group_agg

    ds = read_table(sf_dir, "events", columns=["user_id", "ts"])

    def explode(batch: pa.Table) -> pa.Table:
        us = pc.cast(batch["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        hour = us // 3_600_000_000
        users = batch["user_id"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "user_id": pa.array(np.concatenate([users, users])),
                "window_idx": pa.array(np.concatenate([hour, hour - 1])),
            }
        )

    exploded = ds.map_batches(explode, batch_format="pyarrow", batch_size=65536)
    return bucketed_group_agg(
        exploded,
        ["user_id", "window_idx"],
        {"n_events": ("window_idx", "size")},
    )


# ---------------------------------------------------------------------------
# streaming-analog: tumbling hourly windows per user (integer bucket math)
# ---------------------------------------------------------------------------
@register(
    "hourly_windows",
    # CAST(SUM(..) AS BIGINT): avoid DuckDB's HUGEINT sum representation
    "SELECT user_id, epoch_us(ts) // 3600000000 AS hour_bucket, "
    "COUNT(*) AS n_events, "
    "CAST(SUM(CAST(FLOOR(value * 1000000 + 0.5) AS BIGINT)) AS BIGINT) "
    "AS value_micros "
    "FROM events GROUP BY user_id, hour_bucket",
)
def hourly_windows(sf_dir: str):
    from ..functions.agg import bucketed_group_agg

    ds = read_table(sf_dir, "events", columns=["user_id", "ts", "value"])

    def prep(batch: pa.Table) -> pa.Table:
        us = pc.cast(batch["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        hour = us // 3_600_000_000  # int64 floor division, exact (SQL `//`)
        micros = to_cents(batch["value"], scale=1_000_000)
        return pa.table(
            {
                "user_id": batch["user_id"],
                "hour_bucket": pa.array(hour),
                "micros": micros,
            }
        )

    prepped = ds.map_batches(prep, batch_format="pyarrow", batch_size=65536)
    return bucketed_group_agg(
        prepped,
        ["user_id", "hour_bucket"],
        {"n_events": ("micros", "size"), "value_micros": ("micros", "sum")},
    )


# ---------------------------------------------------------------------------
# Window functions (O1 generalization): ROW_NUMBER + running sum per key.
# The reading-order contract of the reference (pages serialized strictly in
# ascending order, app/main.py:455) generalized to the SQL window family.
# ---------------------------------------------------------------------------
@register(
    "running_revenue",
    # explicit ROWS frame (orderkey is unique so RANGE==ROWS, but be exact);
    # CAST(SUM(..) AS BIGINT): window SUM(BIGINT) is HUGEINT in DuckDB
    "SELECT o_custkey, o_orderkey, "
    "CAST(ROW_NUMBER() OVER w AS BIGINT) AS rn, "
    "CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) OVER w "
    "AS BIGINT) AS cum_cents "
    "FROM orders WINDOW w AS (PARTITION BY o_custkey "
    "ORDER BY o_orderdate, o_orderkey "
    "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)",
)
def running_revenue(sf_dir: str):
    """Per-customer order sequence number + running spend (exact cents).

    One bucket shuffle on the partition key, then a single vectorized
    sort+cumsum per bucket — see functions/window.py for the scale plan.
    """
    from ..functions.window import partitioned_window

    ds = read_table(
        sf_dir, "orders",
        columns=["o_custkey", "o_orderkey", "o_orderdate", "o_totalprice"],
    )

    def prep(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_custkey": batch["o_custkey"],
                "o_orderkey": batch["o_orderkey"],
                "o_orderdate": batch["o_orderdate"],
                "cents": to_cents(batch["o_totalprice"]),
            }
        )

    prepped = ds.map_batches(prep, batch_format="pyarrow", batch_size=65536)
    out = partitioned_window(
        prepped,
        key="o_custkey",
        order_by=["o_orderdate", "o_orderkey"],
        specs=[("rn", "row_number", None, None),
               ("cum_cents", "cumsum", "cents", None)],
        keep_columns=["o_custkey", "o_orderkey"],
    )
    return out.select_columns(["o_custkey", "o_orderkey", "rn", "cum_cents"])


@register(
    "rolling_rank_revenue",
    # three window kinds the cumulative family doesn't cover: a trailing
    # 3-row ROWS frame sum (exact cents) plus RANK / DENSE_RANK with real
    # ties (order dates repeat within a customer)
    "SELECT o_custkey, o_orderkey, "
    "CAST(SUM(cents) OVER w3 AS BIGINT) AS roll3_cents, "
    "CAST(RANK() OVER wd AS BIGINT) AS date_rank, "
    "CAST(DENSE_RANK() OVER wd AS BIGINT) AS date_dense_rank, "
    "CAST(NTILE(4) OVER w3 AS BIGINT) AS quartile "
    "FROM (SELECT o_custkey, o_orderkey, o_orderdate, "
    "CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS cents FROM orders) "
    "WINDOW w3 AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey "
    "ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), "
    "wd AS (PARTITION BY o_custkey ORDER BY o_orderdate)",
)
def rolling_rank_revenue(sf_dir: str):
    """Trailing-window sum + RANK/DENSE_RANK per customer — the window
    kinds beyond the cumulative family, same one-shuffle plan."""
    from ..functions.window import partitioned_window

    ds = read_table(
        sf_dir, "orders",
        columns=["o_custkey", "o_orderkey", "o_orderdate", "o_totalprice"],
    )

    def prep(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_custkey": batch["o_custkey"],
                "o_orderkey": batch["o_orderkey"],
                "o_orderdate": batch["o_orderdate"],
                "cents": to_cents(batch["o_totalprice"]),
            }
        )

    prepped = ds.map_batches(prep, batch_format="pyarrow", batch_size=65536)
    out = partitioned_window(
        prepped,
        key="o_custkey",
        order_by=["o_orderdate", "o_orderkey"],
        specs=[("roll3_cents", "rolling_sum", "cents", 3),
               ("date_rank", "rank", "o_orderdate", None),
               ("date_dense_rank", "dense_rank", "o_orderdate", None),
               ("quartile", "ntile", None, 4)],
        keep_columns=["o_custkey", "o_orderkey"],
    )
    return out.select_columns(
        ["o_custkey", "o_orderkey", "roll3_cents", "date_rank",
         "date_dense_rank", "quartile"]
    )


@register(
    "order_neighbors",
    # the remaining SQL window kinds: LEAD (explicit default), FIRST_VALUE,
    # full-frame LAST_VALUE, and the two distribution functions with REAL
    # ties (order dates repeat within a customer). pct/cume are the exact
    # IEEE divisions both engines perform — bit-identical doubles.
    "SELECT o_custkey, o_orderkey, "
    "CAST(LEAD(o_orderkey, 1, -1) OVER w AS BIGINT) AS next_key, "
    "CAST(FIRST_VALUE(o_orderkey) OVER w AS BIGINT) AS first_key, "
    "CAST(LAST_VALUE(o_orderkey) OVER (PARTITION BY o_custkey "
    "ORDER BY o_orderdate, o_orderkey "
    "ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) "
    "AS BIGINT) AS last_key, "
    "PERCENT_RANK() OVER wd AS pct_rank, "
    "CUME_DIST() OVER wd AS cume "
    "FROM orders WINDOW "
    "w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey), "
    "wd AS (PARTITION BY o_custkey ORDER BY o_orderdate)",
)
def order_neighbors(sf_dir: str):
    """LEAD / FIRST_VALUE / LAST_VALUE / PERCENT_RANK / CUME_DIST per
    customer — completes the window family; same one-shuffle plan."""
    from ..functions.window import partitioned_window

    ds = read_table(
        sf_dir, "orders",
        columns=["o_custkey", "o_orderkey", "o_orderdate"],
    )
    out = partitioned_window(
        ds,
        key="o_custkey",
        order_by=["o_orderdate", "o_orderkey"],
        specs=[("next_key", "lead", "o_orderkey", -1),
               ("first_key", "first_value", "o_orderkey", None),
               ("last_key", "last_value", "o_orderkey", None),
               ("pct_rank", "percent_rank", "o_orderdate", None),
               ("cume", "cume_dist", "o_orderdate", None)],
        keep_columns=["o_custkey", "o_orderkey"],
    )
    return out.select_columns(
        ["o_custkey", "o_orderkey", "next_key", "first_key", "last_key",
         "pct_rank", "cume"]
    )


@register(
    "event_gaps",
    # LAG-based inter-event delta per user; first event of a user -> -1.
    # epoch_us on both sides keeps the arithmetic in exact int64 microseconds.
    "SELECT user_id, event_id, "
    "COALESCE(epoch_us(ts) - LAG(epoch_us(ts)) OVER "
    "(PARTITION BY user_id ORDER BY ts, event_id), -1) AS gap_us "
    "FROM events",
)
def event_gaps(sf_dir: str):
    """LAG window: microsecond gap to the user's previous event."""
    from ..functions.window import partitioned_window

    ds = read_table(sf_dir, "events", columns=["user_id", "event_id", "ts"])

    def prep(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": batch["user_id"],
                "event_id": batch["event_id"],
                "ts_us": pc.cast(batch["ts"], pa.int64()),
            }
        )

    prepped = ds.map_batches(prep, batch_format="pyarrow", batch_size=65536)
    out = partitioned_window(
        prepped,
        key="user_id",
        order_by=["ts_us", "event_id"],
        specs=[("gap_us", "diff", "ts_us", -1)],
        keep_columns=["user_id", "event_id"],
    )
    return out.select_columns(["user_id", "event_id", "gap_us"])


# ---------------------------------------------------------------------------
# LEFT OUTER join: customers with zero orders kept, zero-filled. Exercises
# bucketed_hash_join(how="left") — the null-padded path of the big-big join.
# ---------------------------------------------------------------------------
@register(
    "customer_order_stats",
    "SELECT c.c_custkey, c.c_mktsegment, "
    "COALESCE(o.n_orders, 0) AS n_orders, "
    "COALESCE(o.total_cents, 0) AS total_cents "
    "FROM customer c LEFT JOIN ("
    "SELECT o_custkey, COUNT(*) AS n_orders, "
    "CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) "
    "AS total_cents FROM orders GROUP BY o_custkey) o "
    "ON c.c_custkey = o.o_custkey",
)
def customer_order_stats(sf_dir: str):
    """Left outer join: every customer, order count + spend (0 if none).

    Big side pre-aggregated per batch BEFORE the join shuffle (partial
    groupby — §2.5 discipline), then one bucketed left join on custkey.
    """
    import pyarrow as pa

    from ..functions.agg import bucketed_group_agg
    from ..functions.joins import bucketed_hash_join

    orders = read_table(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])

    def prep(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "c_custkey": batch["o_custkey"],
                "cents": to_cents(batch["o_totalprice"]),
            }
        )

    agg = bucketed_group_agg(
        orders.map_batches(prep, batch_format="pyarrow", batch_size=65536),
        ["c_custkey"],
        {"n_orders": ("cents", "size"), "total_cents": ("cents", "sum")},
    )
    cust = read_table(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"])
    joined = bucketed_hash_join(
        cust, agg, "c_custkey", how="left",
        lschema=pa.schema([("c_custkey", pa.int64()),
                           ("c_mktsegment", pa.string())]),
        rschema=pa.schema([("c_custkey", pa.int64()),
                           ("n_orders", pa.int64()),
                           ("total_cents", pa.int64())]),
    )

    def fill(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "c_custkey": batch["c_custkey"],
                "c_mktsegment": batch["c_mktsegment"],
                "n_orders": pc.fill_null(batch["n_orders"], 0),
                "total_cents": pc.fill_null(batch["total_cents"], 0),
            }
        )

    return joined.map_batches(fill, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# FULL OUTER join: event activity x customer identity — unmatched rows
# survive from BOTH sides (users with no customer record keep null
# acct_cents; customers with no events keep null n_events).
# ---------------------------------------------------------------------------
@register(
    "full_outer_activity",
    "WITH u AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events "
    "FROM events GROUP BY user_id), "
    "c AS (SELECT c_custkey AS user_id, "
    "CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT) AS acct_cents "
    "FROM customer) "
    "SELECT COALESCE(u.user_id, c.user_id) AS user_id, u.n_events, "
    "c.acct_cents FROM u FULL OUTER JOIN c ON u.user_id = c.user_id",
)
def full_outer_activity(sf_dir: str):
    """FULL OUTER bucketed join (``how='full'``): the both-sided
    null-padded path of the big-big join."""
    import pyarrow as pa

    from ..functions.agg import bucketed_group_agg
    from ..functions.joins import bucketed_hash_join

    events = read_table(sf_dir, "events", columns=["user_id"])
    per_user = bucketed_group_agg(
        events, ["user_id"], {"n_events": ("user_id", "size")},
    )

    cust = read_table(sf_dir, "customer", columns=["c_custkey", "c_acctbal"])

    def prep_cust(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": batch["c_custkey"],
                "acct_cents": to_cents(batch["c_acctbal"]),
            }
        )

    cust_p = cust.map_batches(prep_cust, batch_format="pyarrow")
    return bucketed_hash_join(
        per_user, cust_p, "user_id", how="full",
        lschema=pa.schema([("user_id", pa.int64()),
                           ("n_events", pa.int64())]),
        rschema=pa.schema([("user_id", pa.int64()),
                           ("acct_cents", pa.int64())]),
    )


# ---------------------------------------------------------------------------
# PIVOT (conditional aggregation): per-user event-type count matrix.
# ---------------------------------------------------------------------------
_EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


@register(
    "event_type_pivot",
    "SELECT user_id, "
    + ", ".join(
        f"COUNT(*) FILTER (WHERE event_type = '{t}') AS n_{t}"
        for t in _EVENT_TYPES
    )
    + ", COUNT(*) AS n_total FROM events GROUP BY user_id",
)
def event_type_pivot(sf_dir: str):
    """Wide pivot: one column per event type, counts per user.

    Per-batch crosstab partials (categories fixed up front so every
    partial has the same shape) -> one small groupby Sum. The shuffle
    carries |users| x 7 ints, never the raw events.
    """
    from ray.data.aggregate import Sum

    ds = read_table(sf_dir, "events", columns=["user_id", "event_type"])

    n_types = len(_EVENT_TYPES)
    type_arr = np.array(_EVENT_TYPES)

    def partial(batch: pa.Table) -> pa.Table:
        # factorize + flat bincount: one pass, no pd.crosstab pivot
        # machinery (measured ~10x cheaper per batch)
        uids = batch["user_id"].to_numpy(zero_copy_only=False)
        uniq, uidx = np.unique(uids, return_inverse=True)
        # dictionary-encode in Arrow C space, then remap the (tiny) dict
        # to the fixed _EVENT_TYPES order — no per-row string compares
        enc = pc.dictionary_encode(batch["event_type"]).combine_chunks()
        remap = np.searchsorted(type_arr, np.asarray(enc.dictionary))
        # validate the remap: an event_type outside _EVENT_TYPES would
        # otherwise silently land in (or crash on) another type's column
        remap_clipped = np.minimum(remap, n_types - 1)
        valid = type_arr[remap_clipped] == np.asarray(enc.dictionary)
        if not valid.all():
            unknown = np.asarray(enc.dictionary)[~valid].tolist()
            raise ValueError(
                f"event_type_pivot: unknown event types {unknown!r}; "
                f"expected one of {_EVENT_TYPES}"
            )
        code = remap[np.asarray(enc.indices)]
        counts = np.bincount(
            uidx * n_types + code, minlength=len(uniq) * n_types
        ).reshape(len(uniq), n_types)
        cols = {"user_id": pa.array(uniq)}
        for j, t in enumerate(_EVENT_TYPES):
            cols[f"n_{t}"] = pa.array(counts[:, j].astype(np.int64))
        cols["n_total"] = pa.array(counts.sum(axis=1).astype(np.int64))
        return pa.table(cols)

    partials = ds.map_batches(partial, batch_format="pyarrow", batch_size=65536)
    return partials.groupby("user_id").aggregate(
        *[Sum(f"n_{t}", alias_name=f"n_{t}") for t in _EVENT_TYPES],
        Sum("n_total", alias_name="n_total"),
    )


# ---------------------------------------------------------------------------
# Funnel analysis: staged conditional mins per user (view -> click ->
# purchase, each stage's clock starting strictly after the previous
# stage's first event) — the standard product-analytics sequence op.
# ---------------------------------------------------------------------------
@register(
    "funnel_stages",
    "WITH u AS (SELECT DISTINCT user_id FROM events), "
    "s1 AS (SELECT user_id, MIN(ts) AS t1 FROM events "
    "WHERE event_type = 'view' GROUP BY user_id), "
    "s2 AS (SELECT e.user_id, MIN(e.ts) AS t2 FROM events e "
    "JOIN s1 ON e.user_id = s1.user_id AND e.ts > s1.t1 "
    "WHERE e.event_type = 'click' GROUP BY e.user_id), "
    "s3 AS (SELECT e.user_id, MIN(e.ts) AS t3 FROM events e "
    "JOIN s2 ON e.user_id = s2.user_id AND e.ts > s2.t2 "
    "WHERE e.event_type = 'purchase' GROUP BY e.user_id) "
    "SELECT u.user_id, CAST(CASE WHEN s3.user_id IS NOT NULL THEN 3 "
    "WHEN s2.user_id IS NOT NULL THEN 2 "
    "WHEN s1.user_id IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS stage "
    "FROM u LEFT JOIN s1 ON u.user_id = s1.user_id "
    "LEFT JOIN s2 ON u.user_id = s2.user_id "
    "LEFT JOIN s3 ON u.user_id = s3.user_id",
)
def funnel_stages(sf_dir: str):
    """Per-user funnel depth over the ordered event stream (0 = never
    viewed, 3 = completed view→click→purchase in strict timestamp order).
    One user-bucket shuffle; each bucket resolves every user's staged
    mins VECTORIZED (three filtered grouped mins, each gated on the
    previous stage's time via a user-map), never a per-user loop. The
    strict `>` gate means a click sharing the first view's timestamp
    does not advance the funnel — matching the SQL exactly."""
    from ..functions.hashing import bucket_column

    steps = ("view", "click", "purchase")
    ds = read_table(sf_dir, "events",
                    columns=["user_id", "event_type", "ts"])
    bucketed = ds.map_batches(
        lambda t: bucket_column(t, "user_id", 32, "__fb"),
        batch_format="pyarrow",
    )

    def funnel_bucket(grp: pa.Table) -> pa.Table:
        df = grp.drop_columns(["__fb"]).to_pandas()
        users = pd.unique(df["user_id"])
        stage = pd.Series(np.zeros(len(users), np.int64), index=users)
        prev = None  # user -> time the previous stage completed
        for depth, et in enumerate(steps, start=1):
            sub = df[df["event_type"] == et]
            if prev is not None:
                gate = sub["user_id"].map(prev)
                sub = sub[gate.notna().to_numpy()
                          & (sub["ts"] > gate).to_numpy()]
            if len(sub) == 0:
                break
            cur = sub.groupby("user_id")["ts"].min()
            stage.loc[cur.index] = depth
            prev = cur
        return pa.table({
            "user_id": pa.array(stage.index.to_numpy(), pa.int64()),
            "stage": pa.array(stage.to_numpy(), pa.int64()),
        })

    return bucketed.groupby("__fb").map_groups(
        funnel_bucket, batch_format="pyarrow"
    )


# ---------------------------------------------------------------------------
# Z-order (Morton) layout keys: one sort key under which rows close in
# EITHER dimension land close in the file, so row-group min/max stats
# prune 2-D range predicates ("prune at the read" made real — measured
# pruning benefit in tests/test_zorder.py).
# ---------------------------------------------------------------------------
def _zorder_oracle() -> str:
    from ..functions.zorder import zorder_oracle_sql

    return zorder_oracle_sql(
        "SELECT event_id, user_id, "
        "epoch_us(ts) // 3600000000 AS hour_bucket FROM events",
        "event_id", "user_id", "hour_bucket",
    )


@register("zorder_keys", None)
def zorder_keys(sf_dir: str):
    """Morton key of (user_id, hour_bucket) per event — map-only bit
    interleave (numpy shift-or-mask ladder), mirrored exactly by the
    oracle's CTE ladder. At scale: compute the key map-only, `sort("z")`
    once before the partitioned write, and every later 2-D range scan
    prunes on tight row-group statistics."""
    from ..functions.zorder import zorder_key2

    ds = read_table(sf_dir, "events", columns=["event_id", "user_id", "ts"])

    def keys(batch: pa.Table) -> pa.Table:
        us = pc.cast(batch["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        hour = (us // 3_600_000_000).astype(np.uint64)
        uid = batch["user_id"].to_numpy(zero_copy_only=False) \
            .astype(np.uint64)
        return pa.table({
            "event_id": batch["event_id"],
            "z": pa.array(zorder_key2(uid, hour), pa.int64()),
        })

    return ds.map_batches(keys, batch_format="pyarrow", batch_size=65536)


ORACLES["zorder_keys"] = _zorder_oracle()


# ---------------------------------------------------------------------------
# Cohort retention: signup-cohort week x activity-week matrix. The
# user-distinct fold happens INSIDE the user-bucket shuffle (a user lives
# in exactly one bucket, so per-bucket distinct is globally distinct);
# only (cohort_week, week_idx, partial count) rows reach the final tiny
# aggregation — the matrix exchange is O(cohorts x weeks), never O(users).
# ---------------------------------------------------------------------------
@register(
    "cohort_retention",
    # epoch-anchored integer week buckets (same dialect-exact idiom as
    # hourly_windows); cohort = week of the user's FIRST signup event;
    # a user counts once per active week from the cohort week onward
    "WITH c AS (SELECT user_id, MIN(epoch_us(ts) // 604800000000) "
    "AS cohort_week FROM events WHERE event_type = 'signup' "
    "GROUP BY user_id), "
    "a AS (SELECT DISTINCT e.user_id, c.cohort_week, "
    "epoch_us(e.ts) // 604800000000 - c.cohort_week AS week_idx "
    "FROM events e JOIN c ON e.user_id = c.user_id "
    "WHERE epoch_us(e.ts) // 604800000000 >= c.cohort_week) "
    "SELECT cohort_week, week_idx, CAST(COUNT(*) AS BIGINT) AS n_users "
    "FROM a GROUP BY cohort_week, week_idx",
)
def cohort_retention(sf_dir: str):
    """Classic retention triangle: for each signup cohort (week of the
    user's first 'signup' event), how many users were active 0, 1, 2, …
    weeks later. Pre-signup activity is excluded; users who never sign
    up have no cohort and are dropped."""
    from ray.data.aggregate import Sum

    from ..functions.hashing import bucket_column

    WEEK_US = 604_800_000_000
    ds = read_table(sf_dir, "events",
                    columns=["user_id", "event_type", "ts"])

    def prep(batch: pa.Table) -> pa.Table:
        us = pc.cast(batch["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table({
            "user_id": batch["user_id"],
            "event_type": batch["event_type"],
            "week": pa.array(us // WEEK_US, pa.int64()),
        })

    bucketed = ds.map_batches(prep, batch_format="pyarrow",
                              batch_size=65536).map_batches(
        lambda t: bucket_column(t, "user_id", 32, "__cb"),
        batch_format="pyarrow",
    )

    def cohort_bucket(grp: pa.Table) -> pa.Table:
        df = grp.drop_columns(["__cb"]).to_pandas()
        signup = df[df["event_type"] == "signup"] \
            .groupby("user_id")["week"].min()
        cw = df["user_id"].map(signup)
        keep = cw.notna().to_numpy() & (df["week"] >= cw).to_numpy()
        act = pd.DataFrame({
            "user_id": df["user_id"][keep],
            "cohort_week": cw[keep].astype("int64"),
            "week_idx": (df["week"][keep] - cw[keep]).astype("int64"),
        }).drop_duplicates(["user_id", "week_idx"])
        counts = act.groupby(["cohort_week", "week_idx"]).size()
        idx = counts.index.to_frame(index=False)
        return pa.table({
            "cohort_week": pa.array(idx["cohort_week"].to_numpy(), pa.int64()),
            "week_idx": pa.array(idx["week_idx"].to_numpy(), pa.int64()),
            "n_partial": pa.array(counts.to_numpy(), pa.int64()),
        })

    partials = bucketed.groupby("__cb").map_groups(
        cohort_bucket, batch_format="pyarrow"
    )
    return partials.groupby(["cohort_week", "week_idx"]).aggregate(
        Sum("n_partial", alias_name="n_users")
    )


# ---------------------------------------------------------------------------
# ROLLUP (hierarchical subtotals): region -> nation -> grand total, computed
# WITHOUT a driver pass: each partial emits all three hierarchy levels
# (they are Sum-able), so one groupby finishes every level at once.
# ---------------------------------------------------------------------------
@register(
    "revenue_rollup",
    "SELECT COALESCE(r_name, 'ALL') AS region, "
    "COALESCE(n_name, 'ALL') AS nation, COUNT(*) AS n_orders, "
    "CAST(SUM(CAST(FLOOR(o.o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) "
    "AS total_cents "
    "FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey "
    "JOIN nation n ON c.c_nationkey = n.n_nationkey "
    "JOIN region r ON n.n_regionkey = r.r_regionkey "
    "GROUP BY ROLLUP(r_name, n_name)",
)
def revenue_rollup(sf_dir: str):
    import ray
    from ray.data.aggregate import Sum

    # dimension lookups as flat int arrays (same broadcast discipline as
    # orders_by_nation); only dimension-cardinality data touches the driver
    nat = read_table(
        sf_dir, "nation", columns=["n_nationkey", "n_name", "n_regionkey"]
    ).to_pandas().sort_values("n_nationkey")
    reg = read_table(
        sf_dir, "region", columns=["r_regionkey", "r_name"]
    ).to_pandas().sort_values("r_regionkey")
    nation_names = nat["n_name"].to_numpy()
    region_of_nation = nat["n_regionkey"].to_numpy()
    region_names = reg["r_name"].to_numpy()

    # custkey -> nationkey built distributed (see orders_by_nation): the
    # driver holds only the ObjectRef, never a customer row.
    from ..functions.joins import dense_lookup_array_ref

    cust = read_table(sf_dir, "customer", columns=["c_custkey", "c_nationkey"])
    lookup_ref = dense_lookup_array_ref(cust, "c_custkey", "c_nationkey")

    def partial(batch: pa.Table) -> pa.Table:
        lookup = ray.get(lookup_ref)
        nk = lookup[batch["o_custkey"].to_numpy(zero_copy_only=False)].astype(
            np.int64
        )
        cents = to_cents(batch["o_totalprice"]).to_numpy(zero_copy_only=False)
        n = len(nation_names)
        counts = np.bincount(nk, minlength=n)
        sums = np.bincount(nk, weights=cents.astype(np.float64), minlength=n)
        nz = np.nonzero(counts)[0]
        # level 2: (region, nation); level 1: (region, ALL); level 0: (ALL, ALL)
        df = pd.DataFrame(
            {
                "region": region_names[region_of_nation[nz]],
                "nation": nation_names[nz],
                "n_orders": counts[nz].astype(np.int64),
                "total_cents": sums[nz].astype(np.int64),
            }
        )
        lvl1 = (
            df.groupby("region", sort=False)[["n_orders", "total_cents"]]
            .sum()
            .reset_index()
        )
        lvl1["nation"] = "ALL"
        lvl0 = pd.DataFrame(
            {
                "region": ["ALL"],
                "nation": ["ALL"],
                "n_orders": [df["n_orders"].sum()],
                "total_cents": [df["total_cents"].sum()],
            }
        )
        out = pd.concat(
            [df, lvl1[["region", "nation", "n_orders", "total_cents"]], lvl0],
            ignore_index=True,
        )
        return table_from_pandas(out)

    ds = read_table(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])
    partials = ds.map_batches(partial, batch_format="pyarrow", batch_size=32768)
    return partials.groupby(["region", "nation"]).aggregate(
        Sum("n_orders", alias_name="n_orders"),
        Sum("total_cents", alias_name="total_cents"),
    )


# ---------------------------------------------------------------------------
# CUBE (all grouping sets): ROLLUP's hierarchy plus the (ALL, nation)
# cross-slice — every level emitted Sum-able in the partials, one groupby.
# ---------------------------------------------------------------------------
@register(
    "revenue_cube",
    "SELECT COALESCE(r_name, 'ALL') AS region, "
    "COALESCE(n_name, 'ALL') AS nation, COUNT(*) AS n_orders, "
    "CAST(SUM(CAST(FLOOR(o.o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) "
    "AS total_cents "
    "FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey "
    "JOIN nation n ON c.c_nationkey = n.n_nationkey "
    "JOIN region r ON n.n_regionkey = r.r_regionkey "
    "GROUP BY CUBE(r_name, n_name)",
)
def revenue_cube(sf_dir: str):
    import ray
    from ray.data.aggregate import Sum

    from ..functions.joins import dense_lookup_array_ref

    nat = read_table(
        sf_dir, "nation", columns=["n_nationkey", "n_name", "n_regionkey"]
    ).to_pandas().sort_values("n_nationkey")
    reg = read_table(
        sf_dir, "region", columns=["r_regionkey", "r_name"]
    ).to_pandas().sort_values("r_regionkey")
    nation_names = nat["n_name"].to_numpy()
    region_of_nation = nat["n_regionkey"].to_numpy()
    region_names = reg["r_name"].to_numpy()

    cust = read_table(sf_dir, "customer", columns=["c_custkey", "c_nationkey"])
    lookup_ref = dense_lookup_array_ref(cust, "c_custkey", "c_nationkey")

    def partial(batch: pa.Table) -> pa.Table:
        lookup = ray.get(lookup_ref)
        nk = lookup[batch["o_custkey"].to_numpy(zero_copy_only=False)].astype(
            np.int64
        )
        cents = to_cents(batch["o_totalprice"]).to_numpy(zero_copy_only=False)
        n = len(nation_names)
        counts = np.bincount(nk, minlength=n)
        sums = np.bincount(nk, weights=cents.astype(np.float64), minlength=n)
        nz = np.nonzero(counts)[0]
        lvl2 = pd.DataFrame(
            {
                "region": region_names[region_of_nation[nz]],
                "nation": nation_names[nz],
                "n_orders": counts[nz].astype(np.int64),
                "total_cents": sums[nz].astype(np.int64),
            }
        )
        lvl_r = (
            lvl2.groupby("region", sort=False)[["n_orders", "total_cents"]]
            .sum().reset_index()
        )
        lvl_r["nation"] = "ALL"
        lvl_n = (  # the slice ROLLUP lacks: per-nation across all regions
            lvl2.groupby("nation", sort=False)[["n_orders", "total_cents"]]
            .sum().reset_index()
        )
        lvl_n["region"] = "ALL"
        lvl0 = pd.DataFrame(
            {
                "region": ["ALL"], "nation": ["ALL"],
                "n_orders": [lvl2["n_orders"].sum()],
                "total_cents": [lvl2["total_cents"].sum()],
            }
        )
        cols = ["region", "nation", "n_orders", "total_cents"]
        return table_from_pandas(
            pd.concat([lvl2[cols], lvl_r[cols], lvl_n[cols], lvl0[cols]],
                      ignore_index=True)
        )

    ds = read_table(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])
    partials = ds.map_batches(partial, batch_format="pyarrow", batch_size=32768)
    return partials.groupby(["region", "nation"]).aggregate(
        Sum("n_orders", alias_name="n_orders"),
        Sum("total_cents", alias_name="total_cents"),
    )


# ---------------------------------------------------------------------------
# Per-event sessionization: assign every event its session ordinal — the
# row-level companion of session_windows (which emits per-session
# aggregates). One bucket shuffle on user_id; per bucket a single
# vectorized sort + diff + flag + grouped cumsum.
# ---------------------------------------------------------------------------
@register(
    "session_ids",
    "WITH g AS (SELECT user_id, event_id, ts, "
    "epoch_us(ts) - LAG(epoch_us(ts)) OVER "
    "(PARTITION BY user_id ORDER BY ts, event_id) AS gap FROM events) "
    "SELECT user_id, event_id, "
    f"CAST(SUM(CASE WHEN gap IS NULL OR gap > {SESSION_GAP_US} "
    "THEN 1 ELSE 0 END) OVER (PARTITION BY user_id ORDER BY ts, event_id "
    "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - 1 AS BIGINT) "
    "AS session_idx FROM g",
)
def session_ids(sf_dir: str):
    from ..functions.hashing import bucket_column

    ds = read_table(sf_dir, "events", columns=["user_id", "event_id", "ts"])
    bucketed = ds.map_batches(
        lambda t: bucket_column(t, "user_id", 64, "__bucket"),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    def assign_bucket(grp: pa.Table) -> pa.Table:
        df = grp.drop_columns(["__bucket"]).to_pandas()
        df = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        us = df["ts"].astype("int64")
        new_user = df["user_id"].ne(df["user_id"].shift())
        new_s = (new_user | (us.diff() > SESSION_GAP_US)).astype("int64")
        df["session_idx"] = (
            new_s.groupby(df["user_id"].to_numpy()).cumsum() - 1
        )
        out = df[["user_id", "event_id", "session_idx"]].copy()
        out["session_idx"] = out["session_idx"].astype("int64")
        return table_from_pandas(out)

    return bucketed.groupby("__bucket").map_groups(
        assign_bucket, batch_format="pyarrow"
    )


# ---------------------------------------------------------------------------
# Skew-salted big-big join: the explicit hot-key plan (salt hot keys across
# n_salt buckets, replicate the other side's hot rows per salt). The salt
# assignment provably never changes the join OUTPUT, so the oracle is the
# plain SQL join; the planted-skew behavior is pinned in tests/test_joins.py.
# ---------------------------------------------------------------------------
@register(
    "salted_join_priority",
    "SELECT o_orderpriority, COUNT(*) AS n_items, "
    "CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100 + 0.5) "
    "AS BIGINT)) AS BIGINT) AS revenue_cents "
    "FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey "
    "GROUP BY o_orderpriority",
)
def salted_join_priority(sf_dir: str):
    from ray.data.aggregate import Sum

    from ..functions.joins import skew_salted_join

    li = read_table(
        sf_dir, "lineitem",
        columns=["l_orderkey", "l_extendedprice", "l_discount"],
    )

    def prep(batch: pa.Table) -> pa.Table:
        rev = pc.multiply(
            batch["l_extendedprice"], pc.subtract(1.0, batch["l_discount"])
        )
        return pa.table(
            {"o_orderkey": batch["l_orderkey"], "rev_cents": to_cents(rev)}
        )

    big = li.map_batches(prep, batch_format="pyarrow", batch_size=65536)
    small = read_table(sf_dir, "orders",
                       columns=["o_orderkey", "o_orderpriority"])
    # ANY hot-key choice yields the same join output (salting only changes
    # placement); this fixed arithmetic set exercises both the salted and
    # the cold path without a detection pass
    hot = set(range(0, 200_000, 32))
    joined = skew_salted_join(
        big, small, "o_orderkey", hot_keys=hot, n_salt=4,
        bschema=pa.schema([("o_orderkey", pa.int64()),
                           ("rev_cents", pa.int64())]),
        sschema=pa.schema([("o_orderkey", pa.int64()),
                           ("o_orderpriority", pa.string())]),
    )

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        out = (
            batch.groupby("o_orderpriority", sort=False)
            .agg(n_items=("rev_cents", "size"),
                 revenue_cents=("rev_cents", "sum"))
            .reset_index()
        )
        out["n_items"] = out["n_items"].astype("int64")
        out["revenue_cents"] = out["revenue_cents"].astype("int64")
        return out

    return (
        joined.map_batches(partial, batch_format="pandas", batch_size=65536)
        .groupby("o_orderpriority")
        .aggregate(Sum("n_items", alias_name="n_items"),
                   Sum("revenue_cents", alias_name="revenue_cents"))
    )


# ---------------------------------------------------------------------------
# Auto-detected skew salting: the hot-key PROFILING pass
# (functions/heavy_hitters.py detect_hot_keys — Misra-Gries summary +
# exact recount) feeds skew_salted_join's hot_keys directly, so a
# power-law key distribution needs no hand-tuned hot list. Join output is
# invariant to the detected set (salting only changes placement), so the
# oracle is the plain SQL join; at the driver's sf0.01 the detection pass
# genuinely finds hot users (150 users over 10k events).
# ---------------------------------------------------------------------------
@register(
    "auto_salted_segment_value",
    "SELECT c_mktsegment, COUNT(*) AS n_events, "
    "CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT) "
    "AS value_cents "
    "FROM events e JOIN customer c ON e.user_id = c.c_custkey "
    "GROUP BY c_mktsegment",
)
def auto_salted_segment_value(sf_dir: str):
    from ray.data.aggregate import Sum

    from ..functions.heavy_hitters import hot_key_candidates
    from ..functions.joins import skew_salted_join

    ev = read_table(sf_dir, "events", columns=["user_id", "value"])

    def prep(batch: pa.Table) -> pa.Table:
        return pa.table({"c_custkey": batch["user_id"],
                         "value_cents": to_cents(batch["value"])})

    big = ev.map_batches(prep, batch_format="pyarrow", batch_size=65536)
    # AUTO path: users holding >= 0.5% of all events are hot. ONE-pass
    # guaranteed-recall candidates suffice — the salted join's output is
    # invariant to over-selection (salting only changes placement), so
    # the exact-recount execution detect_hot_keys would add is skipped.
    hot = [int(k) for k in hot_key_candidates(big, "c_custkey", phi_inv=200)]
    small = read_table(sf_dir, "customer",
                       columns=["c_custkey", "c_mktsegment"])
    joined = skew_salted_join(
        big, small, "c_custkey", hot_keys=set(hot), n_salt=4,
        bschema=pa.schema([("c_custkey", pa.int64()),
                           ("value_cents", pa.int64())]),
        sschema=pa.schema([("c_custkey", pa.int64()),
                           ("c_mktsegment", pa.string())]),
    )

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        out = (
            batch.groupby("c_mktsegment", sort=False)
            .agg(n_events=("value_cents", "size"),
                 value_cents=("value_cents", "sum"))
            .reset_index()
        )
        out["n_events"] = out["n_events"].astype("int64")
        out["value_cents"] = out["value_cents"].astype("int64")
        return out

    return (
        joined.map_batches(partial, batch_format="pandas", batch_size=65536)
        .groupby("c_mktsegment")
        .aggregate(Sum("n_events", alias_name="n_events"),
                   Sum("value_cents", alias_name="value_cents"))
    )


# ---------------------------------------------------------------------------
# Data profiling: per-column stats in ONE pass. Partials keep each
# column's min/max TYPED in its own wide column (so aggregation compares
# natively, never lexicographically); only the final tiny reshape casts
# to strings for the long-format report.
# ---------------------------------------------------------------------------
@register(
    "profile_events",
    "SELECT 'event_id' AS col, COUNT(*) AS n_rows, "
    "COUNT(*) - COUNT(event_id) AS n_nulls, "
    "CAST(MIN(event_id) AS VARCHAR) AS min_v, "
    "CAST(MAX(event_id) AS VARCHAR) AS max_v FROM events "
    "UNION ALL SELECT 'user_id', COUNT(*), COUNT(*) - COUNT(user_id), "
    "CAST(MIN(user_id) AS VARCHAR), CAST(MAX(user_id) AS VARCHAR) FROM events "
    "UNION ALL SELECT 'event_type', COUNT(*), COUNT(*) - COUNT(event_type), "
    "MIN(event_type), MAX(event_type) FROM events",
)
def profile_events(sf_dir: str):
    from ray.data.aggregate import Max, Min, Sum

    cols = ["event_id", "user_id", "event_type"]
    ds = read_table(sf_dir, "events", columns=cols)

    def partial(batch: pa.Table) -> pa.Table:
        out = {"n_rows": pa.array([batch.num_rows], pa.int64())}
        for c in cols:
            col = batch[c]
            out[f"{c}__nulls"] = pa.array([col.null_count], pa.int64())
            out[f"{c}__min"] = pa.array([pc.min(col).as_py()],
                                        type=col.type)
            out[f"{c}__max"] = pa.array([pc.max(col).as_py()],
                                        type=col.type)
        return pa.table(out)

    aggs = [Sum("n_rows", alias_name="n_rows")]
    for c in cols:
        aggs += [
            Sum(f"{c}__nulls", alias_name=f"{c}__nulls"),
            Min(f"{c}__min", alias_name=f"{c}__min"),
            Max(f"{c}__max", alias_name=f"{c}__max"),
        ]
    m = ds.map_batches(partial, batch_format="pyarrow",
                       batch_size=65536).aggregate(*aggs)
    rows = [
        {
            "col": c,
            "n_rows": int(m["n_rows"]),
            "n_nulls": int(m[f"{c}__nulls"]),
            "min_v": str(m[f"{c}__min"]),
            "max_v": str(m[f"{c}__max"]),
        }
        for c in cols
    ]
    return pa.Table.from_pylist(rows)


# ---------------------------------------------------------------------------
# §2.8 JSON field extraction (typed): parse the integer payload field out
# of the events.props JSON string with the Arrow RE2 named-group kernel —
# the EXTRACT companion of the regex MATCH predicate (regex_key_filter)
# and the inverse of the metadata-block APPENDER (stages/stitch.py, which
# serializes json). Scale shape: the per-batch partial collapses the
# event stream to (event_type, n, sum, max) BEFORE the shuffle, so the
# exchange is |event_types| x blocks tiny rows — props never shuffles.
# Reference analogy: metadata JSON round-trip (app/services/document_converter.py
# metadata block) done as a typed column, not a string.
# ---------------------------------------------------------------------------
@register(
    "json_props_stats",
    "WITH v AS (SELECT event_type, "
    "CAST(json_extract(props, '$.k') AS BIGINT) AS k FROM events) "
    "SELECT event_type, COUNT(*) AS n_events, "
    "CAST(SUM(k) AS BIGINT) AS sum_k, CAST(MAX(k) AS BIGINT) AS max_k, "
    "CAST(SUM(k) AS DOUBLE) / COUNT(*) AS avg_k "
    "FROM v GROUP BY event_type",
)
def json_props_stats(sf_dir: str):
    from ray.data.aggregate import Max, Sum

    ds = read_table(sf_dir, "events", columns=["event_type", "props"])

    def partial(t: pa.Table) -> pd.DataFrame:
        st = pc.extract_regex(t["props"], r'"k":\s*(?P<k>\d+)')
        k = pc.cast(pc.struct_field(st, "k"), pa.int64()) \
            .to_numpy(zero_copy_only=False)
        df = pd.DataFrame({"event_type": t["event_type"].to_pandas(), "k": k})
        out = (
            df.groupby("event_type", sort=False)
            .agg(n_events=("k", "size"), sum_k=("k", "sum"),
                 max_k=("k", "max"))
            .reset_index()
        )
        for c in ("n_events", "sum_k", "max_k"):
            out[c] = out[c].astype("int64")
        return out

    agg = (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=65536)
        .groupby("event_type")
        .aggregate(Sum("n_events", alias_name="n_events"),
                   Sum("sum_k", alias_name="sum_k"),
                   Max("max_k", alias_name="max_k"))
    )

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        # EXACT mirror of the oracle tree: CAST(SUM AS DOUBLE) / COUNT
        df["avg_k"] = df["sum_k"].astype("float64") / df["n_events"]
        return df[["event_type", "n_events", "sum_k", "max_k", "avg_k"]]

    return agg.map_batches(finalize, batch_format="pandas")


# ---------------------------------------------------------------------------
# §2.9 RANGE-frame window: trailing time-interval aggregate per key — the
# variable-width companion of the fixed ROWS frames (functions/window.py
# rolling_sum) and the fixed time BUCKETS (hourly_windows): every event's
# frame is [ts - 1h, ts] within its user, resolved by binary search
# against the user's sorted timestamps. One user-bucket shuffle; inside a
# bucket the work is one sort plus TWO searchsorted calls per USER
# SEGMENT (each vectorized over all that user's rows — the loop is over
# segments, never rows). SQL RANGE semantics: ts-peers share one frame
# (both bounds depend only on (user, ts)), so output is independent of
# tie order. Exact: value folds as int64 micros (functions/money.py).
# ---------------------------------------------------------------------------
@register(
    "trailing_hour_value",
    "WITH v AS (SELECT event_id, user_id, ts, "
    "CAST(FLOOR(value * 1000000 + 0.5) AS BIGINT) AS micros FROM events) "
    "SELECT event_id, user_id, "
    "CAST(SUM(micros) OVER w AS BIGINT) AS trailing_micros, "
    "CAST(COUNT(*) OVER w AS BIGINT) AS trailing_n "
    "FROM v WINDOW w AS (PARTITION BY user_id ORDER BY ts "
    "RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)",
)
def trailing_hour_value(sf_dir: str):
    from ..functions.hashing import bucket_column

    H = 3_600_000_000  # one hour in microseconds

    ds = read_table(sf_dir, "events",
                    columns=["event_id", "user_id", "ts", "value"])

    def prep(batch: pa.Table) -> pa.Table:
        return pa.table({
            "event_id": batch["event_id"],
            "user_id": batch["user_id"],
            "ts_us": pc.cast(batch["ts"], pa.int64()),
            "micros": to_cents(batch["value"], scale=1_000_000),
        })

    bucketed = (
        ds.map_batches(prep, batch_format="pyarrow", batch_size=65536)
        .map_batches(lambda t: bucket_column(t, "user_id", 64, "__ub"),
                     batch_format="pyarrow")
    )

    def frame_bucket(grp: pa.Table) -> pa.Table:
        df = grp.select(["event_id", "user_id", "ts_us", "micros"]) \
            .to_pandas().sort_values(["user_id", "ts_us"], kind="mergesort")
        ts = df["ts_us"].to_numpy()
        mv = df["micros"].to_numpy()
        uid = df["user_id"].to_numpy()
        out_sum = np.empty(len(df), dtype=np.int64)
        out_n = np.empty(len(df), dtype=np.int64)
        seg = np.flatnonzero(np.r_[True, uid[1:] != uid[:-1], True])
        for a, b in zip(seg[:-1], seg[1:]):
            t = ts[a:b]
            cum = np.r_[0, np.cumsum(mv[a:b])]
            lo = np.searchsorted(t, t - H, side="left")
            hi = np.searchsorted(t, t, side="right")
            out_sum[a:b] = cum[hi] - cum[lo]
            out_n[a:b] = hi - lo
        return pa.table({
            "event_id": pa.array(df["event_id"].to_numpy(), pa.int64()),
            "user_id": pa.array(uid, pa.int64()),
            "trailing_micros": pa.array(out_sum),
            "trailing_n": pa.array(out_n),
        })

    return bucketed.groupby("__ub").map_groups(
        frame_bucket, batch_format="pyarrow"
    )


# ---------------------------------------------------------------------------
# Time-series gap-fill resample: densify each user's hourly series over
# [min_hour, max_hour] — missing buckets get zero counts and a
# forward-filled last-observed value. The dense-grid mechanism is the
# inverse of aggregation-only time bucketing (hourly_windows: only
# observed buckets exist) and composes its exact int64 micros fold with
# a per-user-segment vectorized expansion (np.arange grid + searchsorted
# carry — loop over segments, never rows). Densification can EXPLODE on
# long-lived keys (a user spanning a year -> 8760 rows), so the span is
# guarded loudly per user rather than silently materialized.
# ---------------------------------------------------------------------------
@register(
    "hourly_gap_fill",
    "WITH agg AS (SELECT user_id, epoch_us(ts) // 3600000000 AS hour_bucket, "
    "COUNT(*) AS n, CAST(SUM(CAST(FLOOR(value * 1000000 + 0.5) AS BIGINT)) "
    "AS BIGINT) AS v FROM events GROUP BY user_id, hour_bucket), "
    "grid AS (SELECT user_id, unnest(generate_series(MIN(hour_bucket), "
    "MAX(hour_bucket))) AS hour_bucket FROM agg GROUP BY user_id) "
    "SELECT g.user_id, g.hour_bucket, "
    "CAST(COALESCE(a.n, 0) AS BIGINT) AS n_events, "
    "CAST(COALESCE(a.v, 0) AS BIGINT) AS value_micros, "
    "CAST(last_value(a.v IGNORE NULLS) OVER (PARTITION BY g.user_id "
    "ORDER BY g.hour_bucket) AS BIGINT) AS ffill_micros "
    "FROM grid g LEFT JOIN agg a USING (user_id, hour_bucket)",
)
def hourly_gap_fill(sf_dir: str, *, max_span_hours: int = 1_000_000):
    from ..functions.hashing import bucket_column

    ds = read_table(sf_dir, "events", columns=["user_id", "ts", "value"])

    def prep(batch: pa.Table) -> pd.DataFrame:
        us = pc.cast(batch["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        df = pd.DataFrame({
            "user_id": batch["user_id"].to_numpy(zero_copy_only=False),
            "hour_bucket": us // 3_600_000_000,
            "micros": to_cents(batch["value"], scale=1_000_000)
            .to_numpy(zero_copy_only=False),
        })
        # per-batch partial: the shuffle moves (user, hour) partials,
        # never raw events
        out = (
            df.groupby(["user_id", "hour_bucket"], sort=False)
            .agg(n=("micros", "size"), v=("micros", "sum")).reset_index()
        )
        for c in out.columns:
            out[c] = out[c].astype("int64")
        return out

    bucketed = (
        ds.map_batches(prep, batch_format="pyarrow", batch_size=65536)
        .map_batches(lambda t: bucket_column(t, "user_id", 64, "__ub"),
                     batch_format="pyarrow")
    )

    def fill_bucket(grp: pa.Table) -> pa.Table:
        df = (
            grp.select(["user_id", "hour_bucket", "n", "v"]).to_pandas()
            .groupby(["user_id", "hour_bucket"], sort=True)
            .agg(n=("n", "sum"), v=("v", "sum")).reset_index()
        )
        uid = df["user_id"].to_numpy()
        hb = df["hour_bucket"].to_numpy()
        n = df["n"].to_numpy()
        v = df["v"].to_numpy()
        seg = np.flatnonzero(np.r_[True, uid[1:] != uid[:-1], True])
        users, hours, out_n, out_v, out_f = [], [], [], [], []
        for a, b in zip(seg[:-1], seg[1:]):
            span = int(hb[b - 1] - hb[a]) + 1
            if span > max_span_hours:
                raise ValueError(
                    f"hourly_gap_fill: user {uid[a]} spans {span} hours > "
                    f"max_span_hours={max_span_hours}; densifying would "
                    "materialize that many rows per key — resample to a "
                    "coarser bucket or raise the guard deliberately"
                )
            grid = np.arange(hb[a], hb[b - 1] + 1)
            idx = (hb[a:b] - hb[a]).astype(np.int64)
            gn = np.zeros(span, dtype=np.int64)
            gv = np.zeros(span, dtype=np.int64)
            gn[idx], gv[idx] = n[a:b], v[a:b]
            # forward fill: last observed hour at-or-before each grid hour
            carry = np.searchsorted(hb[a:b], grid, side="right") - 1
            users.append(np.full(span, uid[a], dtype=np.int64))
            hours.append(grid)
            out_n.append(gn)
            out_v.append(gv)
            out_f.append(v[a:b][carry])
        if not users:
            return pa.table({"user_id": pa.array([], pa.int64()),
                             "hour_bucket": pa.array([], pa.int64()),
                             "n_events": pa.array([], pa.int64()),
                             "value_micros": pa.array([], pa.int64()),
                             "ffill_micros": pa.array([], pa.int64())})
        return pa.table({
            "user_id": pa.array(np.concatenate(users)),
            "hour_bucket": pa.array(np.concatenate(hours)),
            "n_events": pa.array(np.concatenate(out_n)),
            "value_micros": pa.array(np.concatenate(out_v)),
            "ffill_micros": pa.array(np.concatenate(out_f)),
        })

    return bucketed.groupby("__ub").map_groups(
        fill_bucket, batch_format="pyarrow"
    )
