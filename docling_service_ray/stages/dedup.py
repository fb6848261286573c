"""Deduplication family: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine.

Design rules (100 TB discipline):

- exact dedup is a hash-partitioned ``groupby(content_hash)`` + per-group
  first-wins — never a driver-side dict (the reference's migration script
  accumulates ``hash_to_new_key`` on one process,
  ``scripts/r2_migrate_xxhash.py:171``; that is the anti-pattern ST4);
- near-dup candidate generation is shuffle-by-bucket: signatures are
  computed vectorized per batch, exploded to (band, band_hash, id) rows,
  and co-located by a single ``groupby`` — candidate pairs never leave
  their bucket;
- verification joins text back through BUCKETED hash joins of the (small)
  candidate-pair set against the text table — the corpus is never
  broadcast, never driver-materialized, and no per-pair Python dispatch
  occurs (pairs are deduped vectorized per bucket and verified in batched
  loops inside one task per block).
"""

from __future__ import annotations

import hashlib
import itertools
import logging

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.arrow_util import table_from_pandas

from ..functions.hashing import hash64, stable_seed

logger = logging.getLogger(__name__)


def _id_arrow_type(ds, id_col: str) -> pa.DataType:
    """Resolve and validate the id column's Arrow type.

    The dedup chain is dtype-preserving for integer and string ids (the
    two shapes the sources produce: parquet int64 doc_id, and
    ``read_text_documents``-style path-string ids). Anything else fails
    HERE, at the API boundary, with a clear message — not deep inside a
    shuffle task."""
    from ..functions.arrow_util import arrow_schema_of

    if ds.schema() is None:
        # fully-empty datasets arrive schema-less (Ray drops the schema
        # with the last row); the output is empty either way, so the id
        # type is moot — default to int64
        return pa.int64()
    typ = arrow_schema_of(ds).field(id_col).type
    if pa.types.is_integer(typ):
        return pa.int64()
    if pa.types.is_string(typ) or pa.types.is_large_string(typ):
        return pa.large_string()
    raise TypeError(
        f"dedup id column {id_col!r} must be integer or string, got {typ} "
        "(cast or re-key the dataset before deduplication)"
    )


def _ids_array(values, id_type: pa.DataType) -> pa.Array:
    """numpy/object/list id values -> Arrow array of the declared id type."""
    if isinstance(values, np.ndarray) and values.dtype == object:
        values = values.tolist()
    return pa.array(values, id_type)


_MINHASHERS: dict = {}


def _get_minhasher(num_perm: int, shingle_n: int):
    """Per-worker-process MinHasher memo (task-pool analog of actor
    ``__init__`` state, ST1 pattern)."""
    key = (num_perm, shingle_n)
    mh = _MINHASHERS.get(key)
    if mh is None:
        mh = _MINHASHERS[key] = MinHasher(num_perm=num_perm, shingle_n=shingle_n)
    return mh

# ---------------------------------------------------------------------------
# exact dedup (D1/D2 analog, reference app/main.py:716-729 +
# scripts/r2_migrate_xxhash.py:256-308)
# ---------------------------------------------------------------------------


def add_md5_column(batch: pd.DataFrame, text_col: str = "text") -> pd.DataFrame:
    batch = batch.copy()
    batch["content_hash"] = [
        hashlib.md5(str(t).encode("utf-8")).hexdigest() for t in batch[text_col]
    ]
    return batch


def exact_dedup_keep_min(ds, id_col: str = "doc_id", text_col: str = "text"):
    """First-wins exact dedup: smallest id per identical content survives."""
    from ray.data.aggregate import Min

    hashed = ds.map_batches(
        lambda b: add_md5_column(b, text_col)[[id_col, "content_hash"]],
        batch_format="pandas",
    )
    out = hashed.groupby("content_hash").aggregate(Min(id_col, alias_name=id_col))
    return out.select_columns([id_col])


def exact_dedup_actions(ds, id_col: str = "doc_id", text_col: str = "text",
                        *, n_buckets: int = 64):
    """Per-row action column ('kept' | 'deduplicated'), mirroring the
    migration script's action accounting (scripts/r2_migrate_xxhash.py:243,
    265,303). One coarse hash-bucket groupby co-locates all rows of each
    content hash; canonical ids resolve with a single vectorized
    groupby-transform per bucket (a per-hash map_groups would pay one Ray
    dispatch per distinct content — O(corpus) dispatches). Dtype-preserving
    for integer and string ids (first-wins = min() either way)."""
    from ..functions.hashing import bucket_column

    id_type = _id_arrow_type(ds, id_col)
    hashed = ds.map_batches(
        lambda b: add_md5_column(b, text_col)[[id_col, "content_hash"]],
        batch_format="pandas",
    )
    bucketed = hashed.map_batches(
        lambda t: bucket_column(t, "content_hash", n_buckets, "__db"),
        batch_format="pyarrow",
    )

    def mark_bucket(grp: pa.Table) -> pa.Table:
        df = grp.drop_columns(["__db"]).to_pandas()
        keep = df.groupby("content_hash")[id_col].transform("min")
        return pa.table(
            {
                id_col: _ids_array(df[id_col].to_numpy(), id_type),
                "action": pa.array(
                    np.where(df[id_col] == keep, "kept", "deduplicated"),
                    pa.string(),
                ),
            }
        )

    return bucketed.groupby("__db").map_groups(
        mark_bucket, batch_format="pyarrow"
    )


def incremental_dedup(ds, seen, *, id_col: str = "doc_id",
                      text_col: str = "text",
                      seen_hash_col: str = "content_hash",
                      n_buckets: int = 64):
    """Cross-RUN exact dedup: per-row action ``'kept' | 'deduplicated'
    (within this run) | 'already_seen' (content a prior run stored)`` plus
    the ``content_hash`` column, so the caller can append the kept hashes
    to the manifest for the next run. This is the reference migrate job's
    three-way accounting (migrated / deduplicated / skip_already_migrated,
    ``scripts/r2_migrate_xxhash.py:243,265,303``) — but the prior-run
    "index" is a parquet hash manifest streamed in as a Dataset and
    co-located by the SAME content-hash bucketing as this run's rows (one
    shuffle total), never a driver-side dict and never an O(corpus)
    broadcast.

    ``seen`` is a Dataset with ``seen_hash_col`` (e.g.
    ``read_parquet(manifest_dir)``); pass None for a first run.
    Within-run duplicates resolve first (min id wins) and only the
    surviving row is checked against the manifest, so re-running the same
    input against its own output manifest marks every survivor
    ``already_seen`` — the idempotence a resumable 100 TB job needs."""
    import pyarrow.compute as pc

    from ..functions.hashing import bucket_column

    if seen is None:
        return exact_dedup_actions(ds, id_col, text_col, n_buckets=n_buckets)

    id_type = _id_arrow_type(ds, id_col)
    _SIDE = "__inc_side"
    _B = "__inc_bucket"

    def this_run(b: pd.DataFrame) -> pa.Table:
        h = add_md5_column(b, text_col)
        return pa.table({
            id_col: _ids_array(h[id_col].to_numpy(), id_type),
            "content_hash": pa.array(h["content_hash"], pa.string()),
            _SIDE: pa.array(np.zeros(len(h), np.int8)),
        })

    def seen_rows(t: pa.Table) -> pa.Table:
        uniq = t[seen_hash_col].combine_chunks().cast(pa.string()).unique()
        return pa.table({
            id_col: pa.nulls(len(uniq), id_type),
            "content_hash": uniq,
            _SIDE: pa.array(np.ones(len(uniq), np.int8)),
        })

    tagged = ds.map_batches(this_run, batch_format="pandas").union(
        seen.select_columns([seen_hash_col]).map_batches(
            seen_rows, batch_format="pyarrow")
    ).map_batches(
        lambda t: bucket_column(t, "content_hash", n_buckets, _B),
        batch_format="pyarrow",
    )

    def mark_bucket(grp: pa.Table) -> pa.Table:
        # split sides while still Arrow: side-1 rows carry a null id, and
        # pushing those through pandas would float-ify an int id column
        lmask = pc.equal(grp[_SIDE], 0)
        df = grp.filter(lmask).select([id_col, "content_hash"]).to_pandas()
        seen_set = set(
            grp.filter(pc.invert(lmask))["content_hash"].to_pylist())
        keep = df.groupby("content_hash")[id_col].transform("min")
        is_first = (df[id_col] == keep).to_numpy()
        in_seen = df["content_hash"].isin(seen_set).to_numpy()
        action = np.where(~is_first, "deduplicated",
                          np.where(in_seen, "already_seen", "kept"))
        return pa.table({
            id_col: _ids_array(df[id_col].to_numpy(), id_type),
            "content_hash": pa.array(df["content_hash"], pa.string()),
            "action": pa.array(action, pa.string()),
        })

    return tagged.groupby(_B).map_groups(mark_bucket, batch_format="pyarrow")


def keep_best_dedup(ds, *, id_col: str = "doc_id", text_col: str = "text",
                    prefix_chars: int = 16, n_buckets: int = 64):
    """Keep-BEST dedup: among documents sharing a normalized prefix
    fingerprint (lowercased, whitespace-collapsed first ``prefix_chars``
    chars — the CCNet-style cheap near-identity key), keep the member with
    the highest composite quality score; ties break to the smallest id.

    This is the curation counterpart of first-wins exact dedup
    (:func:`exact_dedup_keep_min`, reference
    ``scripts/r2_migrate_xxhash.py:256-308``): a re-crawled page whose
    boilerplate variant scores lower than the clean variant loses to it
    even when it arrived first. The winner rule (max ``quality_pm``, then
    min id) is total and deterministic, so output is independent of block
    layout and parallelism.

    Plan shape (one shuffle): map-only Arrow scoring + fingerprinting,
    coarse fingerprint-bucket groupby (same co-location trick as
    :func:`exact_dedup_actions` — never one dispatch per group), then a
    per-bucket vectorized sort + first-row-per-group. Only
    (id, fingerprint, score) rows move — never the text."""
    import pyarrow.compute as pc

    from ..functions.hashing import bucket_column
    from .text_analysis import quality_score_arrow

    id_type = _id_arrow_type(ds, id_col)

    def score_and_key(tbl: pa.Table) -> pa.Table:
        s = pc.fill_null(pc.cast(tbl[text_col], pa.string()), "")
        norm = pc.replace_substring_regex(pc.utf8_lower(s), r"\s+", " ")
        grp = pc.utf8_slice_codeunits(norm, 0, prefix_chars)
        keyed = tbl.append_column("__grp", grp)
        scored = quality_score_arrow(keyed, text_col=text_col,
                                     keep=(id_col, "__grp"))
        return scored.select([id_col, "__grp", "quality_pm"])

    scored = ds.map_batches(score_and_key, batch_format="pyarrow",
                            zero_copy_batch=True)
    bucketed = scored.map_batches(
        lambda t: bucket_column(t, "__grp", n_buckets, "__kb"),
        batch_format="pyarrow",
    )

    def best_per_group(grp: pa.Table) -> pa.Table:
        df = grp.drop_columns(["__kb"]).to_pandas()
        best = df.sort_values(
            ["__grp", "quality_pm", id_col],
            ascending=[True, False, True], kind="mergesort",
        ).drop_duplicates("__grp")
        return pa.table({
            id_col: _ids_array(best[id_col].to_numpy(), id_type),
            "quality_pm": pa.array(best["quality_pm"].to_numpy(), pa.int64()),
        })

    return bucketed.groupby("__kb").map_groups(
        best_per_group, batch_format="pyarrow"
    )


# ---------------------------------------------------------------------------
# MinHash + LSH near-dup
# ---------------------------------------------------------------------------

_MERSENNE = (1 << 61) - 1
_COMBINE = np.uint64(0x9E3779B97F4A7C15)  # odd golden-ratio multiplier

# token -> 61-bit hash memo. Natural-language token frequency is Zipfian,
# so a worker-process-level cache turns per-shingle cryptographic hashing
# into a dict lookup for almost every token. Plain Python ints (np scalar
# boxing is slower); bounded so adversarial vocab can't grow it unbounded.
_TOKEN_CACHE: dict = {}
_TOKEN_CACHE_MAX = 1 << 20


def _token_hashes(tokens: list) -> np.ndarray:
    out = np.empty(len(tokens), dtype=np.uint64)
    cache = _TOKEN_CACHE
    for i, t in enumerate(tokens):
        h = cache.get(t)
        if h is None:
            h = hash64(t) & 0x7FFFFFFFFFFFFFFF
            if len(cache) < _TOKEN_CACHE_MAX:
                cache[t] = h
        out[i] = h
    return out


def _window_combine(h: np.ndarray, n: int) -> np.ndarray:
    """Rolling n-window polynomial combine over a uint64 hash sequence —
    one vectorized pass per window offset (n is small), wraparound uint64
    arithmetic, masked to 61 bits for the universal-hash modulus."""
    if len(h) == 0:
        return h
    if len(h) < n:
        acc = np.zeros(1, dtype=np.uint64)
        for v in h:
            acc = acc * _COMBINE + v
        return acc & np.uint64(_MERSENNE)
    m = len(h) - n + 1
    acc = np.zeros(m, dtype=np.uint64)
    for k in range(n):
        acc = acc * _COMBINE + h[k : k + m]
    return acc & np.uint64(_MERSENNE)


def _mod_mersenne(x: np.ndarray) -> np.ndarray:
    """x mod (2^61 - 1) via shift-fold — no integer division (uint64 `%`
    is the hottest op in signature computation; the fold is ~5x faster).
    Input values are < 2^64, so one fold + one conditional subtract lands
    in [0, M)."""
    m = np.uint64(_MERSENNE)
    x = (x >> np.uint64(61)) + (x & m)
    return np.where(x >= m, x - m, x)


class MinHasher:
    """Vectorized minhash signatures over word n-gram shingles.

    All kernels are numpy: cached token hashes -> rolling-window shingle
    hashes -> (num_perm x shingles) universal hashing -> per-row min ->
    vectorized per-band hashes. Coefficients come from a fixed seed, so
    signatures are deterministic across processes and cluster sizes.
    """

    def __init__(self, num_perm: int = 128, shingle_n: int = 3, seed: int = 42):
        rng = stable_seed("minhash", seed)
        self.a = rng.integers(1, _MERSENNE, size=num_perm, dtype=np.uint64)
        self.b = rng.integers(0, _MERSENNE, size=num_perm, dtype=np.uint64)
        self.num_perm = num_perm
        self.shingle_n = shingle_n

    def shingles(self, text: str) -> np.ndarray:
        toks = text.split()
        if not toks:
            return np.zeros(0, dtype=np.uint64)
        return np.unique(_window_combine(_token_hashes(toks), self.shingle_n))

    def signature(self, text: str) -> np.ndarray:
        return self.signature_with_count(text)[0]

    def signature_with_count(self, text: str) -> tuple:
        """(signature, shingle-set size) in one pass — the size feeds the
        candidate-stage Jaccard upper-bound prune."""
        sh = self.shingles(text)
        if sh.size == 0:
            return np.full(self.num_perm, _MERSENNE, dtype=np.uint64), 0
        # (num_perm, n_shingles) universal hashing, min per row
        v = _mod_mersenne(np.outer(self.a, sh) + self.b[:, None])
        return v.min(axis=1), int(sh.size)

    def band_hashes(self, sig: np.ndarray, bands: int) -> np.ndarray:
        """One uint64 hash per band (vectorized across bands)."""
        r = len(sig) // bands
        m = sig[: bands * r].reshape(bands, r)
        acc = np.zeros(bands, dtype=np.uint64)
        for k in range(r):
            acc = acc * _COMBINE + m[:, k]
        return acc


def word_ngram_set(text: str, n: int = 3) -> set:
    """Word n-gram shingle set (falls back to the whole text for short
    inputs, mirroring :func:`jaccard_word_ngrams`)."""
    t = text.split()
    return set(" ".join(t[i : i + n]) for i in range(max(0, len(t) - n + 1))) or (
        {" ".join(t)} if t else set()
    )


def set_jaccard(sa: set, sb: set) -> float:
    if not sa and not sb:
        return 1.0
    if not sa or not sb:
        return 0.0
    return len(sa & sb) / len(sa | sb)


def jaccard_word_ngrams(a: str, b: str, n: int = 3) -> float:
    ta, tb = a.split(), b.split()
    sa = set(" ".join(ta[i : i + n]) for i in range(max(0, len(ta) - n + 1))) or (
        {" ".join(ta)} if ta else set()
    )
    sb = set(" ".join(tb[i : i + n]) for i in range(max(0, len(tb) - n + 1))) or (
        {" ".join(tb)} if tb else set()
    )
    if not sa and not sb:
        return 1.0
    if not sa or not sb:
        return 0.0
    return len(sa & sb) / len(sa | sb)


def candidate_pairs(banded, *, id_col: str, max_bucket: int,
                    n_buckets: int = 64, id_type: pa.DataType = pa.int64(),
                    prune_ratio: float | None = None):
    """(band, band_hash, id) rows -> candidate (a, b) pairs.

    A naive ``groupby([band, band_hash]).map_groups`` pays one Ray
    dispatch per LSH bucket — O(corpus x bands) groups, nearly all
    singletons (measured: the dominant cost of the whole near-dup run).
    Instead ONE groupby on a coarse hash bucket of ``band_hash``
    co-locates every LSH bucket; inside each task a vectorized
    ``duplicated()`` prefilter drops all singleton buckets before the
    (rare) colliding groups are expanded with ``np.triu_indices``.

    Size prune: when the banding rows carry an ``n_units`` column
    (shingle-set size per doc) and ``prune_ratio`` is set, pairs with
    ``min(|A|,|B|)/max(|A|,|B|) < prune_ratio`` are dropped HERE —
    Jaccard is bounded above by that ratio, so pruning at
    ``verify_threshold x margin`` is lossless and spares the verify
    stage its text shuffle for those pairs (measured: ~45% of
    candidates on the benchmark corpus).

    Hot-bucket cap: a bucket of n ids yields C(n,2) pairs, so one
    degenerate bucket (e.g. thousands of near-empty texts sharing a band
    hash) would emit O(n^2) rows in one task. Buckets above
    ``max_bucket`` degrade to a STAR around the smallest id — n-1
    candidate pairs instead of C(n,2) — and are logged with their size.
    Members similar to the representative still reach exact verify (and
    a downstream first-wins drop keeps exactly the representative), so
    the cap bounds work without silently retaining a whole hot cluster;
    only duplicate SUB-clusters that share a band hash with the
    representative's cluster but not its content can be missed, and the
    log line makes that case visible.
    """
    from ..functions.hashing import bucket_column

    bucketed = banded.map_batches(
        lambda t: bucket_column(t, "band_hash", n_buckets, "__cb"),
        batch_format="pyarrow",
    )

    def pairs_bucket(grp: pa.Table) -> pa.Table:
        df = grp.drop_columns(["__cb"]).to_pandas()
        df = df[df.duplicated(["band", "band_hash"], keep=False)]
        do_prune = prune_ratio is not None and "n_units" in df.columns
        sizes = (
            df.drop_duplicates(subset=[id_col]).set_index(id_col)["n_units"]
            if do_prune
            else None
        )
        out_a, out_b = [], []
        for _, g in df.groupby(["band", "band_hash"], sort=False):
            ids = np.unique(g[id_col].to_numpy())
            if len(ids) < 2:
                continue
            if len(ids) > max_bucket:
                logger.warning(
                    "near-dup LSH bucket capped: %d ids > max_bucket=%d; "
                    "emitting %d star pairs around the smallest id instead "
                    "of C(n,2)=%d",
                    len(ids), max_bucket, len(ids) - 1,
                    len(ids) * (len(ids) - 1) // 2,
                )
                out_a.append(np.repeat(ids[:1], len(ids) - 1))
                out_b.append(ids[1:])
                continue
            ia, ib = np.triu_indices(len(ids), k=1)
            out_a.append(ids[ia])
            out_b.append(ids[ib])
        if not out_a:
            return pa.table(
                {"a": pa.array([], id_type), "b": pa.array([], id_type)}
            )
        a = np.concatenate(out_a)
        b = np.concatenate(out_b)
        if do_prune:
            sa = sizes.reindex(a).to_numpy(dtype=np.float64)
            sb = sizes.reindex(b).to_numpy(dtype=np.float64)
            hi = np.maximum(sa, sb)
            # two empty docs are trivially identical (J=1): never prune
            keep = (hi == 0) | (
                np.minimum(sa, sb) / np.where(hi == 0, 1.0, hi) >= prune_ratio
            )
            a, b = a[keep], b[keep]
        pairs = pd.DataFrame({"a": a, "b": b}).drop_duplicates()
        return pa.table(
            {
                "a": _ids_array(pairs["a"].to_numpy(), id_type),
                "b": _ids_array(pairs["b"].to_numpy(), id_type),
            }
        )

    return bucketed.groupby("__cb").map_groups(
        pairs_bucket, batch_format="pyarrow"
    )


def _empty_pairs(id_type: pa.DataType) -> pa.Table:
    return pa.table(
        {
            "a": pa.array([], id_type),
            "b": pa.array([], id_type),
            "jaccard_pct": pa.array([], pa.int64()),
        }
    )


#: Cap on the candidate-pair table the verify plan may collect to the
#: driver. 10M pairs of two ids is ~hundreds of MB in pandas — already
#: generous; a well-tuned LSH on any corpus size stays orders of
#: magnitude below it (candidates are a sliver of the corpus by
#: construction). Mirrors dense_lookup_array_ref's ``max_bytes``.
MAX_CANDIDATE_PAIRS = 10_000_000


def verify_pairs_distributed(cand, text_ds, sim_fn, threshold: float, *,
                             id_col: str = "doc_id", text_col: str = "text",
                             n_buckets: int = 64, prep_fn=None, score_fn=None,
                             id_type: pa.DataType | None = None,
                             max_pairs: int = MAX_CANDIDATE_PAIRS):
    """Candidate (a, b) pairs -> verified (a, b, jaccard_pct), fully
    distributed (the 100 TB verify plan):

    1. candidates are pruned per batch (vectorized drop_duplicates) and
       collected ONCE — the candidate set is tiny by LSH construction
       (cross-band duplicates measured at ~3%), and collecting stops the
       banding stage from re-executing per consumer;
    2. pair buckets are assigned up front (hash of ``a``), and the
       DISTINCT (bucket, doc-id) needs are collected into one compact
       broadcast map (sorted ids + bucket runs, numpy arrays). This is
       the same O(candidate-ids) driver contract the candidate-id
       semi-filter already requires — NOT an O(corpus) collect — and it
       replaces what used to be a whole extra sort shuffle keyed by doc
       id (the text-attach exchange), which on measured runs cost more
       than the verification itself;
    3. the corpus is semi-filtered to candidate ids with a broadcast
       ``is_in`` (the driver holds only the candidate-id set, never
       text), and each surviving text row fans out to its needing
       buckets vectorized via the broadcast map. A doc in k pairs ships
       at most min(k, n_buckets) text copies into the ONE shuffle
       (keyed by pair bucket) — text volume is bounded by bucket
       fan-out, not pair multiplicity;
    4. each verify task builds its id->text dict once and scores pairs
       in a batched loop — one task per bucket, never one dispatch per
       pair.

    Verification kernel: with ``prep_fn``/``score_fn`` given, each
    bucket computes ``prep_fn(text)`` ONCE PER DOCUMENT (memoized by id —
    a doc in k pairs would otherwise rebuild its shingle set k times) and
    scores pairs with ``score_fn(rep_a, rep_b)``; set-like reps also get
    a free size-ratio prune (|A∩B|/|A∪B| <= min/max sizes). Plain
    ``sim_fn(text_a, text_b)`` is the fallback.

    Reference dedup-loop analog: scripts/r2_migrate_xxhash.py:256-308
    (scan -> hash -> resolve), re-expressed as two hash co-locations.
    """
    import ray
    import ray.data as rd

    from ..functions.hashing import bucket_column
    from ..functions.joins import broadcast_anti_filter

    # callers whose text_ds lineage contains a shuffle MUST pass id_type:
    # Dataset.schema() on such a side executes the upstream once just for
    # the schema, doubling the expensive stage
    id_type = id_type or _id_arrow_type(text_ds, id_col)

    # ONE collect of the deduped candidate pairs. Size class: O(candidate
    # pairs) — the same driver contract this plan has always had (the
    # needs map and candidate-id set below are derived views of exactly
    # this table; LSH keeps candidates a sliver of the corpus). Holding
    # the table itself lets the bucket assignment and needs map be
    # computed locally instead of spending two more whole-pipeline
    # executions (materialize + a separate needs collect), and the
    # corpus text still never touches the driver.
    deduped_cand = cand.map_batches(
        lambda df: table_from_pandas(df.drop_duplicates(["a", "b"])),
        batch_format="pandas",
    )
    try:
        # ``limit=`` makes Ray count rows against the cap BEFORE building
        # the driver-side frame — a mis-tuned LSH threshold (adversarial
        # fan-out) fails loudly instead of OOMing the driver.
        pairs_df = deduped_cand.to_pandas(limit=max_pairs)
    except ValueError as e:
        raise ValueError(
            f"verify_pairs_distributed: candidate-pair table exceeds "
            f"max_pairs={max_pairs}. The verify plan's driver contract is "
            "O(candidate pairs); this fan-out means the LSH banding is "
            "mis-tuned for the corpus — raise the similarity threshold, "
            "use fewer bands / longer band width (fewer, more selective "
            "buckets), or pre-shard the corpus and dedup shards "
            "independently before a cross-shard pass."
        ) from e
    pairs_df = pairs_df.drop_duplicates(["a", "b"])
    if len(pairs_df) == 0:
        return rd.from_arrow(_empty_pairs(id_type))

    # pair buckets are assigned FIRST (hash of ``a``); each candidate
    # text then ships ONCE PER (bucket, id) — not once per pair side. A
    # doc appearing in k pairs puts at most min(k, n_buckets) copies
    # into the shuffle, and the pair rows themselves carry only ids.
    pairs_tbl = bucket_column(
        pa.table(
            {
                "a": _ids_array(pairs_df["a"].to_numpy(), id_type),
                "b": _ids_array(pairs_df["b"].to_numpy(), id_type),
            }
        ),
        "a", n_buckets, "__vb",
    )
    # feed the pair rows back distributed, pre-split so the shuffle sees
    # parallel input blocks rather than one giant one
    n_chunks = max(1, min(n_buckets, pairs_tbl.num_rows // 8192))
    step = -(-pairs_tbl.num_rows // n_chunks)
    pb_pairs = rd.from_arrow(
        [pairs_tbl.slice(i, step) for i in range(0, pairs_tbl.num_rows, step)]
    )

    # the distinct (id -> needing buckets) map, broadcast ONCE
    vb_np = pairs_tbl["__vb"].to_numpy()
    needs_df = pd.DataFrame(
        {
            "id": np.concatenate(
                [pairs_df["a"].to_numpy(), pairs_df["b"].to_numpy()]
            ),
            "vb": np.concatenate([vb_np, vb_np]).astype(np.int64),
        }
    ).drop_duplicates().sort_values("id", kind="mergesort")
    uids, starts, counts = np.unique(
        needs_df["id"].to_numpy(), return_index=True, return_counts=True
    )
    needs_ref = ray.put(
        (uids, starts.astype(np.int64), counts.astype(np.int64),
         needs_df["vb"].to_numpy().astype(np.int64))
    )
    cand_ids = set(uids.tolist())

    texts = text_ds.select_columns([id_col, text_col])
    needed = broadcast_anti_filter(texts, id_col, cand_ids, keep_matches=True)

    def expand_texts(t: pa.Table) -> pa.Table:
        """Fan each candidate text out to its needing pair buckets —
        vectorized hash lookup + run expansion, no per-row python."""
        import pyarrow.compute as pc

        b_uids, b_starts, b_counts, b_vbs = ray.get(needs_ref)
        ids = np.asarray(t[id_col])
        pos = pd.Index(b_uids).get_indexer(ids)
        ok = pos >= 0
        if not ok.all():  # defensive: semi-filter guarantees presence
            t = t.filter(pa.array(ok))
            pos = pos[ok]
        c = b_counts[pos]
        o = b_starts[pos]
        total = int(c.sum())
        ridx = np.repeat(np.arange(len(pos)), c)
        within = np.arange(total) - np.repeat(np.cumsum(c) - c, c)
        vb_out = b_vbs[np.repeat(o, c) + within]
        tt = t.take(ridx)
        n = tt.num_rows
        return pa.table(
            {
                "vb": pa.array(vb_out),
                "a": pa.nulls(n, id_type),
                "b": pa.nulls(n, id_type),
                "id": pc.cast(tt[id_col], id_type),
                "text": pc_cast_string(tt[text_col]),
                "side": pa.array(np.ones(n, np.int8)),
            }
        )

    placed = needed.map_batches(
        expand_texts, batch_format="pyarrow", zero_copy_batch=True
    )

    # shuffle A (keyed by doc id): texts meet their need-rows; output is
    # the ONE shuffle (keyed by pair bucket): id-only pair rows + the
    # bucket's fanned-out text rows co-locate; each task builds an
    # id->text dict once and verifies with memoized reps
    def tag_pairs(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table(
            {
                "vb": t["__vb"].cast(pa.int64()),
                "a": t["a"],
                "b": t["b"],
                "id": pa.nulls(n, id_type),
                "text": pa.nulls(n, pa.string()),
                "side": pa.array(np.zeros(n, np.int8)),
            }
        )

    u2 = pb_pairs.map_batches(tag_pairs, batch_format="pyarrow").union(placed)

    def verify_bucket(grp: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        pmask = pc.equal(grp["side"], 0)
        pdf = grp.filter(pmask).select(["a", "b"]).to_pandas().drop_duplicates()
        tdf = grp.filter(pc.invert(pmask)).select(["id", "text"]).to_pandas()
        texts_map = dict(zip(tdf["id"], tdf["text"]))
        p = prep_fn if (prep_fn is not None and score_fn is not None) else str
        s = score_fn if (prep_fn is not None and score_fn is not None) else (
            lambda x, y: sim_fn(str(x), str(y))
        )
        reps: dict = {}

        def rep_of(key):
            r = reps.get(key)
            if r is None:
                t = texts_map.get(key)
                r = reps[key] = None if t is None else p(str(t))
            return r

        out_a, out_b, out_j = [], [], []
        use_prune = prep_fn is not None and score_fn is not None
        for a, b in zip(pdf["a"], pdf["b"]):
            ra = rep_of(a)
            rb = rep_of(b)
            if ra is None or rb is None:  # text side missing (shouldn't
                continue                  # happen; semi-filter guarantees)
            if use_prune:
                try:  # size-ratio upper bound for set-like reps
                    la, lb = len(ra), len(rb)
                    if max(la, lb) and min(la, lb) / max(la, lb) < threshold:
                        continue
                except TypeError:
                    pass
            j = s(ra, rb)
            if j >= threshold:
                out_a.append(a)
                out_b.append(b)
                out_j.append(int(j * 100))
        return pa.table(
            {
                "a": _ids_array(out_a, id_type),
                "b": _ids_array(out_b, id_type),
                "jaccard_pct": pa.array(out_j, pa.int64()),
            }
        )

    return u2.groupby("vb").map_groups(
        verify_bucket, batch_format="pyarrow"
    )


def pc_cast_string(col):
    import pyarrow.compute as pc

    return pc.cast(col, pa.string())


def minhash_lsh_pairs(
    ds,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perm: int = 128,
    bands: int = 32,  # r=4 rows/band -> LSH threshold ~(1/32)^(1/4)=0.42:
    threshold: float = 0.8,  # near-1 recall for verify thresholds >= 0.7
    max_bucket: int = 2000,
    n_buckets: int = 64,
    id_type: pa.DataType | None = None,
):
    """Near-duplicate pairs via MinHash banding, verify included.

    shingle -> minhash -> (band, band_hash, id) explode -> groupby bucket
    -> candidate pairs (hot buckets capped+logged) -> vectorized global
    pair dedup -> bucketed join of pair-ids back to the text table ->
    batched exact word-3-gram Jaccard verify >= threshold.

    Fully distributed: the corpus text is never broadcast or collected;
    the driver holds only candidate ids. Returns a Dataset of
    (a, b, jaccard_pct:int) with a < b. Dtype-preserving for integer and
    string ids.
    """
    id_type = id_type or _id_arrow_type(ds, id_col)

    def band_emitter(batch: pd.DataFrame) -> pa.Table:
        # task pool (not actors): the hasher is memoized per worker
        # process, and tasks scale to every free CPU instead of an
        # actor-pool cap. Output is built as Arrow directly (no pandas
        # schema metadata entering the shuffle).
        mh = _get_minhasher(num_perm, 3)
        n = len(batch)
        bh = np.empty((n, bands), dtype=np.uint64)
        counts = np.empty(n, dtype=np.int64)
        for i, t in enumerate(batch[text_col]):
            sig, counts[i] = mh.signature_with_count(str(t))
            bh[i] = mh.band_hashes(sig, bands)
        return pa.table(
            {
                id_col: _ids_array(
                    np.repeat(batch[id_col].to_numpy(), bands), id_type
                ),
                "band": pa.array(np.tile(np.arange(bands, dtype=np.int64), n)),
                "band_hash": pa.array(bh.reshape(-1).view(np.int64)),
                "n_units": pa.array(np.repeat(counts, bands)),
            }
        )

    banded = ds.map_batches(band_emitter, batch_format="pandas")
    # candidate-stage size prune is lossless at verify time: J <= min/max
    # shingle counts; the 0.95 margin absorbs hash-vs-string set-size
    # discrepancies (none observed, but the bound must stay conservative)
    cand = candidate_pairs(
        banded, id_col=id_col, max_bucket=max_bucket, n_buckets=n_buckets,
        id_type=id_type, prune_ratio=threshold * 0.95,
    )
    return verify_pairs_distributed(
        cand, ds, jaccard_word_ngrams, threshold,
        id_col=id_col, text_col=text_col, n_buckets=n_buckets,
        prep_fn=word_ngram_set, score_fn=set_jaccard, id_type=id_type,
    )


def dedup_corpus(ds, *, id_col: str = "doc_id", text_col: str = "text",
                 threshold: float = 0.8, n_buckets: int = 32):
    """End-to-end corpus dedup: exact (content-hash first-wins) then
    near-dup removal (minhash candidates -> distributed exact-Jaccard
    verify; the larger id of each verified pair drops). Returns the
    surviving ids.

    Scale shape: exact-dedup survivors attach via a bucketed hash join
    (never a driver id set of the corpus), and the verified near-dup
    drop-set is removed with a DISTRIBUTED bucketed anti-join
    (``functions.setops.except_keys``) — nothing of unbounded cardinality
    is ever collected on the driver, even on a pathological corpus where
    almost every document has a near-duplicate."""
    import pyarrow.compute as pc

    from ..functions.joins import bucketed_hash_join
    from ..functions.setops import except_keys

    # resolve the id dtype ONCE from the raw input; every downstream
    # stage receives it explicitly — calling .schema() on the join/dedup
    # outputs would re-execute those shuffles just for schema inference
    id_type = _id_arrow_type(ds, id_col)
    from ..functions.arrow_util import arrow_schema_of

    text_schema = arrow_schema_of(ds.select_columns([id_col, text_col]))
    acts = exact_dedup_actions(ds, id_col, text_col, n_buckets=n_buckets)
    kept = acts.map_batches(
        lambda t: t.filter(pc.equal(t["action"], "kept")).select([id_col]),
        batch_format="pyarrow",
    )
    docs_kept = bucketed_hash_join(kept, ds.select_columns([id_col, text_col]),
                                   id_col, n_buckets=n_buckets,
                                   lschema=pa.schema([(id_col, id_type)]),
                                   rschema=text_schema)
    # materialize ONCE: three consumers follow (banding, the verify text
    # attach, the final keep set) and each would otherwise re-execute the
    # dedup + join shuffles above; the object store holds/spills the
    # deduped corpus instead
    docs_kept = docs_kept.materialize()
    pairs = minhash_lsh_pairs(
        docs_kept, id_col=id_col, text_col=text_col, threshold=threshold,
        n_buckets=n_buckets, id_type=id_type,
    )
    drop_ds = pairs.map_batches(
        lambda t: pa.table({id_col: t["b"]}), batch_format="pyarrow",
    )
    return except_keys(docs_kept.select_columns([id_col]), drop_ds, id_col,
                       n_buckets=n_buckets)


def neardup_clusters(ds, *, id_col: str = "doc_id", text_col: str = "text",
                     threshold: float = 0.8, n_buckets: int = 32):
    """Transitive near-dup CLUSTERS: verified minhash pairs -> connected
    components -> ``(node, cluster)`` with cluster = min member id.

    :func:`dedup_corpus` resolves pairs locally (drop the larger id of
    each pair), which can keep two documents that are both near-dups of a
    third but were never compared directly; this is the cluster-exact
    variant — one representative per component, the standard keep-one
    policy for training-data dedup. Only documents that belong to SOME
    verified pair appear in the output (singletons are implicit).

    Scale shape: the pair set is the only input to the component loop
    (O(pairs), tiny next to the corpus); see
    :mod:`..functions.graph` for the per-round shuffle cost."""
    from ..functions.graph import connected_components

    id_type = _id_arrow_type(ds, id_col)
    pairs = minhash_lsh_pairs(
        ds, id_col=id_col, text_col=text_col, threshold=threshold,
        id_type=id_type,
    )
    comp = connected_components(pairs, src="a", dst="b",
                                n_buckets=n_buckets, id_type=id_type)
    return comp.map_batches(
        lambda t: pa.table({"node": t["node"], "cluster": t["component"]}),
        batch_format="pyarrow",
    )


def passage_windows(ds, *, id_col: str = "doc_id", text_col: str = "text",
                    width: int = 10):
    """``(id, widx, passage)``: each document's disjoint ``width``-word
    windows (whitespace tokens, space-joined); trailing partial windows
    are dropped. The unit of exact repeated-span dedup."""

    def win(df: pd.DataFrame) -> pd.DataFrame:
        out_d, out_w, out_p = [], [], []
        for i, t in zip(df[id_col], df[text_col]):
            w = str(t).split()
            for j in range(len(w) // width):
                out_d.append(i)
                out_w.append(j)
                out_p.append(" ".join(w[j * width:(j + 1) * width]))
        return pd.DataFrame({id_col: out_d, "widx": out_w, "passage": out_p})

    return ds.map_batches(win, batch_format="pandas")


def passage_dedup(ds, *, id_col: str = "doc_id", text_col: str = "text",
                  width: int = 10, n_buckets: int = 64):
    """Exact repeated-passage dedup across the corpus (the C4/RefinedWeb
    "remove repeated spans, keep the first occurrence" policy, at
    disjoint ``width``-word granularity).

    One row per DISTINCT passage: ``(passage, n_copies, keep_doc,
    keep_widx)`` where the kept occurrence is the lexicographically first
    ``(doc, widx)``. Scale shape: docs explode to passage rows map-side,
    then ONE hash-bucketed exchange on the passage string and a per-bucket
    vectorized reduce — no driver-side state, no second shuffle."""
    from ..functions.hashing import bucket_column

    wins = passage_windows(ds, id_col=id_col, text_col=text_col, width=width)
    bucketed = wins.map_batches(
        lambda t: bucket_column(t, "passage", n_buckets, "__pb"),
        batch_format="pyarrow",
    )

    def reduce_bucket(grp: pa.Table) -> pa.Table:
        df = grp.drop_columns(["__pb"]).to_pandas()
        df = df.sort_values(["passage", id_col, "widx"], kind="mergesort")
        firsts = df.drop_duplicates("passage", keep="first")
        counts = df.groupby("passage", sort=False).size()
        return table_from_pandas(pd.DataFrame({
            "passage": firsts["passage"].to_numpy(),
            "n_copies": counts.loc[firsts["passage"]].to_numpy().astype("int64"),
            "keep_doc": firsts[id_col].to_numpy(),
            "keep_widx": firsts["widx"].to_numpy().astype("int64"),
        }))

    return bucketed.groupby("__pb").map_groups(
        reduce_bucket, batch_format="pyarrow"
    )


# ---------------------------------------------------------------------------
# SimHash near-dup
# ---------------------------------------------------------------------------


class SimHasher:
    """64-bit SimHash over word unigrams (vectorized bit-count update)."""

    def __init__(self):
        self.bits = np.arange(64, dtype=np.uint64)

    def simhash(self, text: str) -> int:
        words = text.split()
        if not words:
            return 0
        acc = np.zeros(64, dtype=np.int64)
        for w, cnt in pd.Series(words).value_counts().items():
            h = np.uint64(hash64(w) & 0xFFFFFFFFFFFFFFFF)
            bits = ((h >> self.bits) & np.uint64(1)).astype(np.int64)
            acc += (2 * bits - 1) * int(cnt)
        out = np.uint64(0)
        for i in range(64):
            if acc[i] > 0:
                out |= np.uint64(1) << np.uint64(i)
        return int(out)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        # store as signed int64 (Arrow-friendly); reinterpret bits via
        # Python-int masking — np.int64(np.uint64(h)) with bit 63 set
        # raises OverflowError on NumPy >= 2.0
        batch["simhash"] = pd.array(
            [
                (h - (1 << 64) if h >= (1 << 63) else h)
                for h in (self.simhash(str(t)) for t in batch["text"])
            ],
            dtype="int64",
        )
        return batch


def simhash_pairs(ds, *, id_col: str = "doc_id", max_hamming: int = 3,
                  n_buckets: int = 64):
    """Near-dup pairs with hamming distance <= max_hamming.

    Banding: 4 x 16-bit bands — any pair within hamming 3 shares at least
    one exact band (pigeonhole). Input must already carry a ``simhash``
    int64 column (SimHasher stage).

    Dispatch discipline (same as :func:`candidate_pairs`): LSH buckets are
    co-located by ONE coarse hash-bucket groupby and verified in-task with
    a singleton prefilter — not one Ray dispatch per (band, key) group;
    cross-band pair duplicates are dropped the same way (bucket on ``a``,
    vectorized drop_duplicates), not via a per-pair groupby.
    """
    from ..functions.hashing import bucket_column

    id_type = _id_arrow_type(ds, id_col)

    def emit_bands(batch: pd.DataFrame) -> pa.Table:
        # unsigned reinterpretation via Python-int masking (stable across
        # NumPy versions; uint64(negative) raises on NumPy >= 2.0)
        n = len(batch)
        u = np.array(
            [int(s) & 0xFFFFFFFFFFFFFFFF for s in batch["simhash"]],
            dtype=np.uint64,
        )
        keys = np.empty((n, 4), dtype=np.int64)
        for band in range(4):
            keys[:, band] = ((u >> np.uint64(band * 16)) & np.uint64(0xFFFF)).astype(
                np.int64
            )
        return pa.table(
            {
                id_col: _ids_array(
                    np.repeat(batch[id_col].to_numpy(), 4), id_type
                ),
                "band": pa.array(np.tile(np.arange(4, dtype=np.int64), n)),
                "key": pa.array(keys.reshape(-1)),
                "simhash": pa.array(
                    np.repeat(batch["simhash"].to_numpy().astype(np.int64), 4)
                ),
            }
        )

    banded = ds.map_batches(emit_bands, batch_format="pandas")
    bucketed = banded.map_batches(
        lambda t: bucket_column(t, "key", n_buckets, "__sb"),
        batch_format="pyarrow",
    )

    def verify_bucket(grp: pa.Table) -> pa.Table:
        df = grp.drop_columns(["__sb"]).to_pandas()
        df = df[df.duplicated(["band", "key"], keep=False)]
        out_a, out_b, out_h = [], [], []
        for _, g in df.groupby(["band", "key"], sort=False):
            rows = sorted(set(zip(g[id_col], (int(v) for v in g["simhash"]))))
            for (ia, sa), (ib, sb) in itertools.combinations(rows, 2):
                if ia == ib:
                    continue
                d = ((sa ^ sb) & 0xFFFFFFFFFFFFFFFF).bit_count()
                if d <= max_hamming:
                    out_a.append(min(ia, ib))
                    out_b.append(max(ia, ib))
                    out_h.append(d)
        return pa.table(
            {
                "a": _ids_array(out_a, id_type),
                "b": _ids_array(out_b, id_type),
                "hamming": pa.array(out_h, pa.int64()),
            }
        )

    pairs = bucketed.groupby("__sb").map_groups(
        verify_bucket, batch_format="pyarrow"
    )

    # a pair can surface from several bands (with the SAME hamming value,
    # so first-wins is deterministic): dedupe vectorized per pair bucket
    deduped_pre = pairs.map_batches(
        lambda df: table_from_pandas(df.drop_duplicates(["a", "b"])),
        batch_format="pandas",
    )
    pair_bucketed = deduped_pre.map_batches(
        lambda t: bucket_column(t, "a", n_buckets, "__pb"),
        batch_format="pyarrow",
    )

    def dedup_bucket(grp: pa.Table) -> pa.Table:
        df = grp.drop_columns(["__pb"]).to_pandas()
        return table_from_pandas(
            df.drop_duplicates(["a", "b"]))

    return pair_bucketed.groupby("__pb").map_groups(
        dedup_bucket, batch_format="pyarrow"
    )


# ---------------------------------------------------------------------------
# char n-gram Jaccard near-dup (MinHash-bucketed candidates, exact verify)
# ---------------------------------------------------------------------------


def char_ngrams(text: str, n: int = 5) -> set:
    t = " ".join(text.split())
    if len(t) < n:
        return {t} if t else set()
    return {t[i : i + n] for i in range(len(t) - n + 1)}


def ngram_jaccard_pairs(
    ds,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
    threshold: float = 0.7,
    max_bucket: int = 2000,
    n_buckets: int = 64,
):
    """Char-n-gram Jaccard near-dup: minhash banding on char shingles for
    candidates, exact set Jaccard for the verdict — same fully-distributed
    verify plan as :func:`minhash_lsh_pairs` (bucketed pair dedup +
    bucketed text join + batched verify; no corpus broadcast)."""
    num_perm, bands = 64, 16
    id_type = _id_arrow_type(ds, id_col)

    def char_band_emitter(batch: pd.DataFrame) -> pd.DataFrame:
        # candidate generation hashes BYTE n-gram windows with one
        # vectorized rolling combine per text (the exact verify below
        # still uses true character n-gram sets)
        rng = stable_seed("chargram", n)
        a = rng.integers(1, _MERSENNE, size=num_perm, dtype=np.uint64)
        b = rng.integers(0, _MERSENNE, size=num_perm, dtype=np.uint64)
        mh = _get_minhasher(num_perm, 3)  # reuse band_hashes kernel only
        ids_out, bh_rows, counts = [], [], []
        for i, t in zip(batch[id_col], batch[text_col]):
            norm = " ".join(str(t).split())
            raw = np.frombuffer(norm.encode("utf-8"), dtype=np.uint8)
            if len(raw) == 0:
                continue
            grams = np.unique(_window_combine(raw.astype(np.uint64), n))
            sig = _mod_mersenne(np.outer(a, grams) + b[:, None]).min(axis=1)
            ids_out.append(i)
            counts.append(len(grams))
            bh_rows.append(mh.band_hashes(sig, bands))
        if not ids_out:
            return pa.table(
                {
                    id_col: pa.array([], id_type),
                    "band": pa.array([], pa.int64()),
                    "band_hash": pa.array([], pa.int64()),
                    "n_units": pa.array([], pa.int64()),
                }
            )
        bh = np.stack(bh_rows)
        return pa.table(
            {
                id_col: _ids_array(
                    np.repeat(np.asarray(ids_out, dtype=object), bands), id_type
                ),
                "band": pa.array(
                    np.tile(np.arange(bands, dtype=np.int64), len(ids_out))
                ),
                "band_hash": pa.array(bh.reshape(-1).view(np.int64)),
                "n_units": pa.array(
                    np.repeat(np.asarray(counts, np.int64), bands)
                ),
            }
        )

    banded = ds.map_batches(char_band_emitter, batch_format="pandas")
    cand = candidate_pairs(
        banded, id_col=id_col, max_bucket=max_bucket, n_buckets=n_buckets,
        id_type=id_type, prune_ratio=threshold * 0.95,
    )

    def char_jaccard(x: str, y: str) -> float:
        sa, sb = char_ngrams(x, n), char_ngrams(y, n)
        union = sa | sb
        return (len(sa & sb) / len(union)) if union else 1.0

    def char_set_jaccard(sa: set, sb: set) -> float:
        union = sa | sb
        return (len(sa & sb) / len(union)) if union else 1.0

    return verify_pairs_distributed(
        cand, ds, char_jaccard, threshold,
        id_col=id_col, text_col=text_col, n_buckets=n_buckets,
        prep_fn=lambda t: char_ngrams(t, n), score_fn=char_set_jaccard,
    )


# ---------------------------------------------------------------------------
# embedding-cosine near-dup
# ---------------------------------------------------------------------------


# ---------------------------------------------------------------------------
# edit-distance (Levenshtein) near-dup over short prefixes
# ---------------------------------------------------------------------------

MAX_EXACT_EDIT_ROWS = 20_000  # all-pairs DP is O(N * batch * L^2)


def batched_levenshtein(a_mat: np.ndarray, a_len: np.ndarray,
                        b_mat: np.ndarray, b_len: np.ndarray) -> np.ndarray:
    """Levenshtein distance for MANY pairs at once: the classic DP, run in
    LOCKSTEP across the pair axis — every (i, j) cell update is one numpy
    vector op over all pairs, so the python-level loop is O(L^2) total,
    not O(L^2) per pair.

    ``a_mat``/``b_mat``: (P, L) zero-padded byte/codepoint matrices;
    ``a_len``/``b_len``: true lengths. Returns (P,) int32 distances.
    """
    n_pairs, max_len = a_mat.shape
    out = np.where(a_len == 0, b_len, 0).astype(np.int32)
    prev = np.tile(np.arange(max_len + 1, dtype=np.int32), (n_pairs, 1))
    done0 = a_len == 0
    for i in range(1, max_len + 1):
        cur = np.empty_like(prev)
        cur[:, 0] = i
        sub = prev[:, :-1] + (a_mat[:, i - 1 : i] != b_mat)
        dele = prev[:, 1:] + 1
        for j in range(1, max_len + 1):
            cur[:, j] = np.minimum(
                np.minimum(dele[:, j - 1], sub[:, j - 1]),
                cur[:, j - 1] + 1,
            )
        hit = a_len == i
        if hit.any():
            out[hit] = cur[hit, b_len[hit]]
        prev = cur
    out[done0] = b_len[done0]
    return out


def _prefix_bytes_matrix(texts, n_chars: int):
    """(matrix, lengths) of the UTF-8 BYTES of each text's first
    ``n_chars`` characters — byte-level to mirror DuckDB's byte-based
    ``levenshtein`` exactly."""
    encoded = [str(t)[:n_chars].encode("utf-8") for t in texts]
    max_len = max((len(e) for e in encoded), default=1) or 1
    mat = np.zeros((len(encoded), max_len), dtype=np.uint8)
    lens = np.empty(len(encoded), dtype=np.int64)
    for i, e in enumerate(encoded):
        mat[i, : len(e)] = np.frombuffer(e, np.uint8)
        lens[i] = len(e)
    return mat, lens


def edit_distance_pairs(ds, *, id_col: str = "doc_id",
                        text_col: str = "text", prefix_chars: int = 40,
                        max_dist: int = 5):
    """All (a < b) id pairs whose text-prefix byte edit distance is
    <= ``max_dist`` — the exact oracle-checkable member of the near-dup
    family (DuckDB ``levenshtein`` mirrors it byte-for-byte).

    Deliberately the EXACT all-pairs baseline, like the exact embedding
    ops: the (id, prefix) table is collected (guarded by
    ``MAX_EXACT_EDIT_ROWS``), broadcast once, and each batch runs the
    lockstep-vectorized DP against the full list. The scale path for
    unguarded corpora is LSH candidates (``ngram_jaccard_pairs`` /
    ``minhash_lsh_pairs``) + this DP as the verify kernel."""
    import ray

    ref_df = ds.select_columns([id_col, text_col]).to_pandas()
    if len(ref_df) > MAX_EXACT_EDIT_ROWS:
        raise ValueError(
            f"edit_distance_pairs is the exact all-pairs oracle path "
            f"({len(ref_df)} rows > cap {MAX_EXACT_EDIT_ROWS}); use LSH "
            "candidates + verify for corpora this large"
        )
    id_type = _id_arrow_type(ds, id_col)
    all_ids = ref_df[id_col].to_numpy()
    all_mat, all_len = _prefix_bytes_matrix(ref_df[text_col], prefix_chars)
    order = np.argsort(all_ids, kind="mergesort")
    ref = ray.put((all_ids[order], all_mat[order], all_len[order]))

    def pairs_batch(df: pd.DataFrame) -> pa.Table:
        ids_sorted, mat, lens = ray.get(ref)
        bids = df[id_col].to_numpy()
        bmat, blen = _prefix_bytes_matrix(df[text_col], prefix_chars)
        width = max(mat.shape[1], bmat.shape[1])
        if mat.shape[1] < width:
            mat = np.pad(mat, ((0, 0), (0, width - mat.shape[1])))
        if bmat.shape[1] < width:
            bmat = np.pad(bmat, ((0, 0), (0, width - bmat.shape[1])))
        # one STACKED DP per batch: every (row, larger-id partner) pair
        # becomes one lane of the lockstep DP — the L^2 python loop runs
        # once per batch, not once per row
        starts = np.searchsorted(ids_sorted, bids, side="right")
        counts = len(ids_sorted) - starts
        if counts.sum() == 0:
            return pa.table(
                {"a": _ids_array([], id_type), "b": _ids_array([], id_type),
                 "dist": pa.array([], pa.int64())}
            )
        row_idx = np.repeat(np.arange(len(bids)), counts)
        within = (np.arange(int(counts.sum()))
                  - np.repeat(np.cumsum(counts) - counts, counts))
        partner = np.repeat(starts, counts) + within
        # slab the lanes so DP state stays ~100 MB regardless of fan-out
        slab = 500_000
        out_a, out_b, out_d = [], [], []
        for lo in range(0, len(row_idx), slab):
            ri = row_idx[lo : lo + slab]
            pi = partner[lo : lo + slab]
            d = batched_levenshtein(bmat[ri], blen[ri], mat[pi], lens[pi])
            keep = d <= max_dist
            if keep.any():
                out_a.append(bids[ri[keep]])
                out_b.append(ids_sorted[pi[keep]])
                out_d.append(d[keep].astype(np.int64))
        if not out_a:
            return pa.table(
                {"a": _ids_array([], id_type), "b": _ids_array([], id_type),
                 "dist": pa.array([], pa.int64())}
            )
        return pa.table(
            {
                "a": _ids_array(np.concatenate(out_a), id_type),
                "b": _ids_array(np.concatenate(out_b), id_type),
                "dist": pa.array(np.concatenate(out_d)),
            }
        )

    return ds.select_columns([id_col, text_col]).map_batches(
        pairs_batch, batch_format="pandas", batch_size=256
    )


MAX_EXACT_EMBED_ROWS = 500_000  # ~128 MB of f64x64 — broadcast-matrix cap


def _guard_exact_embed(n: int, fn_name: str, scale_fn: str) -> None:
    """The exact embedding ops are deliberate all-pairs ORACLE baselines;
    they materialize the full matrix on the driver and broadcast it. This
    guard makes the documented limit enforceable instead of aspirational:
    past the cap they fail LOUDLY and name the scale path."""
    if n > MAX_EXACT_EMBED_ROWS:
        raise ValueError(
            f"{fn_name} is the exact all-pairs oracle path and materializes "
            f"the full embedding matrix ({n} rows > cap "
            f"{MAX_EXACT_EMBED_ROWS}); use {scale_fn} (LSH/IVF scale path) "
            f"for corpora this large"
        )


def embedding_neardup_pairs(ds, *, id_col: str = "vec_id", threshold: float = 0.95):
    """Exact all-pairs cosine near-dup (oracle-checkable).

    The full (small-side) matrix is broadcast ONCE via ray.put and each
    batch does one float64 matmul against it — O(N x batch) FLOPs,
    vectorized. Guarded: above MAX_EXACT_EMBED_ROWS it raises and points
    at :func:`embedding_neardup_lsh` (the scale path).
    Returns (a, b) pairs with a < b and cosine >= threshold.
    """
    import ray

    ref_tbl = ds.select_columns([id_col, "embedding"]).to_pandas()
    _guard_exact_embed(len(ref_tbl), "embedding_neardup_pairs",
                       "embedding_neardup_lsh")
    ids = ref_tbl[id_col].to_numpy()
    mat = np.stack(ref_tbl["embedding"].to_numpy()).astype(np.float64)
    norms = np.linalg.norm(mat, axis=1)
    norms[norms == 0] = 1.0
    matn = mat / norms[:, None]
    ref = ray.put((ids, matn))

    def find_pairs(batch: pd.DataFrame) -> pd.DataFrame:
        all_ids, all_mat = ray.get(ref)
        bids = batch[id_col].to_numpy()
        bmat = np.stack(batch["embedding"].to_numpy()).astype(np.float64)
        bn = np.linalg.norm(bmat, axis=1)
        bn[bn == 0] = 1.0
        sims = (bmat / bn[:, None]) @ all_mat.T
        rows, cols = np.nonzero(sims >= threshold)
        a = bids[rows]
        b = all_ids[cols]
        keep = a < b  # dedupe + drop self
        return pd.DataFrame({"a": a[keep].astype("int64"), "b": b[keep].astype("int64")})

    return ds.map_batches(find_pairs, batch_format="pandas", batch_size=1024)


def embedding_dup_counts(ds, *, id_col: str = "vec_id", threshold: float = 0.95):
    """Per-vector near-duplicate COUNT (cosine >= threshold, self excluded).

    Same broadcast-matmul shape as :func:`embedding_neardup_pairs` but the
    output is one row per vector (never empty), which keeps the oracle
    comparison meaningful on corpora with no actual duplicates.
    """
    import ray

    ref_tbl = ds.select_columns([id_col, "embedding"]).to_pandas()
    _guard_exact_embed(len(ref_tbl), "embedding_dup_counts",
                       "embedding_neardup_lsh_stats")
    ids = ref_tbl[id_col].to_numpy()
    mat = np.stack(ref_tbl["embedding"].to_numpy()).astype(np.float64)
    norms = np.linalg.norm(mat, axis=1)
    norms[norms == 0] = 1.0
    ref = ray.put((ids, mat / norms[:, None]))

    def count_dups(batch: pd.DataFrame) -> pd.DataFrame:
        all_ids, all_mat = ray.get(ref)
        bids = batch[id_col].to_numpy()
        bmat = np.stack(batch["embedding"].to_numpy()).astype(np.float64)
        bn = np.linalg.norm(bmat, axis=1)
        bn[bn == 0] = 1.0
        sims = (bmat / bn[:, None]) @ all_mat.T
        hits = (sims >= threshold).sum(axis=1)
        # subtract the self-match
        self_hit = np.isin(bids, all_ids).astype(np.int64)
        return pd.DataFrame(
            {id_col: bids.astype("int64"), "n_dups": (hits - self_hit).astype("int64")}
        )

    return ds.map_batches(count_dups, batch_format="pandas", batch_size=1024)


def embedding_neardup_lsh(
    ds, *, id_col: str = "vec_id", threshold: float = 0.95, planes: int = 16,
    dim: int = 64, n_buckets: int = 64, tables: int = 4
):
    """Scale path: MULTI-TABLE random-hyperplane (sign) LSH bucketing +
    in-bucket exact verify. ``tables`` independent hash tables of
    ``planes`` hyperplanes each; a pair is a candidate if it collides in
    ANY table, so recall = 1-(1-r)^tables where r is the single-table
    collision rate (measured on the planted-perturbation fixture:
    ~0.63 single-table -> ~0.98 at 4 tables). Cost: each vector ships
    ``tables`` (signature, embedding) rows into the shuffle — the
    standard LSH recall/bandwidth trade, stated here so callers can size
    it (tables=1 restores the old behavior).

    LSH buckets are co-located by a COARSE hash bucket (one Ray dispatch
    per coarse bucket, not per occupied LSH bucket), verified with one
    matmul per non-singleton LSH bucket inside the task, and cross-table
    duplicate pairs are dropped with the same bucketed vectorized dedup
    the simhash path uses."""
    from ..functions.hashing import bucket_column

    rng = stable_seed("signlsh", planes, dim)
    hyper = rng.standard_normal((tables, dim, planes))

    def bucketize(batch: pd.DataFrame) -> pd.DataFrame:
        mat = np.stack(batch["embedding"].to_numpy()).astype(np.float64)
        n = len(batch)
        ids_out, keys_out, emb_out = [], [], []
        for t in range(tables):
            signs = (mat @ hyper[t]) > 0
            keys = (signs * (1 << np.arange(planes))).sum(axis=1).astype("int64")
            # table id folded into the key -> tables never cross-collide
            ids_out.append(batch[id_col].to_numpy())
            keys_out.append(keys + (t << planes))
            emb_out.extend(batch["embedding"].tolist())
        return pd.DataFrame(
            {
                id_col: np.concatenate(ids_out),
                "bucket": np.concatenate(keys_out),
                "embedding": emb_out,
            }
        )

    bucketed = ds.map_batches(bucketize, batch_format="pandas").map_batches(
        lambda t: bucket_column(t, "bucket", n_buckets, "__eb"),
        batch_format="pyarrow",
    )

    def verify_coarse(grp: pa.Table) -> pa.Table:
        df = grp.drop_columns(["__eb"]).to_pandas()
        df = df[df.duplicated("bucket", keep=False)]
        out_a, out_b = [], []
        for _, group in df.groupby("bucket", sort=False):
            ids = group[id_col].to_numpy()
            mat = np.stack(group["embedding"].to_numpy()).astype(np.float64)
            n = np.linalg.norm(mat, axis=1)
            n[n == 0] = 1.0
            matn = mat / n[:, None]
            sims = matn @ matn.T
            rows, cols = np.nonzero(np.triu(sims >= threshold, k=1))
            out_a.append(np.minimum(ids[rows], ids[cols]))
            out_b.append(np.maximum(ids[rows], ids[cols]))
        a = np.concatenate(out_a) if out_a else np.array([], np.int64)
        b = np.concatenate(out_b) if out_b else np.array([], np.int64)
        pairs = pd.DataFrame(
            {"a": a.astype(np.int64), "b": b.astype(np.int64)}
        ).drop_duplicates()
        return pa.table(
            {
                "a": pa.array(pairs["a"].to_numpy()),
                "b": pa.array(pairs["b"].to_numpy()),
            }
        )

    pairs = bucketed.groupby("__eb").map_groups(
        verify_coarse, batch_format="pyarrow"
    )
    # cross-table duplicates: same pair found via different tables lands in
    # different coarse buckets -> one bucketed vectorized dedup on "a"
    pair_bucketed = pairs.map_batches(
        lambda t: bucket_column(t, "a", n_buckets, "__pb"),
        batch_format="pyarrow",
    )
    return pair_bucketed.groupby("__pb").map_groups(
        lambda df: table_from_pandas(
            df.drop(columns="__pb").drop_duplicates(["a", "b"])
        ),
        batch_format="pandas",
    )


def embedding_neardup_lsh_stats(
    ds, *, id_col: str = "vec_id", threshold: float = 0.95,
    planes: int = 16, dim: int = 64, n_buckets: int = 64
):
    """Sign-LSH bucketing summary: (bucket, n_vecs, n_dup_pairs) per
    occupied bucket. Same bucketing + in-bucket verify as
    :func:`embedding_neardup_lsh` (including the coarse-bucket dispatch
    discipline), but the output is schema-stable and non-empty on
    duplicate-free corpora (the pair list alone collapses to a schemaless
    empty Dataset, which downstream consumers can't type)."""
    from ..functions.hashing import bucket_column

    rng = stable_seed("signlsh", planes, dim)
    hyper = rng.standard_normal((dim, planes))

    def bucketize(batch: pd.DataFrame) -> pd.DataFrame:
        mat = np.stack(batch["embedding"].to_numpy()).astype(np.float64)
        signs = (mat @ hyper) > 0
        keys = (signs * (1 << np.arange(planes))).sum(axis=1).astype("int64")
        return pd.DataFrame(
            {
                id_col: batch[id_col].to_numpy(),
                "bucket": keys,
                "embedding": batch["embedding"],
            }
        )

    bucketed = ds.map_batches(bucketize, batch_format="pandas").map_batches(
        lambda t: bucket_column(t, "bucket", n_buckets, "__eb"),
        batch_format="pyarrow",
    )

    def summarize_coarse(grp: pa.Table) -> pa.Table:
        df = grp.drop_columns(["__eb"]).to_pandas()
        out_bucket, out_n, out_pairs = [], [], []
        for bucket, group in df.groupby("bucket", sort=False):
            n = len(group)
            pairs = 0
            if n >= 2:
                mat = np.stack(group["embedding"].to_numpy()).astype(np.float64)
                nm = np.linalg.norm(mat, axis=1)
                nm[nm == 0] = 1.0
                sims = (mat / nm[:, None]) @ (mat / nm[:, None]).T
                pairs = int(np.triu(sims >= threshold, k=1).sum())
            out_bucket.append(int(bucket))
            out_n.append(n)
            out_pairs.append(pairs)
        return pa.table(
            {
                "bucket": pa.array(out_bucket, pa.int64()),
                "n_vecs": pa.array(out_n, pa.int64()),
                "n_dup_pairs": pa.array(out_pairs, pa.int64()),
            }
        )

    return bucketed.groupby("__eb").map_groups(
        summarize_coarse, batch_format="pyarrow"
    )
