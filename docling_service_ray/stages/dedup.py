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

from ..functions.hashing import hash64, stable_seed

logger = logging.getLogger(__name__)

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


def exact_dedup_actions(ds, id_col: str = "doc_id", text_col: str = "text"):
    """Per-row action column ('kept' | 'deduplicated'), mirroring the
    migration script's action accounting (scripts/r2_migrate_xxhash.py:243,
    265,303)."""
    hashed = ds.map_batches(
        lambda b: add_md5_column(b, text_col)[[id_col, "content_hash"]],
        batch_format="pandas",
    )

    def mark(group: pd.DataFrame) -> pd.DataFrame:
        keep = group[id_col].min()
        return pd.DataFrame(
            {
                id_col: group[id_col],
                "action": np.where(group[id_col] == keep, "kept", "deduplicated"),
            }
        )

    return hashed.groupby("content_hash").map_groups(mark, batch_format="pandas")


# ---------------------------------------------------------------------------
# MinHash + LSH near-dup
# ---------------------------------------------------------------------------

_MERSENNE = (1 << 61) - 1


class MinHasher:
    """Vectorized minhash signatures over word n-gram shingles.

    Actor-pool stage: permutation coefficients are drawn once per actor
    from a fixed seed in ``__init__``.
    """

    def __init__(self, num_perm: int = 128, shingle_n: int = 3, seed: int = 42):
        rng = stable_seed("minhash", seed)
        self.a = rng.integers(1, _MERSENNE, size=num_perm, dtype=np.uint64)
        self.b = rng.integers(0, _MERSENNE, size=num_perm, dtype=np.uint64)
        self.num_perm = num_perm
        self.shingle_n = shingle_n

    def shingles(self, text: str) -> np.ndarray:
        toks = text.split()
        n = self.shingle_n
        if len(toks) < n:
            items = [" ".join(toks)] if toks else []
        else:
            items = [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]
        uniq = set(items)
        if not uniq:
            return np.zeros(0, dtype=np.uint64)
        return np.fromiter(
            (hash64(s) & 0x7FFFFFFFFFFFFFFF for s in uniq),
            dtype=np.uint64,
            count=len(uniq),
        )

    def signature(self, text: str) -> np.ndarray:
        sh = self.shingles(text)
        if sh.size == 0:
            return np.full(self.num_perm, _MERSENNE, dtype=np.uint64)
        # (num_perm, n_shingles) universal hashing, min per row
        v = (np.outer(self.a, sh) + self.b[:, None]) % _MERSENNE
        return v.min(axis=1)


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


def _bucket_pairs_fn(id_col: str, max_bucket: int):
    """Per-LSH-bucket candidate emission with a hot-bucket cap: a bucket of
    n ids yields C(n,2) pairs, so one degenerate bucket (e.g. thousands of
    near-empty texts sharing a band hash) would emit O(n^2) rows in one
    task. Buckets above ``max_bucket`` are SKIPPED AND LOGGED — no silent
    caps (the log line carries the bucket size so recall loss is visible).
    """

    def bucket_pairs(group: pd.DataFrame) -> pd.DataFrame:
        ids = sorted(set(group[id_col]))
        if len(ids) < 2:
            return pd.DataFrame({"a": [], "b": []}).astype("int64")
        if len(ids) > max_bucket:
            logger.warning(
                "near-dup LSH bucket skipped: %d ids > max_bucket=%d "
                "(C(n,2)=%d candidate pairs suppressed)",
                len(ids), max_bucket, len(ids) * (len(ids) - 1) // 2,
            )
            return pd.DataFrame({"a": [], "b": []}).astype("int64")
        a, b = zip(*itertools.combinations(ids, 2))
        return pd.DataFrame({"a": list(a), "b": list(b)})

    return bucket_pairs


_EMPTY_PAIRS = {
    "a": pa.array([], pa.int64()),
    "b": pa.array([], pa.int64()),
    "jaccard_pct": pa.array([], pa.int64()),
}


def verify_pairs_distributed(cand, text_ds, sim_fn, threshold: float, *,
                             id_col: str = "doc_id", text_col: str = "text",
                             n_buckets: int = 64):
    """Candidate (a, b) pairs -> verified (a, b, jaccard_pct), fully
    distributed (the 100 TB verify plan):

    1. candidates are pruned per batch (vectorized drop_duplicates) and
       materialized ONCE — the candidate set is tiny by LSH construction,
       and materializing stops the banding stage from re-executing per
       consumer;
    2. the corpus is semi-filtered to candidate ids with a broadcast
       ``is_in`` (the driver holds only the candidate-id int set, never
       text);
    3. shuffle A — rows keyed by doc id: each pair emits (id=a) and
       (id=b) need-rows, co-located with the candidate texts by ONE
       hash-bucket groupby; each bucket attaches text vectorized (merge);
    4. shuffle B — rows keyed by pair: one hash-bucket groupby on ``a``
       co-locates both sides of every pair; each bucket pivots
       (a, b, side, text) -> (a, b, text_a, text_b), drops global pair
       duplicates vectorized, and verifies in a batched loop — one task
       per bucket, never one dispatch per pair.

    Reference dedup-loop analog: scripts/r2_migrate_xxhash.py:256-308
    (scan -> hash -> resolve), re-expressed as two hash co-locations.
    """
    import ray.data as rd

    from ..functions.hashing import bucket_column
    from ..functions.joins import broadcast_anti_filter

    pairs = cand.map_batches(
        lambda df: df.drop_duplicates(["a", "b"]), batch_format="pandas"
    ).materialize()
    if pairs.count() == 0:
        return rd.from_arrow(pa.table(_EMPTY_PAIRS))

    id_batches = pairs.map_batches(
        lambda df: pd.DataFrame(
            {"id": pd.unique(pd.concat([df["a"], df["b"]]).astype("int64"))}
        ),
        batch_format="pandas",
    ).to_pandas()
    cand_ids = set(id_batches["id"].tolist())

    texts = text_ds.select_columns([id_col, text_col])
    needed = broadcast_anti_filter(texts, id_col, cand_ids, keep_matches=True)

    # aligned union schema: (id, a, b, text, side); sides split while still
    # Arrow in the bucket fns so null padding never upcasts int columns
    def pair_need_rows(df: pd.DataFrame) -> pa.Table:
        a = df["a"].to_numpy().astype(np.int64)
        b = df["b"].to_numpy().astype(np.int64)
        n = len(df)
        return pa.table(
            {
                "id": pa.array(np.concatenate([a, b])),
                "a": pa.array(np.concatenate([a, a])),
                "b": pa.array(np.concatenate([b, b])),
                "text": pa.nulls(2 * n, pa.string()),
                "side": pa.array(
                    np.concatenate(
                        [np.zeros(n, np.int8), np.ones(n, np.int8)]
                    )
                ),
            }
        )

    def text_rows(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table(
            {
                "id": pc_cast_int64(t[id_col]),
                "a": pa.nulls(n, pa.int64()),
                "b": pa.nulls(n, pa.int64()),
                "text": pc_cast_string(t[text_col]),
                "side": pa.array(np.full(n, 2, np.int8)),
            }
        )

    unioned = pairs.map_batches(pair_need_rows, batch_format="pandas").union(
        needed.map_batches(text_rows, batch_format="pyarrow")
    )
    by_id = unioned.map_batches(
        lambda t: bucket_column(t, "id", n_buckets, "__vb"),
        batch_format="pyarrow",
    )

    def attach_bucket(grp: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        tmask = pc.equal(grp["side"], 2)
        tdf = grp.filter(tmask).select(["id", "text"]).to_pandas()
        pdf = grp.filter(pc.invert(tmask)).select(
            ["id", "a", "b", "side"]
        ).to_pandas()
        m = pdf.merge(tdf, on="id", how="inner")
        return pa.Table.from_pandas(
            m[["a", "b", "side", "text"]], preserve_index=False
        )

    attached = by_id.groupby("__vb").map_groups(
        attach_bucket, batch_format="pyarrow"
    )
    by_pair = attached.map_batches(
        lambda t: bucket_column(t, "a", n_buckets, "__vb"),
        batch_format="pyarrow",
    )

    def verify_bucket(grp: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        amask = pc.equal(grp["side"], 0)
        ta = grp.filter(amask).select(["a", "b", "text"]).to_pandas()
        tb = grp.filter(pc.invert(amask)).select(["a", "b", "text"]).to_pandas()
        ta = ta.rename(columns={"text": "text_a"}).drop_duplicates(["a", "b"])
        tb = tb.rename(columns={"text": "text_b"}).drop_duplicates(["a", "b"])
        m = ta.merge(tb, on=["a", "b"], how="inner")
        out_a, out_b, out_j = [], [], []
        for a, b, x, y in zip(m["a"], m["b"], m["text_a"], m["text_b"]):
            j = sim_fn(str(x), str(y))
            if j >= threshold:
                out_a.append(int(a))
                out_b.append(int(b))
                out_j.append(int(j * 100))
        return pa.table(
            {
                "a": pa.array(out_a, pa.int64()),
                "b": pa.array(out_b, pa.int64()),
                "jaccard_pct": pa.array(out_j, pa.int64()),
            }
        )

    return by_pair.groupby("__vb").map_groups(
        verify_bucket, batch_format="pyarrow"
    )


def pc_cast_int64(col):
    import pyarrow.compute as pc

    return pc.cast(col, pa.int64())


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
):
    """Near-duplicate pairs via MinHash banding, verify included.

    shingle -> minhash -> (band, band_hash, id) explode -> groupby bucket
    -> candidate pairs (hot buckets capped+logged) -> vectorized global
    pair dedup -> bucketed join of pair-ids back to the text table ->
    batched exact word-3-gram Jaccard verify >= threshold.

    Fully distributed: the corpus text is never broadcast or collected;
    the driver holds only candidate ids. Returns a Dataset of
    (a, b, jaccard_pct:int) with a < b.
    """
    rows_per_band = num_perm // bands

    class BandEmitter:
        def __init__(self):
            self.mh = MinHasher(num_perm=num_perm)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            ids, band_ids, band_hashes = [], [], []
            for i, t in zip(batch[id_col], batch[text_col]):
                sig = self.mh.signature(str(t))
                for band in range(bands):
                    chunk = sig[band * rows_per_band : (band + 1) * rows_per_band]
                    h = hash64(",".join(map(str, chunk.tolist())))
                    ids.append(i)
                    band_ids.append(band)
                    band_hashes.append(h)
            return pd.DataFrame(
                {id_col: ids, "band": band_ids, "band_hash": band_hashes}
            )

    banded = ds.map_batches(
        BandEmitter, batch_format="pandas", concurrency=(2, 8)
    )
    cand = banded.groupby(["band", "band_hash"]).map_groups(
        _bucket_pairs_fn(id_col, max_bucket), batch_format="pandas"
    )
    return verify_pairs_distributed(
        cand, ds, jaccard_word_ngrams, threshold,
        id_col=id_col, text_col=text_col, n_buckets=n_buckets,
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


def simhash_pairs(ds, *, id_col: str = "doc_id", max_hamming: int = 3):
    """Near-dup pairs with hamming distance <= max_hamming.

    Banding: 4 x 16-bit bands — any pair within hamming 3 shares at least
    one exact band (pigeonhole). groupby band bucket -> verify popcount.
    Input must already carry a ``simhash`` int64 column (SimHasher stage).
    """

    def emit_bands(batch: pd.DataFrame) -> pd.DataFrame:
        # unsigned reinterpretation via Python-int masking (stable across
        # NumPy versions; uint64(negative) raises on NumPy >= 2.0)
        ids, bands, keys, sigs = [], [], [], []
        for i, s in zip(batch[id_col], batch["simhash"]):
            s = int(s)
            u = s & 0xFFFFFFFFFFFFFFFF
            for band in range(4):
                key = (u >> (band * 16)) & 0xFFFF
                ids.append(i)
                bands.append(band)
                keys.append(key)
                sigs.append(s)
        return pd.DataFrame(
            {id_col: ids, "band": bands, "key": keys, "simhash": sigs}
        )

    banded = ds.map_batches(emit_bands, batch_format="pandas")

    def bucket_verify(group: pd.DataFrame) -> pd.DataFrame:
        rows = sorted(
            set(zip((int(v) for v in group[id_col]), (int(v) for v in group["simhash"])))
        )
        out_a, out_b, out_h = [], [], []
        for (ia, sa), (ib, sb) in itertools.combinations(rows, 2):
            if ia == ib:
                continue
            d = ((sa ^ sb) & 0xFFFFFFFFFFFFFFFF).bit_count()
            if d <= max_hamming:
                out_a.append(min(ia, ib))
                out_b.append(max(ia, ib))
                out_h.append(d)
        return pd.DataFrame({"a": out_a, "b": out_b, "hamming": out_h}).astype("int64")

    pairs = banded.groupby(["band", "key"]).map_groups(
        bucket_verify, batch_format="pandas"
    )

    def first_only(group: pd.DataFrame) -> pd.DataFrame:
        return group.head(1)

    # a pair can surface from several bands — keep one representative
    return pairs.groupby(["a", "b"]).map_groups(first_only, batch_format="pandas")


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

    class CharBandEmitter:
        def __init__(self):
            rng = stable_seed("chargram", n)
            self.a = rng.integers(1, _MERSENNE, size=num_perm, dtype=np.uint64)
            self.b = rng.integers(0, _MERSENNE, size=num_perm, dtype=np.uint64)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            rows_per_band = num_perm // bands
            ids, band_ids, keys = [], [], []
            for i, t in zip(batch[id_col], batch[text_col]):
                grams = char_ngrams(str(t), n)
                if not grams:
                    continue
                gh = np.fromiter(
                    (hash64(g) & 0x7FFFFFFFFFFFFFFF for g in grams),
                    dtype=np.uint64,
                    count=len(grams),
                )
                sig = ((np.outer(self.a, gh) + self.b[:, None]) % _MERSENNE).min(axis=1)
                for band in range(bands):
                    chunk = sig[band * rows_per_band : (band + 1) * rows_per_band]
                    ids.append(i)
                    band_ids.append(band)
                    keys.append(hash64(",".join(map(str, chunk.tolist()))))
            return pd.DataFrame({id_col: ids, "band": band_ids, "band_hash": keys})

    banded = ds.map_batches(
        CharBandEmitter, batch_format="pandas", concurrency=(2, 8)
    )
    cand = banded.groupby(["band", "band_hash"]).map_groups(
        _bucket_pairs_fn(id_col, max_bucket), batch_format="pandas"
    )

    def char_jaccard(x: str, y: str) -> float:
        sa, sb = char_ngrams(x, n), char_ngrams(y, n)
        union = sa | sb
        return (len(sa & sb) / len(union)) if union else 1.0

    return verify_pairs_distributed(
        cand, ds, char_jaccard, threshold,
        id_col=id_col, text_col=text_col, n_buckets=n_buckets,
    )


# ---------------------------------------------------------------------------
# embedding-cosine near-dup
# ---------------------------------------------------------------------------


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
    ds, *, id_col: str = "vec_id", threshold: float = 0.95, planes: int = 16, dim: int = 64
):
    """Scale path: random-hyperplane (sign) LSH bucketing + in-bucket exact
    verify. Recall < 1 by construction (documented); candidates never leave
    their bucket so the shuffle moves one signature row per vector."""

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

    bucketed = ds.map_batches(bucketize, batch_format="pandas")

    def verify(group: pd.DataFrame) -> pd.DataFrame:
        if len(group) < 2:
            return pd.DataFrame({"a": [], "b": []}).astype("int64")
        ids = group[id_col].to_numpy()
        mat = np.stack(group["embedding"].to_numpy()).astype(np.float64)
        n = np.linalg.norm(mat, axis=1)
        n[n == 0] = 1.0
        matn = mat / n[:, None]
        sims = matn @ matn.T
        rows, cols = np.nonzero(np.triu(sims >= threshold, k=1))
        a = np.minimum(ids[rows], ids[cols])
        b = np.maximum(ids[rows], ids[cols])
        return pd.DataFrame({"a": a.astype("int64"), "b": b.astype("int64")})

    return bucketed.groupby("bucket").map_groups(verify, batch_format="pandas")


def embedding_neardup_lsh_stats(
    ds, *, id_col: str = "vec_id", threshold: float = 0.95,
    planes: int = 16, dim: int = 64
):
    """Sign-LSH bucketing summary: (bucket, n_vecs, n_dup_pairs) per
    occupied bucket. Same bucketing + in-bucket verify as
    :func:`embedding_neardup_lsh`, but the output is schema-stable and
    non-empty on duplicate-free corpora (the pair list alone collapses to a
    schemaless empty Dataset, which downstream consumers can't type)."""

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

    bucketed = ds.map_batches(bucketize, batch_format="pandas")

    def summarize(group: pd.DataFrame) -> pd.DataFrame:
        n = len(group)
        pairs = 0
        if n >= 2:
            mat = np.stack(group["embedding"].to_numpy()).astype(np.float64)
            nm = np.linalg.norm(mat, axis=1)
            nm[nm == 0] = 1.0
            sims = (mat / nm[:, None]) @ (mat / nm[:, None]).T
            pairs = int(np.triu(sims >= threshold, k=1).sum())
        return pd.DataFrame(
            {
                "bucket": [int(group["bucket"].iloc[0])],
                "n_vecs": [np.int64(n)],
                "n_dup_pairs": [np.int64(pairs)],
            }
        )

    return bucketed.groupby("bucket").map_groups(summarize, batch_format="pandas")
