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
- verification joins text back via a broadcast side only at test scale; at
  corpus scale the verify step is a bucketed self-join keyed by pair id
  (documented per function).
"""

from __future__ import annotations

import hashlib
import itertools

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.hashing import hash64, stable_seed

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


def minhash_lsh_pairs(
    ds,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perm: int = 128,
    bands: int = 32,  # r=4 rows/band -> LSH threshold ~(1/32)^(1/4)=0.42:
    threshold: float = 0.8,  # near-1 recall for verify thresholds >= 0.7
    verify_texts: dict | None = None,
):
    """Near-duplicate pairs via MinHash banding.

    shingle -> minhash -> (band, band_hash, id) explode -> groupby bucket ->
    candidate pairs -> exact word-3-gram Jaccard verify >= threshold.

    ``verify_texts``: broadcast {id: text} for the verify step. At corpus
    scale replace with a bucketed join of pair-ids back to the text table
    (same groupby key); the broadcast path is for test/small corpora.
    Returns a Dataset of (a, b, jaccard_pct:int) with a < b.
    """
    import ray

    rows_per_band = num_perm // bands
    texts_ref = ray.put(verify_texts) if verify_texts is not None else None

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

    banded = ds.map_batches(BandEmitter, batch_format="pandas", concurrency=2)

    def bucket_pairs(group: pd.DataFrame) -> pd.DataFrame:
        ids = sorted(set(group[id_col]))
        if len(ids) < 2:
            return pd.DataFrame({"a": [], "b": []}).astype("int64")
        a, b = zip(*itertools.combinations(ids, 2))
        return pd.DataFrame({"a": list(a), "b": list(b)})

    cand = banded.groupby(["band", "band_hash"]).map_groups(
        bucket_pairs, batch_format="pandas"
    )

    def verify(group: pd.DataFrame) -> pd.DataFrame:
        # one representative per (a, b) — groupby key IS the pair
        a = int(group["a"].iloc[0])
        b = int(group["b"].iloc[0])
        if texts_ref is None:
            return pd.DataFrame({"a": [a], "b": [b], "jaccard_pct": [-1]})
        texts = ray.get(texts_ref)
        j = jaccard_word_ngrams(str(texts.get(a, "")), str(texts.get(b, "")))
        if j >= threshold:
            return pd.DataFrame(
                {"a": [a], "b": [b], "jaccard_pct": [int(j * 100)]}
            )
        return pd.DataFrame({"a": [], "b": [], "jaccard_pct": []}).astype("int64")

    return cand.groupby(["a", "b"]).map_groups(verify, batch_format="pandas")


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
        # store as signed int64 (Arrow-friendly); reinterpret bits
        batch["simhash"] = [
            np.int64(np.uint64(self.simhash(str(t)))) for t in batch["text"]
        ]
        return batch


def simhash_pairs(ds, *, id_col: str = "doc_id", max_hamming: int = 3):
    """Near-dup pairs with hamming distance <= max_hamming.

    Banding: 4 x 16-bit bands — any pair within hamming 3 shares at least
    one exact band (pigeonhole). groupby band bucket -> verify popcount.
    Input must already carry a ``simhash`` int64 column (SimHasher stage).
    """

    def emit_bands(batch: pd.DataFrame) -> pd.DataFrame:
        ids, bands, keys, sigs = [], [], [], []
        for i, s in zip(batch[id_col], batch["simhash"]):
            u = np.uint64(np.int64(s))
            for band in range(4):
                key = int((u >> np.uint64(band * 16)) & np.uint64(0xFFFF))
                ids.append(i)
                bands.append(band)
                keys.append(key)
                sigs.append(int(np.int64(s)))
        return pd.DataFrame(
            {id_col: ids, "band": bands, "key": keys, "simhash": sigs}
        )

    banded = ds.map_batches(emit_bands, batch_format="pandas")

    def bucket_verify(group: pd.DataFrame) -> pd.DataFrame:
        rows = sorted(
            set(zip(group[id_col].astype(int), group["simhash"].astype(np.int64)))
        )
        out_a, out_b, out_h = [], [], []
        for (ia, sa), (ib, sb) in itertools.combinations(rows, 2):
            if ia == ib:
                continue
            d = int(bin(np.uint64(np.int64(sa)) ^ np.uint64(np.int64(sb))).count("1"))
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
    verify_texts: dict | None = None,
):
    """Char-n-gram Jaccard near-dup: minhash banding on char shingles for
    candidates, exact set Jaccard for the verdict (same broadcast caveat as
    minhash_lsh_pairs)."""
    import ray

    texts_ref = ray.put(verify_texts) if verify_texts is not None else None
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

    banded = ds.map_batches(CharBandEmitter, batch_format="pandas", concurrency=2)

    def bucket_pairs(group: pd.DataFrame) -> pd.DataFrame:
        ids = sorted(set(group[id_col]))
        if len(ids) < 2:
            return pd.DataFrame({"a": [], "b": []}).astype("int64")
        a, b = zip(*itertools.combinations(ids, 2))
        return pd.DataFrame({"a": list(a), "b": list(b)})

    cand = banded.groupby(["band", "band_hash"]).map_groups(
        bucket_pairs, batch_format="pandas"
    )

    def verify(group: pd.DataFrame) -> pd.DataFrame:
        a, b = int(group["a"].iloc[0]), int(group["b"].iloc[0])
        if texts_ref is None:
            return pd.DataFrame({"a": [a], "b": [b], "jaccard_pct": [-1]})
        texts = ray.get(texts_ref)
        sa, sb = char_ngrams(str(texts.get(a, "")), n), char_ngrams(str(texts.get(b, "")), n)
        union = sa | sb
        j = (len(sa & sb) / len(union)) if union else 1.0
        if j >= threshold:
            return pd.DataFrame({"a": [a], "b": [b], "jaccard_pct": [int(j * 100)]})
        return pd.DataFrame({"a": [], "b": [], "jaccard_pct": []}).astype("int64")

    return cand.groupby(["a", "b"]).map_groups(verify, batch_format="pandas")


# ---------------------------------------------------------------------------
# embedding-cosine near-dup
# ---------------------------------------------------------------------------


def embedding_neardup_pairs(ds, *, id_col: str = "vec_id", threshold: float = 0.95):
    """Exact all-pairs cosine near-dup (oracle-checkable).

    The full (small-side) matrix is broadcast ONCE via ray.put and each
    batch does one float64 matmul against it — O(N x batch) FLOPs,
    vectorized. For corpora where the matrix no longer fits a worker, use
    :func:`embedding_neardup_lsh` (the scale path).
    Returns (a, b) pairs with a < b and cosine >= threshold.
    """
    import ray

    ref_tbl = ds.select_columns([id_col, "embedding"]).to_pandas()
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
