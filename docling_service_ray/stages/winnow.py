"""Winnowing document fingerprints (rolling-hash k-grams + window minima).

The MOSS local fingerprinting algorithm (Schleimer, Wilkerson, Aiken,
"Winnowing: Local Algorithms for Document Fingerprinting", SIGMOD 2003 —
public paper): hash every character k-gram with a rolling polynomial
hash, slide a window of w consecutive k-gram hashes over the document,
and keep each window's MINIMUM (rightmost position on ties). The
selected hashes are the document's fingerprint set, with the paper's
guarantee: any substring shared by two documents of length at least
``w + k - 1`` contributes at least one IDENTICAL fingerprint to both —
so fingerprint intersection is a sound detector of verbatim overlap
(plagiarism / license-text / boilerplate mining), unlike whole-document
hashes (``fingerprints`` query) which only catch full-document equality.

Everything is numpy: char codepoints → avalanche mix → rolling
polynomial combine (the same kernel family as the MinHash shingler,
``stages/dedup.py``) → stride-tricks sliding-window minima (uint64-exact
— no float rolling path, values exceed 2^53) → unique selection. Density
is ~2/(w+1) fingerprints per character, so the exploded (doc_id, fp)
output is a small constant fraction of the corpus.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

_MERSENNE = (1 << 61) - 1
_COMBINE = np.uint64(0x9E3779B97F4A7C15)
_MIX = np.uint64(0xBF58476D1CE4E5B9)


def _char_hashes(text: str) -> np.ndarray:
    """Per-character 64-bit hashes: codepoints through one multiplicative
    avalanche round (raw codepoints are tiny and adjacent, which would
    make the polynomial combine degenerate)."""
    c = np.frombuffer(text.encode("utf-32-le"), dtype=np.uint32) \
        .astype(np.uint64)
    h = (c + np.uint64(1)) * _MIX
    h ^= h >> np.uint64(31)
    return h


def kgram_hashes(text: str, k: int) -> np.ndarray:
    """Rolling polynomial hash of every character k-gram (uint64,
    masked to 61 bits). len(text) - k + 1 values; empty if shorter."""
    h = _char_hashes(text)
    if len(h) < k:
        return np.empty(0, np.uint64)
    m = len(h) - k + 1
    acc = np.zeros(m, dtype=np.uint64)
    for i in range(k):
        acc = acc * _COMBINE + h[i: i + m]
    return acc & np.uint64(_MERSENNE)


def winnow_select(kh: np.ndarray, w: int) -> np.ndarray:
    """Winnowing selection: the minimum of every w-window of k-gram
    hashes; returns the SORTED UNIQUE selected hash VALUES (the
    positional tie rule only matters for position-carrying fingerprints;
    the value set is the same either way). Documents shorter than one
    full window keep their global minimum (the paper's boundary
    convention)."""
    if len(kh) == 0:
        return kh
    if len(kh) < w:
        return np.array([kh.min()], dtype=np.uint64)
    win = np.lib.stride_tricks.sliding_window_view(kh, w)
    return np.unique(win.min(axis=1))  # uint64-exact, no float path


def winnow_fingerprints(text: str, *, k: int = 5, w: int = 4) -> np.ndarray:
    """Sorted unique winnowing fingerprints of one document."""
    return winnow_select(kgram_hashes(text, k), w)


def fingerprint_batch(batch: pd.DataFrame, *, id_col: str = "doc_id",
                      text_col: str = "text", k: int = 5,
                      w: int = 4) -> pd.DataFrame:
    """Exploded (id, fp) rows per document; fp masked into int64."""
    ids, fps = [], []
    for i, t in zip(batch[id_col], batch[text_col]):
        f = winnow_fingerprints(str(t) if t is not None else "", k=k, w=w)
        if len(f):
            ids.append(np.full(len(f), i))
            fps.append(f.astype(np.int64))
    if not ids:
        return pd.DataFrame({id_col: pd.Series([], dtype="int64"),
                             "fp": pd.Series([], dtype="int64")})
    return pd.DataFrame({id_col: np.concatenate(ids),
                         "fp": np.concatenate(fps)})


def winnow_overlap_pairs(ds, *, id_col: str = "doc_id",
                         text_col: str = "text", k: int = 5, w: int = 4,
                         min_shared: int = 2, max_bucket: int = 2000,
                         n_buckets: int = 64):
    """Document pairs sharing >= ``min_shared`` winnowing fingerprints —
    verbatim-overlap mining. Plan shape is the LSH-banding plan
    (``stages/dedup.py candidate_pairs``): fingerprint-keyed groupby
    co-locates the posting list of each fingerprint, pairs are generated
    vectorized inside each posting (combinations over the posting, never
    across), stop-fingerprints whose posting exceeds ``max_bucket``
    (boilerplate shared by everything — the paper's stopword analog) are
    dropped LOUDLY via a counted column, and per-pair shared counts
    resolve with one final pair-keyed aggregation."""
    from ray.data.aggregate import Sum

    from ..functions.hashing import bucket_column

    fps = ds.map_batches(
        lambda b: fingerprint_batch(b, id_col=id_col, text_col=text_col,
                                    k=k, w=w),
        batch_format="pandas",
    )
    bucketed = fps.map_batches(
        lambda t: bucket_column(t, "fp", n_buckets, "__wb"),
        batch_format="pyarrow",
    )

    def pairs_bucket(grp: pa.Table) -> pa.Table:
        empty = pa.table({"a": pa.array([], pa.int64()),
                          "b": pa.array([], pa.int64()),
                          "n": pa.array([], pa.int64())})
        df = grp.drop_columns(["__wb"]).to_pandas()[["fp", id_col]]
        if len(df) == 0:
            return empty
        # posting-size gate FIRST (vectorized): singletons give no pairs,
        # stop-fingerprints (boilerplate everything shares) are dropped —
        # this is what bounds the pair fan-out at sum(posting^2) <=
        # max_bucket * kept_rows
        sizes = df.groupby("fp")[id_col].transform("size")
        over = sizes.to_numpy() > max_bucket
        if over.any():
            # no silent caps: record how much boilerplate the stop-
            # fingerprint gate dropped (visible in worker logs / ds.stats)
            import logging

            logging.getLogger(__name__).info(
                "winnow_overlap: dropped %d stop-fingerprints "
                "(posting > %d) covering %d rows in this bucket",
                df["fp"][over].nunique(), max_bucket, int(over.sum()),
            )
        df = df[(sizes.to_numpy() >= 2) & ~over]
        if len(df) == 0:
            return empty
        # all in-posting ordered pairs via one vectorized self-merge
        m = df.merge(df, on="fp", suffixes=("_a", "_b"))
        m = m[m[f"{id_col}_a"].to_numpy() < m[f"{id_col}_b"].to_numpy()]
        if len(m) == 0:
            return empty
        cnt = m.groupby([f"{id_col}_a", f"{id_col}_b"]).size()
        idx = cnt.index.to_frame(index=False)
        return pa.table({
            "a": pa.array(idx[f"{id_col}_a"].to_numpy(), pa.int64()),
            "b": pa.array(idx[f"{id_col}_b"].to_numpy(), pa.int64()),
            "n": pa.array(cnt.to_numpy(), pa.int64()),
        })

    partials = bucketed.groupby("__wb").map_groups(
        pairs_bucket, batch_format="pyarrow"
    )
    agg = partials.groupby(["a", "b"]).aggregate(
        Sum("n", alias_name="shared_fps"))
    return agg.filter(expr=f"shared_fps >= {int(min_shared)}")
