"""Exact frequent-items ("heavy hitters") without shuffling the vocabulary.

``token_histogram`` (pipelines/training.py) shuffles the full (word,count)
vocabulary — correct, but at 10^12 tokens the vocab itself is huge. This
module is the scale path for "words with frequency >= N/phi_inv":

1. **Truncated per-batch summaries** (Misra-Gries-style): each batch
   reduces to at most ``capacity`` (word, est) rows by subtracting the
   (capacity+1)-th largest count and dropping <=0. Underestimate per batch
   is <= n_batch_tokens/(capacity+1), so summed over batches the total
   underestimate is <= N/(capacity+1) — any word with true count
   >= N/phi_inv is GUARANTEED to survive when capacity+1 >= 2*phi_inv
   (margin below uses 4x).
2. One groupby over summary rows (<= capacity per batch, not the vocab)
   plus a sentinel row per batch carrying the exact batch token total, so
   N is known without a second reduction.
3. **Exact recount**: the candidate set (provably <= ~phi_inv/0.75 words)
   broadcasts into a second pass that counts ONLY candidates exactly —
   final counts are exact, so the result matches a plain SQL
   ``HAVING cnt * phi_inv >= total``.

Reference analog: action counting A3 (`scripts/r2_migrate_xxhash.py:173-179`)
at corpus scale.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

# Summary rows namespace real tokens under a "w" prefix and the batch-total
# row under "N" — collision-proof by construction (a hostile document
# containing any literal sentinel string still lands in the "w" namespace).
TOTAL_SENTINEL = "N"
_WORD_PREFIX = "w"


def truncate_counts(vc: pd.Series, capacity: int) -> pd.Series:
    """Misra-Gries-style truncation of a value_counts Series: keep at most
    ``capacity`` entries, each an UNDERestimate by at most the dropped
    offset; total dropped mass <= n/(capacity+1) per invocation."""
    if len(vc) <= capacity:
        return vc
    vc = vc.sort_values(ascending=False, kind="mergesort")
    offset = int(vc.iloc[capacity])
    est = vc.iloc[:capacity] - offset
    return est[est > 0]


def summary_batch(texts: pd.Series, capacity: int) -> pd.DataFrame:
    """One batch of documents -> truncated summary rows + the sentinel row
    with the exact batch token total."""
    s = texts.fillna("").str.strip()
    s = s[s != ""]
    words = s.str.split(r"\s+").explode()
    n_tokens = int(len(words))
    vc = truncate_counts(words.value_counts(), capacity)
    out = pd.DataFrame(
        {"word": _WORD_PREFIX + vc.index.astype(str),
         "est": vc.to_numpy().astype("int64")}
    )
    total = pd.DataFrame({"word": [TOTAL_SENTINEL], "est": [n_tokens]})
    return pd.concat([out, total], ignore_index=True)


def select_candidates(summary: pd.DataFrame, phi_inv: int,
                      capacity: int) -> tuple[set, int]:
    """Merged summary (word, est) -> (candidate words, exact N).

    Keep words with est >= N/phi_inv - N/(capacity+1): completeness is
    guaranteed (underestimate bound), and the candidate count is bounded
    by N / (N/phi_inv - N/(capacity+1)) ~ phi_inv/(1 - phi_inv/(capacity+1)).
    """
    total = int(summary.loc[summary["word"] == TOTAL_SENTINEL, "est"].sum())
    floor = total / phi_inv - total / (capacity + 1)
    words = summary["word"]
    keep = summary[
        words.str.startswith(_WORD_PREFIX)
        & (summary["est"].to_numpy() >= np.floor(floor))
    ]
    # strip the namespace prefix back to the real tokens
    return set(keep["word"].str[len(_WORD_PREFIX):]), total


def recount_batch(texts: pd.Series, candidates: set) -> pd.DataFrame:
    """Exact candidate counts for one batch (plus nothing else)."""
    s = texts.fillna("").str.strip()
    s = s[s != ""]
    words = s.str.split(r"\s+").explode()
    hits = words[words.isin(candidates)]
    vc = hits.value_counts()
    return pd.DataFrame(
        {"word": vc.index.astype(str), "cnt": vc.to_numpy().astype("int64")}
    )


def key_summary_batch(keys: pd.Series, capacity: int) -> pd.DataFrame:
    """One batch of KEY VALUES (any dtype) -> truncated summary rows (keys
    stringified into the "w" namespace) + the sentinel row with the exact
    batch row count."""
    s = keys.dropna().astype(str)
    vc = truncate_counts(s.value_counts(), capacity)
    out = pd.DataFrame(
        {"word": _WORD_PREFIX + vc.index.astype(str),
         "est": vc.to_numpy().astype("int64")}
    )
    total = pd.DataFrame({"word": [TOTAL_SENTINEL], "est": [int(len(s))]})
    return pd.concat([out, total], ignore_index=True)


def hot_key_candidates(ds, key: str, *, phi_inv: int = 100,
                       capacity: int | None = None,
                       batch_size: int = 65536) -> list[str]:
    """ONE-pass hot-key candidates: every key with global frequency
    >= N/phi_inv is returned (guaranteed recall), along with bounded
    over-selection down to ~0.75x the threshold. Candidates come back
    STRINGIFIED (the summary namespace), hottest-estimate unordered.

    This is the right detection pass when the consumer is a SALTED PLAN
    (skew_salted_join / salted_partitioned_window / the stitch router):
    those plans produce identical output for any superset of the true
    hot set — salting only changes placement — so the exact recount
    pass :func:`detect_hot_keys` runs is unnecessary and its whole
    Dataset execution can be skipped."""
    from ray.data.aggregate import Sum

    if capacity is None:
        capacity = 4 * phi_inv
    if capacity < 2 * phi_inv:
        raise ValueError(
            f"capacity {capacity} < 2*phi_inv: recall guarantee void"
        )

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        return key_summary_batch(batch[key], capacity)

    merged = (
        ds.map_batches(partial, batch_format="pandas", batch_size=batch_size)
        .groupby("word")
        .aggregate(Sum("est", alias_name="est"))
        .to_pandas()  # sketch-cardinality (<= ~capacity rows)
    )
    candidates, _total = select_candidates(merged, phi_inv, capacity)
    return sorted(candidates)


def detect_hot_keys(ds, key: str, *, phi_inv: int = 100,
                    capacity: int | None = None,
                    batch_size: int = 65536) -> list:
    """EXACT hot keys of a Dataset column: values whose global frequency is
    >= N/phi_inv (N = non-null rows). The auto-detection pass the salted
    plans (functions/joins.py skew_salted_join, functions/window.py
    salted_partitioned_window) document as their ``hot_keys`` source.

    Two streaming passes, never holding the key domain:

    1. Misra-Gries summary per batch (capacity rows max) -> one small
       groupby -> candidate set with GUARANTEED recall (any key with true
       count >= N/phi_inv survives when capacity >= 2*phi_inv; default 4x);
    2. exact recount of candidates only (original dtype preserved), so the
       result is exact — over-selection in pass 1 self-corrects.

    Returns key VALUES in the column's dtype, hottest first (count desc,
    value asc). Driver holds <= ~phi_inv * 4/3 candidates, never the key
    domain.
    """
    import ray
    from ray.data.aggregate import Sum

    if capacity is None:
        capacity = 4 * phi_inv
    if capacity < 2 * phi_inv:
        raise ValueError(
            f"capacity {capacity} < 2*phi_inv: recall guarantee void"
        )

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        return key_summary_batch(batch[key], capacity)

    merged = (
        ds.map_batches(partial, batch_format="pandas", batch_size=batch_size)
        .groupby("word")
        .aggregate(Sum("est", alias_name="est"))
        .to_pandas()  # sketch-cardinality (<= ~capacity words + sentinel)
    )
    candidates, total = select_candidates(merged, phi_inv, capacity)
    if not candidates or total == 0:
        return []
    cand_ref = ray.put(candidates)

    def recount(batch: pd.DataFrame) -> pd.DataFrame:
        k = batch[key].dropna()
        hits = k[k.astype(str).isin(ray.get(cand_ref))]
        vc = hits.value_counts()
        return pd.DataFrame(
            {"k": vc.index, "cnt": vc.to_numpy().astype("int64")}
        )

    exact = (
        ds.map_batches(recount, batch_format="pandas", batch_size=batch_size)
        .groupby("k")
        .aggregate(Sum("cnt", alias_name="cnt"))
        .to_pandas()  # <= |candidates| rows
    )
    if exact.empty:
        return []
    keep = exact[exact["cnt"].to_numpy() * phi_inv >= total]
    keep = keep.sort_values(["cnt", "k"], ascending=[False, True])
    return keep["k"].tolist()
