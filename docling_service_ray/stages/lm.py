"""Bigram language-model training + per-document cross-entropy scoring —
the perplexity quality filter of CCNet-style training-data pipelines
(Wenzek et al., LREC 2020; the KenLM filtering recipe — public papers):
score every document by how surprising it is under a language model
trained on the corpus itself, then filter/stratify on that score.

Shape of the build (the repo's two-phase broadcast discipline):

- **train**: one distributed pass counts unigrams and adjacent-pair
  bigrams — per-batch ``value_counts`` partials, ONE key-keyed groupby
  sum, so the exchange moves vocabulary-sized count tables, never the
  token stream (same plan as ``distinct_token_count``).
- **score**: the count tables broadcast ONCE (``ray.put``), an actor
  pool maps batches; each actor rebuilds its lookup dicts once in
  ``__init__`` and scores vectorized (exploded pairs → ``Series.map`` →
  per-doc ordered float64 mean). Laplace smoothing:
  ``p(w2|w1) = (c(w1 w2)+1) / (c(w1)+V)``; unseen words/pairs get the
  uniform floor instead of -inf.

The broadcast side is vocabulary-sized, so it carries the same loud
guard as the dense-lookup join (`functions/joins.py` ``max_bytes``):
above ``max_vocab`` distinct keys training raises with the mitigation
(prune counts below a minimum frequency) instead of silently shipping
an unbounded object.

Deterministic: per-document pairs are scored in token order, and the
per-doc mean folds in that order — two runs on the same layout agree
bitwise (no RNG, no unordered float reduction across workers).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _doc_pairs(texts: pd.Series) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(row_pos, left_token, right_token) for all within-document
    adjacent token pairs, vectorized positionally (the `_bigram_series`
    pairing plan, kept row-aligned for per-doc scoring)."""
    s = texts.fillna("").str.strip()
    toks = s.str.split(r"\s+")
    # an empty row splits to [''] — zero its count and drop it from the
    # exploded token stream so positions stay row-aligned
    empty = s.to_numpy() == ""
    counts = np.where(empty,
                      0, toks.str.len().fillna(0).to_numpy()).astype(np.int64)
    if counts.sum() == 0:
        z = np.empty(0, dtype=np.int64)
        return z, z.astype(object), z.astype(object)
    tokens = toks[~empty].explode().to_numpy()
    pos = np.arange(counts.sum()) - np.repeat(np.cumsum(counts) - counts,
                                              counts)
    left_mask = pos < np.repeat(counts - 1, counts)
    row_of = np.repeat(np.arange(len(counts)), counts)[left_mask]
    left = tokens[left_mask]
    right = tokens[np.flatnonzero(left_mask) + 1]
    return row_of, left, right


def train_bigram_lm(ds, *, text_col: str = "text",
                    max_vocab: int = 2_000_000) -> dict:
    """One-pass distributed (unigram, bigram) count tables.

    Returns {"uni": {word: n}, "bi": {"w1 w2": n}, "v": |unigram vocab|}
    — the broadcast payload for :class:`BigramScore`. Raises loudly when
    either table exceeds ``max_vocab`` distinct keys (the dict is a
    driver/broadcast object; prune low-frequency counts upstream or
    raise the threshold deliberately).
    """
    def partials(batch: pd.DataFrame) -> pd.DataFrame:
        _, left, right = _doc_pairs(batch[text_col])
        # unigrams: every token (not just pair members) so one-token
        # docs still contribute vocabulary
        s = batch[text_col].fillna("").str.strip()
        s = s[s != ""]
        u = s.str.split(r"\s+").explode().value_counts()
        frames = [pd.DataFrame({"kind": 0, "key": u.index.astype(str),
                                "n": u.to_numpy().astype(np.int64)})]
        if len(left):
            b = pd.Series(
                pd.Series(left, dtype="object") + " "
                + pd.Series(right, dtype="object")).value_counts()
            frames.append(pd.DataFrame({"kind": 1,
                                        "key": b.index.astype(str),
                                        "n": b.to_numpy().astype(np.int64)}))
        return pd.concat(frames, ignore_index=True)

    from ..functions.agg import bucketed_group_agg

    # int-bucket fold on the hashed key, not Ray's sort-based
    # multi-column groupby — the string-key sort shuffle costs ~10x the
    # whole plan at this partial-table size (measured via ds.stats())
    counts = bucketed_group_agg(
        ds.map_batches(partials, batch_format="pandas"),
        ["key", "kind"], {"n": ("n", "sum")}, n_buckets=64,
    ).to_pandas()
    uni = counts[counts["kind"] == 0]
    bi = counts[counts["kind"] == 1]
    for name, tbl in (("unigram", uni), ("bigram", bi)):
        if len(tbl) > max_vocab:
            raise ValueError(
                f"train_bigram_lm: {len(tbl)} distinct {name} keys > "
                f"max_vocab={max_vocab}; the count table is a broadcast "
                "object — prune counts below a minimum frequency before "
                "broadcasting, or raise max_vocab deliberately"
            )
    return {
        "uni": dict(zip(uni["key"], uni["n"].astype(np.int64))),
        "bi": dict(zip(bi["key"], bi["n"].astype(np.int64))),
        "v": int(len(uni)),
    }


class BigramScore:
    """Actor-pool scoring stage: lookup dicts rebuilt once per actor from
    the broadcast model ref; batches scored vectorized."""

    def __init__(self, model_ref):
        import ray

        model = ray.get(model_ref) if not isinstance(model_ref, dict) \
            else model_ref
        self.uni = pd.Series(model["uni"], dtype="int64")
        self.bi = pd.Series(model["bi"], dtype="int64")
        self.v = model["v"]

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        row_of, left, right = _doc_pairs(batch["text"])
        n_docs = len(batch)
        n_pairs = np.bincount(row_of, minlength=n_docs).astype(np.int64)
        xent = np.zeros(n_docs, dtype=np.float64)
        if len(left):
            pair = pd.Series(left, dtype="object") + " " \
                + pd.Series(right, dtype="object")
            c_bi = pair.map(self.bi).fillna(0).to_numpy(dtype=np.float64)
            c_w1 = pd.Series(left, dtype="object").map(self.uni) \
                .fillna(0).to_numpy(dtype=np.float64)
            # Laplace: (c(w1 w2)+1) / (c(w1)+V); unseen w1 -> uniform 1/V
            logp = np.log2(c_bi + 1.0) - np.log2(c_w1 + self.v)
            sums = np.bincount(row_of, weights=-logp, minlength=n_docs)
            nz = n_pairs > 0
            xent[nz] = sums[nz] / n_pairs[nz]
        return pd.DataFrame({
            "doc_id": batch["doc_id"].to_numpy(),
            "n_pairs": n_pairs,
            "xent_bits": xent,
        })


def score_corpus(ds, model: dict, *, concurrency=(1, 8)):
    """Broadcast the trained model once and score every document."""
    import ray

    model_ref = ray.put(model)
    return ds.map_batches(
        BigramScore,
        fn_constructor_args=(model_ref,),
        batch_format="pandas",
        concurrency=concurrency,
    )
