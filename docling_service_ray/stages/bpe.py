"""Distributed BPE tokenizer training + encoding.

Byte-pair-encoding merge learning in the classic word-frequency
formulation (Sennrich et al. 2016, "Neural Machine Translation of Rare
Words with Subword Units" — public paper): the corpus collapses ONCE to a
``(word, count)`` table (one shuffle, vocabulary-sized — the Zipf trick
that makes BPE training corpus-size-independent), and every merge round
then runs over that small table only:

    round k:  pair-count partials (map-only, weighted by word count)
              → small (pair, count) groupby
              → per-block top-1 → driver picks the ONE global winner
              → winner broadcast → map-only re-merge of symbol sequences

Per round the driver receives O(n_blocks) candidate rows and broadcasts
O(1) state (the winning pair), so rounds stay cheap at any corpus size;
the all-to-all exchanges after the initial word count are vocabulary-
sized, never corpus-sized. The winner rule (max count, then
lexicographically smallest pair) is total, so the learned merge list is
deterministic and independent of block layout / parallelism.

Scale contract: the word table is distributed (never a driver dict); the
per-word symbol loop is O(vocab × rounds), not O(corpus). Real trainers
additionally update pair counts incrementally instead of recounting; the
recount here is one map-only pass over the vocabulary-sized table per
round, which is the simple/robust distributed trade documented in
SURVEY.md §2 (an incremental-delta variant would co-locate words by the
merged pair and push deltas, the same exchange shape).

Encoding applies the learned ranks greedily (lowest rank first — the
standard GPT-2-style algorithm) with a per-actor word→tokens memo, so the
Zipf head hits a dict lookup instead of the merge loop.

Reference analog: the reference service has no tokenizer trainer; this is
part of the beyond-reference training-data layer (brief: "token counting
(whitespace + a BPE-ish regex)" — this is the full trainer).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


_EOW = "</w>"  # end-of-word marker (standard BPE convention)


# ---------------------------------------------------------------------------
# word-frequency table
# ---------------------------------------------------------------------------

def word_count_table(ds, *, text_col: str = "text"):
    """Corpus → distributed ``(word, count)`` table: per-batch Counter
    partials (the exchange moves vocabulary, never the token stream),
    one word-keyed groupby sum."""
    from ray.data.aggregate import Sum

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        s = batch[text_col].fillna("").str.strip()
        s = s[s != ""]
        words = s.str.split(r"\s+").explode()
        vc = words.value_counts()
        return pd.DataFrame({"word": vc.index.astype(str), "n": vc.to_numpy()})

    parts = ds.map_batches(partial, batch_format="pandas")
    return parts.groupby("word").aggregate(Sum("n", alias_name="n"))


def _symbols(word: str) -> list:
    """Initial symbol sequence: characters, with the end-of-word marker
    fused onto the last character (Sennrich's variant — keeps word
    boundaries learnable without a standalone marker symbol)."""
    if not word:
        return []
    chars = list(word)
    chars[-1] = chars[-1] + _EOW
    return chars


# ---------------------------------------------------------------------------
# training rounds
# ---------------------------------------------------------------------------

def _pair_counts_partial(batch: pd.DataFrame) -> pd.DataFrame:
    """Weighted adjacent-pair counts for one block of the word table."""
    from collections import Counter

    counts: Counter = Counter()
    for syms, n in zip(batch["syms"], batch["n"]):
        if len(syms) < 2:
            continue
        n = int(n)
        # a pair repeated inside one word counts once per occurrence
        for a, b in zip(syms[:-1], syms[1:]):
            counts[(a, b)] += n
    if not counts:
        return pd.DataFrame({"a": pd.Series([], dtype=str),
                             "b": pd.Series([], dtype=str),
                             "cnt": pd.Series([], dtype="int64")})
    keys = list(counts.keys())
    return pd.DataFrame({
        "a": [k[0] for k in keys],
        "b": [k[1] for k in keys],
        "cnt": np.fromiter(counts.values(), dtype=np.int64, count=len(keys)),
    })


def _block_top1(batch: pd.DataFrame) -> pd.DataFrame:
    """Per-block winner under the total order (cnt desc, a asc, b asc)."""
    if len(batch) == 0:
        return batch
    best = batch.sort_values(["cnt", "a", "b"],
                             ascending=[False, True, True],
                             kind="mergesort").head(1)
    return best.reset_index(drop=True)


def _merge_batch(batch: pd.DataFrame, a: str, b: str) -> pd.DataFrame:
    """Replace every adjacent (a, b) in each symbol sequence with a+b."""
    ab = a + b
    out = []
    for syms in batch["syms"]:
        if len(syms) < 2:
            out.append(syms)
            continue
        merged = []
        i, n = 0, len(syms)
        while i < n:
            if i < n - 1 and syms[i] == a and syms[i + 1] == b:
                merged.append(ab)
                i += 2
            else:
                merged.append(syms[i])
                i += 1
        out.append(merged)
    res = batch.copy()
    res["syms"] = out
    return res


def _local_rounds(words_df: pd.DataFrame, n_merges: int,
                  min_count: int) -> list:
    """Merge rounds over a driver-local (word, n) table — the fast path
    when the vocabulary is small (one dict pass per round instead of two
    Dataset executions). Same total order as the distributed rounds, so
    both paths produce identical merge lists by construction."""
    from collections import Counter

    vocab: dict = {}
    for w, n in zip(words_df["word"].astype(str), words_df["n"]):
        syms = tuple(_symbols(w))
        vocab[syms] = vocab.get(syms, 0) + int(n)
    merges = []
    for rank in range(n_merges):
        pairs: Counter = Counter()
        for syms, n in vocab.items():
            for a, b in zip(syms[:-1], syms[1:]):
                pairs[(a, b)] += n
        if not pairs:
            break
        (a, b), cnt = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if cnt < min_count:
            break
        merges.append((rank, a, b, cnt))
        new_vocab: dict = {}
        for syms, n in vocab.items():
            if len(syms) < 2:
                new_vocab[syms] = new_vocab.get(syms, 0) + n
                continue
            out, i, ln = [], 0, len(syms)
            while i < ln:
                if i < ln - 1 and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            key = tuple(out)
            new_vocab[key] = new_vocab.get(key, 0) + n
        vocab = new_vocab
    return merges


def bpe_train(ds, *, text_col: str = "text", n_merges: int = 16,
              min_count: int = 2,
              small_vocab_threshold: int = 1 << 16) -> pa.Table:
    """Learn ``n_merges`` BPE merges over a corpus. Returns the merge
    table ``(rank, left, right, cnt)`` — rank 0 is the first merge.
    Stops early when no pair reaches ``min_count``.

    Two regimes behind one total order (identical output):
    - vocab ≤ ``small_vocab_threshold``: the (word, count) table — already
      vocabulary-sized, corpus-size-independent — collects to the driver
      and rounds run locally (a dict pass per round beats two Dataset
      executions per round by ~30× at small vocab; this is what every
      practical BPE trainer does, and the collect is bounded by the
      threshold, same guard discipline as MAX_EXACT_* elsewhere).
    - larger vocab: fully distributed rounds (pair-count partials →
      vocabulary-sized groupby → per-block top-1 → O(n_blocks) driver
      reduce → broadcast winner → map-only re-merge)."""
    from ray.data.aggregate import Sum

    words = word_count_table(ds, text_col=text_col)
    n_vocab = words.count()
    if n_vocab <= small_vocab_threshold:
        merges = _local_rounds(words.to_pandas(), n_merges, min_count)
        return pa.table({
            "rank": pa.array([m[0] for m in merges], pa.int64()),
            "left": pa.array([m[1] for m in merges], pa.string()),
            "right": pa.array([m[2] for m in merges], pa.string()),
            "cnt": pa.array([m[3] for m in merges], pa.int64()),
        })

    def to_syms(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "syms": [_symbols(w) for w in batch["word"].astype(str)],
            "n": batch["n"].astype("int64"),
        })

    table = words.map_batches(to_syms, batch_format="pandas").materialize()

    merges: list[tuple[int, str, str, int]] = []
    for rank in range(n_merges):
        pairs = table.map_batches(_pair_counts_partial, batch_format="pandas")
        agg = pairs.groupby(["a", "b"]).aggregate(Sum("cnt", alias_name="cnt"))
        # per-block top-1, then the driver reduces O(n_blocks) candidates
        cand = agg.map_batches(_block_top1, batch_format="pandas").to_pandas()
        if len(cand) == 0:
            break
        cand = cand.sort_values(["cnt", "a", "b"],
                                ascending=[False, True, True],
                                kind="mergesort")
        a, b, cnt = (str(cand.iloc[0]["a"]), str(cand.iloc[0]["b"]),
                     int(cand.iloc[0]["cnt"]))
        if cnt < min_count:
            break
        merges.append((rank, a, b, cnt))
        table = table.map_batches(
            lambda batch, a=a, b=b: _merge_batch(batch, a, b),
            batch_format="pandas",
        ).materialize()

    return pa.table({
        "rank": pa.array([m[0] for m in merges], pa.int64()),
        "left": pa.array([m[1] for m in merges], pa.string()),
        "right": pa.array([m[2] for m in merges], pa.string()),
        "cnt": pa.array([m[3] for m in merges], pa.int64()),
    })


# ---------------------------------------------------------------------------
# encoding with learned merges
# ---------------------------------------------------------------------------

def encode_word(word: str, rank_of: dict) -> list:
    """Greedy lowest-rank-first BPE encode of one word (GPT-2-style)."""
    syms = _symbols(word)
    while len(syms) >= 2:
        best_rank, best_i = None, -1
        for i in range(len(syms) - 1):
            r = rank_of.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        syms[best_i:best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


class BpeEncode:
    """Actor-pool encode stage: the merge table is built into a rank dict
    once per actor (``__init__``), each batch encodes via a Zipf-friendly
    word→tokens memo. Use as
    ``map_batches(BpeEncode, fn_constructor_args=(merges_ref,), ...)``
    with ``merges_ref = ray.put(merge_table)`` so the (small) model ships
    once per actor, never per batch."""

    def __init__(self, merges_ref, text_col: str = "text",
                 id_col: str = "doc_id"):
        import ray

        tbl = ray.get(merges_ref) if not isinstance(merges_ref, pa.Table) \
            else merges_ref
        self.rank_of = {
            (left, right): int(rank)
            for rank, left, right in zip(
                tbl["rank"].to_pylist(), tbl["left"].to_pylist(),
                tbl["right"].to_pylist())
        }
        self.text_col = text_col
        self.id_col = id_col
        self._memo: dict = {}
        self._memo_max = 1 << 18

    def _encode(self, word: str) -> list:
        toks = self._memo.get(word)
        if toks is None:
            toks = encode_word(word, self.rank_of)
            if len(self._memo) < self._memo_max:
                self._memo[word] = toks
        return toks

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        # Zipf-vectorized: encode each DISTINCT word in the batch once,
        # then the per-doc totals are a dict-map + groupby sum — the
        # merge loop runs O(unique words), not O(corpus words).
        texts = batch[self.text_col].fillna("").str.strip()
        words = texts.str.split().explode().dropna()
        n_words = words.groupby(level=0).size().reindex(
            batch.index, fill_value=0).to_numpy(dtype=np.int64)
        tok_len = {w: len(self._encode(w)) for w in pd.unique(words)} \
            if len(words) else {}
        n_tokens = (
            words.map(tok_len).groupby(level=0).sum()
            .reindex(batch.index, fill_value=0)
            .to_numpy(dtype=np.int64)
        ) if len(words) else np.zeros(len(batch), dtype=np.int64)
        return pd.DataFrame({
            self.id_col: batch[self.id_col].to_numpy(),
            "n_words": n_words,
            "n_bpe_tokens": n_tokens,
        })
