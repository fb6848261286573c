"""Text-analysis stages for training-data pipelines.

All hot paths are vectorized pandas/pyarrow string kernels; the only
per-row Python is hashing (hashlib has no batch API). Counting semantics
are defined to be expressible in ANSI SQL so DuckDB oracles can verify
them bit-exactly (integer outputs only — see functions/money.py for why).
"""

from __future__ import annotations

import hashlib
import re

import pandas as pd
import pyarrow as pa


def token_count_batch(batch: pd.DataFrame, text_col: str = "text") -> pd.DataFrame:
    """n_tokens = number of whitespace-separated tokens.

    Edges strip ALL whitespace (.str.strip()); the SQL mirror uses
    regexp_replace(text, '^\\s+|\\s+$', '', 'g') — NOT trim(), which
    strips spaces only and would drift on tab/newline-edged text.
    """
    s = batch[text_col].fillna("").str.strip()
    n = s.str.count(r"\s+") + 1
    n[s == ""] = 0
    batch = batch.copy()
    batch["n_tokens"] = n.astype("int64")
    return batch


# ASCII adaptation of the public GPT-2 pre-tokenizer pattern (the
# original uses \p{L}/\p{N} unicode classes and a trailing-space
# lookahead; stdlib re lacks \p and DuckDB's RE2 lacks lookahead, so
# both sides use THIS exact pattern — contractions, space-prefixed
# letter runs, digit runs, punctuation runs, whitespace runs).
BPE_ISH_PATTERN = (
    r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+|\s+"
)
_BPE_RE = re.compile(BPE_ISH_PATTERN)


def bpe_token_count_batch(batch: pd.DataFrame, text_col: str = "text") -> pd.DataFrame:
    """n_bpe_tokens = number of BPE-ish pre-tokenizer matches — the
    standard LLM token-budget estimator (one vectorized .str.count of a
    compiled pattern per batch)."""
    s = batch[text_col].fillna("")
    batch = batch.copy()
    batch["n_bpe_tokens"] = s.str.count(_BPE_RE).astype("int64")
    return batch


def char_class_batch(batch: pd.DataFrame, text_col: str = "text") -> pd.DataFrame:
    """ASCII char-class counts (quality-scoring raw features).

    SQL mirrors use length(text) - length(regexp_replace(text, cls, '', 'g')).
    """
    s = batch[text_col].fillna("")
    batch = batch.copy()
    batch["n_chars_m"] = s.str.len().astype("int64")
    batch["n_spaces"] = s.str.count(" ").astype("int64")
    batch["n_digits"] = s.str.count(r"[0-9]").astype("int64")
    batch["n_vowels"] = s.str.count(r"[aeiou]").astype("int64")
    return batch


_NORM_WS = re.compile(r"\s+")


def fingerprint_batch(batch: pd.DataFrame, text_col: str = "text") -> pd.DataFrame:
    """Document fingerprint: md5 of whitespace-collapsed lowercase text.

    SQL mirror: md5(regexp_replace(lower(text), '\\s+', ' ', 'g')).
    (Content-hash keying analog of reference app/main.py:716-718.)
    """
    s = batch[text_col].fillna("").str.lower().str.replace(_NORM_WS, " ", regex=True)
    batch = batch.copy()
    batch["fp"] = [hashlib.md5(t.encode("utf-8")).hexdigest() for t in s]
    return batch


_STOPWORDS = ("the", "and", "of", "to", "in")


def quality_score_batch(batch: pd.DataFrame, text_col: str = "text") -> pd.DataFrame:
    """Composite document quality score (training-data filtering feature),
    integer fixed-point so a SQL oracle can reproduce it bit-exactly.

    Components (all per mille, int64):
    - space_ratio_pm: spaces / chars (prose has ~150-200)
    - digit_ratio_pm: digits / chars (boilerplate/tables skew high)
    - stopword_pm: occurrences of 5 common English stopwords per token
    - len_score_pm: 1000 if 100 <= n_chars <= 20000 else 0 (the upload
      size-gate analog, reference app/main.py:1074-1087)

    quality_pm = (space_pm.clip(0,200)*2 + stopword_pm.clip(0,250)*2
                  + len_score_pm - digit_pm) floored at 0.
    """
    s = batch[text_col].fillna("")
    n_chars = s.str.len().astype("int64")
    denom = n_chars.where(n_chars > 0, 1)
    space_pm = (s.str.count(" ").astype("int64") * 1000) // denom
    digit_pm = (s.str.count(r"[0-9]").astype("int64") * 1000) // denom
    n_tokens = s.str.strip().str.count(r"\s+").astype("int64") + 1
    n_tokens[s.str.strip() == ""] = 0
    tok_denom = n_tokens.where(n_tokens > 0, 1)
    stop_hits = sum(
        s.str.count(rf"\b{w}\b").astype("int64") for w in _STOPWORDS
    )
    stopword_pm = (stop_hits * 1000) // tok_denom
    len_score_pm = ((n_chars >= 100) & (n_chars <= 20000)).astype("int64") * 1000
    quality_pm = (
        space_pm.clip(upper=200) * 2
        + stopword_pm.clip(upper=250) * 2
        + len_score_pm
        - digit_pm
    ).clip(lower=0)
    out = batch.copy()
    out["space_pm"] = space_pm
    out["digit_pm"] = digit_pm
    out["stopword_pm"] = stopword_pm
    out["quality_pm"] = quality_pm.astype("int64")
    return out


# --- Arrow-native variants (zero-copy hot path) -------------------------------
#
# The four map-only document-scoring kernels above are also provided as
# pyarrow.compute variants operating on Arrow tables directly, so the
# stage runs zero-copy from the object store with no per-batch pandas
# conversion. Semantics are IDENTICAL on the engine's contract: the SQL
# oracles are RE2 (DuckDB), and these kernels use RE2 too
# (pyarrow.compute), so if anything they hew closer to the oracle than
# the Python-re pandas forms (the two differ only on non-ASCII
# whitespace, outside the documented ASCII counting contract).
# Equivalence on edge inputs is pinned in tests/test_text_analysis.py.


def _filled(tbl: pa.Table, text_col: str) -> pa.ChunkedArray:
    import pyarrow.compute as pc

    return pc.fill_null(tbl[text_col], "")


def _token_count_arrow(s) -> pa.Array:
    """Whitespace token count of a filled string array (int64)."""
    import pyarrow.compute as pc

    t = pc.utf8_trim_whitespace(s)
    n = pc.add(pc.count_substring_regex(t, r"\s+"), 1)
    return pc.cast(pc.if_else(pc.equal(t, ""), 0, n), pa.int64())


def token_count_arrow(tbl: pa.Table, text_col: str = "text",
                      keep: tuple = ("doc_id",)) -> pa.Table:
    """Arrow-native :func:`token_count_batch` (emits key cols + n_tokens)."""
    cols = {k: tbl[k] for k in keep}
    cols["n_tokens"] = _token_count_arrow(_filled(tbl, text_col))
    return pa.table(cols)


def char_class_arrow(tbl: pa.Table, text_col: str = "text",
                     keep: tuple = ("doc_id",)) -> pa.Table:
    """Arrow-native :func:`char_class_batch`."""
    import pyarrow.compute as pc

    s = _filled(tbl, text_col)
    i64 = lambda a: pc.cast(a, pa.int64())  # noqa: E731
    cols = {k: tbl[k] for k in keep}
    cols["n_chars_m"] = i64(pc.utf8_length(s))
    cols["n_spaces"] = i64(pc.count_substring(s, " "))
    cols["n_digits"] = i64(pc.count_substring_regex(s, "[0-9]"))
    cols["n_vowels"] = i64(pc.count_substring_regex(s, "[aeiou]"))
    return pa.table(cols)


def fingerprint_arrow(tbl: pa.Table, text_col: str = "text",
                      keep: tuple = ("doc_id",)) -> pa.Table:
    """Arrow-native :func:`fingerprint_batch`: normalization (lower +
    whitespace collapse) runs as RE2 kernels; only the md5 itself is a
    Python loop (hashlib has no batch API)."""
    import pyarrow.compute as pc

    norm = pc.replace_substring_regex(
        pc.utf8_lower(_filled(tbl, text_col)), r"\s+", " "
    )
    fp = [hashlib.md5(t.encode("utf-8")).hexdigest()
          for t in norm.to_pylist()]
    cols = {k: tbl[k] for k in keep}
    cols["fp"] = pa.array(fp, pa.string())
    return pa.table(cols)


def quality_score_arrow(tbl: pa.Table, text_col: str = "text",
                        keep: tuple = ("doc_id",)) -> pa.Table:
    """Arrow-native :func:`quality_score_batch`: RE2 counting kernels +
    int64 numpy arithmetic (all components non-negative, so numpy floor
    division matches SQL // exactly)."""
    import numpy as np
    import pyarrow.compute as pc

    s = _filled(tbl, text_col)
    cnt = lambda pat: pc.count_substring_regex(s, pat).to_numpy(  # noqa: E731
        zero_copy_only=False).astype(np.int64)
    n_chars = pc.utf8_length(s).to_numpy(zero_copy_only=False).astype(np.int64)
    denom = np.maximum(n_chars, 1)
    space_pm = (pc.count_substring(s, " ").to_numpy(zero_copy_only=False)
                .astype(np.int64) * 1000) // denom
    digit_pm = (cnt("[0-9]") * 1000) // denom
    n_tokens = _token_count_arrow(s).to_numpy(zero_copy_only=False)
    stop_hits = sum(cnt(rf"\b{w}\b") for w in _STOPWORDS)
    stopword_pm = (stop_hits * 1000) // np.maximum(n_tokens, 1)
    len_score_pm = ((n_chars >= 100) & (n_chars <= 20000)).astype(np.int64) * 1000
    quality_pm = np.maximum(
        np.minimum(space_pm, 200) * 2 + np.minimum(stopword_pm, 250) * 2
        + len_score_pm - digit_pm,
        0,
    )
    cols = {k: tbl[k] for k in keep}
    cols.update(
        space_pm=pa.array(space_pm, pa.int64()),
        digit_pm=pa.array(digit_pm, pa.int64()),
        stopword_pm=pa.array(stopword_pm, pa.int64()),
        quality_pm=pa.array(quality_pm, pa.int64()),
    )
    return pa.table(cols)


# --- PII-style scrubbing (vectorized redaction) ------------------------------

# dialect-portable patterns (identical semantics in Python re and RE2, so
# the DuckDB oracle reproduces the transform byte-for-byte)
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
NUMRUN_RE = r"[0-9]{2,}"


def scrub_batch(batch: pd.DataFrame, text_col: str = "text") -> pd.DataFrame:
    """Redact email addresses and digit runs (the shape of a PII-scrub
    stage for training corpora): emails -> ``<EMAIL>``, digit runs of 2+
    -> ``<NUM>``, plus redaction counts per row. All pandas str kernels.
    SQL mirror: regexp_replace(...,'g') chain + length-delta counts.
    """
    s = batch[text_col].fillna("")
    n_emails = s.str.count(EMAIL_RE).astype("int64")
    no_email = s.str.replace(EMAIL_RE, "<EMAIL>", regex=True)
    n_nums = no_email.str.count(NUMRUN_RE).astype("int64")
    scrubbed = no_email.str.replace(NUMRUN_RE, "<NUM>", regex=True)
    out = batch.copy()
    out["scrubbed"] = scrubbed
    out["n_emails"] = n_emails
    out["n_numruns"] = n_nums
    return out


# --- language id (heuristic; stateful actor) --------------------------------

_LANG_PROFILES = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "that", "it", "for"},
    "fr": {"le", "la", "et", "de", "un", "une", "est", "que", "pour", "dans"},
    "es": {"el", "la", "y", "de", "un", "una", "es", "que", "por", "en"},
    "de": {"der", "die", "und", "das", "ein", "ist", "nicht", "mit", "für", "auf"},
    "zh": set(),  # no-stopword fallback handled by CJK codepoint ratio
}

_LANG_ORDER = ["en", "fr", "es", "de"]  # deterministic tie-break order


class LangId:
    """Stopword-profile + CJK-ratio language classifier.

    Actor-pool stage: profiles and regexes are compiled once per actor in
    ``__init__`` (converter-cache pattern ST1, reference
    ``app/main.py:155-197``), batches scored in ``__call__``.
    """

    def __init__(self):
        self.word_re = re.compile(r"[a-zA-Zäöüéèàç]+")
        self.cjk_re = re.compile(r"[一-鿿]")
        self.profiles = {k: v for k, v in _LANG_PROFILES.items() if v}

    def classify(self, text: str) -> str:
        if not text:
            return "unknown"
        if len(self.cjk_re.findall(text)) * 2 > len(text.split()):
            return "zh"
        words = [w.lower() for w in self.word_re.findall(text)]
        if not words:
            return "unknown"
        best_lang, best = "unknown", 0
        for lang in _LANG_ORDER:
            hits = sum(1 for w in words if w in self.profiles[lang])
            if hits > best:
                best_lang, best = lang, hits
        return best_lang

    def __call__(self, batch: pa.Table) -> pa.Table:
        preds = [self.classify(t) for t in batch["text"].to_pylist()]
        return batch.append_column("lang_pred", pa.array(preds, pa.string()))


# ---------------------------------------------------------------------------
# decontamination: word-n-gram overlap against a probe (benchmark) set
# ---------------------------------------------------------------------------
def doc_ngrams(ds, *, id_col: str = "doc_id", text_col: str = "text",
               n: int = 3, id_type: pa.DataType | None = None):
    """``(id, g)`` rows: the DISTINCT word n-grams of each document
    (whitespace tokens, space-joined) — the unit of train/test
    decontamination. Grams are deduped per document BEFORE the shuffle,
    so the exchange moves each document's gram set once."""
    from ..functions.arrow_util import arrow_schema_of

    if id_type is None:
        id_type = arrow_schema_of(ds).field(id_col).type

    def grams(df: pd.DataFrame) -> pa.Table:
        out_id, out_g = [], []
        for i, t in zip(df[id_col], df[text_col]):
            w = str(t).split()
            gs = sorted({" ".join(w[j:j + n]) for j in range(len(w) - n + 1)})
            out_id.extend([i] * len(gs))
            out_g.extend(gs)
        return pa.table({id_col: pa.array(out_id, id_type),
                         "g": pa.array(out_g, pa.string())})

    return ds.map_batches(grams, batch_format="pandas")


def ngram_contamination(docs, probe, *, id_col: str = "doc_id",
                        text_col: str = "text", n: int = 3,
                        n_buckets: int = 64):
    """Contaminated documents: ``(id, n_hits)`` where ``n_hits`` counts the
    distinct word n-grams a document shares with ANY probe text (the
    standard benchmark-decontamination check for training corpora).

    Scale shape: both sides explode to per-doc-deduped gram rows; overlap
    is a DISTRIBUTED bucketed semi-join on the gram string (probe sets —
    benchmark suites — are usually tiny, but nothing here collects them
    on the driver, so an arbitrarily large probe side works); hit counts
    come from one bucketed per-doc aggregation. The corpus text itself is
    read once and never re-shuffled."""
    from ..functions.agg import bucketed_group_agg
    from ..functions.joins import bucketed_semi_anti_join

    dg = doc_ngrams(docs, id_col=id_col, text_col=text_col, n=n)
    pg = doc_ngrams(probe, id_col=id_col, text_col=text_col, n=n)
    hits = bucketed_semi_anti_join(
        dg, pg.select_columns(["g"]), "g", keep_matches=True,
        n_buckets=n_buckets,
    )
    return bucketed_group_agg(hits, [id_col], {"n_hits": ("g", "count")},
                              n_buckets=n_buckets)
