"""End-to-end training-data curation pipeline.

The composition the whole engine exists for — what a 100 TB pretraining
corpus actually goes through before tokenization, expressed as ONE lazy
Ray Data flow (the reference's closest analog is the checkpointed
migrate job, ``scripts/r2_migrate_xxhash.py:236-320``, which only
hashes + dedups; this adds the quality, near-dup, decontamination,
chunking and packing stages a modern data pipeline runs):

    documents
      │ quality filter        (map-only: fixed-point scoring, threshold)
      │ exact + near dedup    (hash groupby; minhash LSH -> verify -> anti-join)
      │ decontamination       (word-n-gram semi-join vs the probe/benchmark set)
      │ chunking              (map-only one-to-many expansion)
      │ packing               (bucketed first-fit-decreasing)
      ▼ packed sequences + per-pack stats

Scale shape: every stage is a Dataset transform — the only exchanges are
the dedup groupbys/joins and the pack bucketing; quality, contamination
gram expansion and chunking are map-only. Nothing of corpus cardinality
is ever collected on the driver. The surviving-id joins reuse one
bucketing key (the doc id) end-to-end.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

DEFAULT_QUALITY_MIN = 1000
CHUNK_CHARS = 600
CHUNK_STRIDE = 500
PACK_BUDGET = 2000


def quality_filter(ds, *, min_quality_pm: int = DEFAULT_QUALITY_MIN,
                   text_col: str = "text"):
    """Keep documents whose fixed-point quality score clears the bar
    (same scoring kernel as the ``quality_scores`` oracle query)."""
    from ..stages.text_analysis import quality_score_batch

    def filt(df: pd.DataFrame) -> pd.DataFrame:
        scores = quality_score_batch(df, text_col=text_col)
        return df.loc[
            (scores["quality_pm"] >= min_quality_pm).to_numpy()
        ].reset_index(drop=True)

    return ds.map_batches(filt, batch_format="pandas")


def chunk_docs(ds, *, id_col: str = "doc_id", text_col: str = "text",
               chunk_chars: int = CHUNK_CHARS, stride: int = CHUNK_STRIDE):
    """One-to-many overlapping fixed-size chunks (same boundary rule as
    the ``chunk_documents`` oracle query): start_k = k*stride while
    start < len, final chunk short rather than padded, empty docs emit
    nothing."""

    def chunk(df: pd.DataFrame) -> pd.DataFrame:
        ids, idxs, texts = [], [], []
        for i, t in zip(df[id_col], df[text_col]):
            t = str(t)
            for k, start in enumerate(range(0, len(t), stride)):
                ids.append(i)
                idxs.append(k)
                texts.append(t[start:start + chunk_chars])
        out = pd.DataFrame({
            id_col: pd.array(ids, dtype="int64"),
            "chunk_idx": pd.array(idxs, dtype="int64"),
            "chunk_text": texts,
        })
        out["n_chunk_chars"] = out["chunk_text"].str.len().astype("int64")
        return out

    return ds.map_batches(chunk, batch_format="pandas")


def curate(docs, probe, *, id_col: str = "doc_id", text_col: str = "text",
           min_quality_pm: int = DEFAULT_QUALITY_MIN,
           neardup_threshold: float = 0.8, contamination_n: int = 3,
           chunk_chars: int = CHUNK_CHARS, stride: int = CHUNK_STRIDE,
           pack_budget: int = PACK_BUDGET, n_buckets: int = 32):
    """Run the full curation flow; returns ``(packed, kept_ids)`` where
    ``packed`` is the chunk→pack assignment (id, chunk_idx,
    n_chunk_chars, pack_id) and ``kept_ids`` the surviving document ids
    (both lazy Datasets)."""
    from ..functions.arrow_util import arrow_schema_of
    from ..functions.joins import bucketed_hash_join
    from ..functions.setops import except_keys
    from ..stages.dedup import _id_arrow_type, dedup_corpus
    from ..stages.packing import pack_chunks
    from ..stages.text_analysis import ngram_contamination

    id_type = _id_arrow_type(docs, id_col)

    passing = quality_filter(
        docs.select_columns([id_col, text_col]),
        min_quality_pm=min_quality_pm, text_col=text_col,
    )
    # three downstream consumers (dedup, contamination, final text join)
    # — materialize once instead of re-running the scoring pass per use
    passing = passing.materialize()

    deduped_ids = dedup_corpus(
        passing, id_col=id_col, text_col=text_col,
        threshold=neardup_threshold, n_buckets=n_buckets,
    )

    contaminated = ngram_contamination(
        passing, probe, id_col=id_col, text_col=text_col,
        n=contamination_n, n_buckets=n_buckets,
    ).select_columns([id_col])

    kept_ids = except_keys(deduped_ids, contaminated, id_col,
                           n_buckets=n_buckets)

    kept_docs = bucketed_hash_join(
        kept_ids, passing, id_col, n_buckets=n_buckets,
        lschema=pa.schema([(id_col, id_type)]),
        rschema=arrow_schema_of(passing),  # materialized: metadata read
    )

    chunks = chunk_docs(kept_docs, id_col=id_col, text_col=text_col,
                        chunk_chars=chunk_chars, stride=stride)
    packed = pack_chunks(chunks, budget=pack_budget,
                         id_cols=(id_col, "chunk_idx"))
    return packed, kept_ids
