"""Ray Data stages: batch transforms and actor-pool callables."""

from .dedup import (
    dedup_corpus,
    embedding_neardup_lsh,
    exact_dedup_actions,
    exact_dedup_keep_min,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_pairs,
)
from .extract_stage import ExtractTurns, apply_extract, extract_batch
from .refs import canonical_keys, rewrite_refs
from .stitch import stitch_conversations, stitch_conversations_salted

__all__ = [
    "ExtractTurns",
    "apply_extract",
    "canonical_keys",
    "dedup_corpus",
    "embedding_neardup_lsh",
    "exact_dedup_actions",
    "exact_dedup_keep_min",
    "extract_batch",
    "minhash_lsh_pairs",
    "ngram_jaccard_pairs",
    "rewrite_refs",
    "simhash_pairs",
    "stitch_conversations",
    "stitch_conversations_salted",
]
