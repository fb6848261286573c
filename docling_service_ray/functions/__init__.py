"""Distributed primitives + vectorized scalar helpers shared by stages
and queries."""

from .agg import bucketed_group_agg
from .hashing import bucket_column, hash64, md5_hex_array, stable_seed
from .joins import (
    asof_join_per_key,
    broadcast_anti_filter,
    bucketed_hash_join,
    grouped_topk,
)
from .money import to_cents
from .setops import except_keys, intersect, union_distinct

__all__ = [
    "asof_join_per_key",
    "broadcast_anti_filter",
    "bucket_column",
    "bucketed_group_agg",
    "bucketed_hash_join",
    "except_keys",
    "grouped_topk",
    "hash64",
    "intersect",
    "md5_hex_array",
    "stable_seed",
    "to_cents",
    "union_distinct",
]
