"""Content hashing (dedup keys, fingerprints).

The reference keys artifacts by ``xxhash.xxh64(bytes).hexdigest()``
(``app/main.py:716-718``; ``scripts/r2_migrate_xxhash.py:97-99``). xxhash
isn't available here; md5 (stdlib, also available in DuckDB for oracle
parity) serves as the content hash, and blake2b provides cheap 64-bit
partitioning keys.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa


def md5_hex_array(texts) -> pa.Array:
    """Element-wise md5 hexdigest of a string Arrow array/chunked array."""
    out = [
        hashlib.md5(t.encode("utf-8", "surrogatepass")).hexdigest()
        if t is not None
        else None
        for t in texts.to_pylist()
    ]
    return pa.array(out, pa.string())


def hash64(text: str) -> int:
    """Stable signed 64-bit content hash (partitioning / bucketing key)."""
    d = hashlib.blake2b(text.encode("utf-8", "surrogatepass"), digest_size=8).digest()
    return int.from_bytes(d, "big", signed=True)


def hash64_array(texts) -> pa.Array:
    return pa.array(
        [hash64(t) if t is not None else None for t in texts.to_pylist()],
        pa.int64(),
    )


def bucket_column(tbl: pa.Table, key: str, n_buckets: int,
                  col_name: str = "bucket") -> pa.Table:
    """Append a hash-bucket column for ``key`` (string or integer column).

    String keys hash once per DISTINCT value per chunk (dictionary encode),
    integer keys via a Fibonacci multiplicative hash — both deterministic
    across processes. The standard first step of every explicit
    hash-partitioned operation in this repo (stitch, bucketed join,
    grouped top-k)."""
    import zlib

    if tbl.num_rows == 0:
        return tbl.append_column(
            col_name, pa.array([], pa.int64())
        ).replace_schema_metadata(None)
    col = tbl[key]
    chunks = col.chunks if isinstance(col, pa.ChunkedArray) else [col]
    out = []
    for chunk in chunks:
        if pa.types.is_integer(chunk.type):
            v = chunk.to_numpy(zero_copy_only=False).astype(np.uint64)
            h = (v * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(33)
            out.append(pa.array((h % np.uint64(n_buckets)).astype(np.int64)))
        else:
            d = chunk.dictionary_encode()
            vals = d.dictionary.to_pylist()
            bmap = np.array(
                [zlib.crc32(str(v).encode()) % n_buckets for v in vals],
                dtype=np.int64,
            )
            out.append(pa.array(bmap[d.indices.to_numpy(zero_copy_only=False)]))
    arr = pa.chunked_array(out) if len(out) > 1 else out[0]
    # drop schema metadata (the pandas dict blob breaks Ray's block-schema
    # hashing and spams 'Failed to hash the schemas' in every reduce task);
    # bucket_column fronts every explicit shuffle, so this is the one place
    return tbl.append_column(col_name, arr).replace_schema_metadata(None)


def stable_seed(*parts) -> np.random.Generator:
    """Deterministic numpy Generator from string parts (no wall clock)."""
    h = hashlib.blake2b(":".join(map(str, parts)).encode(), digest_size=8).digest()
    return np.random.default_rng(int.from_bytes(h, "big"))
