"""Distributed Bloom-filter membership: build over a key column, probe as a
broadcast prefilter.

Reference analog: the dedup existence probe ``object_exists(hash_key)``
(``/root/reference/app/main.py:721-729``) asks storage one key at a time
before upload. At 10^12 keys, the scale path is a compact approximate
membership structure built ONCE over the manifest and broadcast to every
probe task: false positives only (a hit falls back to the exact check —
``stages/dedup.py:incremental_dedup``), never false negatives (a miss is
definitely new and skips the exact path entirely).

Build plan: per-batch partial bitmaps OR-merge (OR is associative and
commutative -> order-independent, shuffle-free reduce). Each partial is
``m_bits/8`` bytes regardless of batch size; a tree merge (coarse groupby
on batch ordinal) keeps the driver's share at ``n_merge_buckets`` bitmaps.

Hashing: double hashing idx_i = (h1 + i*h2) mod m with h1/h2 from a
splitmix64-style vectorized mix of the key (int64 keys: pure numpy, no
Python loop; string keys: one md5 per string, then the same mix).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

_GOLDEN = np.uint64(0x9E3779B97F4A7C15)


def _mix64(x: np.ndarray, seed: int) -> np.ndarray:
    """splitmix64 finalizer, vectorized (uint64 in -> uint64 out)."""
    z = x.astype(np.uint64) + np.uint64(seed) * _GOLDEN
    with np.errstate(over="ignore"):
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def _key_u64(arr: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """Key column -> uint64 base hashes (vectorized for ints; md5 for str)."""
    typ = arr.type
    if pa.types.is_integer(typ):
        return arr.to_numpy(zero_copy_only=False).astype(np.uint64)
    vals = arr.to_pylist()
    return np.fromiter(
        (
            int.from_bytes(
                hashlib.md5(str(v).encode("utf-8", "surrogatepass")).digest()[:8],
                "little",
            )
            for v in vals
        ),
        dtype=np.uint64,
        count=len(vals),
    )


def _bit_indices(base: np.ndarray, k_hashes: int, m_bits: int) -> np.ndarray:
    """(n,) base hashes -> (k, n) bit indices via double hashing."""
    h1 = _mix64(base, 1)
    h2 = _mix64(base, 2) | np.uint64(1)  # odd -> full-period stride
    m = np.uint64(m_bits)
    with np.errstate(over="ignore"):
        return np.stack(
            [(h1 + np.uint64(i) * h2) % m for i in range(k_hashes)]
        )


def _set_bits(bitmap: np.ndarray, idx: np.ndarray) -> None:
    flat = idx.ravel()
    np.bitwise_or.at(bitmap, flat >> np.uint64(3),
                     np.left_shift(1, (flat & np.uint64(7)).astype(np.uint8),
                                   dtype=np.uint8))


def _test_bits(bitmap: np.ndarray, idx: np.ndarray) -> np.ndarray:
    """(k, n) indices -> (n,) bool: ALL k bits set."""
    byte = bitmap[(idx >> np.uint64(3)).astype(np.int64)]
    bit = np.left_shift(1, (idx & np.uint64(7)).astype(np.uint8), dtype=np.uint8)
    return ((byte & bit) != 0).all(axis=0)


def build_bloom(ds, key: str, *, m_bits: int = 1 << 23, k_hashes: int = 4,
                n_merge_buckets: int = 16) -> np.ndarray:
    """Build a Bloom bitmap (uint8 array of m_bits/8 bytes) over ds[key].

    Partial bitmaps per batch, OR-merged in a coarse tree: the groupby
    fan-in is ``n_merge_buckets`` rows of m_bits/8 bytes each; only those
    reach the driver for the final OR. m_bits must be a multiple of 8.
    """
    if m_bits % 8:
        raise ValueError("m_bits must be a multiple of 8")
    n_bytes = m_bits // 8

    def partial(batch: pa.Table) -> pa.Table:
        bm = np.zeros(n_bytes, dtype=np.uint8)
        base = _key_u64(batch[key])
        if len(base):
            _set_bits(bm, _bit_indices(base, k_hashes, m_bits))
        # bucket by content so identical batches collapse anywhere; any
        # deterministic small int works — spread via first bytes
        b = int(bm[: 64].sum()) % n_merge_buckets
        return pa.table(
            {"mb": pa.array([b], pa.int32()),
             "bits": pa.array([bm.tobytes()], pa.binary())}
        )

    partials = ds.map_batches(partial, batch_format="pyarrow",
                              batch_size=65536)

    def or_group(grp: pa.Table) -> pa.Table:
        acc = np.zeros(n_bytes, dtype=np.uint8)
        for buf in grp["bits"].to_pylist():
            acc |= np.frombuffer(buf, dtype=np.uint8)
        return pa.table(
            {"mb": pa.array([int(grp["mb"][0].as_py())], pa.int32()),
             "bits": pa.array([acc.tobytes()], pa.binary())}
        )

    merged = partials.groupby("mb").map_groups(or_group, batch_format="pyarrow")
    acc = np.zeros(n_bytes, dtype=np.uint8)
    for row in merged.take_all():  # <= n_merge_buckets rows by construction
        acc |= np.frombuffer(row["bits"], dtype=np.uint8)
    return acc


def bloom_probe_filter(ds, key: str, bitmap: np.ndarray, *,
                       m_bits: int | None = None, k_hashes: int = 4,
                       keep_matches: bool = False):
    """Filter ds by Bloom membership of ds[key].

    ``keep_matches=False`` (the dedup prefilter): keep rows whose key is
    DEFINITELY absent — exact-check only the (few) possible members.
    The bitmap is ``ray.put`` ONCE and read zero-copy in every task.
    """
    import ray

    m = m_bits if m_bits is not None else len(bitmap) * 8
    ref = ray.put(bitmap)

    def probe(batch: pa.Table) -> pa.Table:
        bm = ray.get(ref)
        base = _key_u64(batch[key])
        if not len(base):
            return batch
        member = _test_bits(bm, _bit_indices(base, k_hashes, m))
        return batch.filter(pa.array(member if keep_matches else ~member))

    return ds.map_batches(probe, batch_format="pyarrow", batch_size=65536)
