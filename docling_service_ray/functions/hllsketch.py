"""HyperLogLog: mergeable constant-space distinct counting.

The Flajolet–Fusy–Gandouet–Meunier sketch (AofA 2007 — public paper):
``m = 2**p`` 6-bit registers; each value hashes to one register (top p
bits) and contributes its rank (position of the leftmost 1-bit in the
remaining 64-p bits); the register keeps the MAX rank it has seen.
Properties this module's tests pin down:

- **mergeable**: regs(A ∪ B) == elementwise-max(regs(A), regs(B)), so
  per-batch partial registers combine with ONE max-fold — the exchange
  is ≤ m (register, rank) pairs per batch regardless of corpus size
  (the same partial-fold shape as the Count-Min sketch,
  `functions/cmsketch.py`, and the KMV distinct sketch, `training.py`);
- standard error ≈ 1.04/sqrt(m) (~1.6% at p=12), with the
  linear-counting small-range correction below 2.5·m;
- deterministic: the value hash is the repo's stable 64-bit hash
  (`functions/hashing.py`), no PYTHONHASHSEED dependence.

Where the exact COUNT-DISTINCT path (`training.py` grouped distinct)
shuffles every distinct value and the KMV sketch keeps the k smallest
hashes, HLL answers "how many distinct" in 2^p bytes with a tunable
error — the cardinality companion of the CM frequency sketch. With a
64-bit hash the classic 32-bit large-range correction is unnecessary
(collision mass is negligible below ~2^57 distincts).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .hashing import hash64

_U64_MASK = (1 << 64) - 1


def _alpha(m: int) -> float:
    """Bias-correction constant from the HLL paper (m >= 16)."""
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


def _hash_values(values) -> np.ndarray:
    return np.array([hash64(str(v)) & _U64_MASK for v in values],
                    dtype=np.uint64)


def _bit_length_u64(x: np.ndarray) -> np.ndarray:
    """Exact vectorized bit_length for uint64 (no float round-trip —
    float64 loses exactness above 2^53)."""
    bl = np.zeros(x.shape, dtype=np.int64)
    v = x.copy()
    for s in (32, 16, 8, 4, 2, 1):
        big = v >= (np.uint64(1) << np.uint64(s))
        bl[big] += s
        v[big] >>= np.uint64(s)
    bl[x > 0] += 1
    return bl


def registers_batch(values, *, p: int) -> np.ndarray:
    """Dense ``m = 2**p`` uint8 register array for a batch of values.

    Register index = top p hash bits; rank = leftmost-1 position in the
    low 64-p bits (1-based), i.e. (64-p) - bit_length(low) + 1, which is
    64-p+1 when the low bits are all zero — the single formula covers
    both cases.
    """
    if not 4 <= p <= 18:
        raise ValueError(
            f"registers_batch: p={p} outside [4, 18] — the bias constant "
            "assumes m >= 16 registers, and beyond 2^18 the register "
            "table stops being a sensible broadcast/fold object"
        )
    m = 1 << p
    regs = np.zeros(m, dtype=np.uint8)
    if len(values) == 0:
        return regs
    h = _hash_values(values)
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    low = h & np.uint64((1 << (64 - p)) - 1)
    rank = (64 - p) - _bit_length_u64(low) + 1
    np.maximum.at(regs, idx, rank.astype(np.uint8))
    return regs


def merge(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """regs(A ∪ B): elementwise max."""
    return np.maximum(a, b)


def estimate(regs: np.ndarray) -> int:
    """Cardinality estimate with the paper's small-range correction."""
    m = len(regs)
    raw = _alpha(m) * m * m / np.sum(np.power(2.0, -regs.astype(np.float64)))
    zeros = int(np.count_nonzero(regs == 0))
    if raw <= 2.5 * m and zeros > 0:
        return int(round(m * np.log(m / zeros)))  # linear counting
    return int(round(raw))


def hll_distinct_tokens(ds, *, text_col: str = "text", p: int = 12) -> int:
    """One-pass distributed HLL of whitespace tokens: per-batch dense
    registers flattened to sparse (reg, rank) rows, ONE register-keyed
    groupby max (≤ 2**p distinct registers — constant-size exchange),
    registers rebuilt on the driver (2**p bytes)."""
    from ray.data.aggregate import Max

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        s = batch[text_col].fillna("").str.strip()
        s = s[s != ""]
        toks = s.str.split(r"\s+").explode().unique()
        regs = registers_batch(toks, p=p)
        nz = np.flatnonzero(regs)
        return pd.DataFrame({"reg": nz.astype(np.int64),
                             "rank": regs[nz].astype(np.int64)})

    folded = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("reg").aggregate(Max("rank", alias_name="rank"))
        .to_pandas()  # <= 2**p rows by construction
    )
    regs = np.zeros(1 << p, dtype=np.uint8)
    if len(folded):
        regs[folded["reg"].to_numpy()] = folded["rank"].to_numpy()
    return estimate(regs)


def hll_distinct_by_group(ds, *, group_col: str, text_col: str = "text",
                          p: int = 12) -> pa.Table:
    """Per-group approximate distinct-token counts: per-batch (group,
    reg, rank) partials, ONE (group, reg)-keyed max fold — the exchange
    is O(groups × 2**p) pairs, never the distinct values themselves.
    This is the scale path next to the exact grouped COUNT-DISTINCT
    (which must shuffle every distinct (group, value) pair).

    Returns (group_col, n_distinct_est) sorted by group. The register
    fold is an int-bucket fold on the register index (never Ray's
    sort-based multi-column groupby — the string-key sort shuffle costs
    ~10x the whole plan at this partial-table size); the per-group
    estimate then runs inside map_groups — the driver receives one row
    per group.
    """
    from .agg import bucketed_group_agg

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        out = []
        s = batch[text_col].fillna("").str.strip()
        for grp, sub in s.groupby(batch[group_col].astype(str)):
            sub = sub[sub != ""]
            toks = sub.str.split(r"\s+").explode().unique()
            regs = registers_batch(toks, p=p)
            nz = np.flatnonzero(regs)
            out.append(pd.DataFrame({
                group_col: grp,
                "reg": nz.astype(np.int64),
                "rank": regs[nz].astype(np.int64),
            }))
        if not out:
            return pd.DataFrame({group_col: pd.Series([], dtype=str),
                                 "reg": pd.Series([], dtype=np.int64),
                                 "rank": pd.Series([], dtype=np.int64)})
        return pd.concat(out, ignore_index=True)

    def per_group_estimate(grp: pd.DataFrame) -> pd.DataFrame:
        regs = np.zeros(1 << p, dtype=np.uint8)
        regs[grp["reg"].to_numpy()] = grp["rank"].to_numpy()
        return pd.DataFrame({group_col: [grp[group_col].iloc[0]],
                             "n_distinct_est": [estimate(regs)]})

    folded = bucketed_group_agg(
        ds.map_batches(partial, batch_format="pandas"),
        ["reg", group_col], {"rank": ("rank", "max")}, n_buckets=64,
    )
    return (
        folded.groupby(group_col)
        .map_groups(per_group_estimate, batch_format="pandas")
        .sort(group_col)
    )
