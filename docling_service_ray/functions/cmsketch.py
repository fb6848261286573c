"""Count-Min sketch: mergeable sub-linear frequency estimation.

The Cormode–Muthukrishnan sketch (J. Algorithms 2005 — public paper): a
``d × w`` int64 counter matrix; each key increments one counter per row
(row-salted universal hash), the estimate is the MIN over its d
counters. Properties this module's tests pin down:

- **never underestimates** (counters only ever add other keys' mass);
- **mergeable**: sketch(A ∪ B) == sketch(A) + sketch(B) elementwise, so
  per-batch partial sketches combine with ONE elementwise sum — the
  exchange is O(d·w) ints per batch regardless of corpus size (the same
  partial-fold shape as the KMV distinct sketch, `training.py`);
- error bound: overestimate ≤ e/w · N total mass with probability
  1 − e^(−d) per query.

Where the exact heavy-hitter path (`functions/heavy_hitters.py` —
Misra-Gries candidates + exact recount) answers "WHICH keys are
frequent" exactly, the CM sketch answers "how frequent is THIS key" for
arbitrary keys after one pass, in constant space — the point-query
companion. Deterministic: hash coefficients derive from fixed salts via
the repo's stable 64-bit hash.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .hashing import hash64

_P = (1 << 61) - 1  # Mersenne prime for the universal hash family


def _row_coeffs(d: int) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic (a_i, b_i) per sketch row from fixed salts."""
    a = np.array([hash64(f"cm-a-{i}") % (_P - 1) + 1 for i in range(d)],
                 dtype=np.uint64)
    b = np.array([hash64(f"cm-b-{i}") % _P for i in range(d)],
                 dtype=np.uint64)
    return a, b


def _positions(keys: np.ndarray, d: int, w: int) -> np.ndarray:
    """(d, n) column positions for pre-hashed uint64 keys — vectorized
    universal hashing with the shift-fold Mersenne reduction."""
    a, b = _row_coeffs(d)
    x = keys[None, :] * a[:, None] + b[:, None]  # wraparound uint64 ok
    x = (x >> np.uint64(61)) + (x & np.uint64(_P))
    x = np.where(x >= _P, x - np.uint64(_P), x)
    return (x % np.uint64(w)).astype(np.int64)


def _hash_keys(values) -> np.ndarray:
    # hash64 returns a signed 64-bit int; mask into uint64 range before
    # the numpy conversion (negative -> uint64 is deprecated in numpy)
    mask = (1 << 64) - 1
    return np.array([hash64(str(v)) & mask for v in values],
                    dtype=np.uint64)


def sketch_batch(values, counts, *, d: int, w: int) -> np.ndarray:
    """Dense (d, w) int64 partial sketch of (value, count) pairs."""
    m = np.zeros((d, w), dtype=np.int64)
    if len(values) == 0:
        return m
    pos = _positions(_hash_keys(values), d, w)
    cnts = np.asarray(counts, dtype=np.int64)
    for i in range(d):
        np.add.at(m[i], pos[i], cnts)
    return m


def cm_sketch_tokens(ds, *, text_col: str = "text", d: int = 4,
                     w: int = 1024) -> np.ndarray:
    """One-pass distributed CM sketch of whitespace tokens: per-batch
    dense partials flattened to sparse (cell, cnt) rows, ONE cell-keyed
    groupby sum (≤ d·w distinct cells — constant-size exchange), dense
    matrix rebuilt on the driver (d·w ints)."""
    from ray.data.aggregate import Sum

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        s = batch[text_col].fillna("").str.strip()
        s = s[s != ""]
        vc = s.str.split(r"\s+").explode().value_counts()
        m = sketch_batch(vc.index.to_numpy(), vc.to_numpy(), d=d, w=w)
        cell = np.flatnonzero(m.ravel())
        return pd.DataFrame({"cell": cell.astype(np.int64),
                             "cnt": m.ravel()[cell]})

    cells = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("cell").aggregate(Sum("cnt", alias_name="cnt"))
        .to_pandas()  # <= d*w rows by construction
    )
    m = np.zeros(d * w, dtype=np.int64)
    m[cells["cell"].to_numpy()] = cells["cnt"].to_numpy()
    return m.reshape(d, w)


def estimate(m: np.ndarray, values) -> np.ndarray:
    """Point-query estimates (min over rows) for the given keys."""
    d, w = m.shape
    if len(values) == 0:
        return np.zeros(0, dtype=np.int64)
    pos = _positions(_hash_keys(values), d, w)
    ests = np.stack([m[i, pos[i]] for i in range(d)])
    return ests.min(axis=0)
