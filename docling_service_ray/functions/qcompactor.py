"""Deterministic mergeable quantile-compactor sketch with a CERTIFIED
rank-error bound.

The compactor hierarchy of the KLL/MRL family (Karnin–Lang–Liberty,
FOCS 2016; Manku–Rajagopalan–Lindsay, SIGMOD 1998 — public papers),
derandomized: level ``l`` holds items of weight ``2**l``; a full level
sorts and promotes every other item (the offset ALTERNATES per level —
deterministic, no coin flip), doubling their weight. Two facts make it
the right quantile primitive for this repo:

- **mergeable**: a sketch IS its (level, value) multiset plus per-level
  compaction counters; merge = levelwise concat + counter sum +
  re-compress. Per-batch partials fold through the same fixed-fan-in
  shape as the KMV distinct sketch (`training.py`) — the driver receives
  O(k · log(n/k)) values, never the column.
- **certified error**: one compaction at level ``l`` moves any rank by
  at most ``2**l`` (one item's weight), so the EXACT per-sketch bound
  ``sum_l C_l * 2**l`` — with ``C_l`` the tracked compaction count — is
  a hard ceiling on the rank error of every quantile answer, valid
  across merges (counters add). The artifact query and the tests check
  measured rank error against this certificate, not against an
  asymptotic formula.

Weight is conserved exactly (an odd buffer leaves its maximum behind at
the same level), so ``total_weight() == n`` always — the invariant the
tests pin first. Deterministic by construction: no RNG anywhere; the
same input layout always yields the same sketch.

Complements the two existing quantile paths (`partitioning.py`): the
exact histogram path needs a bounded value domain and the sampled path
gives only a probabilistic error — the compactor handles unbounded
domains with a deterministic certificate.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


class CompactorSketch:
    """Fixed-``k`` deterministic compactor hierarchy over int64 values."""

    def __init__(self, k: int = 256):
        if k < 4 or k % 2:
            raise ValueError("k must be an even integer >= 4")
        self.k = k
        self.levels: list[np.ndarray] = [np.empty(0, dtype=np.int64)]
        self.compactions: list[int] = [0]
        self.parity: list[int] = [0]

    # -- construction -----------------------------------------------------
    def update(self, values) -> "CompactorSketch":
        x = np.asarray(values, dtype=np.int64)
        if len(x):
            self.levels[0] = np.concatenate([self.levels[0], x])
            self._compress()
        return self

    def _grow(self) -> None:
        self.levels.append(np.empty(0, dtype=np.int64))
        self.compactions.append(0)
        self.parity.append(0)

    def _compress(self) -> None:
        l = 0
        while l < len(self.levels):
            buf = self.levels[l]
            if len(buf) < self.k:
                l += 1
                continue
            buf = np.sort(buf)
            if len(buf) % 2:
                # odd buffer: the max stays behind at this level — zero
                # error, exact weight conservation
                keep_back, buf = buf[-1:], buf[:-1]
            else:
                keep_back = buf[:0]
            promoted = buf[self.parity[l]::2]
            self.parity[l] ^= 1
            self.compactions[l] += 1
            self.levels[l] = keep_back.copy()
            if l + 1 == len(self.levels):
                self._grow()
            self.levels[l + 1] = np.concatenate(
                [self.levels[l + 1], promoted])
            # the promotion may have filled l+1; the loop visits it next

    # -- merge ------------------------------------------------------------
    def merge(self, other: "CompactorSketch") -> "CompactorSketch":
        if other.k != self.k:
            raise ValueError("cannot merge sketches with different k")
        while len(self.levels) < len(other.levels):
            self._grow()
        for l in range(len(other.levels)):
            self.levels[l] = np.concatenate(
                [self.levels[l], other.levels[l]])
            self.compactions[l] += other.compactions[l]
            # parity after a merge is a free choice (the certificate does
            # not depend on it); XOR keeps it deterministic
            self.parity[l] ^= other.parity[l]
        self._compress()
        return self

    # -- row (de)serialization for the distributed fold -------------------
    def to_rows(self) -> pd.DataFrame:
        """(kind, level, v): kind=0 rows carry sketch values, kind=1 rows
        carry the per-level compaction counter (v = count)."""
        frames = [
            pd.DataFrame({"kind": 0, "level": l,
                          "v": self.levels[l].astype(np.int64)})
            for l in range(len(self.levels)) if len(self.levels[l])
        ]
        frames.append(pd.DataFrame({
            "kind": 1,
            "level": np.arange(len(self.compactions), dtype=np.int64),
            "v": np.asarray(self.compactions, dtype=np.int64),
        }))
        return pd.concat(frames, ignore_index=True)

    @classmethod
    def from_rows(cls, df: pd.DataFrame, k: int) -> "CompactorSketch":
        s = cls(k)
        if not len(df):
            return s
        top = int(df["level"].max())
        while len(s.levels) <= top:
            s._grow()
        vals = df[df["kind"] == 0]
        for l, grp in vals.groupby("level"):
            s.levels[int(l)] = grp["v"].to_numpy(dtype=np.int64)
        cnts = df[df["kind"] == 1].groupby("level")["v"].sum()
        for l, c in cnts.items():
            s.compactions[int(l)] += int(c)
        s._compress()
        return s

    # -- queries ----------------------------------------------------------
    def total_weight(self) -> int:
        return sum(len(v) << l for l, v in enumerate(self.levels))

    def error_bound(self) -> int:
        """Hard ceiling on |estimated rank − true rank| for any query."""
        return sum(c << l for l, c in enumerate(self.compactions))

    def _weighted(self) -> tuple[np.ndarray, np.ndarray]:
        vals = np.concatenate([v for v in self.levels]) \
            if any(len(v) for v in self.levels) else np.empty(0, np.int64)
        wts = np.concatenate([
            np.full(len(v), 1 << l, dtype=np.int64)
            for l, v in enumerate(self.levels)
        ]) if len(vals) else np.empty(0, np.int64)
        order = np.argsort(vals, kind="stable")
        return vals[order], wts[order]

    def quantile(self, qs) -> np.ndarray:
        """Type-1 style: smallest sketch value whose cumulative weight
        reaches ceil(q · W); q=0 returns the minimum."""
        vals, wts = self._weighted()
        if not len(vals):
            raise ValueError("quantile of an empty sketch")
        cum = np.cumsum(wts)
        w = cum[-1]
        out = np.empty(len(np.atleast_1d(qs)), dtype=np.int64)
        for i, q in enumerate(np.atleast_1d(qs)):
            target = max(1, int(np.ceil(q * w)))
            out[i] = vals[np.searchsorted(cum, target, side="left")]
        return out


MERGE_FAN = 16


def compactor_sketch_column(ds, col: str, *, k: int = 256) -> CompactorSketch:
    """One-pass distributed compactor sketch of an int64 column: per-batch
    partial sketches serialize to (kind, level, v) rows, fold through
    MERGE_FAN bucket merges (content-keyed fan-in — deterministic for a
    fixed block layout), then ONE final merge task; the driver receives
    one sketch of O(k · log(n/k)) values with its summed compaction
    certificate."""
    from .hashing import hash64

    def sketch_batch(df: pd.DataFrame) -> pd.DataFrame:
        # NULLs are ignored, matching SQL percentile semantics (total
        # weight == the non-null count)
        x = df[col].dropna().to_numpy(dtype=np.int64)
        s = CompactorSketch(k).update(x)
        rows = s.to_rows()
        # fan-in key from stable content (first value + length), never
        # builtin hash() — same discipline as sampled_quantile_boundaries
        key = hash64(f"qsk-{len(x)}-{x[0]}") % MERGE_FAN if len(x) else 0
        rows["__mb"] = np.int64(key)
        return rows

    def fold_bucket(grp: pd.DataFrame) -> pd.DataFrame:
        rows = CompactorSketch.from_rows(grp, k).to_rows()
        return rows

    level1 = (
        ds.select_columns([col])
        .map_batches(sketch_batch, batch_format="pandas")
        .groupby("__mb")
        .map_groups(fold_bucket, batch_format="pandas")
    )
    final = level1.repartition(1).map_batches(
        lambda df: CompactorSketch.from_rows(df, k).to_rows(),
        batch_format="pandas", batch_size=None,
    ).to_pandas()
    return CompactorSketch.from_rows(final, k)
