"""KLL streaming-quantiles sketch (Karnin, Lang & Liberty 2016; the
relative-error refinement surveyed in "Relative Error Streaming
Quantiles", PODS 2021 — PAPERS.md).

A second, rank-error-bounded quantile sketch alongside the t-digest:
KLL bounds UNIFORM rank error ε ≈ O(1/k) with space O(k log(n/k)),
whereas the t-digest concentrates accuracy at the tails with no worst
case bound. Drift/pruning paths that need a guaranteed rank error at
arbitrary interior quantiles can use this one; both are mergeable,
per-block partials → driver merge.

Determinism: classical KLL flips a fair coin per compaction to pick the
kept offset. Ray retries must reproduce results, so the coin here is a
counter-based hash of (level, number of compactions at that level) —
statistically equivalent alternation, reproducible across reruns and
merge orders that present the same data (the same trick as the engine's
seeded generators, `determinism.py`).

Level j items carry weight 2^j; level 0 buffers arrive unsorted
(compaction sorts). Rank queries take the weighted rank over all levels
with an order-independent count per level. Compaction CONSERVES total
weight: an odd-sized level retains its one unpaired item (the classical
KLL rule) — promoting all ⌈L/2⌉ items would drift total weight by
±2^j per compaction, eating the rank-error budget.
"""

from __future__ import annotations

import struct

import numpy as np

from ..determinism import splitmix64


class KLL:
    def __init__(self, k: int = 200):
        if k < 8:
            raise ValueError("k must be >= 8")
        self.k = int(k)
        self.levels: list[np.ndarray] = [np.empty(0, dtype=np.float64)]
        self.n = 0
        self._compactions: list[int] = [0]

    # -- internals -----------------------------------------------------
    def _capacity(self, level: int) -> int:
        # capacity shrinks geometrically for lower levels (c = 2/3 as in
        # the paper's practical variant), floor of 8
        top = len(self.levels) - 1
        c = self.k * (2.0 / 3.0) ** (top - level)
        return max(8, int(np.ceil(c)))

    def _coin(self, level: int) -> int:
        h = splitmix64(np.array(
            [(level << 32) ^ self._compactions[level]], dtype=np.uint64))[0]
        return int(h)

    def _compact(self) -> None:
        for lvl in range(len(self.levels)):
            if len(self.levels[lvl]) <= self._capacity(lvl):
                continue
            a = np.sort(self.levels[lvl])
            h = self._coin(lvl)
            self._compactions[lvl] += 1
            retained = np.empty(0, dtype=np.float64)
            if len(a) % 2 == 1:
                # weight conservation: the unpaired item STAYS at this
                # level (deterministic end choice — coin bit 1)
                if h & 2:
                    retained, a = a[-1:], a[:-1]
                else:
                    retained, a = a[:1], a[1:]
            promoted = a[(h & 1)::2]
            self.levels[lvl] = retained
            if lvl + 1 == len(self.levels):
                self.levels.append(np.empty(0, dtype=np.float64))
                self._compactions.append(0)
            self.levels[lvl + 1] = np.sort(
                np.concatenate([self.levels[lvl + 1], promoted]))

    # -- public API ------------------------------------------------------
    def update(self, values) -> None:
        v = np.asarray(values, dtype=np.float64)
        v = v[~np.isnan(v)]
        if not len(v):
            return
        self.n += len(v)
        self.levels[0] = np.concatenate([self.levels[0], v])
        # a huge batch can overflow level 0 many times over
        while any(len(self.levels[j]) > self._capacity(j)
                  for j in range(len(self.levels))):
            self._compact()

    def merge(self, other: "KLL") -> "KLL":
        """Merge ``other`` INTO self (like every sketch in this
        package: Bloom/HLL/CMS/TDigest all mutate in place) and return
        self, so both ``acc.merge(x)`` and ``acc = acc.merge(x)``
        styles stay correct."""
        self.k = min(self.k, other.k)
        self.n += other.n
        depth = max(len(self.levels), len(other.levels))
        levels, compactions = [], []
        for j in range(depth):
            a = self.levels[j] if j < len(self.levels) else \
                np.empty(0, dtype=np.float64)
            b = other.levels[j] if j < len(other.levels) else \
                np.empty(0, dtype=np.float64)
            levels.append(np.sort(np.concatenate([a, b])))
            compactions.append(
                (self._compactions[j] if j < len(self._compactions) else 0)
                + (other._compactions[j] if j < len(other._compactions)
                   else 0))
        self.levels, self._compactions = levels, compactions
        while any(len(self.levels[j]) > self._capacity(j)
                  for j in range(len(self.levels))):
            self._compact()
        return self

    def quantile(self, q: float) -> float:
        if not 0.0 <= q <= 1.0:
            raise ValueError(f"q must be in [0,1], got {q}")
        if self.n == 0:
            return float("nan")
        items, weights = [], []
        for j, lvl in enumerate(self.levels):
            if len(lvl):
                items.append(lvl)
                weights.append(np.full(len(lvl), 1 << j, dtype=np.float64))
        x = np.concatenate(items)
        w = np.concatenate(weights)
        order = np.argsort(x, kind="mergesort")
        x, w = x[order], w[order]
        cw = np.cumsum(w)
        target = q * cw[-1]
        i = int(np.searchsorted(cw, target, side="left"))
        return float(x[min(i, len(x) - 1)])

    def rank(self, value: float) -> float:
        """Estimated fraction of items <= value (order-independent
        count per level — level 0 buffers are UNSORTED between
        compactions, so searchsorted there would return garbage)."""
        if self.n == 0:
            return float("nan")
        tot = below = 0.0
        for j, lvl in enumerate(self.levels):
            if len(lvl):
                wj = float(1 << j)
                tot += wj * len(lvl)
                below += wj * int(np.count_nonzero(lvl <= value))
        return below / tot

    # -- serialization (hex-safe bytes for parquet/driver rows) ----------
    def to_bytes(self) -> bytes:
        parts = [struct.pack("<iqi", self.k, self.n, len(self.levels))]
        for lvl, c in zip(self.levels, self._compactions):
            parts.append(struct.pack("<iq", len(lvl), c))
            parts.append(lvl.astype("<f8").tobytes())
        return b"".join(parts)

    @classmethod
    def from_bytes(cls, data: bytes) -> "KLL":
        k, n, depth = struct.unpack_from("<iqi", data, 0)
        off = struct.calcsize("<iqi")
        out = cls(k=k)
        out.n = n
        out.levels, out._compactions = [], []
        for _ in range(depth):
            ln, c = struct.unpack_from("<iq", data, off)
            off += struct.calcsize("<iq")
            arr = np.frombuffer(data, dtype="<f8", count=ln, offset=off).copy()
            off += ln * 8
            out.levels.append(arr)
            out._compactions.append(c)
        return out
