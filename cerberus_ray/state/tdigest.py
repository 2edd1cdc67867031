"""Mergeable quantile sketch (t-digest style, Dunning & Ertl 2019).

Centroid clustering uses the arcsine scale function k1 so accuracy
concentrates at the tails; the merge pass is fully vectorized
(searchsorted + add.reduceat) instead of the paper's per-centroid loop, so
batch updates stay numpy-speed in the hot path. Deterministic for a given
input order of *merges of sorted data* — and since merge is performed on
the sorted union of centroids, the final digest is independent of block
order, which is what Ray task retries require (SURVEY.md §7 hard part g).

Used for distribution-drift checks (north_rule ST6): per-column quantile
profiles compared run-vs-baseline via KS distance / PSI, the engine's
generalization of the reference's weekly report deltas
(cerberus/reports.py:19-35).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


class TDigest:
    def __init__(self, compression: float = 200.0):
        self.compression = float(compression)
        self.means = np.empty(0, dtype=np.float64)
        self.weights = np.empty(0, dtype=np.float64)
        self.count = 0.0

    # -- internals ---------------------------------------------------------
    def _compress(self, means: np.ndarray, weights: np.ndarray) -> None:
        order = np.argsort(means, kind="mergesort")
        means, weights = means[order], weights[order]
        total = weights.sum()
        if total == 0:
            return
        # mid-point quantile of each centroid
        cw = np.cumsum(weights)
        q = (cw - weights / 2) / total
        # k1 scale: k(q) = δ/(2π) asin(2q-1); cluster id = floor(k)
        k = self.compression / (2 * np.pi) * np.arcsin(np.clip(2 * q - 1, -1, 1))
        cluster = np.floor(k + self.compression / 4).astype(np.int64)
        # group consecutive equal cluster ids
        boundaries = np.flatnonzero(np.diff(cluster)) + 1
        starts = np.concatenate(([0], boundaries))
        w = np.add.reduceat(weights, starts)
        m = np.add.reduceat(weights * means, starts) / w
        self.means, self.weights, self.count = m, w, float(total)

    # -- update / merge ----------------------------------------------------
    def update(self, values) -> None:
        if isinstance(values, (pa.Array, pa.ChunkedArray)):
            values = values.to_numpy(zero_copy_only=False)
        v = np.asarray(values, dtype=np.float64)
        v = v[~np.isnan(v)]
        if len(v) == 0:
            return
        self._compress(np.concatenate([self.means, v]),
                       np.concatenate([self.weights, np.ones(len(v))]))

    def merge(self, other: "TDigest") -> "TDigest":
        # parameter mismatch is a caller bug, like the sibling sketches
        # (bloom/hll/cms all assert) — a silent mixed-compression merge
        # produces an accuracy profile nobody asked for
        assert self.compression == other.compression, (
            self.compression, other.compression)
        if other.count:
            self._compress(np.concatenate([self.means, other.means]),
                           np.concatenate([self.weights, other.weights]))
        return self

    def to_bytes(self) -> bytes:
        head = np.array([self.compression, self.count], dtype=np.float64).tobytes()
        return head + self.means.tobytes() + self.weights.tobytes()

    @classmethod
    def from_bytes(cls, b: bytes) -> "TDigest":
        comp, count = np.frombuffer(b[:16], dtype=np.float64)
        td = cls(compression=comp)
        rest = np.frombuffer(b[16:], dtype=np.float64)
        n = len(rest) // 2
        td.means, td.weights = rest[:n].copy(), rest[n:].copy()
        td.count = float(count)
        return td

    # -- queries -----------------------------------------------------------
    def quantile(self, q) -> np.ndarray:
        """Interpolated quantile(s) in [0, 1]."""
        qs = np.atleast_1d(np.asarray(q, dtype=np.float64))
        if self.count == 0:
            return np.full(len(qs), np.nan)
        cw = np.cumsum(self.weights) - self.weights / 2
        out = np.interp(qs * self.count, cw, self.means,
                        left=self.means[0], right=self.means[-1])
        return out if np.ndim(q) else float(out[0])

    def cdf(self, x) -> np.ndarray:
        xs = np.atleast_1d(np.asarray(x, dtype=np.float64))
        if self.count == 0:
            return np.full(len(xs), np.nan)
        cw = (np.cumsum(self.weights) - self.weights / 2) / self.count
        out = np.interp(xs, self.means, cw, left=0.0, right=1.0)
        return out if np.ndim(x) else float(out[0])
