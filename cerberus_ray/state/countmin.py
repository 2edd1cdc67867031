"""Count-Min sketch (Cormode & Muthukrishnan, 2005).

Approximate per-key frequency with one-sided error (never undercounts).
Used with the Bloom filter in the referential stage (north_rule ST5) to
estimate how many child rows point at a given (possibly missing) parent
key, and for hot-key detection feeding the salted-skew path (SURVEY.md §4).
Merge = elementwise add.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..determinism import hash_idx, hash_strings, splitmix64


class CountMinSketch:
    def __init__(self, width: int = 1 << 14, depth: int = 4):
        self.width = width
        self.depth = depth
        self.table = np.zeros((depth, width), dtype=np.int64)

    def _hash(self, arr) -> np.ndarray:
        # shared dispatch (determinism.hash_keys): Arrow strings pass
        # through zero-copy into the polars hash — no per-key Python
        from ..determinism import hash_keys

        return hash_keys(arr)

    def add(self, arr, counts=None) -> None:
        h = self._hash(arr)
        if counts is None:
            counts = np.ones(len(h), dtype=np.int64)
        for d in range(self.depth):
            idx = (hash_idx(h, 0, salt=d + 101) % np.uint64(self.width)).astype(np.int64)
            np.add.at(self.table[d], idx, counts)

    def query(self, arr) -> np.ndarray:
        h = self._hash(arr)
        est = np.full(len(h), np.iinfo(np.int64).max, dtype=np.int64)
        for d in range(self.depth):
            idx = (hash_idx(h, 0, salt=d + 101) % np.uint64(self.width)).astype(np.int64)
            np.minimum(est, self.table[d][idx], out=est)
        return est

    def merge(self, other: "CountMinSketch") -> "CountMinSketch":
        assert self.table.shape == other.table.shape
        self.table += other.table
        return self

    def to_bytes(self) -> bytes:
        head = np.array([self.width, self.depth], dtype=np.int64).tobytes()
        return head + self.table.tobytes()

    @classmethod
    def from_bytes(cls, b: bytes) -> "CountMinSketch":
        w, d = np.frombuffer(b[:16], dtype=np.int64)
        cm = cls(width=int(w), depth=int(d))
        cm.table = np.frombuffer(b[16:], dtype=np.int64).reshape(d, w).copy()
        return cm
