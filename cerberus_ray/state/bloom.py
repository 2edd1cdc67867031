"""Bloom filter — broadcastable membership pre-filter for referential
integrity at scale (north_rule ST5).

Semantics for validation: ``contains`` False ⇒ key DEFINITELY absent from
the parent set (a certain fk-missing violation, reference PROTECT
semantics, cerberus/models/pet.py:68-72); True ⇒ present OR a false
positive, so the exact referential stage only needs to re-check the
(rare) positives-that-might-be-missing via a shuffle semi-join.
Merge = bitwise OR (commutative/associative).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..determinism import hash_idx, hash_strings, splitmix64


class BloomFilter:
    def __init__(self, n_bits: int = 1 << 20, k: int = 5):
        assert n_bits % 64 == 0
        self.n_bits = n_bits
        self.k = k
        self.words = np.zeros(n_bits // 64, dtype=np.uint64)

    def _positions(self, h: np.ndarray) -> np.ndarray:
        # k independent streams via salted rehash; shape (k, n)
        return np.stack([
            hash_idx(h, 0, salt=i + 1) % np.uint64(self.n_bits)
            for i in range(self.k)
        ])

    def _hash(self, arr) -> np.ndarray:
        # shared dispatch (determinism.hash_keys): Arrow strings pass
        # through zero-copy into the polars hash — no per-key Python
        from ..determinism import hash_keys

        return hash_keys(arr)

    def add(self, arr) -> None:
        pos = self._positions(self._hash(arr)).ravel()
        np.bitwise_or.at(self.words, (pos >> np.uint64(6)).astype(np.int64),
                         np.uint64(1) << (pos & np.uint64(63)))

    def contains(self, arr) -> np.ndarray:
        pos = self._positions(self._hash(arr))
        hit = (self.words[(pos >> np.uint64(6)).astype(np.int64)]
               >> (pos & np.uint64(63))) & np.uint64(1)
        return hit.astype(bool).all(axis=0)

    def merge(self, other: "BloomFilter") -> "BloomFilter":
        assert self.n_bits == other.n_bits and self.k == other.k
        np.bitwise_or(self.words, other.words, out=self.words)
        return self

    def to_bytes(self) -> bytes:
        return self.n_bits.to_bytes(8, "little") + bytes([self.k]) + self.words.tobytes()

    @classmethod
    def from_bytes(cls, b: bytes) -> "BloomFilter":
        n_bits = int.from_bytes(b[:8], "little")
        bf = cls(n_bits=n_bits, k=b[8])
        bf.words = np.frombuffer(b[9:], dtype=np.uint64).copy()
        return bf

    @staticmethod
    def size_for(n_keys: int, fpp: float = 0.01) -> int:
        """Bits needed for n keys at target false-positive rate (rounded to 64)."""
        import math

        m = max(64, int(-n_keys * math.log(fpp) / (math.log(2) ** 2)))
        return ((m + 63) // 64) * 64
