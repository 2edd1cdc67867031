"""HyperLogLog distinct-count sketch (Flajolet et al., 2007).

Mergeable (elementwise register max — commutative/associative, so Ray task
retries can't corrupt it, SURVEY.md §7 hard part g) and deterministic
(hashes from cerberus_ray.determinism). Used by the uniqueness stage as the
no-shuffle approximate path at 10^12-doc scale (north_rule ST4).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..determinism import hash_strings, splitmix64


class HyperLogLog:
    def __init__(self, p: int = 14):
        assert 4 <= p <= 18
        self.p = p
        self.m = 1 << p
        self.registers = np.zeros(self.m, dtype=np.uint8)

    # -- update ------------------------------------------------------------
    def update_hashes(self, h: np.ndarray) -> None:
        h = h.astype(np.uint64)
        idx = (h & np.uint64(self.m - 1)).astype(np.int64)
        w = h >> np.uint64(self.p)
        # rank = (64-p) - bit_length(w) + 1 ; frexp exponent == bit_length
        bl = np.frexp(w.astype(np.float64))[1]
        rank = np.clip(64 - self.p - bl + 1, 1, 64).astype(np.uint8)
        np.maximum.at(self.registers, idx, rank)

    def update_strings(self, arr) -> None:
        # Arrow arrays pass through UNCONVERTED — hash_strings' polars
        # fast path is zero-copy from Arrow; a numpy-object detour would
        # materialize a Python object per key
        self.update_hashes(hash_strings(arr))

    def update_ints(self, arr: np.ndarray) -> None:
        self.update_hashes(splitmix64(np.asarray(arr).astype(np.uint64)))

    # -- merge / serialize -------------------------------------------------
    def merge(self, other: "HyperLogLog") -> "HyperLogLog":
        assert self.p == other.p
        np.maximum(self.registers, other.registers, out=self.registers)
        return self

    def to_bytes(self) -> bytes:
        return bytes([self.p]) + self.registers.tobytes()

    def merge_bytes(self, b: bytes) -> "HyperLogLog":
        assert b[0] == self.p
        np.maximum(self.registers,
                   np.frombuffer(b[1:], dtype=np.uint8), out=self.registers)
        return self

    @classmethod
    def from_bytes(cls, b: bytes) -> "HyperLogLog":
        h = cls(p=b[0])
        h.registers = np.frombuffer(b[1:], dtype=np.uint8).copy()
        return h

    # -- estimate ----------------------------------------------------------
    def estimate(self) -> float:
        m = float(self.m)
        alpha = 0.7213 / (1 + 1.079 / m)
        inv = np.exp2(-self.registers.astype(np.float64))
        e = alpha * m * m / inv.sum()
        zeros = int((self.registers == 0).sum())
        if e <= 2.5 * m and zeros:
            return m * np.log(m / zeros)  # linear counting, small range
        return float(e)
