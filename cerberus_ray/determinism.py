"""Counter-based deterministic randomness.

The generator and the skew/salting machinery need randomness that is a pure
function of (seed, index) — identical no matter how Ray splits the index
range into blocks, so that golden expected outputs are computable exactly
(FIXTURES.md) and retried tasks regenerate byte-identical data.

splitmix64 is a public-domain mixing function (Steele, Lea & Flood,
"Fast Splittable Pseudorandom Number Generators", OOPSLA 2014); vectorized
here over numpy uint64 arrays.
"""

from __future__ import annotations

import numpy as np

_GOLDEN = np.uint64(0x9E3779B97F4A7C15)
_M1 = np.uint64(0xBF58476D1CE4E5B9)
_M2 = np.uint64(0x94D049BB133111EB)


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer: uint64 array -> uint64 array."""
    z = (x.astype(np.uint64) + _GOLDEN)
    with np.errstate(over="ignore"):
        z = (z ^ (z >> np.uint64(30))) * _M1
        z = (z ^ (z >> np.uint64(27))) * _M2
        z = z ^ (z >> np.uint64(31))
    return z


def hash_idx(idx: np.ndarray, seed: int, salt: int = 0) -> np.ndarray:
    """Deterministic uint64 hash of an index array under (seed, salt)."""
    base = np.uint64(seed & 0xFFFFFFFFFFFFFFFF) ^ splitmix64(
        np.asarray([salt], dtype=np.uint64)
    )
    return splitmix64(idx.astype(np.uint64) ^ base)


def uniform01(idx: np.ndarray, seed: int, salt: int = 0) -> np.ndarray:
    """Deterministic float64 in [0, 1) per index."""
    return hash_idx(idx, seed, salt).astype(np.float64) / 2.0**64


def randint(idx: np.ndarray, seed: int, salt: int, low: int, high: int) -> np.ndarray:
    """Deterministic int64 in [low, high) per index."""
    span = np.uint64(high - low)
    return (hash_idx(idx, seed, salt) % span).astype(np.int64) + low


def hash_strings(arr) -> np.ndarray:
    """Deterministic uint64 hash of a string sequence.

    Used for hash-partitioning / exact-dedup bucket keys. Stable across
    processes and runs (unlike Python's salted ``hash``). Fast path is
    polars' vectorized 64-bit hash (fixed seeds → run-to-run stable for a
    given polars version); fallback is a pure-Python crc mix.
    """
    import pyarrow as pa

    try:
        import polars as pl

        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        if isinstance(arr, pa.Array):
            s = pl.from_arrow(arr)  # zero-copy
            if s.dtype != pl.Utf8:
                s = s.cast(pl.Utf8)
        elif isinstance(arr, pl.Series):
            s = arr
        else:
            s = pl.Series(values=list(arr), dtype=pl.Utf8)
        return s.hash(seed=0).fill_null(0).to_numpy().astype(np.uint64)
    except Exception:
        import zlib

        out = np.empty(len(arr), dtype=np.uint64)
        for i, s in enumerate(arr):
            if s is None:
                out[i] = 0
            else:
                b = s.encode("utf-8") if isinstance(s, str) else bytes(s)
                out[i] = (
                    np.uint64(zlib.crc32(b))
                    ^ (np.uint64(zlib.crc32(b[::-1])) << np.uint64(32))
                    ^ np.uint64(len(b))
                )
        return splitmix64(out)


def hash_keys(arr) -> np.ndarray:
    """uint64 hash of a key array for sketch updates: integer dtypes go
    through splitmix64 directly; strings (including Arrow string arrays,
    passed through UNCONVERTED so hash_strings' zero-copy polars path
    applies) through hash_strings. The shared dispatch for
    Bloom/CMS/HLL — one definition, one semantics."""
    import pyarrow as pa

    if isinstance(arr, (pa.Array, pa.ChunkedArray)):
        if pa.types.is_integer(arr.type):
            return splitmix64(
                arr.to_numpy(zero_copy_only=False).astype(np.uint64))
        return hash_strings(arr)
    a = np.asarray(arr)
    if a.dtype.kind in "iu":
        return splitmix64(a.astype(np.uint64))
    return hash_strings(a)


def round_away(x, ndigits: int = 2) -> np.ndarray:
    """SQL ROUND semantics (half away from zero) with a CORRECTLY-ROUNDED
    result double.

    arrow's ``pc.round`` rescales by multiplying with the inverse power
    of ten, which leaves e.g. 657.55 as 657.5500000000001 — an ulp off
    the double DuckDB's ROUND returns, so bit-exact oracle comparisons
    fail even though the decimal value is identical. Scaling up,
    flooring at ±0.5, and ONE true division yields the nearest double
    to the decimal value on every element."""
    v = np.asarray(x, dtype=np.float64)
    p = 10.0 ** ndigits
    y = v * p
    return np.where(y >= 0, np.floor(y + 0.5), np.ceil(y - 0.5)) / p
