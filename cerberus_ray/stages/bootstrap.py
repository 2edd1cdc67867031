"""Deterministic Poisson bootstrap: confidence intervals in ONE pass.

The production-scale bootstrap (the online/streaming Poisson bootstrap
— Chamandy et al., "Estimating Uncertainty for Massive Data Streams",
Google 2012; public method): instead of resampling rows (impossible in
one pass), each replica r gives every row a Poisson(1) weight, and a
replica's statistic is the weighted mean. Weights here are PURE in
(key, replica, seed) — inverse-CDF lookup on a counter hash — so the
procedure is retry-reproducible and bit-deterministic per block layout
(across layouts only the float summation grouping differs: equal to
the last ulp), unlike an rng-per-task bootstrap.

One streamed pass: each block emits, per replica, (Σ w·x, Σ w) — the
exchange is #blocks × n_replicas × 2 floats, merged by exact sums in
pinned order; the driver derives the replica means and reads the
percentile CI off their empirical distribution. Nothing is O(rows)
anywhere.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..determinism import splitmix64

#: Poisson(1) inverse-CDF table: P(K ≤ k) for k = 0..12 covers all but
#: ~1e-13 of the mass — beyond-table draws clamp to 13 (never observed
#: at double precision)
_POIS1_CDF = np.cumsum(np.exp(-1.0) / np.cumprod(
    np.r_[1.0, np.arange(1, 13, dtype=np.float64)]))


def _poisson_weights(keys_u64: np.ndarray, replica: int,
                     seed: int) -> np.ndarray:
    h = splitmix64(keys_u64 ^ np.uint64(
        (replica * 0x9E3779B97F4A7C15 + seed) & 0xFFFFFFFFFFFFFFFF))
    u = h.astype(np.float64) / 2.0 ** 64
    return np.searchsorted(_POIS1_CDF, u).astype(np.float64)


def bootstrap_mean_ci(ds, value_col: str, key_col: str, *,
                      n_replicas: int = 200, seed: int = 42,
                      alpha: float = 0.05) -> dict:
    """→ ``{"mean", "ci_lo", "ci_hi", "se", "n", "n_replicas"}``: the
    plain mean of ``value_col`` with a percentile bootstrap CI at level
    ``1 − alpha`` from ``n_replicas`` Poisson replicas keyed on
    ``key_col`` (non-negative ints — same contract as the samplers).
    NaN values are excluded."""
    if not 0 < alpha < 1:
        raise ValueError(f"alpha must be in (0,1), got {alpha}")
    R = n_replicas

    def partial(b: pa.Table) -> pa.Table:
        v = b[value_col].to_numpy(zero_copy_only=False).astype(
            np.float64)
        k = b[key_col].to_numpy(zero_copy_only=False).astype(np.uint64)
        ok = ~np.isnan(v)
        v, k = v[ok], k[ok]
        sw = np.empty(2 * R + 2, dtype=np.float64)
        for r in range(R):
            w = _poisson_weights(k, r, seed)
            sw[2 * r] = float(w @ v)
            sw[2 * r + 1] = float(w.sum())
        sw[-2] = float(v.sum())
        sw[-1] = float(len(v))
        return pa.Table.from_pydict({
            "s": pa.array([sw.tobytes()], pa.binary())})

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True).to_pandas()
    acc = np.zeros(2 * R + 2, dtype=np.float64)
    for raw in sorted(parts["s"]):      # order-pinned exact merge
        acc += np.frombuffer(raw, dtype=np.float64)
    n = int(acc[-1])
    if n == 0:
        raise ValueError("no usable rows")
    mean = acc[-2] / n
    wsum = acc[1:2 * R:2]
    means = np.where(wsum > 0, acc[0:2 * R:2] / np.maximum(wsum, 1), np.nan)
    means = means[~np.isnan(means)]
    lo, hi = np.quantile(means, [alpha / 2, 1 - alpha / 2])
    return {"mean": float(mean), "ci_lo": float(lo), "ci_hi": float(hi),
            "se": float(means.std(ddof=1)), "n": n, "n_replicas": R}
