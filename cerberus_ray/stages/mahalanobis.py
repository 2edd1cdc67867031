"""Mahalanobis-distance outlier scores from exact mergeable moments.

The PARAMETRIC multivariate outlier leg: the isolation forest
(`pipelines/iforest.py`) is model-free and sample-fit; Mahalanobis
distance d²(x) = (x−μ)ᵀ Σ⁻¹ (x−μ) is EXACT over the full dataset
because its sufficient statistics (n, Σx, Σxxᵀ) are one tiny mergeable
partial per block — the textbook two-pass shape (profile pass →
broadcast (μ, Σ⁻¹) → streamed scoring pass). Under multivariate
normality d² ~ χ²_d, so the flag threshold is the χ² quantile
(Wilson-Hilferty closed-form approximation — no scipy in the sandbox,
accuracy documented in the tests against exact small-case values).

Degenerate (rank-deficient) covariance gets a ridge of
``eps·trace/d`` — documented, deterministic — rather than a pinv
surprise.
"""

from __future__ import annotations

from typing import List, Sequence

import numpy as np
import pandas as pd
import pyarrow as pa

import ray

__all__ = ["mahalanobis_profile", "score_mahalanobis",
           "mahalanobis_outlier_report", "chi2_quantile"]


def chi2_quantile(p: float, df: int) -> float:
    """Wilson-Hilferty: χ²_df quantile ≈ df·(1 − 2/(9df) + z·√(2/(9df)))³
    with z the normal quantile (Acklam rational approximation)."""
    if not 0 < p < 1:
        raise ValueError("p in (0,1)")
    # Acklam's inverse normal CDF (public-domain rational approx)
    a = [-3.969683028665376e+01, 2.209460984245205e+02,
         -2.759285104469687e+02, 1.383577518672690e+02,
         -3.066479806614716e+01, 2.506628277459239e+00]
    b = [-5.447609879822406e+01, 1.615858368580409e+02,
         -1.556989798598866e+02, 6.680131188771972e+01,
         -1.328068155288572e+01]
    c = [-7.784894002430293e-03, -3.223964580411365e-01,
         -2.400758277161838e+00, -2.549732539343734e+00,
         4.374664141464968e+00, 2.938163982698783e+00]
    d = [7.784695709041462e-03, 3.224671290700398e-01,
         2.445134137142996e+00, 3.754408661907416e+00]
    plow, phigh = 0.02425, 1 - 0.02425
    if p < plow:
        q = np.sqrt(-2 * np.log(p))
        z = ((((((c[0] * q + c[1]) * q + c[2]) * q + c[3]) * q + c[4])
              * q + c[5])
             / ((((d[0] * q + d[1]) * q + d[2]) * q + d[3]) * q + 1))
    elif p <= phigh:
        q = p - 0.5
        r = q * q
        z = ((((((a[0] * r + a[1]) * r + a[2]) * r + a[3]) * r + a[4])
              * r + a[5]) * q
             / (((((b[0] * r + b[1]) * r + b[2]) * r + b[3]) * r + b[4])
                * r + 1))
    else:
        q = np.sqrt(-2 * np.log(1 - p))
        z = -((((((c[0] * q + c[1]) * q + c[2]) * q + c[3]) * q + c[4])
               * q + c[5])
              / ((((d[0] * q + d[1]) * q + d[2]) * q + d[3]) * q + 1))
    h = 2.0 / (9.0 * df)
    return float(df * (1.0 - h + z * np.sqrt(h)) ** 3)


def mahalanobis_profile(ds, cols: Sequence[str], *,
                        eps: float = 1e-9) -> tuple:
    """One streamed pass → (mean (d,), inverse covariance (d, d), n).
    NaN rows are excluded from the moments."""
    cols = list(cols)
    d = len(cols)
    if d == 0:
        raise ValueError("cols must be non-empty")

    def partial(b: pa.Table) -> pa.Table:
        X = np.column_stack([
            b[c].to_numpy(zero_copy_only=False).astype(np.float64)
            for c in cols])
        X = X[~np.isnan(X).any(axis=1)]
        return pa.Table.from_pydict({
            "n": pa.array([len(X)], pa.int64()),
            "sx": [X.sum(axis=0).tobytes()],
            "sxx": [(X.T @ X).tobytes()]})

    p = ds.map_batches(partial, batch_format="pyarrow",
                       zero_copy_batch=True).to_pandas()
    n = int(p["n"].sum())
    if n < d + 1:
        raise ValueError(f"need > {d} complete rows, got {n}")
    sx = sum(np.frombuffer(x) for x in p["sx"])
    sxx = sum(np.frombuffer(x).reshape(d, d) for x in p["sxx"])
    mu = sx / n
    cov = sxx / n - np.outer(mu, mu)
    cov = cov * (n / (n - 1))                     # sample covariance
    ridge = eps * max(np.trace(cov) / d, 1.0)
    inv = np.linalg.inv(cov + ridge * np.eye(d))
    return mu, inv, n


def score_mahalanobis(ds, cols: Sequence[str], mu: np.ndarray,
                      inv: np.ndarray, *, out_col: str = "d2"):
    """Append d²(x); NaN rows score null."""
    cols = list(cols)
    ref = ray.put((np.asarray(mu), np.asarray(inv)))

    def score(b: pa.Table, _ref=ref) -> pa.Table:
        m, iv = ray.get(_ref)
        X = np.column_stack([
            b[c].to_numpy(zero_copy_only=False).astype(np.float64)
            for c in cols])
        ok = ~np.isnan(X).any(axis=1)
        z = X - m[None, :]
        d2 = np.einsum("ij,jk,ik->i", z, iv, z)
        return b.append_column(out_col, pa.array(
            np.where(ok, d2, np.nan), pa.float64()))

    return ds.map_batches(score, batch_format="pyarrow",
                          zero_copy_batch=True)


def mahalanobis_outlier_report(ds, cols: Sequence[str], *,
                               p: float = 0.999) -> pa.Table:
    """Two-pass report: profile → flag rows with d² above the χ²_d
    ``p``-quantile. → one row (n_rows, n_flagged, threshold, max_d2,
    mean_d2)."""
    cols = list(cols)
    mu, inv, n = mahalanobis_profile(ds, cols)
    thr = chi2_quantile(p, len(cols))
    scored = score_mahalanobis(ds, cols, mu, inv)

    def part(b: pa.Table) -> pa.Table:
        s = b["d2"].to_numpy(zero_copy_only=False)
        s = s[~np.isnan(s)]
        return pa.Table.from_pydict({
            "n": pa.array([len(s)], pa.int64()),
            "flag": pa.array([int((s > thr).sum())], pa.int64()),
            "mx": pa.array([float(s.max()) if len(s) else 0.0]),
            "sm": pa.array([float(s.sum())])})

    pr = scored.map_batches(part, batch_format="pyarrow").to_pandas()
    tot = int(pr["n"].sum())
    return pa.Table.from_pydict({
        "n_rows": pa.array([tot], pa.int64()),
        "n_flagged": pa.array([int(pr["flag"].sum())], pa.int64()),
        "threshold": pa.array([round(thr, 4)]),
        "max_d2": pa.array([round(float(pr["mx"].max()), 4)]),
        "mean_d2": pa.array([round(float(pr["sm"].sum() / max(tot, 1)),
                                   4)])})
