"""Classical additive seasonal decomposition (trend / seasonal /
residual — the moving-average method of Macaulay 1931, the default
`decompose` in every stats package) over a regularly-spaced series.

Scale shape: the SERIES is time-domain-bounded (days × keys), so the
distributed work is producing it — the engine's bounded grouped
aggregates do that — and the decomposition itself is closed-form
driver arithmetic over those bounded rows, exactly like the Benford
histogram or the drift profile. No row-proportional driver state ever.

Semantics (parity-tested against a DuckDB window formulation):
- trend: centered moving average of length ``period`` (odd periods
  only here — the 2×m even-period convention doubles the window
  bookkeeping without adding coverage for weekly/monthly seasons);
  NULL where the full window doesn't exist (the standard edge rule).
- seasonal: per-position mean of (value − trend) over rows with a
  trend, re-centered to sum to zero across positions.
- resid: value − trend − seasonal (NULL where trend is NULL).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

__all__ = ["seasonal_decompose_series", "seasonal_strength"]


def seasonal_decompose_series(series: pd.DataFrame, value_col: str,
                              period: int, *,
                              round_digits: int = 6) -> pd.DataFrame:
    """Decompose an ORDERED regular series (one row per tick; the
    caller produces it with a bounded grouped aggregate and fills
    gaps). → input frame + (trend, seasonal, resid) columns."""
    if period < 3 or period % 2 == 0:
        raise ValueError("period must be an odd integer >= 3")
    v = series[value_col].to_numpy(dtype=np.float64)
    n = len(v)
    half = period // 2
    trend = np.full(n, np.nan)
    if n >= period:
        c = np.cumsum(np.concatenate([[0.0], v]))
        trend[half:n - half] = (c[period:] - c[:-period]) / period
    detr = v - trend
    pos = np.arange(n) % period
    seasonal_means = np.full(period, np.nan)
    for p in range(period):
        m = (pos == p) & ~np.isnan(detr)
        if m.any():
            seasonal_means[p] = detr[m].mean()
    seasonal_means -= np.nanmean(seasonal_means)
    seas = seasonal_means[pos]
    resid = v - trend - seas
    out = series.copy()
    out["trend"] = np.round(trend, round_digits)
    out["seasonal"] = np.round(seas, round_digits)
    out["resid"] = np.round(resid, round_digits)
    return out


def seasonal_strength(decomp: pd.DataFrame, *,
                      round_digits: int = 6) -> float:
    """Hyndman's seasonal-strength statistic
    F = max(0, 1 − Var(resid)/Var(seasonal + resid)) ∈ [0, 1]."""
    d = decomp.dropna(subset=["trend"])
    r = d["resid"].to_numpy(dtype=np.float64)
    sr = r + d["seasonal"].to_numpy(dtype=np.float64)
    if len(r) < 2 or np.var(sr) == 0:
        return float("nan")
    return round(max(0.0, 1.0 - np.var(r) / np.var(sr)), round_digits)
