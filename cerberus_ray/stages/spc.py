"""Statistical-process-control charts per key — EWMA and CUSUM.

Sequential monitoring rules that the point-in-time checks cannot
express: a SMALL but SUSTAINED shift in a stream's level passes every
per-row range rule and barely moves a whole-series mean, but an EWMA
or CUSUM statistic accumulates it within a few observations (Roberts
1959; Page 1954 — textbook SPC, public domain). The monitoring triad:
`drift.py` watches distributions, `freshness.py` watches time,
`spc.py` watches level.

Each key's center/scale is self-calibrated from its own first
``warmup`` observations (the "phase I" sample); monitoring starts
after warm-up. Both charts are computed WITHOUT per-row Python via
closed forms:

- EWMA ``z_t = λ x_t + (1−λ) z_{t−1}``, ``z_{-1} = μ̂``: let
  ``m_t`` be pandas' C-implemented ``ewm(adjust=True).mean`` and
  ``c_t = (1−(1−λ)^{t+1})/λ`` its weight mass; then
  ``z_t = (1−λ)^{t+1} μ̂ + λ m_t c_t``. Variance-corrected limits
  ``μ̂ ± L σ̂ √(λ/(2−λ) (1−(1−λ)^{2(t+1)}))``.
- CUSUM ``C⁺_t = max(0, C⁺_{t−1} + z_t − k)`` unrolls to
  ``cs_t − min(0, cummin(cs)_t)`` with ``cs`` the running sum of
  ``z_t − k`` (and symmetrically for C⁻) — grouped cumsum/cummin,
  no recursion.

Ray shape: one hash-bucketed keyed exchange (`keyed_window.keyed_apply`
— whole keys per bucket, vectorized multi-key kernels, Python calls
∝ buckets not keys). Output rows ∝ out-of-control points.

Reference anchor: SURVEY.md §2.8's stream-shaped rule family; the
reference's only sequential rule is the FSM chain check
(cerberus/models/booking.py) — level monitoring is the §2.8 extension.
Tests: tests/test_spc.py (recursion-reference parity, planted-shift
detection, warm-up exemption, layout invariance).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .keyed_window import keyed_apply

__all__ = ["ewma_chart", "cusum_chart"]


def _warmup_stats(df: pd.DataFrame, key_col: str, value_col: str,
                  t: np.ndarray, warmup: int):
    """Per-row (μ̂, σ̂) broadcast from each key's first ``warmup``
    observations (ddof=1)."""
    head = df[t < warmup]
    st = head.groupby(key_col, sort=False)[value_col].agg(
        ["mean", "std"])
    mu = df[key_col].map(st["mean"]).to_numpy(dtype="float64")
    sd = df[key_col].map(st["std"]).to_numpy(dtype="float64")
    return mu, sd


def ewma_chart(ds, key_col: str, ts_col: str, value_col: str, *,
               lam: float = 0.2, L: float = 3.0, warmup: int = 20,
               id_col: str | None = None, n_buckets: int = 32):
    """→ Dataset of out-of-control points: (key, ts, value, ewma,
    center, limit, side) where ``|ewma − μ̂|`` exceeds the
    variance-corrected L-sigma EWMA limit, monitoring only past the
    per-key warm-up. ``side`` ∈ {'high','low'}."""
    if not 0.0 < lam <= 1.0:
        raise ValueError(f"lam must be in (0, 1]: {lam}")
    sort_cols = [key_col, ts_col] + ([id_col] if id_col else [])

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(sort_cols, kind="mergesort"
                            ).reset_index(drop=True)
        g = df.groupby(key_col, sort=False)
        t = g.cumcount().to_numpy()
        mu, sd = _warmup_stats(df, key_col, value_col, t, warmup)
        m = g[value_col].ewm(alpha=lam, adjust=True).mean(
        ).reset_index(level=0, drop=True).sort_index().to_numpy()
        q = 1.0 - lam
        c = (1.0 - q ** (t + 1)) / lam
        z = q ** (t + 1) * mu + lam * (m * c)
        sig = sd * np.sqrt(lam / (2.0 - lam)
                           * (1.0 - q ** (2 * (t + 1))))
        with np.errstate(invalid="ignore"):
            lim = L * sig
            bad = (t >= warmup) & (sd > 0) & (np.abs(z - mu) > lim)
        out = df.loc[bad, [key_col, ts_col, value_col]].copy()
        out["ewma"] = z[bad]
        out["center"] = mu[bad]
        out["limit"] = lim[bad]
        out["side"] = np.where(z[bad] > mu[bad], "high", "low")
        return out

    return keyed_apply(ds, key_col, kernel, n_buckets=n_buckets)


def cusum_chart(ds, key_col: str, ts_col: str, value_col: str, *,
                k: float = 0.5, h: float = 5.0, warmup: int = 20,
                id_col: str | None = None, n_buckets: int = 32):
    """→ Dataset of out-of-control points: (key, ts, value, cusum_pos,
    cusum_neg, side) where either one-sided standardized CUSUM exceeds
    ``h`` after the per-key warm-up. ``k`` is the slack (in σ̂ units);
    classical (k=0.5, h=5) detects ~1σ sustained shifts."""
    sort_cols = [key_col, ts_col] + ([id_col] if id_col else [])

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(sort_cols, kind="mergesort"
                            ).reset_index(drop=True)
        g = df.groupby(key_col, sort=False)
        t = g.cumcount().to_numpy()
        mu, sd = _warmup_stats(df, key_col, value_col, t, warmup)
        with np.errstate(invalid="ignore", divide="ignore"):
            z = (df[value_col].to_numpy(dtype="float64") - mu) / sd
        z = np.where(np.isfinite(z), z, 0.0)
        zs = pd.Series(z, copy=False)
        kg = df[key_col]
        up = zs - k
        cs = up.groupby(kg, sort=False).cumsum()
        cpos = (cs - cs.groupby(kg, sort=False).cummin().clip(upper=0.0)
                ).to_numpy()
        dn = -(zs + k)
        cv = dn.groupby(kg, sort=False).cumsum()
        cneg = (cv - cv.groupby(kg, sort=False).cummin().clip(upper=0.0)
                ).to_numpy()
        bad = (t >= warmup) & (sd > 0) & ((cpos > h) | (cneg > h))
        out = df.loc[bad, [key_col, ts_col, value_col]].copy()
        out["cusum_pos"] = cpos[bad]
        out["cusum_neg"] = cneg[bad]
        out["side"] = np.where(cpos[bad] > h, "high", "low")
        return out

    return keyed_apply(ds, key_col, kernel, n_buckets=n_buckets)
