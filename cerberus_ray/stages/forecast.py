"""Seasonal-naive forecast backtest with MASE, per key.

The standard forecasting baseline + its standard scale-free error
metric (Hyndman & Koehler 2006, public method): forecast(t) =
value(t − season) evaluated against the one-step naive forecaster —
MASE = MAE(seasonal model) / MAE(naive-1); < 1 means the seasonal lag
carries real signal. Lags are in OBSERVATIONS within the key's
time-ordered sequence (the SQL ``LAG(value, season) OVER (PARTITION BY
key ORDER BY ts)`` semantics — the DuckDB oracle in
tests/test_forecast.py), so irregular sampling is the caller's modeling
choice, not a silent reindex.

Execution: one `keyed_apply` hash exchange; each bucket kernel is a
vectorized pandas groupby-shift over whole keys (no per-key Python).
Output is one row per key — bounded by key cardinality.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .keyed_window import keyed_apply


def seasonal_naive_eval(ds, key_col: str, ts_col: str, value_col: str,
                        *, season: int, n_buckets: int = 32,
                        round_digits: int = 6):
    """→ Dataset (key_col, n_evals, mae_model, mae_naive1, mase):
    per-key backtest over every observation where both the seasonal lag
    and the previous observation exist; keys with no evaluable rows (or
    a zero naive error — a constant series) report NaN MASE."""
    if season < 1:
        raise ValueError(f"season must be ≥ 1, got {season}")

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        d = g.sort_values([key_col, ts_col], kind="mergesort")
        grp = d.groupby(key_col, sort=False)[value_col]
        lag_s = grp.shift(season)
        lag_1 = grp.shift(1)
        ok = lag_s.notna() & lag_1.notna()
        err_m = (d[value_col] - lag_s).abs().where(ok)
        err_1 = (d[value_col] - lag_1).abs().where(ok)
        out = pd.DataFrame({
            key_col: d[key_col], "ok": ok.astype(np.int64),
            "em": err_m.fillna(0.0), "e1": err_1.fillna(0.0)})
        r = out.groupby(key_col, as_index=False).sum()
        n = r["ok"].to_numpy()
        mae_m = np.divide(r["em"], np.maximum(n, 1))
        mae_1 = np.divide(r["e1"], np.maximum(n, 1))
        mase = np.where((n > 0) & (mae_1 > 0), mae_m / np.maximum(
            mae_1, 1e-300), np.nan)
        return pd.DataFrame({
            key_col: r[key_col],
            "n_evals": n.astype(np.int64),
            "mae_model": np.round(np.where(n > 0, mae_m, np.nan),
                                  round_digits),
            "mae_naive1": np.round(np.where(n > 0, mae_1, np.nan),
                                   round_digits),
            "mase": np.round(mase, round_digits)})

    return keyed_apply(ds, key_col, kernel, n_buckets=n_buckets)


def conformal_intervals(ds, key_col: str, ts_col: str, value_col: str,
                        *, season: int, alpha: float = 0.1,
                        n_buckets: int = 32,
                        round_digits: int = 6):
    """Split-conformal prediction intervals (Vovk et al. 2005;
    Shafer & Vovk 2008 tutorial) around the seasonal-naive forecaster:
    per key, the calibration scores are the historical absolute
    seasonal-naive residuals, q̂ is their ⌈(n+1)(1−α)⌉-th order
    statistic (the finite-sample-valid conformal quantile), and the
    next-step interval is ŷ ± q̂ with ŷ = y_{T+1−season}.

    Same execution shape as ``seasonal_naive_eval``: one keyed
    exchange, C-vectorized kernel (per-key order statistics via a
    rank-equality mask, no per-key Python), one row per key.

    → Dataset (key_col, n_cal, forecast, lo, hi); NaN row when the
    series is shorter than ``season`` (no forecast) or has no
    calibration residuals."""
    if not 0 < alpha < 1:
        raise ValueError(f"alpha must be in (0,1), got {alpha}")
    if season < 1:
        raise ValueError(f"season must be ≥ 1, got {season}")

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        d = g.sort_values([key_col, ts_col], kind="mergesort")
        grp = d.groupby(key_col, sort=False)[value_col]
        resid = (d[value_col] - grp.shift(season)).abs()
        d = d.assign(__r=resid)
        # per-key forecast: the value `season` ticks before the next
        sizes = d.groupby(key_col, sort=False)[value_col].transform(
            "size")
        pos = d.groupby(key_col, sort=False).cumcount()
        is_fc = pos == (sizes - season)
        fc = (d.loc[is_fc, [key_col, value_col]]
              .rename(columns={value_col: "forecast"}))
        # per-key conformal quantile: k-th smallest residual
        c = d.dropna(subset=["__r"]).sort_values(
            [key_col, "__r"], kind="mergesort")
        n = c.groupby(key_col, sort=False)["__r"].transform("size")
        rank = c.groupby(key_col, sort=False).cumcount() + 1
        k = np.minimum(np.ceil((n.to_numpy() + 1) * (1 - alpha)),
                       n.to_numpy())
        sel = c.loc[rank.to_numpy() == k,
                    [key_col, "__r"]].rename(columns={"__r": "qhat"})
        sel["n_cal"] = n.to_numpy()[rank.to_numpy() == k]
        keys = pd.DataFrame({key_col: d[key_col].unique()})
        out = keys.merge(fc, on=key_col, how="left").merge(
            sel, on=key_col, how="left")
        out["n_cal"] = out["n_cal"].fillna(0).astype("int64")
        out["lo"] = (out["forecast"] - out["qhat"]).round(round_digits)
        out["hi"] = (out["forecast"] + out["qhat"]).round(round_digits)
        out["forecast"] = out["forecast"].round(round_digits)
        return out[[key_col, "n_cal", "forecast", "lo", "hi"]]

    return keyed_apply(ds, key_col, kernel, n_buckets=n_buckets)


def holt_forecast(ds, key_col: str, ts_col: str, value_col: str, *,
                  alpha: float = 0.5, beta: float = 0.3,
                  horizon: int = 1, n_buckets: int = 32,
                  round_digits: int = 6):
    """Holt's linear-trend exponential smoothing (Holt 1957; the
    standard double-exponential forecaster) per key — the trending
    companion of ``seasonal_naive_eval``. Standard init l₀ = y₀,
    b₀ = y₁ − y₀; forecast = l_T + h·b_T.

    The recursion is sequential in TIME but not across series: the
    kernel stacks every same-length series in a bucket into one
    (keys × T) matrix and runs T vectorized steps (time-domain-bounded,
    like every series op here) — no per-key Python.

    → Dataset (key_col, n_obs, level, trend, forecast); a single-point
    series forecasts itself with zero trend."""
    if not (0 < alpha <= 1) or not (0 <= beta <= 1):
        raise ValueError("alpha must be in (0,1], beta in [0,1]")

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        d = g.sort_values([key_col, ts_col], kind="mergesort")
        keys = d[key_col].to_numpy()
        y = d[value_col].to_numpy(dtype=np.float64)
        uk, starts, counts = np.unique(keys, return_index=True,
                                       return_counts=True)
        out_k, out_n, out_l, out_b = [], [], [], []
        for T in np.unique(counts):
            rows = starts[counts == T]
            ks = uk[counts == T]
            mat = y[rows[:, None] + np.arange(T)[None, :]]
            if T == 1:
                lvl = mat[:, 0]
                tr = np.zeros(len(ks))
            else:
                lvl = mat[:, 0].copy()
                tr = mat[:, 1] - mat[:, 0]
                for t in range(1, T):
                    prev = lvl.copy()
                    lvl = alpha * mat[:, t] + (1 - alpha) * (lvl + tr)
                    tr = beta * (lvl - prev) + (1 - beta) * tr
            out_k.append(ks)
            out_n.append(np.full(len(ks), T, dtype=np.int64))
            out_l.append(lvl)
            out_b.append(tr)
        if not out_k:
            return pd.DataFrame({key_col: [], "n_obs": [],
                                 "level": [], "trend": [],
                                 "forecast": []})
        lvl = np.concatenate(out_l)
        tr = np.concatenate(out_b)
        return pd.DataFrame({
            key_col: np.concatenate(out_k),
            "n_obs": np.concatenate(out_n),
            "level": np.round(lvl, round_digits),
            "trend": np.round(tr, round_digits),
            "forecast": np.round(lvl + horizon * tr, round_digits)})

    return keyed_apply(ds, key_col, kernel, n_buckets=n_buckets)


def lag_corr_by_key(ds, key_col: str, order_cols, value_col: str, *,
                    lags=(1, 2, 3), n_buckets: int = 32):
    """Per-key lag autocorrelation → Dataset ``(key_col, lag, n,
    lag_corr)``: Pearson correlation between the key's time-ordered
    value sequence and its ``lag``-observation shift — the SQL
    ``corr(value, LAG(value, k) OVER (PARTITION BY key ORDER BY
    order_cols))`` semantics exactly (pairwise-complete rows; the
    DuckDB oracle in tests/test_forecast.py). This is the
    lag-correlation used to pick seasonal periods / check residual
    whiteness; like the rest of this module, lags count OBSERVATIONS,
    not wall-clock — regularize first if sampling is irregular.

    ``order_cols`` must be a deterministic total order within the key
    (e.g. ``["ts", "event_id"]``) or ties make the shift ambiguous.

    One keyed_apply exchange; the kernel computes all lags with
    groupby-shift + grouped Pearson moment sums over whole buckets —
    no per-key Python. Output is keys × lags rows."""
    lags = [int(k) for k in lags]
    if not lags or min(lags) < 1:
        raise ValueError(f"lags must be ≥ 1, got {lags}")

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        d = g.sort_values([key_col, *order_cols], kind="mergesort")
        grp = d.groupby(key_col, sort=False)[value_col]
        frames = []
        for k in lags:
            lag = grp.shift(k)
            ok = lag.notna() & d[value_col].notna()
            x = d[value_col].where(ok, 0.0).to_numpy(dtype=np.float64)
            y = lag.where(ok, 0.0).to_numpy(dtype=np.float64)
            t = pd.DataFrame({
                key_col: d[key_col], "n": ok.to_numpy(np.int64),
                "sx": x, "sy": y, "sxx": x * x, "syy": y * y,
                "sxy": x * y})
            r = t.groupby(key_col, as_index=False, sort=False).sum()
            n = r["n"].to_numpy(dtype=np.float64)
            cov = n * r["sxy"] - r["sx"] * r["sy"]
            vx = n * r["sxx"] - r["sx"] ** 2
            vy = n * r["syy"] - r["sy"] ** 2
            with np.errstate(invalid="ignore", divide="ignore"):
                rho = np.where((n >= 2) & (vx > 0) & (vy > 0),
                               cov / np.sqrt(vx * vy), np.nan)
            frames.append(pd.DataFrame({
                key_col: r[key_col],
                "lag": np.full(len(r), k, dtype=np.int64),
                "n": r["n"].astype(np.int64), "lag_corr": rho}))
        return pd.concat(frames, ignore_index=True)

    return keyed_apply(ds, key_col, kernel, n_buckets=n_buckets)


def pacf_by_key(ds, key_col: str, order_cols, value_col: str, *,
                max_lag: int = 3, n_buckets: int = 32):
    """Per-key partial autocorrelation → Dataset ``(key_col, lag, n,
    pacf)`` for lags 1..max_lag: the Durbin–Levinson recursion over the
    key's BIASED sample ACF (ρ_k = Σ(x_t−x̄)(x_{t+k}−x̄) / Σ(x_t−x̄)²,
    full-series mean and denominator — the standard stationary
    estimator, NOT lag_corr's pairwise-complete Pearson). PACF is the
    AR-order diagnostic: an AR(p) key cuts off after lag p.

    One keyed_apply exchange; the bucket kernel computes every key's
    ACF with groupby-shift products and runs Durbin–Levinson VECTORIZED
    ACROSS KEYS (the k ≤ max_lag recursion is a constant-size loop of
    array ops — no per-key Python). Keys with n ≤ lag (or a degenerate
    constant series) emit NaN. Yule-Walker solve parity + AR(1) cutoff
    property in tests/test_forecast.py."""
    K = int(max_lag)
    if K < 1:
        raise ValueError(f"max_lag must be ≥ 1, got {max_lag}")

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        d = g.sort_values([key_col, *order_cols], kind="mergesort")
        grp = d.groupby(key_col, sort=False)
        x = d[value_col].to_numpy(dtype=np.float64)
        # center on the full per-key mean
        mean = grp[value_col].transform("mean").to_numpy(
            dtype=np.float64)
        dev = x - mean
        dd = pd.DataFrame({key_col: d[key_col].to_numpy(),
                           "dev": dev})
        per = dd.groupby(key_col, as_index=False, sort=False).agg(
            n=("dev", "size"))
        keys = per[key_col].to_numpy()
        n = per["n"].to_numpy(np.float64)
        ss = dd.assign(s=dev * dev).groupby(
            key_col, sort=False)["s"].sum().to_numpy(np.float64)
        rho = np.ones((len(keys), K + 1))
        sgrp = dd.groupby(key_col, sort=False)["dev"]
        for k in range(1, K + 1):
            lag = sgrp.shift(k)
            prod = np.where(lag.isna().to_numpy(), 0.0,
                            dev * lag.fillna(0.0).to_numpy())
            num = pd.DataFrame({key_col: dd[key_col],
                                "p": prod}).groupby(
                key_col, sort=False)["p"].sum().to_numpy(np.float64)
            with np.errstate(invalid="ignore", divide="ignore"):
                rho[:, k] = np.where((ss > 0) & (n > k), num / ss,
                                     np.nan)
        # Durbin–Levinson, vectorized across keys
        phi = np.zeros((len(keys), K + 1, K + 1))
        pacf = np.full((len(keys), K + 1), np.nan)
        if K >= 1:
            phi[:, 1, 1] = rho[:, 1]
            pacf[:, 1] = rho[:, 1]
        for k in range(2, K + 1):
            num = rho[:, k].copy()
            den = np.ones(len(keys))
            for j in range(1, k):
                num -= phi[:, k - 1, j] * rho[:, k - j]
                den -= phi[:, k - 1, j] * rho[:, j]
            with np.errstate(invalid="ignore", divide="ignore"):
                pkk = np.where(np.abs(den) > 1e-15, num / den, np.nan)
            phi[:, k, k] = np.where(np.isnan(pkk), 0.0, pkk)
            for j in range(1, k):
                phi[:, k, j] = (phi[:, k - 1, j]
                                - phi[:, k, k] * phi[:, k - 1, k - j])
            pacf[:, k] = pkk
        frames = []
        for k in range(1, K + 1):
            frames.append(pd.DataFrame({
                key_col: keys,
                "lag": np.full(len(keys), k, dtype=np.int64),
                "n": per["n"].to_numpy(np.int64),
                "pacf": pacf[:, k]}))
        return pd.concat(frames, ignore_index=True)

    return keyed_apply(ds, key_col, kernel, n_buckets=n_buckets)
