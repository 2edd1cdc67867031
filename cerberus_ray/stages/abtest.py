"""Two-sample (A/B) analysis: Welch's t-test per metric from one pass
of moment partials.

The experiment-readout primitive: for each metric column, compare
treatment vs control with the unequal-variance t statistic (Welch
1947, public method), Welch–Satterthwaite degrees of freedom, relative
lift, and a two-sided p-value via the normal approximation —
``erfc(|t|/√2)`` — which is what large-sample experiment analysis uses
(df in the thousands makes the t and normal tails indistinguishable;
the approximation is DOCUMENTED, not silent: ``p_approx``).

One streamed pass: per (group, block) partials (n, Σx, Σx²) per metric
— sums merge exactly, so the test statistic is deterministic and the
exchange is #blocks × #metrics × 3 floats. The DuckDB oracle mirrors
the statistic from AVG/VAR_SAMP exactly (tests/test_abtest.py).
"""

from __future__ import annotations

import math
from typing import Sequence

import numpy as np
import pandas as pd
import pyarrow as pa


def bh_adjust(pvals: Sequence[float]) -> np.ndarray:
    """Benjamini–Hochberg adjusted p-values (FDR control across the
    metric family — Benjamini & Hochberg 1995, public method): the
    step-up procedure's q-values, monotone-enforced from the largest
    rank down. Driver math — a readout has a handful of metrics."""
    p = np.asarray(pvals, dtype=np.float64)
    m = len(p)
    order = np.argsort(p, kind="mergesort")
    ranked = p[order] * m / (np.arange(m) + 1)
    # enforce monotonicity from the tail, clip at 1
    q = np.minimum.accumulate(ranked[::-1])[::-1]
    out = np.empty(m)
    out[order] = np.minimum(q, 1.0)
    return out


def welch_ab_test(ds, group_col: str, metric_cols: Sequence[str], *,
                  control, treatment) -> pd.DataFrame:
    """→ frame (metric, n_control, n_treatment, mean_control,
    mean_treatment, lift, t_stat, df, p_approx). Rows outside the two
    groups are ignored; NULL metric values are excluded per metric."""
    cols = list(metric_cols)

    def partial(b: pa.Table) -> pa.Table:
        g = b[group_col].to_numpy(zero_copy_only=False)
        rows = {"g": [], "m": [], "n": [], "s1": [], "s2": []}
        for grp, name in ((control, "c"), (treatment, "t")):
            mask = g == grp
            for c in cols:
                v = b[c].to_numpy(zero_copy_only=False).astype(
                    np.float64)[mask]
                v = v[~np.isnan(v)]
                rows["g"].append(name)
                rows["m"].append(c)
                rows["n"].append(len(v))
                rows["s1"].append(float(v.sum()))
                rows["s2"].append(float((v * v).sum()))
        return pa.Table.from_pydict({
            "g": pa.array(rows["g"], pa.string()),
            "m": pa.array(rows["m"], pa.string()),
            "n": pa.array(rows["n"], pa.int64()),
            "s1": pa.array(rows["s1"], pa.float64()),
            "s2": pa.array(rows["s2"], pa.float64())})

    parts = (ds.map_batches(partial, batch_format="pyarrow",
                            zero_copy_batch=True).to_pandas()
             .sort_values(["g", "m"])   # order-pinned float merge
             .groupby(["g", "m"], as_index=False).sum())
    out = []
    for c in cols:
        st = {}
        for name in ("c", "t"):
            r = parts[(parts["g"] == name) & (parts["m"] == c)]
            n = int(r["n"].sum())
            if n < 2:
                raise ValueError(
                    f"group {name!r} has {n} usable rows for {c!r} — "
                    f"need ≥ 2 for a variance")
            s1, s2 = float(r["s1"].sum()), float(r["s2"].sum())
            mean = s1 / n
            var = (s2 - n * mean * mean) / (n - 1)   # sample variance
            st[name] = (n, mean, max(var, 0.0))
        (nc, mc, vc), (nt, mt, vt) = st["c"], st["t"]
        se2 = vc / nc + vt / nt
        t = (mt - mc) / math.sqrt(se2) if se2 > 0 else float("inf")
        df = (se2 * se2 / ((vc / nc) ** 2 / (nc - 1)
                           + (vt / nt) ** 2 / (nt - 1))
              if vc > 0 or vt > 0 else float(nc + nt - 2))
        p = math.erfc(abs(t) / math.sqrt(2.0))
        out.append({
            "metric": c, "n_control": nc, "n_treatment": nt,
            "mean_control": round(mc, 6),
            "mean_treatment": round(mt, 6),
            "lift": round((mt - mc) / mc, 6) if mc != 0 else np.nan,
            "t_stat": round(t, 6), "df": round(df, 2),
            "p_approx": round(p, 8)})
    res = pd.DataFrame(out)
    # multi-metric families get FDR-adjusted q-values alongside
    res["p_bh"] = np.round(bh_adjust(res["p_approx"].to_numpy()), 8)
    return res


def cuped_ab_test(ds, group_col: str, metric_col: str,
                  covariate_col: str, *, control, treatment,
                  round_digits: int = 6) -> pd.DataFrame:
    """CUPED variance reduction (Deng, Xu, Kohavi & Walker, WSDM
    2013 — public method): adjust the experiment metric with a
    pre-experiment covariate, Y' = Y − θ(X − X̄), θ = cov(X,Y)/var(X)
    pooled across both arms, then run the same Welch readout on Y'.
    θ is estimated from pre-treatment-correlated structure, so the
    adjustment is unbiased for the treatment effect while shrinking
    variance by the squared correlation.

    One pass of per-(arm, block) joint-moment partials
    (n, Σx, Σy, Σxy, Σx², Σy'-moments derive on the driver) — the
    exchange is a handful of floats per block, same contract as
    ``welch_ab_test``.

    → one-row frame (n_control, n_treatment, theta, lift_raw,
    lift_cuped, var_reduction, t_raw, t_cuped, p_raw, p_cuped)."""
    import math

    def partial(b: pa.Table) -> pa.Table:
        g = b[group_col].to_numpy(zero_copy_only=False)
        rows = {"g": [], "n": [], "sx": [], "sy": [], "sxy": [],
                "sx2": [], "sy2": []}
        for grp, name in ((control, "c"), (treatment, "t")):
            mask = g == grp
            x = b[covariate_col].to_numpy(zero_copy_only=False).astype(
                np.float64)[mask]
            y = b[metric_col].to_numpy(zero_copy_only=False).astype(
                np.float64)[mask]
            ok = ~(np.isnan(x) | np.isnan(y))
            x, y = x[ok], y[ok]
            rows["g"].append(name)
            rows["n"].append(len(x))
            rows["sx"].append(float(x.sum()))
            rows["sy"].append(float(y.sum()))
            rows["sxy"].append(float((x * y).sum()))
            rows["sx2"].append(float((x * x).sum()))
            rows["sy2"].append(float((y * y).sum()))
        return pa.Table.from_pydict(
            {k: pa.array(v) for k, v in rows.items()})

    parts = (ds.map_batches(partial, batch_format="pyarrow",
                            zero_copy_batch=True).to_pandas()
             .sort_values(["g", "sx"])  # order-pinned float merge
             .groupby("g", as_index=False).sum())
    s = parts.set_index("g")
    n_c, n_t = int(s.loc["c", "n"]), int(s.loc["t", "n"])
    if n_c < 2 or n_t < 2:
        raise ValueError("each arm needs at least 2 complete rows")
    # pooled theta over both arms
    N = n_c + n_t
    sx, sy = s["sx"].sum(), s["sy"].sum()
    sxy, sx2 = s["sxy"].sum(), s["sx2"].sum()
    var_x = sx2 - sx * sx / N
    theta = (sxy - sx * sy / N) / var_x if var_x > 0 else 0.0
    xbar = sx / N

    def arm_stats(name):
        n = s.loc[name, "n"]
        my = s.loc[name, "sy"] / n
        mx = s.loc[name, "sx"] / n
        vy = (s.loc[name, "sy2"] - n * my * my) / (n - 1)
        # Y' = Y − θ(X − x̄): var(Y') = var(Y) + θ²var(X) − 2θcov
        vx = (s.loc[name, "sx2"] - n * mx * mx) / (n - 1)
        cxy = (s.loc[name, "sxy"] - n * mx * my) / (n - 1)
        my_adj = my - theta * (mx - xbar)
        vy_adj = vy + theta * theta * vx - 2 * theta * cxy
        return n, my, vy, my_adj, vy_adj

    def welch(m1, v1, n1, m2, v2, n2):
        se2 = v1 / n1 + v2 / n2
        t = (m2 - m1) / math.sqrt(se2) if se2 > 0 else float("nan")
        p = math.erfc(abs(t) / math.sqrt(2)) if t == t else float("nan")
        return t, p

    nc, myc, vyc, mac, vac = arm_stats("c")
    nt, myt, vyt, mat_, vat = arm_stats("t")
    t_raw, p_raw = welch(myc, vyc, nc, myt, vyt, nt)
    t_cu, p_cu = welch(mac, vac, nc, mat_, vat, nt)
    vr = 1.0 - (vac / nc + vat / nt) / (vyc / nc + vyt / nt) \
        if (vyc / nc + vyt / nt) > 0 else float("nan")
    return pd.DataFrame([{
        "n_control": n_c, "n_treatment": n_t,
        "theta": round(float(theta), round_digits),
        "lift_raw": round(float(myt - myc), round_digits),
        "lift_cuped": round(float(mat_ - mac), round_digits),
        "var_reduction": round(float(vr), round_digits),
        "t_raw": round(t_raw, round_digits),
        "t_cuped": round(t_cu, round_digits),
        "p_raw": round(p_raw, round_digits),
        "p_cuped": round(p_cu, round_digits)}])


# ---------------------------------------------------------------------------
# Bayesian A/B — Beta-Binomial posterior over conversion rates
# ---------------------------------------------------------------------------

def _beta_logpdf_grid(a: float, b: float, x: np.ndarray) -> np.ndarray:
    from math import lgamma

    return ((a - 1) * np.log(x) + (b - 1) * np.log1p(-x)
            + lgamma(a + b) - lgamma(a) - lgamma(b))


def prob_b_beats_a(a_a: float, b_a: float, a_b: float, b_b: float, *,
                   grid: int = 8192) -> float:
    """P(p_B > p_A) for independent Beta posteriors by deterministic
    trapezoid quadrature of f_B(x)·F_A(x) (closed-form-parity-tested
    for integer parameters against the Evan Miller sum)."""
    x = (np.arange(1, grid) / grid)
    fa = np.exp(_beta_logpdf_grid(a_a, b_a, x))
    fb = np.exp(_beta_logpdf_grid(a_b, b_b, x))
    Fa = np.cumsum((fa[:-1] + fa[1:]) / 2) / grid
    Fa = np.concatenate([[0.0], Fa])
    val = float(np.trapz(fb * Fa, x))
    # renormalize for pdf mass lost to the open grid ends
    mass = float(np.trapz(fb, x))
    return min(max(val / max(mass, 1e-12), 0.0), 1.0)


def bayes_ab_test(ds, group_col: str, success_col: str, *, control,
                  treatment, prior_alpha: float = 1.0,
                  prior_beta: float = 1.0,
                  grid: int = 8192) -> pd.DataFrame:
    """Beta-Binomial Bayesian A/B on a 0/1 ``success_col``: one
    mergeable (n, successes)-per-arm census → posterior
    Beta(α+s, β+n−s) per arm → P(treatment beats control) and the
    expected posterior lift by the same deterministic quadrature.
    → one row (n_*, conv_*, prob_beats, expected_lift)."""
    def partial(b: pa.Table) -> pa.Table:
        g = b[group_col].to_numpy(zero_copy_only=False)
        y = b[success_col].to_numpy(zero_copy_only=False)
        rows = {"g": [], "n": [], "s": []}
        for grp, name in ((control, "c"), (treatment, "t")):
            m = g == grp
            rows["g"].append(name)
            rows["n"].append(int(m.sum()))
            rows["s"].append(int(np.asarray(y, dtype=np.float64)[m]
                                 .sum()))
        return pa.Table.from_pydict(rows)

    p = (ds.map_batches(partial, batch_format="pyarrow",
                        zero_copy_batch=True)
         .to_pandas().groupby("g", as_index=False).sum())
    d = p.set_index("g")
    nc, sc = int(d.loc["c", "n"]), int(d.loc["c", "s"])
    nt, st = int(d.loc["t", "n"]), int(d.loc["t", "s"])
    if min(nc, nt) == 0:
        raise ValueError("both arms need rows")
    a_c, b_c = prior_alpha + sc, prior_beta + nc - sc
    a_t, b_t = prior_alpha + st, prior_beta + nt - st
    prob = prob_b_beats_a(a_c, b_c, a_t, b_t, grid=grid)
    lift = a_t / (a_t + b_t) - a_c / (a_c + b_c)
    return pd.DataFrame([{
        "n_control": nc, "n_treatment": nt,
        "conv_control": round(sc / nc, 6),
        "conv_treatment": round(st / nt, 6),
        "prob_beats": round(prob, 6),
        "expected_lift": round(float(lift), 6)}])
