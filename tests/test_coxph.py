"""Cox PH: single-process Newton reference parity, planted
hazard-ratio recovery, monotone partial likelihood, Breslow ties,
layout invariance, guards."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from cerberus_ray.pipelines.coxph import fit_coxph


def _cohort(n=2000, seed=29, tie_grid=None):
    """Exponential survival with hazard exp(0.7·x1 − 0.4·x2);
    independent exponential censoring (~30%)."""
    rng = np.random.default_rng(seed)
    x1 = rng.standard_normal(n)
    x2 = rng.standard_normal(n)
    lam = np.exp(0.7 * x1 - 0.4 * x2)
    t_event = rng.exponential(1.0 / lam)
    t_cens = rng.exponential(2.0, n)
    t = np.minimum(t_event, t_cens)
    if tie_grid:
        t = np.ceil(t * tie_grid) / tie_grid
    return pd.DataFrame({"x1": x1, "x2": x2, "time": t,
                         "event": (t_event <= t_cens).astype(int)})


def _reference(df, cols, n_iters, reg=1e-8):
    """Dense Breslow Newton (same math, one process)."""
    X = df[cols].to_numpy(np.float64)
    t = df["time"].to_numpy(np.float64)
    ev = df["event"].to_numpy(np.float64)
    w = np.zeros(X.shape[1])
    lls = []
    for _ in range(n_iters + 1):
        r = np.exp(np.clip(X @ w, -30, 30))
        times = np.unique(t)
        ll, grad = 0.0, -reg * w
        H = reg * np.eye(X.shape[1])
        for tt in times:
            risk = t >= tt
            at = (t == tt) & (ev == 1)
            dt = at.sum()
            if dt == 0:
                continue
            S0 = r[risk].sum()
            S1 = (X[risk] * r[risk, None]).sum(axis=0)
            S2 = (r[risk, None, None]
                  * X[risk, :, None] * X[risk, None, :]).sum(axis=0)
            ll += (X[at] @ w).sum() - dt * np.log(S0)
            Z = S1 / S0
            grad = grad + X[at].sum(axis=0) - dt * Z
            H += dt * (S2 / S0 - np.outer(Z, Z))
        lls.append(round(ll / ev.sum(), 10))
        if len(lls) == n_iters + 1:
            break
        w = w + np.linalg.solve(H, grad)
    return w, lls


def test_matches_reference_with_ties(ray_session):
    df = _cohort(n=400, tie_grid=20)     # coarse grid → real ties
    m = fit_coxph(rd.from_pandas(df, override_num_blocks=4), "time",
                  "event", ["x1", "x2"], n_iters=5)
    w, lls = _reference(df, ["x1", "x2"], 5)
    np.testing.assert_allclose(m.coef, w, atol=1e-8)
    np.testing.assert_allclose(m.loglik, lls, atol=1e-8)


def test_hazard_ratio_recovery_and_monotone_ll(ray_session):
    df = _cohort()
    m = fit_coxph(rd.from_pandas(df, override_num_blocks=5), "time",
                  "event", ["x1", "x2"], n_iters=8)
    assert abs(m.coef[0] - 0.7) < 0.12, m.coef
    assert abs(m.coef[1] + 0.4) < 0.12, m.coef
    hr = m.hazard_ratios()
    assert hr["x1"] > 1.5 and hr["x2"] < 0.8
    ll = m.loglik
    assert all(b >= a - 1e-9 for a, b in zip(ll, ll[1:])), ll
    assert m.n == len(df) and m.n_events == df["event"].sum()


def test_layout_invariance(ray_session):
    df = _cohort(n=600, seed=4, tie_grid=50)
    a = fit_coxph(rd.from_pandas(df, override_num_blocks=2), "time",
                  "event", ["x1", "x2"], n_iters=4)
    b = fit_coxph(rd.from_pandas(df, override_num_blocks=9), "time",
                  "event", ["x1", "x2"], n_iters=4)
    np.testing.assert_allclose(a.coef, b.coef, atol=1e-9)
    np.testing.assert_allclose(a.loglik, b.loglik, atol=1e-10)


def test_guards(ray_session):
    df = _cohort(n=60)
    with pytest.raises(ValueError):
        fit_coxph(rd.from_pandas(df), "time", "event", [])
    dead = df.assign(event=0)
    with pytest.raises(Exception, match="no events"):
        fit_coxph(rd.from_pandas(dead), "time", "event", ["x1"])
