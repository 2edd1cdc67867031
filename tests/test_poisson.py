"""Poisson GLM: numpy IRLS reference parity, true-rate recovery,
monotone deviance, rerun determinism, guards."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from cerberus_ray.pipelines.poisson import (fit_poisson,
                                            predict_poisson)


def _frame(n=4000, seed=31):
    """log λ = 0.8·x1 − 0.5·x2 + 0.3 — a real count GLM."""
    rng = np.random.default_rng(seed)
    x1 = rng.uniform(-1, 1, n)
    x2 = rng.uniform(-1, 1, n)
    lam = np.exp(0.8 * x1 - 0.5 * x2 + 0.3)
    return pd.DataFrame({"x1": x1, "x2": x2,
                         "y": rng.poisson(lam).astype(np.int64)})


def _reference(df, cols, n_iters, reg=1e-8, max_eta=30.0):
    X = np.column_stack([df[c].to_numpy(np.float64) for c in cols]
                        + [np.ones(len(df))])
    y = df["y"].to_numpy(np.float64)
    w = np.zeros(X.shape[1])
    w[-1] = np.log(max(y.mean(), 1e-9))
    devs = []
    for _ in range(n_iters):
        eta = np.clip(X @ w, -max_eta, max_eta)
        mu = np.exp(eta)
        with np.errstate(divide="ignore", invalid="ignore"):
            ylogy = np.where(y > 0, y * np.log(y / mu), 0.0)
        devs.append(round(float(2 * (ylogy - (y - mu)).sum()) / len(y),
                          10))
        z = eta + (y - mu) / mu
        A = (X * mu[:, None]).T @ X + reg * np.eye(X.shape[1])
        w = np.linalg.solve(A, (X * mu[:, None]).T @ z)
    return w, devs


def test_matches_reference_and_recovers_rates(ray_session):
    df = _frame()
    m = fit_poisson(rd.from_pandas(df, override_num_blocks=5),
                    ["x1", "x2"], "y", n_iters=8)
    w, devs = _reference(df, ["x1", "x2"], 8)
    np.testing.assert_allclose(np.append(m.coef, m.intercept), w,
                               atol=1e-7)
    np.testing.assert_allclose(m.deviance[:8], devs, atol=1e-8)
    # true coefficients recovered within sampling error
    assert abs(m.coef[0] - 0.8) < 0.1
    assert abs(m.coef[1] + 0.5) < 0.1
    assert abs(m.intercept - 0.3) < 0.1
    # deviance monotone after the first update
    dv = m.deviance
    assert all(b <= a + 1e-9 for a, b in zip(dv[1:], dv[2:])), dv


def test_predict_and_determinism(ray_session):
    df = _frame(n=800, seed=4)
    ds = rd.from_pandas(df, override_num_blocks=3)
    a = fit_poisson(ds, ["x1", "x2"], "y", n_iters=6)
    b = fit_poisson(ds, ["x1", "x2"], "y", n_iters=6)
    assert np.array_equal(a.coef, b.coef)
    p = predict_poisson(rd.from_pandas(df), a).to_pandas()
    np.testing.assert_allclose(
        p["rate"],
        np.exp(p["x1"] * a.coef[0] + p["x2"] * a.coef[1]
               + a.intercept), atol=1e-12)
    assert (p["rate"] > 0).all()


def test_guards(ray_session):
    df = _frame(n=50)
    bad = df.assign(y=df["y"] - 10)
    with pytest.raises(Exception, match="non-negative"):
        fit_poisson(rd.from_pandas(bad), ["x1"], "y")
    with pytest.raises(Exception, match="usable rows"):
        fit_poisson(rd.from_pandas(df.head(1)), ["x1"], "y")
