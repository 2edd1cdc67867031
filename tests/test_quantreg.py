"""Quantile regression: numpy IRLS reference parity, coverage
calibration per quantile, heteroscedastic slope recovery, rerun
determinism, guards."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from cerberus_ray.pipelines.quantreg import (fit_quantreg,
                                             fit_quantreg_multi,
                                             predict_quantreg)


def _frame(n=3000, seed=19):
    """Heteroscedastic: y = 2x + 1 + (0.5 + 0.4x)·ε with x > 0, so
    upper and lower conditional quantiles have DIFFERENT slopes."""
    rng = np.random.default_rng(seed)
    x = rng.uniform(0, 5, n)
    y = 2.0 * x + 1.0 + (0.5 + 0.4 * x) * rng.standard_normal(n)
    return pd.DataFrame({"x": x, "y": y})


def _reference(df, cols, q, n_iters, eps=1e-6, reg=1e-8):
    X = np.column_stack([df[c].to_numpy(np.float64) for c in cols]
                        + [np.ones(len(df))])
    y = df["y"].to_numpy(np.float64)
    w = np.zeros(X.shape[1])
    pins = []
    for _ in range(n_iters):
        r = y - X @ w
        pins.append(round(float((r * (q - (r < 0))).mean()), 10))
        wt = np.abs(q - (r < 0)) / np.maximum(np.abs(r), eps)
        A = (X * wt[:, None]).T @ X + reg * np.eye(X.shape[1])
        w = np.linalg.solve(A, (X * wt[:, None]).T @ y)
    return w, pins


def test_matches_numpy_reference(ray_session):
    df = _frame(n=800)
    m = fit_quantreg(rd.from_pandas(df, override_num_blocks=5), ["x"],
                     "y", q=0.7, n_iters=6)
    w, pins = _reference(df, ["x"], 0.7, 6)
    np.testing.assert_allclose(np.append(m.coef, m.intercept), w,
                               atol=1e-7)
    # engine appends one extra evaluation-pass entry for the final w
    assert len(m.pinball) == 7
    np.testing.assert_allclose(m.pinball[:6], pins, atol=1e-8)
    assert m.pinball[-1] <= m.pinball[-2] + 1e-9


def test_coverage_and_heteroscedastic_slopes(ray_session):
    df = _frame()
    ds = rd.from_pandas(df, override_num_blocks=4)
    m1, m5, m9 = fit_quantreg_multi(ds, ["x"], "y", (0.1, 0.5, 0.9))
    # multi-fit shares passes and agrees with the single fit (same
    # algorithm; partial-merge float order differs, so near-equality)
    s5 = fit_quantreg(ds, ["x"], "y", q=0.5)
    np.testing.assert_allclose(m5.coef, s5.coef, atol=1e-3)
    assert abs(m5.coverage - s5.coverage) < 1e-3
    for m, q in ((m1, 0.1), (m5, 0.5), (m9, 0.9)):
        assert abs(m.coverage - q) < 0.03, (q, m.coverage)
    # median recovers the true line
    assert abs(m5.coef[0] - 2.0) < 0.1
    assert abs(m5.intercept - 1.0) < 0.15
    # heteroscedastic noise: q90 slope > median slope > q10 slope
    assert m9.coef[0] > m5.coef[0] > m1.coef[0]
    # pinball non-increasing after the first update
    for m in (m1, m5, m9):
        assert all(b <= a + 1e-9 for a, b in
                   zip(m.pinball[1:], m.pinball[2:])), m.pinball


def test_driver_stream_mode_agreement(ray_session):
    df = _frame(n=700, seed=8)
    ds = rd.from_pandas(df, override_num_blocks=4)
    a = fit_quantreg_multi(ds, ["x"], "y", (0.3, 0.8), n_iters=10,
                           mode="driver")
    b = fit_quantreg_multi(ds, ["x"], "y", (0.3, 0.8), n_iters=10,
                           mode="stream")
    for ma, mb in zip(a, b):
        np.testing.assert_allclose(ma.coef, mb.coef, atol=1e-6)
        np.testing.assert_allclose(ma.pinball, mb.pinball, atol=1e-7)
        assert abs(ma.coverage - mb.coverage) < 1e-6


def test_rerun_determinism_and_predict(ray_session):
    df = _frame(n=500, seed=3)
    a = fit_quantreg(rd.from_pandas(df, override_num_blocks=3), ["x"],
                     "y", q=0.5, n_iters=5)
    b = fit_quantreg(rd.from_pandas(df, override_num_blocks=3), ["x"],
                     "y", q=0.5, n_iters=5)
    assert a.coef[0] == b.coef[0] and a.intercept == b.intercept
    p = predict_quantreg(rd.from_pandas(df), a).to_pandas()
    np.testing.assert_allclose(
        p["pred"], p["x"] * a.coef[0] + a.intercept, atol=1e-12)


def test_guards(ray_session):
    df = _frame(n=50)
    with pytest.raises(ValueError):
        fit_quantreg(rd.from_pandas(df), ["x"], "y", q=0.0)
    with pytest.raises(Exception, match="usable rows"):
        fit_quantreg(rd.from_pandas(df.head(1)), ["x"], "y")
