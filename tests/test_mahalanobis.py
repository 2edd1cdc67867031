"""Mahalanobis outliers: exact numpy moment parity, χ² quantile
accuracy, planted-outlier flags + calibrated false-positive rate,
layout invariance, NaN routing, guards."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from cerberus_ray.stages.mahalanobis import (
    chi2_quantile, mahalanobis_outlier_report, mahalanobis_profile,
    score_mahalanobis)


def _frame(n=2000, n_out=10, seed=17):
    rng = np.random.default_rng(seed)
    cov = np.array([[2.0, 0.8, 0.2], [0.8, 1.0, -0.3],
                    [0.2, -0.3, 0.5]])
    L = np.linalg.cholesky(cov)
    X = rng.standard_normal((n, 3)) @ L.T + np.array([1.0, -2.0, 0.5])
    out = X[:n_out] + 25 * np.sign(rng.standard_normal((n_out, 3)))
    df = pd.DataFrame(np.vstack([X, out]), columns=["a", "b", "c"])
    df["is_outlier"] = [0] * n + [1] * n_out
    return df


def test_chi2_quantile_accuracy():
    # exact references: χ²₁(0.95)=3.8415, χ²₃(0.999)=16.2662,
    # χ²₄(0.99)=13.2767 (standard tables); Wilson-Hilferty is a ~1%
    # relative approximation at small df
    assert abs(chi2_quantile(0.95, 1) - 3.8415) / 3.8415 < 0.03
    assert abs(chi2_quantile(0.999, 3) - 16.2662) / 16.2662 < 0.025
    assert abs(chi2_quantile(0.99, 4) - 13.2767) / 13.2767 < 0.01
    with pytest.raises(ValueError):
        chi2_quantile(0.0, 3)


def test_profile_matches_numpy(ray_session):
    df = _frame(n=500, n_out=0)
    mu, inv, n = mahalanobis_profile(
        rd.from_pandas(df, override_num_blocks=4), ["a", "b", "c"])
    X = df[["a", "b", "c"]].to_numpy()
    np.testing.assert_allclose(mu, X.mean(axis=0), atol=1e-10)
    np.testing.assert_allclose(np.linalg.inv(inv),
                               np.cov(X.T, ddof=1), rtol=1e-6)
    assert n == len(df)
    s = score_mahalanobis(rd.from_pandas(df), ["a", "b", "c"], mu,
                          inv).to_pandas()
    z = X - mu
    want = np.einsum("ij,jk,ik->i", z, inv, z)
    got = s.sort_values(["a", "b"])["d2"].to_numpy()
    np.testing.assert_allclose(
        got, df.assign(w=want).sort_values(["a", "b"])["w"].to_numpy(),
        atol=1e-9)


def test_planted_outliers_flagged_calibrated(ray_session):
    df = _frame()
    r = mahalanobis_outlier_report(
        rd.from_pandas(df, override_num_blocks=5), ["a", "b", "c"],
        p=0.999).to_pandas().iloc[0]
    # all 10 planted + roughly n×0.001 false positives
    assert r["n_flagged"] >= 10
    assert r["n_flagged"] <= 10 + 12
    assert r["max_d2"] > r["threshold"]


def test_layout_invariance_and_nan(ray_session):
    df = _frame(n=400, n_out=4, seed=2)
    df.loc[5, "a"] = np.nan
    a = mahalanobis_outlier_report(
        rd.from_pandas(df, override_num_blocks=2),
        ["a", "b", "c"]).to_pandas()
    b = mahalanobis_outlier_report(
        rd.from_pandas(df, override_num_blocks=9),
        ["a", "b", "c"]).to_pandas()
    pd.testing.assert_frame_equal(a, b)
    assert a["n_rows"].iloc[0] == len(df) - 1   # NaN row excluded


def test_guards(ray_session):
    df = _frame(n=3, n_out=0)
    with pytest.raises(ValueError, match="non-empty"):
        mahalanobis_profile(rd.from_pandas(df), [])
    with pytest.raises(ValueError, match="need >"):
        mahalanobis_profile(rd.from_pandas(df.head(2)),
                            ["a", "b", "c"])
