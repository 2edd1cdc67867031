"""Gaussian-mixture EM: in-memory reference parity, monotone
log-likelihood, planted-blob recovery, layout invariance, guards."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from cerberus_ray.pipelines.gmm import (_log_resp, assign_gmm, fit_gmm)


def _blobs(n=900, seed=5, d=4):
    """Three well-separated diagonal-covariance blobs."""
    rng = np.random.default_rng(seed)
    centers = np.array([[0.0] * d, [6.0] * d,
                        [-6.0] + [6.0] * (d - 1)])
    scales = [0.7, 1.0, 0.5]
    rows, labs = [], []
    for i in range(n):
        j = i % 3
        rows.append(centers[j] + scales[j] * rng.standard_normal(d))
        labs.append(j)
    return pd.DataFrame({"vec_id": range(n),
                         "embedding": [r.astype(np.float32) for r in rows],
                         "label": labs})


def _reference_em(X, w, mu, var, iters):
    lls = []
    for _ in range(iters):
        lr, lse = _log_resp(X, w, mu, var)
        r = np.exp(lr)
        lls.append(round(float(lse.sum()) / len(X), 10))
        rs = np.maximum(r.sum(axis=0), 1e-12)
        w = rs / len(X)
        mu = (r.T @ X) / rs[:, None]
        var = np.maximum((r.T @ (X * X)) / rs[:, None] - mu ** 2, 1e-6)
    return w, mu, var, lls


def test_matches_reference(ray_session):
    df = _blobs()
    ds = rd.from_pandas(df, override_num_blocks=6)
    init = fit_gmm(ds, k=3, n_iters=0)
    m = fit_gmm(ds, k=3, n_iters=5, init_means=init.means,
                init_variances=init.variances,
                init_weights=init.weights)
    X = np.stack(df["embedding"].to_numpy()).astype(np.float64)
    w, mu, var, lls = _reference_em(X, init.weights, init.means,
                                    init.variances, 5)
    np.testing.assert_allclose(m.weights, w, atol=1e-9)
    np.testing.assert_allclose(m.means, mu, atol=1e-8)
    np.testing.assert_allclose(m.variances, var, atol=1e-8)
    np.testing.assert_allclose(m.loglik, lls, atol=1e-8)


def test_monotone_loglik_and_recovery(ray_session):
    df = _blobs(n=1200, seed=11)
    ds = rd.from_pandas(df, override_num_blocks=5)
    m = fit_gmm(ds, k=3, n_iters=8)
    ll = m.loglik
    assert all(b >= a - 1e-9 for a, b in zip(ll, ll[1:])), ll
    out = assign_gmm(ds, m).to_pandas()
    # each true blob maps to one dominant component (purity > 0.95)
    purity = (out.groupby("label")["component"]
              .agg(lambda s: s.value_counts().iloc[0] / len(s)))
    assert (purity > 0.95).all(), purity
    assert out["component"].nunique() == 3
    assert ((out["posterior"] > 0) & (out["posterior"] <= 1)).all()


def test_layout_invariance_with_fixed_init(ray_session):
    df = _blobs(n=600, seed=3)
    init = fit_gmm(rd.from_pandas(df), k=3, n_iters=0)
    a = fit_gmm(rd.from_pandas(df, override_num_blocks=2), k=3,
                n_iters=3, init_means=init.means,
                init_variances=init.variances, init_weights=init.weights)
    b = fit_gmm(rd.from_pandas(df, override_num_blocks=11), k=3,
                n_iters=3, init_means=init.means,
                init_variances=init.variances, init_weights=init.weights)
    np.testing.assert_allclose(a.means, b.means, atol=1e-8)
    np.testing.assert_allclose(a.loglik, b.loglik, atol=1e-9)


def test_guards(ray_session):
    df = _blobs(n=30)
    with pytest.raises(ValueError):
        fit_gmm(rd.from_pandas(df), k=0)
    with pytest.raises(ValueError, match="need >="):
        fit_gmm(rd.from_pandas(df.head(2)), k=5)
