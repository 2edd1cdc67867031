"""Sinkhorn OT: marginal feasibility + closed 1-D checks for the
kernel; divergence zero-on-self, symmetry, shift monotonicity,
determinism."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from cerberus_ray.stages.ot import sinkhorn_cost, sinkhorn_divergence


def test_sinkhorn_cost_degenerate_and_1d():
    # identical point masses → zero cost
    p = np.array([1.0, 0.0])
    M = np.array([[0.0, 1.0], [1.0, 0.0]])
    assert sinkhorn_cost(p, p, M) < 1e-9
    # all mass must move across unit cost → cost 1
    q = np.array([0.0, 1.0])
    assert abs(sinkhorn_cost(p, q, M) - 1.0) < 1e-9
    # low-reg entropic cost approaches the exact 1-D OT: supports
    # {0,1,2}, p=(.5,.5,0), q=(0,.5,.5) → shift everything by 1 → 1.0
    xs = np.array([0.0, 1.0, 2.0])
    M3 = (xs[:, None] - xs[None, :]) ** 2
    p3 = np.array([0.5, 0.5, 0.0])
    q3 = np.array([0.0, 0.5, 0.5])
    c = sinkhorn_cost(p3, q3, M3, reg=0.01, n_iters=2000)
    assert abs(c - 1.0) < 0.05, c


def _vecs(center, n=400, seed=6, d=4, scale=0.3):
    rng = np.random.default_rng(seed)
    X = center + scale * rng.standard_normal((n, d))
    return pd.DataFrame({
        "vec_id": range(n),
        "embedding": [r.astype(np.float32) for r in X]})


def test_divergence_zero_self_and_shift_monotone(ray_session):
    a = rd.from_pandas(_vecs(np.zeros(4)), override_num_blocks=3)
    d0, info = sinkhorn_divergence(a, a, k=16)
    assert abs(d0) < 1e-6, d0
    assert info["k"] <= 16
    small = rd.from_pandas(_vecs(np.full(4, 0.5), seed=7))
    large = rd.from_pandas(_vecs(np.full(4, 2.0), seed=8))
    d_small, _ = sinkhorn_divergence(a, small, k=16)
    d_large, _ = sinkhorn_divergence(a, large, k=16)
    assert 0 <= d_small < d_large, (d_small, d_large)


def test_symmetry_and_determinism(ray_session):
    a = rd.from_pandas(_vecs(np.zeros(4), seed=1),
                       override_num_blocks=2)
    b = rd.from_pandas(_vecs(np.ones(4), seed=2),
                       override_num_blocks=5)
    d1, _ = sinkhorn_divergence(a, b, k=12)
    d2, _ = sinkhorn_divergence(b, a, k=12)
    # shared union codebook → near-symmetric (float/assignment ties)
    assert abs(d1 - d2) < 1e-3 * max(d1, 1e-9)
    d3, _ = sinkhorn_divergence(a, b, k=12)
    assert d1 == d3


def test_empty_guard(ray_session):
    a = rd.from_pandas(_vecs(np.zeros(4), n=30))
    empty = rd.from_pandas(pd.DataFrame({
        "vec_id": pd.Series([], dtype="int64"),
        "embedding": pd.Series([], dtype=object)}))
    with pytest.raises(Exception):
        sinkhorn_divergence(a, empty, k=8)
