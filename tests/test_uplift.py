"""T-learner uplift: planted heterogeneous effect recovered, decile
curve monotone-ish, null treatment gives ~zero uplift, shared edges."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from cerberus_ray.pipelines.uplift import (fit_t_learner, score_uplift,
                                           uplift_by_decile)


def _frame(n=6000, hetero=True, seed=27):
    """Treatment helps only when x1 > 0 (planted heterogeneity)."""
    rng = np.random.default_rng(seed)
    x1 = rng.uniform(-2, 2, n)
    x2 = rng.standard_normal(n)
    t = rng.integers(0, 2, n)
    base = 1 / (1 + np.exp(-0.5 * x2))
    lift = np.where((x1 > 0) & (t == 1), 0.35, 0.0) if hetero else 0.0
    y = (rng.random(n) < np.clip(base * 0.4 + lift, 0, 1)).astype(
        np.int64)
    return pd.DataFrame({"x1": x1, "x2": x2, "t": t, "y": y})


def test_recovers_heterogeneous_effect(ray_session):
    df = _frame()
    ds = rd.from_pandas(df, override_num_blocks=5)
    m1, m0 = fit_t_learner(ds, "t", "y", ["x1", "x2"], n_rounds=4)
    scored = score_uplift(ds, m1, m0).to_pandas()
    assert "uplift" in scored.columns
    # planted: uplift concentrated where x1 > 0
    up_pos = scored[scored["x1"] > 0.5]["uplift"].mean()
    up_neg = scored[scored["x1"] < -0.5]["uplift"].mean()
    assert up_pos > up_neg + 0.15, (up_pos, up_neg)
    assert up_pos > 0.2


def test_decile_curve_separates(ray_session):
    df = _frame(n=8000, seed=5)
    ds = rd.from_pandas(df, override_num_blocks=4)
    m1, m0 = fit_t_learner(ds, "t", "y", ["x1", "x2"])
    scored = score_uplift(ds, m1, m0).materialize()
    dec = uplift_by_decile(scored, "t", "y")
    assert len(dec) >= 4
    top = dec.nlargest(2, "mean_predicted")["observed_uplift"].mean()
    bot = dec.nsmallest(2, "mean_predicted")["observed_uplift"].mean()
    assert top > bot + 0.1, dec.to_string()
    assert top > 0.2


def test_null_treatment_near_zero(ray_session):
    df = _frame(n=5000, hetero=False, seed=8)
    ds = rd.from_pandas(df, override_num_blocks=4)
    m1, m0 = fit_t_learner(ds, "t", "y", ["x1", "x2"], n_rounds=3)
    scored = score_uplift(ds, m1, m0).to_pandas()
    assert abs(scored["uplift"].mean()) < 0.05
    # shared quantization: both models carry identical edges
    for e1, e0 in zip(m1.bin_edges, m0.bin_edges):
        np.testing.assert_array_equal(e1, e0)
