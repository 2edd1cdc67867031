"""Gaussian copula synthesis: marginal + correlation fidelity,
deterministic regeneration, layout-stable fit, guards."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from cerberus_ray.pipelines.copula import fit_copula, sample_copula


def _frame(n=4000, seed=23):
    rng = np.random.default_rng(seed)
    z = rng.standard_normal((n, 2))
    x = z[:, 0] * 2.0 + 10.0
    y = np.exp(0.8 * (0.7 * z[:, 0] + np.sqrt(1 - 0.49) * z[:, 1]))
    return pd.DataFrame({"x": x, "y": y})


def test_marginals_and_correlation_preserved(ray_session):
    df = _frame()
    m = fit_copula(rd.from_pandas(df, override_num_blocks=5),
                   ["x", "y"])
    assert m.n == len(df)
    syn = sample_copula(m, 5000, seed=7).to_pandas()
    assert len(syn) == 5000 and list(syn.columns) == ["x", "y"]
    for c in ("x", "y"):
        for q in (0.1, 0.25, 0.5, 0.75, 0.9):
            a = df[c].quantile(q)
            b = syn[c].quantile(q)
            scale = df[c].quantile(0.9) - df[c].quantile(0.1)
            assert abs(a - b) < 0.1 * scale, (c, q, a, b)
    rho_orig = np.corrcoef(df["x"], df["y"])[0, 1]
    rho_syn = np.corrcoef(syn["x"], syn["y"])[0, 1]
    assert abs(rho_orig - rho_syn) < 0.1, (rho_orig, rho_syn)


def test_deterministic_regeneration(ray_session):
    df = _frame(n=800, seed=2)
    m = fit_copula(rd.from_pandas(df), ["x", "y"])
    a = (sample_copula(m, 300, seed=5).to_pandas()
         .sort_values(["x", "y"]).reset_index(drop=True))
    b = (sample_copula(m, 300, seed=5, parallelism=3).to_pandas()
         .sort_values(["x", "y"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)
    c = (sample_copula(m, 300, seed=6).to_pandas()
         .sort_values(["x", "y"]).reset_index(drop=True))
    assert not a.equals(c)


def test_fit_layout_stable(ray_session):
    df = _frame(n=1000, seed=11)
    a = fit_copula(rd.from_pandas(df, override_num_blocks=2),
                   ["x", "y"])
    b = fit_copula(rd.from_pandas(df, override_num_blocks=9),
                   ["x", "y"])
    np.testing.assert_allclose(a.corr, b.corr, atol=1e-9)
    assert a.n == b.n


def test_guards(ray_session):
    df = _frame(n=50)
    with pytest.raises(ValueError):
        fit_copula(rd.from_pandas(df), [])
    m = fit_copula(rd.from_pandas(df), ["x", "y"])
    with pytest.raises(ValueError):
        sample_copula(m, 0)
