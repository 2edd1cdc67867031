"""Global approximate-CDF transform: rank accuracy vs the exact
empirical CDF, NaN handling, fixed-layout rerun determinism,
monotonicity."""

import numpy as np
import pandas as pd
import ray.data as rd

from cerberus_ray.stages.stats import approx_cdf_column


def _frame(n=20_000, seed=3):
    rng = np.random.default_rng(seed)
    return pd.DataFrame({"v": rng.lognormal(1.0, 0.7, n)})


def test_rank_accuracy(ray_session):
    df = _frame()
    out = (approx_cdf_column(
        rd.from_pandas(df, override_num_blocks=8), "v", k=200)
        .to_pandas())
    v = out["v"].to_numpy()
    exact = pd.Series(v).rank(method="max").to_numpy() / len(v)
    err = np.abs(out["cdf"].to_numpy() - exact)
    assert err.max() < 0.03, err.max()     # KLL uniform rank bound
    assert err.mean() < 0.01


def test_monotone_in_value(ray_session):
    df = _frame(n=5000, seed=9)
    out = (approx_cdf_column(rd.from_pandas(df), "v").to_pandas()
           .sort_values("v"))
    assert (np.diff(out["cdf"].to_numpy()) >= -1e-12).all()
    assert out["cdf"].between(0, 1).all()


def test_nan_rows_get_nan(ray_session):
    df = pd.DataFrame({"v": [1.0, np.nan, 3.0, 2.0]})
    out = approx_cdf_column(rd.from_pandas(df), "v").to_pandas()
    assert out["cdf"].isna().sum() == 1
    assert out.loc[out["v"] == 3.0, "cdf"].iloc[0] == 1.0


def test_rerun_deterministic(ray_session):
    df = _frame(n=3000, seed=5)
    a, b = (approx_cdf_column(
        rd.from_pandas(df, override_num_blocks=6), "v")
        .to_pandas() for _ in range(2))
    pd.testing.assert_frame_equal(a, b)


def test_all_nan_passthrough(ray_session):
    df = pd.DataFrame({"v": [np.nan, np.nan]})
    out = approx_cdf_column(rd.from_pandas(df), "v").to_pandas()
    assert out["cdf"].isna().all()
