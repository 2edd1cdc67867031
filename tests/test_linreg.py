"""Distributed OLS/ridge: exact numpy lstsq parity, known-coefficient
recovery, DuckDB simple-regression agreement, null exclusion, rerun
determinism, guards."""

import duckdb
import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from cerberus_ray.pipelines.linreg import fit_ols, predict_ols


def _frame(n=500, seed=3, noise=0.1):
    rng = np.random.default_rng(seed)
    x1 = rng.normal(size=n)
    x2 = rng.uniform(-2, 2, size=n)
    y = 3.0 * x1 - 1.5 * x2 + 0.75 + rng.normal(0, noise, size=n)
    return pd.DataFrame({"x1": x1, "x2": x2, "y": y})


def test_matches_numpy_lstsq(ray_session):
    df = _frame()
    m = fit_ols(rd.from_pandas(df, override_num_blocks=5),
                ["x1", "x2"], "y")
    X = np.column_stack([df["x1"], df["x2"], np.ones(len(df))])
    w, *_ = np.linalg.lstsq(X, df["y"].to_numpy(), rcond=None)
    np.testing.assert_allclose(m.coef, w[:-1], atol=1e-9)
    assert abs(m.intercept - w[-1]) < 1e-9
    # known generating coefficients recovered within noise
    np.testing.assert_allclose(m.coef, [3.0, -1.5], atol=0.05)
    assert m.r2 > 0.99


def test_duckdb_simple_regression_agreement(ray_session):
    df = _frame()[["x1", "y"]]
    m = fit_ols(rd.from_pandas(df), ["x1"], "y")
    slope, icpt = duckdb.sql(
        "SELECT regr_slope(y, x1), regr_intercept(y, x1) FROM df"
    ).fetchone()
    assert abs(m.coef[0] - slope) < 1e-9
    assert abs(m.intercept - icpt) < 1e-9


def test_null_rows_excluded(ray_session):
    df = _frame(n=100)
    df.loc[::7, "x2"] = np.nan
    m = fit_ols(rd.from_pandas(df, override_num_blocks=3),
                ["x1", "x2"], "y")
    clean = df.dropna()
    X = np.column_stack([clean["x1"], clean["x2"], np.ones(len(clean))])
    w, *_ = np.linalg.lstsq(X, clean["y"].to_numpy(), rcond=None)
    np.testing.assert_allclose(m.coef, w[:-1], atol=1e-9)
    assert m.n == len(clean)


def test_ridge_shrinks(ray_session):
    df = _frame()
    plain = fit_ols(rd.from_pandas(df), ["x1", "x2"], "y")
    ridge = fit_ols(rd.from_pandas(df), ["x1", "x2"], "y", reg=100.0)
    assert np.abs(ridge.coef).sum() < np.abs(plain.coef).sum()


def test_predict_and_determinism(ray_session):
    df = _frame(seed=9)
    ds = rd.from_pandas(df, override_num_blocks=7)
    a, b = fit_ols(ds, ["x1", "x2"], "y"), fit_ols(ds, ["x1", "x2"], "y")
    np.testing.assert_array_equal(a.coef, b.coef)   # bitwise rerun
    out = predict_ols(ds, a).to_pandas()
    resid = out["y"] - out["pred"]
    assert resid.abs().mean() < 0.15


def test_underdetermined_raises(ray_session):
    df = pd.DataFrame({"x1": [1.0], "x2": [2.0], "y": [3.0]})
    with pytest.raises(ValueError):
        fit_ols(rd.from_pandas(df), ["x1", "x2"], "y")


def test_grouped_simple_ols_matches_duckdb(ray_session):
    import duckdb

    from cerberus_ray.pipelines.linreg import grouped_simple_ols

    rng = np.random.default_rng(44)
    n = 3000
    g = rng.choice(["a", "b", "c"], n)
    slopes = {"a": 2.0, "b": -1.0, "c": 0.5}
    x = rng.uniform(0, 10, n)
    y = np.vectorize(slopes.get)(g) * x + 3.0 + rng.normal(0, 0.5, n)
    df = pd.DataFrame({"g": g, "x": x, "y": y})
    df.loc[:20, "x"] = np.nan          # pairwise-null exclusion
    got = grouped_simple_ols(rd.from_pandas(df, override_num_blocks=5),
                             "g", "x", "y")
    con = duckdb.connect()
    con.register("t", df)
    want = con.execute("""
        select g, regr_count(y, x)::bigint n, regr_slope(y, x) slope,
               regr_intercept(y, x) intercept, regr_r2(y, x) r2
        from t group by g order by g""").df()
    np.testing.assert_allclose(got["slope"], want["slope"], atol=1e-8)
    np.testing.assert_allclose(got["intercept"], want["intercept"],
                               atol=1e-8)
    np.testing.assert_allclose(got["r2"], want["r2"], atol=1e-8)
    assert list(got["n"]) == list(want["n"])
    for k, s in slopes.items():
        row = got[got["g"] == k].iloc[0]
        assert abs(row["slope"] - s) < 0.05


def test_grouped_simple_ols_degenerate_groups(ray_session):
    from cerberus_ray.pipelines.linreg import grouped_simple_ols

    df = pd.DataFrame({
        "g": ["tiny", "tiny", "const", "const", "const", "const"],
        "x": [1.0, 2.0, 5.0, 5.0, 5.0, 5.0],
        "y": [1.0, 2.0, 1.0, 2.0, 3.0, 4.0]})
    got = grouped_simple_ols(rd.from_pandas(df), "g", "x", "y")
    const = got[got["g"] == "const"].iloc[0]
    tiny = got[got["g"] == "tiny"].iloc[0]
    assert np.isnan(const["slope"])     # zero x-variance
    assert np.isnan(tiny["slope"])      # below min_n
