"""Correlation/covariance matrices: DuckDB CORR/COVAR parity with
pairwise nulls, pandas cross-check, degenerate columns, real table."""

import duckdb
import numpy as np
import pandas as pd
import ray.data as rd

from cerberus_ray.stages.stats import corr_matrix, cov_matrix

SF = "/root/testdata/sf0.001"


def _frame():
    rng = np.random.default_rng(41)
    n = 400
    a = rng.normal(0, 1, n)
    df = pd.DataFrame({
        "a": a,
        "b": 2 * a + rng.normal(0, 0.5, n),
        "c": rng.normal(5, 3, n),
        "const": np.full(n, 3.0)})
    df.loc[rng.choice(n, 30, replace=False), "a"] = np.nan
    df.loc[rng.choice(n, 25, replace=False), "b"] = np.nan
    df.loc[rng.choice(n, 20, replace=False), "c"] = np.nan
    return df


def test_corr_matches_duckdb_pairwise(ray_session):
    df = _frame()
    ds = rd.from_pandas(df, override_num_blocks=5)
    got = corr_matrix(ds, ["a", "b", "c", "const"])
    for x in ("a", "b", "c"):
        for y in ("a", "b", "c"):
            want = duckdb.sql(
                f"SELECT corr({x}, {y}) FROM df").fetchone()[0]
            np.testing.assert_allclose(got.loc[x, y], want, rtol=1e-10,
                                       err_msg=f"{x},{y}")
    # zero-variance column → NULL in SQL, NaN here
    assert np.isnan(got.loc["const", "a"])
    assert duckdb.sql("SELECT corr(const, a) FROM df").fetchone()[0] is None


def test_cov_matches_duckdb(ray_session):
    df = _frame()
    ds = rd.from_pandas(df, override_num_blocks=4)
    got_s = cov_matrix(ds, ["a", "b", "c"], ddof=1)
    got_p = cov_matrix(ds, ["a", "b", "c"], ddof=0)
    for x in ("a", "b", "c"):
        for y in ("a", "b", "c"):
            ws = duckdb.sql(
                f"SELECT covar_samp({x}, {y}) FROM df").fetchone()[0]
            wp = duckdb.sql(
                f"SELECT covar_pop({x}, {y}) FROM df").fetchone()[0]
            np.testing.assert_allclose(got_s.loc[x, y], ws, rtol=1e-10)
            np.testing.assert_allclose(got_p.loc[x, y], wp, rtol=1e-10)


def test_pandas_crosscheck_and_structure(ray_session):
    df = _frame()[["a", "b", "c"]]
    ds = rd.from_pandas(df, override_num_blocks=3)
    got = corr_matrix(ds, ["a", "b", "c"])
    want = df.corr()  # pandas default is exactly pairwise-complete
    np.testing.assert_allclose(got.to_numpy(), want.to_numpy(),
                               rtol=1e-10)
    np.testing.assert_allclose(np.diag(got.to_numpy()), 1.0, rtol=1e-12)
    np.testing.assert_allclose(got.to_numpy(), got.to_numpy().T,
                               rtol=1e-12)
    assert got.loc["a", "b"] > 0.9  # planted linear relation


def test_real_table(ray_session):
    from cerberus_ray.sources.io import read_table

    ds = read_table(f"{SF}/lineitem.parquet",
                    columns=["l_quantity", "l_extendedprice",
                             "l_discount"])
    got = corr_matrix(ds, ["l_quantity", "l_extendedprice", "l_discount"])
    want = duckdb.sql(f"""
        SELECT corr(l_quantity, l_extendedprice),
               corr(l_quantity, l_discount)
        FROM read_parquet('{SF}/lineitem.parquet')""").fetchone()
    np.testing.assert_allclose(
        got.loc["l_quantity", "l_extendedprice"], want[0], rtol=1e-10)
    np.testing.assert_allclose(
        got.loc["l_quantity", "l_discount"], want[1], rtol=1e-10)


def test_grouped_regression_duckdb_parity(ray_session):
    from cerberus_ray.stages.stats import grouped_regression

    rng = np.random.default_rng(47)
    n = 500
    df = pd.DataFrame({
        "g": rng.choice(["p", "q", "r"], n),
        "x": rng.normal(0, 2, n)})
    df["y"] = 3.0 * df["x"] + rng.normal(0, 1, n) + \
        df["g"].map({"p": 0, "q": 5, "r": -2})
    df.loc[rng.choice(n, 40, replace=False), "x"] = np.nan
    df.loc[rng.choice(n, 30, replace=False), "y"] = np.nan
    # a single-row group and a zero-x-variance group
    df = pd.concat([df, pd.DataFrame({
        "g": ["solo", "flat", "flat", "flat"],
        "x": [1.0, 7.0, 7.0, 7.0], "y": [2.0, 1.0, 2.0, 3.0]})],
        ignore_index=True)
    ds = rd.from_pandas(df, override_num_blocks=5)
    got = grouped_regression(ds, ["g"], "x", "y").set_index("g")
    want = duckdb.sql("""
        SELECT g, regr_count(y, x) AS n, regr_slope(y, x) AS slope,
               regr_intercept(y, x) AS intercept, regr_r2(y, x) AS r2
        FROM df GROUP BY g ORDER BY g
    """).fetchdf().set_index("g")
    assert got.index.tolist() == want.index.tolist()
    np.testing.assert_array_equal(got["n"].to_numpy(),
                                  want["n"].to_numpy(dtype="int64"))
    for c in ("slope", "intercept", "r2"):
        np.testing.assert_allclose(got[c].to_numpy(),
                                   want[c].to_numpy(dtype="float64"),
                                   rtol=1e-9, equal_nan=True, err_msg=c)
    assert np.isnan(got.loc["solo", "slope"])
    assert np.isnan(got.loc["flat", "slope"])
    assert abs(got.loc["p", "slope"] - 3.0) < 0.3


def test_grouped_regression_real_table(ray_session):
    from cerberus_ray.sources.io import read_table
    from cerberus_ray.stages.stats import grouped_regression

    ds = read_table(f"{SF}/lineitem.parquet",
                    columns=["l_returnflag", "l_quantity",
                             "l_extendedprice"])
    got = grouped_regression(ds, ["l_returnflag"], "l_quantity",
                             "l_extendedprice").set_index("l_returnflag")
    want = duckdb.sql(f"""
        SELECT l_returnflag,
               regr_slope(l_extendedprice, l_quantity) AS slope
        FROM read_parquet('{SF}/lineitem.parquet')
        GROUP BY l_returnflag ORDER BY l_returnflag
    """).fetchdf().set_index("l_returnflag")
    np.testing.assert_allclose(got["slope"].to_numpy(),
                               want["slope"].to_numpy(), rtol=1e-9)


def test_histogram_duckdb_parity(ray_session):
    from cerberus_ray.stages.stats import histogram

    rng = np.random.default_rng(53)
    df = pd.DataFrame({"v": rng.normal(50, 20, 1000)})
    df.loc[rng.choice(1000, 50, replace=False), "v"] = np.nan
    ds = rd.from_pandas(df, override_num_blocks=4)
    lo, hi, bins = 0.0, 100.0, 10
    got = histogram(ds, "v", bins=bins, lo=lo, hi=hi)
    # oracle: explicit equi-width bucket math (this DuckDB has no
    # width_bucket), under/overflow folded into the edge bins
    w = (hi - lo) / bins
    want = duckdb.sql(f"""
        SELECT LEAST(GREATEST(CAST(floor((v - {lo}) / {w}) AS BIGINT),
                              0), {bins - 1}) AS bin,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM df WHERE v IS NOT NULL GROUP BY 1 ORDER BY 1
    """).fetchdf()
    merged = got.merge(want, on="bin", how="left",
                       suffixes=("", "_want")).fillna({"n_want": 0})
    # np.histogram puts x == edge into the LEFT bin for the last edge
    # only; width_bucket's half-open bins agree except at exact edges,
    # which have measure zero for continuous draws
    np.testing.assert_array_equal(merged["n"].to_numpy(),
                                  merged["n_want"].to_numpy(dtype="int64"))
    assert got["n"].sum() == df["v"].notna().sum()


def test_histogram_auto_bounds_and_degenerate(ray_session):
    from cerberus_ray.stages.stats import histogram

    df = pd.DataFrame({"v": [1.0, 2.0, 3.0, 4.0]})
    got = histogram(rd.from_pandas(df), "v", bins=3)
    assert got["n"].sum() == 4
    assert got["lo"].iloc[0] == 1.0 and got["hi"].iloc[-1] == 4.0
    const = histogram(rd.from_pandas(pd.DataFrame({"v": [5.0] * 7})),
                      "v", bins=4)
    assert const["n"].sum() == 7


def test_chi2_independence(ray_session):
    from cerberus_ray.stages.stats import chi2_independence

    rng = np.random.default_rng(59)
    n = 2000
    a = rng.choice(["x", "y", "z"], n)
    # b depends on a for half the rows → real association
    b = np.where(rng.random(n) < 0.5,
                 np.char.add(a, "_dep"),
                 rng.choice(["p_dep", "q_dep"], n))
    df = pd.DataFrame({"a": a, "b": b})
    df.loc[rng.choice(n, 40, replace=False), "a"] = None
    ds = rd.from_pandas(df, override_num_blocks=4)
    got = chi2_independence(ds, "a", "b")
    # slow reference on the same frame
    d = df.dropna()
    tab = pd.crosstab(d["a"], d["b"]).to_numpy(dtype=float)
    exp = np.outer(tab.sum(1), tab.sum(0)) / tab.sum()
    want = float((((tab - exp) ** 2) / exp).sum())
    np.testing.assert_allclose(got["chi2"], want, rtol=1e-10)
    assert got["dof"] == (tab.shape[0] - 1) * (tab.shape[1] - 1)
    assert got["n"] == len(d)
    assert got["cramers_v"] > 0.3  # planted dependence

    # independent columns → tiny V
    df2 = pd.DataFrame({"a": rng.choice(["x", "y"], n),
                        "b": rng.choice(["p", "q"], n)})
    got2 = chi2_independence(rd.from_pandas(df2), "a", "b")
    assert got2["cramers_v"] < 0.08

    import pytest as _pt
    with _pt.raises(ValueError, match="max_levels"):
        chi2_independence(rd.from_pandas(pd.DataFrame({
            "a": [str(i) for i in range(30)],
            "b": ["c"] * 30})), "a", "b", max_levels=10)


def test_completeness_report(ray_session):
    from cerberus_ray.stages.stats import completeness_report

    rng = np.random.default_rng(71)
    n = 800
    df = pd.DataFrame({
        "i": rng.integers(0, 1000, n),          # "9" vs "10" trap
        "f": rng.normal(0, 1, n),
        "s": rng.choice(["apple", "pear", "zebra", None], n),
        "t": pd.to_datetime("2024-01-01")
             + pd.to_timedelta(rng.integers(0, 10**6, n), unit="s"),
    })
    df.loc[rng.choice(n, 60, replace=False), "f"] = np.nan
    ds = rd.from_pandas(df, override_num_blocks=5)
    got = completeness_report(ds).set_index("col")
    want = duckdb.sql("""
        SELECT COUNT(*) n,
               SUM(CASE WHEN f IS NULL THEN 1 ELSE 0 END) fn,
               COUNT(DISTINCT i) di, COUNT(DISTINCT s) dsx,
               MIN(i) mi, MAX(i) ma, MIN(s) ms, MAX(s) mxs
        FROM df""").fetchone()
    assert got.loc["i", "n"] == want[0]
    assert got.loc["f", "n_null"] == want[1]
    assert got.loc["i", "n_distinct"] == want[2]
    assert got.loc["s", "n_distinct"] == want[3]
    # typed min/max: numeric merge, not lexicographic
    assert int(got.loc["i", "min"]) == want[4]
    assert int(got.loc["i", "max"]) == want[5]
    assert got.loc["s", "min"] == want[6]
    assert got.loc["s", "max"] == want[7]
    assert got.loc["t", "min"] == str(df["t"].min())
    assert abs(got.loc["f", "null_frac"] - 60 / n) < 1e-9

    # HLL path within 3% of exact
    approx = completeness_report(ds, approx_distinct=True).set_index("col")
    assert abs(approx.loc["i", "n_distinct"] - want[2]) / want[2] < 0.03


def test_histogram_all_null_column(ray_session):
    from cerberus_ray.stages.stats import histogram

    df = pd.DataFrame({"v": [np.nan] * 10})
    got = histogram(rd.from_pandas(df), "v", bins=4)
    assert got["n"].sum() == 0
    assert np.isfinite(got["lo"]).all() and np.isfinite(got["hi"]).all()


def test_completeness_nested_and_edge_values(ray_session):
    from cerberus_ray.stages.stats import completeness_report

    df = pd.DataFrame({
        "s": ["", "", "a\x1fb", "a", None],
        "emb": [[1.0, 2.0]] * 5})
    got = completeness_report(rd.from_pandas(df)).set_index("col")
    # nested column: counts only, no crash
    assert got.loc["emb", "n"] == 5
    assert pd.isna(got.loc["emb", "n_distinct"])
    # empty string counts as a distinct value; \x1f value not split
    assert got.loc["s", "n_distinct"] == 3
    assert got.loc["s", "n_null"] == 1
