"""Grouped Spearman: DuckDB averaged-rank corr parity, tie handling,
null semantics, degenerate groups, multi-block invariance."""

import duckdb
import numpy as np
import pandas as pd
import ray.data as rd

from cerberus_ray.sources.io import read_table
from cerberus_ray.stages.stats import spearman_by_group

SF = "/root/testdata/sf0.001"


def test_duckdb_parity_on_lineitem(ray_session):
    li = read_table(f"{SF}/lineitem.parquet",
                    columns=["l_returnflag", "l_quantity",
                             "l_extendedprice"])
    got = spearman_by_group(li, "l_returnflag", "l_quantity",
                            "l_extendedprice")
    con = duckdb.connect()
    con.execute(f"CREATE VIEW lineitem AS SELECT * FROM "
                f"read_parquet('{SF}/lineitem.parquet')")
    want = con.execute("""
        WITH r AS (SELECT l_returnflag AS g,
            RANK() OVER (PARTITION BY l_returnflag ORDER BY l_quantity)
              + (COUNT(*) OVER (PARTITION BY l_returnflag, l_quantity)
                 - 1) / 2.0 AS rx,
            RANK() OVER (PARTITION BY l_returnflag
                         ORDER BY l_extendedprice)
              + (COUNT(*) OVER (PARTITION BY l_returnflag,
                                l_extendedprice) - 1) / 2.0 AS ry
          FROM lineitem)
        SELECT g, CAST(COUNT(*) AS BIGINT) AS n, corr(rx, ry) AS rho
        FROM r GROUP BY g ORDER BY g""").df()
    assert list(got["l_returnflag"]) == list(want["g"])
    np.testing.assert_array_equal(got["n"], want["n"])
    np.testing.assert_allclose(got["rho"], want["rho"], atol=1e-6)
    con.close()


def test_known_values(ray_session):
    # perfect monotone → 1; perfect inverse → −1; ties averaged
    df = pd.DataFrame({
        "g": ["a"] * 4 + ["b"] * 4 + ["c"] * 4,
        "x": [1, 2, 3, 4] * 3,
        "y": [10, 20, 30, 40,      # monotone
              40, 30, 20, 10,      # inverse
              5, 5, 9, 9]})        # tied pairs
    got = spearman_by_group(rd.from_pandas(df, override_num_blocks=3),
                            "g", "x", "y").set_index("g")
    np.testing.assert_allclose(got.loc["a", "rho"], 1.0, atol=1e-9)
    np.testing.assert_allclose(got.loc["b", "rho"], -1.0, atol=1e-9)
    # tied-pair group: ranks x=(1,2,3,4), y=(1.5,1.5,3.5,3.5) →
    # cov=4, vx=5, vy=4 → rho = 4/√20
    np.testing.assert_allclose(got.loc["c", "rho"],
                               4.0 / np.sqrt(20.0), atol=1e-6)


def test_nulls_and_degenerate(ray_session):
    df = pd.DataFrame({
        "g": ["a", "a", "a", "b", "c", "c"],
        "x": [1.0, 2.0, None, 1.0, 1.0, 2.0],
        "y": [2.0, 4.0, 9.0, 3.0, 5.0, 5.0]})
    got = spearman_by_group(rd.from_pandas(df), "g", "x", "y"
                            ).set_index("g")
    assert got.loc["a", "n"] == 2          # null row dropped
    np.testing.assert_allclose(got.loc["a", "rho"], 1.0)
    assert np.isnan(got.loc["b", "rho"])   # single row
    assert np.isnan(got.loc["c", "rho"])   # constant y → zero denom


def test_multiblock_invariance(ray_session):
    rng = np.random.default_rng(23)
    df = pd.DataFrame({"g": rng.integers(0, 20, 3000),
                       "x": rng.normal(size=3000),
                       "y": rng.normal(size=3000)})
    a = spearman_by_group(rd.from_pandas(df, override_num_blocks=1),
                          "g", "x", "y")
    b = spearman_by_group(rd.from_pandas(df, override_num_blocks=7),
                          "g", "x", "y", n_buckets=5)
    pd.testing.assert_frame_equal(a, b)


def test_theil_sen_exact_band_duckdb_parity(ray_session):
    from cerberus_ray.stages.stats import theil_sen_by_group

    # small groups → exact all-pairs band; DuckDB median of pairwise
    # slopes over a rid self-join is an independent derivation
    rng = np.random.default_rng(31)
    n = 240
    df = pd.DataFrame({
        "g": np.repeat(np.arange(8), 30),
        "rid": np.arange(n),
        "x": rng.normal(size=n),
        "y": rng.normal(size=n)})
    got = theil_sen_by_group(rd.from_pandas(df, override_num_blocks=4),
                             "g", "x", "y", max_pairs=500)
    con = duckdb.connect()
    con.register("d", df)
    want = con.execute("""
        WITH s AS (SELECT a.g, (b.y - a.y) / (b.x - a.x) AS sl
                   FROM d a JOIN d b
                   ON a.g = b.g AND a.rid < b.rid AND a.x <> b.x)
        SELECT g, median(sl) AS slope FROM s GROUP BY g ORDER BY g
        """).df()
    np.testing.assert_allclose(got["slope"], want["slope"], atol=1e-6)
    # intercept: median(y − slope·x), checked in numpy
    for gi in range(8):
        sub = df[df["g"] == gi]
        sl = got.set_index("g").loc[gi, "slope"]
        np.testing.assert_allclose(
            got.set_index("g").loc[gi, "intercept"],
            np.median(sub["y"] - sl * sub["x"]), atol=1e-6)
    con.close()


def test_theil_sen_outlier_robust(ray_session):
    from cerberus_ray.stages.stats import theil_sen_by_group

    # y = 2x + 1 with 10% wild outliers → slope stays ≈ 2
    rng = np.random.default_rng(5)
    x = np.linspace(0, 10, 100)
    y = 2 * x + 1
    y[::10] += 500.0
    df = pd.DataFrame({"g": "a", "x": x, "y": y})
    got = theil_sen_by_group(rd.from_pandas(df), "g", "x", "y").iloc[0]
    np.testing.assert_allclose(got["slope"], 2.0, atol=0.05)
    np.testing.assert_allclose(got["intercept"], 1.0, atol=1.0)


def test_theil_sen_sampled_band_and_ties(ray_session):
    from cerberus_ray.stages.stats import theil_sen_by_group

    # 300 points → C(n,2)=44850 > max_pairs=1000 → seeded design;
    # still recovers a clean linear trend, and is layout-invariant
    x = np.tile(np.arange(100.0), 3)
    y = 3 * x - 7
    df = pd.DataFrame({"g": "a", "x": x, "y": y})
    a = theil_sen_by_group(rd.from_pandas(df, override_num_blocks=1),
                           "g", "x", "y", max_pairs=1000).iloc[0]
    b = theil_sen_by_group(rd.from_pandas(df, override_num_blocks=5),
                           "g", "x", "y", max_pairs=1000).iloc[0]
    assert a["n"] == 300
    np.testing.assert_allclose(a["slope"], 3.0, atol=1e-9)
    assert a.equals(b)
    # all-tied x → NaN slope
    tied = pd.DataFrame({"g": "t", "x": [1.0] * 5,
                         "y": np.arange(5.0)})
    got = theil_sen_by_group(rd.from_pandas(tied), "g", "x", "y")
    assert np.isnan(got["slope"].iloc[0])


def test_simpson_paradox_detected(ray_session):
    from cerberus_ray.stages.stats import simpson_check

    # classic construction: within each group y DECREASES in x, but
    # groups with larger x also have much larger y → pooled slope > 0
    rng = np.random.default_rng(41)
    rows = []
    for gi in range(4):
        x = rng.uniform(0, 1, 80) + 2 * gi
        y = -1.0 * (x - 2 * gi) + 5 * gi + rng.normal(0, 0.05, 80)
        for xi, yi in zip(x, y):
            rows.append((gi, xi, yi))
    df = pd.DataFrame(rows, columns=["g", "x", "y"])
    out = simpson_check(rd.from_pandas(df, override_num_blocks=3),
                        "x", "y", "g").iloc[0]
    assert out["pooled_slope"] > 0
    assert out["n_groups"] == 4
    assert out["n_groups_opposite"] == 4
    assert bool(out["simpson_flag"])


def test_simpson_no_paradox_and_pooled_parity(ray_session):
    import duckdb

    from cerberus_ray.stages.stats import simpson_check

    rng = np.random.default_rng(43)
    df = pd.DataFrame({
        "g": rng.integers(0, 5, 500),
        "x": rng.normal(size=500)})
    df["y"] = 2 * df["x"] + rng.normal(0, 0.1, 500)
    out = simpson_check(rd.from_pandas(df, override_num_blocks=4),
                        "x", "y", "g").iloc[0]
    assert not bool(out["simpson_flag"])
    assert out["n_groups_opposite"] == 0
    con = duckdb.connect()
    con.register("d", df)
    want = con.execute(
        "SELECT regr_slope(y, x) FROM d").fetchone()[0]
    np.testing.assert_allclose(out["pooled_slope"], want, atol=1e-6)
    con.close()


def test_kendall_duckdb_parity_exact(ray_session):
    """Exact τ-b vs the DuckDB self-join SIGN-product oracle on a
    synthetic grouped table (sizes small enough for exact all-pairs)."""
    from cerberus_ray.stages.stats import kendall_by_group

    rng = np.random.default_rng(23)
    n = 240
    df = pd.DataFrame({
        "g": np.repeat(list("abcd"), n // 4),
        "x": np.round(rng.normal(size=n), 1),   # rounding makes ties
        "y": np.round(rng.normal(size=n), 1)})
    df["y"] += 0.5 * df["x"]
    got = kendall_by_group(rd.from_pandas(df, override_num_blocks=4),
                           "g", "x", "y", max_pairs=10**6)
    con = duckdb.connect()
    con.register("t0", df.assign(rid=np.arange(n)))
    want = con.execute("""
        WITH p AS (SELECT a.g,
                   SIGN(a.x - b.x) * SIGN(a.y - b.y) AS s,
                   CASE WHEN a.x = b.x THEN 1 ELSE 0 END AS tx,
                   CASE WHEN a.y = b.y THEN 1 ELSE 0 END AS ty
            FROM t0 a JOIN t0 b ON a.g = b.g AND a.rid < b.rid)
        SELECT g, SUM(s) / SQRT((COUNT(*) - SUM(tx))
                              * (COUNT(*) - SUM(ty))) AS tau_b
        FROM p GROUP BY g ORDER BY g""").df()
    assert list(got["g"]) == list(want["g"])
    np.testing.assert_allclose(got["tau_b"], want["tau_b"], atol=1e-8)
    con.close()


def test_kendall_closed_forms_and_sampling(ray_session):
    from cerberus_ray.stages.stats import kendall_by_group

    # monotone → +1; inverse → −1; all-tied margin → NaN; n=1 → NaN
    df = pd.DataFrame({
        "g": ["m"] * 5 + ["i"] * 5 + ["t"] * 4 + ["s"],
        "x": [1, 2, 3, 4, 5, 1, 2, 3, 4, 5, 1, 2, 3, 4, 9],
        "y": [2, 4, 6, 8, 9, 9, 8, 6, 4, 2, 7, 7, 7, 7, 1.0]})
    got = (kendall_by_group(rd.from_pandas(df), "g", "x", "y")
           .set_index("g"))
    np.testing.assert_allclose(got.loc["m", "tau_b"], 1.0)
    np.testing.assert_allclose(got.loc["i", "tau_b"], -1.0)
    assert np.isnan(got.loc["t", "tau_b"])
    assert np.isnan(got.loc["s", "tau_b"])

    # sampled band: big monotone-with-noise group, sampled estimate
    # close to the exact value; deterministic across layouts
    rng = np.random.default_rng(5)
    n = 600
    x = rng.normal(size=n)
    big = pd.DataFrame({"g": "big", "x": x,
                        "y": x + 0.3 * rng.normal(size=n)})
    exact = kendall_by_group(rd.from_pandas(big), "g", "x", "y",
                             max_pairs=10**6)["tau_b"].iloc[0]
    samp1 = kendall_by_group(rd.from_pandas(big, override_num_blocks=1),
                             "g", "x", "y", max_pairs=3000)
    samp5 = kendall_by_group(rd.from_pandas(big, override_num_blocks=5),
                             "g", "x", "y", max_pairs=3000,
                             n_buckets=3)
    pd.testing.assert_frame_equal(samp1, samp5)
    assert abs(samp1["tau_b"].iloc[0] - exact) < 0.1
