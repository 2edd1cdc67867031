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
