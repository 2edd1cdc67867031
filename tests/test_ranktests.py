"""Kruskal-Wallis + Brown-Forsythe: DuckDB midrank-window parity,
hand-computable closed forms, exact layout invariance."""

import duckdb
import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from cerberus_ray.sources.io import read_table
from cerberus_ray.stages.ranktests import brown_forsythe, kruskal_wallis

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    c.execute(f"CREATE VIEW events AS SELECT * FROM "
              f"read_parquet('{SF}/events.parquet')")
    return c


def test_kw_duckdb_parity(ray_session, con):
    ev = read_table(f"{SF}/events.parquet",
                    columns=["event_type", "value"])
    got = kruskal_wallis(ev, "event_type", "value")
    want = con.execute("""
        WITH c AS (SELECT event_type g,
                          CAST(ROUND(value * 100) AS BIGINT) v
                   FROM events),
        ranked AS (SELECT g, v,
                          RANK() OVER (ORDER BY v)
                          + (COUNT(*) OVER (PARTITION BY v) - 1) / 2.0
                            AS ar
                   FROM c),
        per_g AS (SELECT g, COUNT(*) n, SUM(ar) rsum
                  FROM ranked GROUP BY 1),
        ties AS (SELECT SUM(POWER(t, 3) - t) tt FROM (
                   SELECT COUNT(*) t FROM c GROUP BY v)),
        tot AS (SELECT SUM(n) n_all FROM per_g)
        SELECT CAST(COUNT(*) AS BIGINT) k,
               CAST(ANY_VALUE(n_all) AS BIGINT) n,
               12.0 / (ANY_VALUE(n_all) * (ANY_VALUE(n_all) + 1.0))
                 * SUM(rsum * rsum / n)
                 - 3.0 * (ANY_VALUE(n_all) + 1.0) AS h,
               1.0 - ANY_VALUE(tt)
                 / (POWER(ANY_VALUE(n_all), 3)
                    - ANY_VALUE(n_all)) AS tie
        FROM per_g, tot, ties""").df()
    assert got["k"] == want["k"].iloc[0]
    assert got["n"] == want["n"].iloc[0]
    np.testing.assert_allclose(got["h_stat"], want["h"].iloc[0],
                               rtol=1e-9)
    np.testing.assert_allclose(got["tie_correction"],
                               want["tie"].iloc[0], rtol=1e-12)
    np.testing.assert_allclose(
        got["h_corrected"], want["h"].iloc[0] / want["tie"].iloc[0],
        rtol=1e-9)


def test_kw_hand_case(ray_session):
    # no ties, hand ranks: a={1,2,3} ranks{1,2,3}, b={4,5,6} ranks
    # {4,5,6}: H = 12/(6*7) * (36/3 + 225/3) - 3*7 = 12/42*87 - 21
    df = pd.DataFrame({"g": list("aaabbb"),
                       "v": [0.01, 0.02, 0.03, 0.04, 0.05, 0.06]})
    got = kruskal_wallis(rd.from_pandas(df, override_num_blocks=3),
                         "g", "v")
    want = 12.0 / 42.0 * (36.0 / 3 + 225.0 / 3) - 21.0
    np.testing.assert_allclose(got["h_stat"], want, atol=1e-12)
    np.testing.assert_allclose(got["tie_correction"], 1.0, atol=1e-15)
    # all-tied values: tie correction hits 0, H_c undefined
    tied = pd.DataFrame({"g": list("ab"), "v": [1.0, 1.0]})
    z = kruskal_wallis(rd.from_pandas(tied), "g", "v")
    assert np.isnan(z["h_corrected"])


def test_kw_layout_invariance(ray_session):
    rng = np.random.default_rng(7)
    df = pd.DataFrame({
        "g": rng.choice(list("abcd"), 3000),
        "v": np.round(rng.normal(10, 2, 3000), 2)})
    a = kruskal_wallis(rd.from_pandas(df, override_num_blocks=1),
                       "g", "v")
    b = kruskal_wallis(rd.from_pandas(df, override_num_blocks=7),
                       "g", "v")
    assert a == b  # exact census => bitwise-identical closed form


def test_bf_duckdb_parity(ray_session, con):
    ev = read_table(f"{SF}/events.parquet",
                    columns=["event_type", "value"])
    got = brown_forsythe(ev, "event_type", "value")
    want = con.execute("""
        WITH c AS (SELECT event_type g,
                          CAST(ROUND(value * 100) AS BIGINT) v
                   FROM events),
        med AS (SELECT g, quantile_disc(v, 0.5) m FROM c GROUP BY 1),
        z AS (SELECT c.g, ABS(v - m) z FROM c JOIN med ON c.g = med.g),
        per AS (SELECT g, COUNT(*) n, SUM(z) s1, SUM(z * z) s2
                FROM z GROUP BY 1),
        tot AS (SELECT SUM(n) n_all, SUM(s1) s_all FROM per)
        SELECT CAST(COUNT(*) AS BIGINT) k,
               CAST(ANY_VALUE(n_all) AS BIGINT) n,
               SUM(n * POWER(CAST(s1 AS DOUBLE) / n
                   - CAST(s_all AS DOUBLE) / n_all, 2)) AS ssb,
               SUM(CAST(s2 AS DOUBLE)
                   - n * POWER(CAST(s1 AS DOUBLE) / n, 2)) AS ssw
        FROM per, tot""").df()
    assert got["k"] == want["k"].iloc[0]
    assert got["n"] == want["n"].iloc[0]
    f = ((want["ssb"].iloc[0] / (got["k"] - 1))
         / (want["ssw"].iloc[0] / (got["n"] - got["k"])))
    np.testing.assert_allclose(got["f_stat"], f, rtol=1e-9)


def test_bf_hand_case_and_layout(ray_session):
    # group a = {1,2,9}: lower median 2, z = {1,0,7}
    # group b = {4,5,6}: lower median 5, z = {1,0,1}
    df = pd.DataFrame({"g": list("aaabbb"),
                       "v": [1.0, 2.0, 9.0, 4.0, 5.0, 6.0]})
    got = brown_forsythe(rd.from_pandas(df, override_num_blocks=2),
                         "g", "v")
    za, zb = np.array([1.0, 0.0, 7.0]), np.array([1.0, 0.0, 1.0])
    grand = np.concatenate([za, zb]).mean()
    ssb = 3 * (za.mean() - grand) ** 2 + 3 * (zb.mean() - grand) ** 2
    ssw = ((za - za.mean()) ** 2).sum() + ((zb - zb.mean()) ** 2).sum()
    want = (ssb / 1) / (ssw / 4)
    np.testing.assert_allclose(got["f_stat"], want, rtol=1e-12)
    b2 = brown_forsythe(rd.from_pandas(df, override_num_blocks=5),
                        "g", "v")
    assert got == b2
