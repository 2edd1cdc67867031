"""One-way ANOVA + grouped concentration metrics: exact-integer DuckDB
parity, hand-built closed forms, planner-mode agreement."""

import duckdb
import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from cerberus_ray.sources.io import read_table
from cerberus_ray.stages.anova import anova_oneway
from cerberus_ray.stages.concentration import concentration_by_group

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in ["events", "orders"]:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                  f"read_parquet('{SF}/{t}.parquet')")
    return c


def test_anova_duckdb_parity(ray_session, con):
    ev = read_table(f"{SF}/events.parquet",
                    columns=["event_type", "value"])
    got = anova_oneway(ev, "event_type", "value")
    want = con.execute("""
        WITH c AS (SELECT event_type g,
                          CAST(ROUND(value * 100) AS BIGINT) v
                   FROM events),
        per AS (SELECT g, COUNT(*) n, SUM(v) s1, SUM(v * v) s2
                FROM c GROUP BY 1),
        tot AS (SELECT SUM(n) n_all, SUM(s1) s_all FROM per)
        SELECT CAST(COUNT(*) AS BIGINT) k,
               CAST(ANY_VALUE(n_all) AS BIGINT) n,
               SUM(n * POWER(CAST(s1 AS DOUBLE) / n
                   - CAST(s_all AS DOUBLE) / n_all, 2)) / 10000.0
                 AS ss_between,
               SUM(CAST(s2 AS DOUBLE)
                   - n * POWER(CAST(s1 AS DOUBLE) / n, 2)) / 10000.0
                 AS ss_within
        FROM per, tot""").df()
    assert got["k"] == want["k"].iloc[0]
    assert got["n"] == want["n"].iloc[0]
    np.testing.assert_allclose(got["ss_between"],
                               want["ss_between"].iloc[0], rtol=1e-9)
    np.testing.assert_allclose(got["ss_within"],
                               want["ss_within"].iloc[0], rtol=1e-9)
    f = ((want["ss_between"].iloc[0] / (got["k"] - 1))
         / (want["ss_within"].iloc[0] / (got["n"] - got["k"])))
    np.testing.assert_allclose(got["f_stat"], f, rtol=1e-9)
    assert 0.0 <= got["eta_sq"] <= 1.0


def test_anova_hand_case(ray_session):
    # two groups with hand-computable SS: a=(1,2,3), b=(4,5,6)
    df = pd.DataFrame({"g": list("aaabbb"),
                       "v": [1.0, 2.0, 3.0, 4.0, 5.0, 6.0]})
    got = anova_oneway(rd.from_pandas(df, override_num_blocks=3),
                       "g", "v")
    # grand mean 3.5; SSB = 3*(2-3.5)^2 + 3*(5-3.5)^2 = 13.5
    # SSW = 2 + 2 = 4; F = (13.5/1)/(4/4) = 13.5
    np.testing.assert_allclose(got["ss_between"], 13.5, atol=1e-9)
    np.testing.assert_allclose(got["ss_within"], 4.0, atol=1e-9)
    np.testing.assert_allclose(got["f_stat"], 13.5, atol=1e-9)
    np.testing.assert_allclose(got["eta_sq"], 13.5 / 17.5, atol=1e-9)
    # identical groups -> F == 0
    df2 = pd.DataFrame({"g": list("aabb"), "v": [1.0, 2.0, 1.0, 2.0]})
    z = anova_oneway(rd.from_pandas(df2), "g", "v")
    np.testing.assert_allclose(z["f_stat"], 0.0, atol=1e-12)


def test_anova_nulls_and_layout(ray_session):
    df = pd.DataFrame({"g": list("ababab"),
                       "v": [1.0, None, 3.0, 4.0, None, 6.0]})
    a = anova_oneway(rd.from_pandas(df, override_num_blocks=1),
                     "g", "v")
    b = anova_oneway(rd.from_pandas(df, override_num_blocks=5),
                     "g", "v")
    assert a == b  # exact-integer partials => layout-identical
    assert a["n"] == 4


def test_concentration_duckdb_parity(ray_session, con):
    orders = read_table(f"{SF}/orders.parquet",
                        columns=["o_orderpriority", "o_custkey",
                                 "o_totalprice"])
    got = concentration_by_group(orders, "o_orderpriority",
                                 "o_custkey", "o_totalprice")
    want = con.execute("""
        WITH member AS (
          SELECT o_orderpriority g, o_custkey m,
                 CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                      AS BIGINT) cents
          FROM orders GROUP BY 1, 2),
        r AS (SELECT g, cents,
                     ROW_NUMBER() OVER (PARTITION BY g
                                        ORDER BY cents) rnk
              FROM member)
        SELECT g AS o_orderpriority,
               CAST(COUNT(*) AS BIGINT) n_members,
               CAST(SUM(cents) AS BIGINT) / 100.0 total,
               2.0 * SUM(rnk * CAST(cents AS DOUBLE))
                 / (COUNT(*) * CAST(SUM(cents) AS DOUBLE))
                 - (COUNT(*) + 1.0) / COUNT(*) AS gini,
               SUM(CAST(cents AS DOUBLE) ** 2)
                 / (CAST(SUM(cents) AS DOUBLE) ** 2) AS hhi,
               MAX(cents) / CAST(SUM(cents) AS DOUBLE) AS top1_share
        FROM r GROUP BY 1 ORDER BY 1""").df()
    assert len(got) == len(want) and len(got) >= 3
    for c in ["n_members", "total"]:
        assert got[c].tolist() == want[c].tolist()
    for c in ["gini", "hhi", "top1_share"]:
        np.testing.assert_allclose(got[c], want[c], rtol=1e-9)


def test_concentration_modes_agree(ray_session):
    orders = read_table(f"{SF}/orders.parquet",
                        columns=["o_orderpriority", "o_custkey",
                                 "o_totalprice"])
    d = concentration_by_group(orders, "o_orderpriority", "o_custkey",
                               "o_totalprice", mode="driver")
    s = concentration_by_group(orders, "o_orderpriority", "o_custkey",
                               "o_totalprice", mode="shuffle",
                               n_buckets=5)
    pd.testing.assert_frame_equal(
        d, s.astype(d.dtypes.to_dict()), check_dtype=False)
    with pytest.raises(ValueError):
        concentration_by_group(orders, "o_orderpriority", "o_custkey",
                               "o_totalprice", mode="nope")


def test_concentration_closed_forms(ray_session):
    # equal shares -> gini 0, hhi 1/n; monopoly -> gini (n-1)/n
    # with one nonzero member... use one-member group: gini 0, hhi 1
    df = pd.DataFrame({
        "g": ["eq"] * 4 + ["solo"],
        "m": [1, 2, 3, 4, 9],
        "v": [5.0, 5.0, 5.0, 5.0, 7.0]})
    out = concentration_by_group(rd.from_pandas(df), "g", "m", "v")
    eq = out[out["g"] == "eq"].iloc[0]
    np.testing.assert_allclose(eq["gini"], 0.0, atol=1e-12)
    np.testing.assert_allclose(eq["hhi"], 0.25, atol=1e-12)
    np.testing.assert_allclose(eq["top1_share"], 0.25, atol=1e-12)
    solo = out[out["g"] == "solo"].iloc[0]
    assert solo["n_members"] == 1
    np.testing.assert_allclose(solo["gini"], 0.0, atol=1e-12)
    np.testing.assert_allclose(solo["hhi"], 1.0, atol=1e-12)
    # rows of one member accumulate before the metric
    df2 = pd.DataFrame({"g": ["x"] * 3, "m": [1, 1, 2],
                        "v": [2.0, 3.0, 5.0]})
    out2 = concentration_by_group(rd.from_pandas(df2), "g", "m", "v")
    assert out2["n_members"].iloc[0] == 2
    np.testing.assert_allclose(out2["hhi"].iloc[0], 0.5, atol=1e-12)
