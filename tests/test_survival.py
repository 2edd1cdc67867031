"""Kaplan-Meier: DuckDB window parity (EXP·SUM·LN over ordered distinct
times — an independent formulation of the cumulative product), hand-
worked textbook example, censoring semantics, grouped mode, full-death
tail, partition invariance."""

import duckdb
import numpy as np
import pandas as pd
import ray.data as rd

from cerberus_ray.stages.survival import kaplan_meier

SQL = """
WITH g AS (
  SELECT t, SUM(e) AS d, COUNT(*) AS n FROM df GROUP BY t),
c AS (
  SELECT t, d, n,
         (SELECT COUNT(*) FROM df)
           - COALESCE(SUM(n) OVER (ORDER BY t ROWS BETWEEN
               UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS r
  FROM g)
SELECT t, CAST(r AS BIGINT) AS at_risk, CAST(d AS BIGINT) AS events,
       CAST(n - d AS BIGINT) AS censored,
       EXP(SUM(LN(1.0 - d / r)) OVER (ORDER BY t)) AS survival
FROM c ORDER BY t
"""


def _frame(seed=13, n=3000):
    rng = np.random.default_rng(seed)
    t = rng.integers(1, 40, n)
    e = (rng.random(n) < 0.7).astype(np.int64)
    g = rng.choice(["x", "y"], n)
    # censor the max-duration rows so no at-risk set dies out entirely
    e[t == t.max()] = 0
    return pd.DataFrame({"t": t, "e": e, "g": g})


def test_duckdb_parity(ray_session):
    df = _frame()
    got = kaplan_meier(rd.from_pandas(df, override_num_blocks=5),
                       "t", "e")
    want = duckdb.sql(SQL).fetchdf()
    assert got["t"].tolist() == want["t"].tolist()
    assert got["at_risk"].tolist() == want["at_risk"].tolist()
    assert got["events"].tolist() == want["events"].tolist()
    assert got["censored"].tolist() == want["censored"].tolist()
    np.testing.assert_allclose(got["survival"], want["survival"],
                               atol=1e-6)


def test_textbook_example(ray_session):
    # classic 6-subject example: deaths at 1, 3 (censor at 2), ...
    df = pd.DataFrame({"t": [1, 2, 3, 4, 4, 5],
                       "e": [1, 0, 1, 1, 0, 0]})
    got = kaplan_meier(rd.from_pandas(df), "t", "e")
    # S(1)=5/6; S(3)=5/6*3/4; S(4)=5/6*3/4*2/3
    np.testing.assert_allclose(
        got.set_index("t")["survival"],
        [5 / 6, 5 / 6, 5 / 6 * 3 / 4, 5 / 6 * 3 / 4 * 2 / 3,
         5 / 6 * 3 / 4 * 2 / 3],
        atol=1e-6)
    assert got.set_index("t").loc[2, "censored"] == 1
    assert got.set_index("t").loc[2, "events"] == 0


def test_full_death_reaches_zero(ray_session):
    df = pd.DataFrame({"t": [1, 2, 2], "e": [1, 1, 1]})
    got = kaplan_meier(rd.from_pandas(df), "t", "e")
    assert got["survival"].iloc[-1] == 0.0


def test_grouped_matches_per_group(ray_session):
    df = _frame(seed=3)
    got = kaplan_meier(rd.from_pandas(df, override_num_blocks=4),
                       "t", "e", group_col="g")
    for g, sub in df.groupby("g"):
        solo = kaplan_meier(rd.from_pandas(sub.reset_index(drop=True)),
                            "t", "e")
        part = (got[got["g"] == g].drop(columns="g")
                .reset_index(drop=True))
        pd.testing.assert_frame_equal(part, solo)


def test_partition_invariance(ray_session):
    df = _frame(seed=21)
    a = kaplan_meier(rd.from_pandas(df, override_num_blocks=1), "t", "e")
    b = kaplan_meier(rd.from_pandas(df, override_num_blocks=8), "t", "e")
    pd.testing.assert_frame_equal(a, b)
