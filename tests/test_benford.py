"""Benford profile: DuckDB digit-extraction parity on real testdata
(orders.o_totalprice), conformity of a synthetic Benford sample vs
clear non-conformity of uniform data, zero/NULL exclusion, partition
invariance."""

import duckdb
import numpy as np
import pandas as pd
import ray.data as rd

from cerberus_ray.sources.io import read_table
from cerberus_ray.stages.benford import BENFORD_P, benford_profile

SF = "/root/testdata/sf0.001"

SQL = """
WITH d AS (
  SELECT CAST(FLOOR(ABS(x) / POWER(10, FLOOR(LOG10(ABS(x)))))
              AS BIGINT) AS digit
  FROM df WHERE x IS NOT NULL AND x <> 0)
SELECT digit, COUNT(*) AS n FROM d GROUP BY digit ORDER BY digit
"""


def test_duckdb_parity_on_orders(ray_session):
    path = f"{SF}/orders.parquet"
    ds = read_table(path, columns=["o_totalprice"])
    got = benford_profile(ds, "o_totalprice")
    df = pd.read_parquet(path, columns=["o_totalprice"]).rename(
        columns={"o_totalprice": "x"})
    want = duckdb.sql(SQL).fetchdf().set_index("digit")["n"]
    want = want.reindex(np.arange(1, 10), fill_value=0)
    assert got["n"].tolist() == want.tolist()
    assert got["n"].sum() == len(df)
    np.testing.assert_allclose(got["p_obs"], got["n"] / len(df),
                               atol=1e-6)


def test_benford_sample_conforms_uniform_does_not(ray_session):
    rng = np.random.default_rng(17)
    # log-uniform over several decades ⇒ Benford-distributed digits
    ben = pd.DataFrame({"x": 10 ** rng.uniform(0, 5, 20000)})
    uni = pd.DataFrame({"x": rng.uniform(100, 999, 20000)})
    b = benford_profile(rd.from_pandas(ben, override_num_blocks=4), "x")
    u = benford_profile(rd.from_pandas(uni, override_num_blocks=4), "x")
    assert b["mad"].iloc[0] < 0.01       # Nigrini: <0.006 close, <0.012 acceptable
    assert u["mad"].iloc[0] > 0.05       # uniform digits ≈ 1/9 each
    assert b["chi2"].iloc[0] < u["chi2"].iloc[0] / 10
    np.testing.assert_allclose(b["p_exp"], BENFORD_P, atol=1e-6)


def test_zero_null_excluded(ray_session):
    df = pd.DataFrame({"x": [0.0, None, np.nan, 123.0, -45.0, 0.07]})
    got = benford_profile(rd.from_pandas(df), "x")
    assert got["n"].sum() == 3
    assert got.set_index("digit").loc[1, "n"] == 1   # 123
    assert got.set_index("digit").loc[4, "n"] == 1   # -45
    assert got.set_index("digit").loc[7, "n"] == 1   # 0.07


def test_partition_invariance(ray_session):
    rng = np.random.default_rng(3)
    df = pd.DataFrame({"x": 10 ** rng.uniform(0, 4, 5000)})
    a = benford_profile(rd.from_pandas(df, override_num_blocks=1), "x")
    b = benford_profile(rd.from_pandas(df, override_num_blocks=9), "x")
    pd.testing.assert_frame_equal(a, b)
