"""Robust grouped stats: DuckDB window parity for trimmed/winsorized
means and quantile_disc MAD, hand closed forms, layout invariance."""

import duckdb
import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from cerberus_ray.sources.io import read_table
from cerberus_ray.stages.robust import grouped_robust_stats

SF = "/root/testdata/sf0.001"


def test_duckdb_parity(ray_session):
    ev = read_table(f"{SF}/events.parquet",
                    columns=["event_type", "value"])
    got = grouped_robust_stats(ev, "event_type", "value", trim=0.1)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{SF}/events.parquet')")
    want = con.execute("""
        WITH c AS (SELECT event_type g,
                          CAST(ROUND(value * 100) AS BIGINT) v
                   FROM events),
        r AS (SELECT g, v,
                     ROW_NUMBER() OVER (PARTITION BY g ORDER BY v) rn,
                     COUNT(*) OVER (PARTITION BY g) n
              FROM c),
        k AS (SELECT *, CAST(FLOOR(0.1 * n) AS BIGINT) kk FROM r),
        bounds AS (SELECT g,
                          MAX(CASE WHEN rn = kk + 1 THEN v END) lo,
                          MAX(CASE WHEN rn = n - kk THEN v END) hi
                   FROM k GROUP BY g),
        med AS (SELECT g, quantile_disc(v, 0.5) m FROM c GROUP BY 1)
        SELECT k.g AS event_type,
               CAST(ANY_VALUE(k.n) AS BIGINT) n,
               AVG(v) FILTER (rn > kk AND rn <= n - kk) / 100.0
                 AS trimmed_mean,
               AVG(LEAST(GREATEST(v, lo), hi)) / 100.0
                 AS winsorized_mean,
               ANY_VALUE(m) / 100.0 AS median,
               quantile_disc(ABS(v - m), 0.5) / 100.0 AS mad
        FROM k JOIN bounds ON k.g = bounds.g
               JOIN med ON k.g = med.g
        GROUP BY k.g ORDER BY k.g""").df()
    con.close()
    assert len(got) == len(want) >= 3
    for col in ["n", "median", "mad"]:
        assert got[col].tolist() == want[col].tolist()
    for col in ["trimmed_mean", "winsorized_mean"]:
        np.testing.assert_allclose(got[col], want[col], rtol=1e-12)


def test_hand_case_and_trim_zero(ray_session):
    # g: values 1..10, trim 0.2 -> k=2: trimmed mean of 3..8 = 5.5
    # winsorized: clamp {1,2}->3, {9,10}->8: (3+3+3+4+..+8+8+8)/10
    df = pd.DataFrame({"g": ["a"] * 10,
                       "v": [float(i) for i in range(1, 11)]})
    got = grouped_robust_stats(rd.from_pandas(df), "g", "v", trim=0.2)
    np.testing.assert_allclose(got["trimmed_mean"], 5.5, atol=1e-12)
    wins = (3 + 3 + 3 + 4 + 5 + 6 + 7 + 8 + 8 + 8) / 10
    np.testing.assert_allclose(got["winsorized_mean"], wins,
                               atol=1e-12)
    assert got["median"].iloc[0] == 5.0  # lower median
    # MAD around lower median 5: |v-5| sorted = 0,1,1,2,2,3,3,4,4,5
    assert got["mad"].iloc[0] == 2.0
    # trim=0 reduces to the plain mean
    z = grouped_robust_stats(rd.from_pandas(df), "g", "v", trim=0.0)
    np.testing.assert_allclose(z["trimmed_mean"], 5.5, atol=1e-12)
    np.testing.assert_allclose(z["winsorized_mean"], 5.5, atol=1e-12)
    with pytest.raises(ValueError):
        grouped_robust_stats(rd.from_pandas(df), "g", "v", trim=0.5)


def test_outlier_resistance_and_layout(ray_session):
    # one wild outlier moves the mean but not the trimmed mean much
    df = pd.DataFrame({"g": ["a"] * 11,
                       "v": [10.0] * 10 + [10_000.0]})
    got = grouped_robust_stats(rd.from_pandas(df), "g", "v", trim=0.1)
    np.testing.assert_allclose(got["trimmed_mean"], 10.0, atol=1e-9)
    assert got["mad"].iloc[0] == 0.0
    rng = np.random.default_rng(9)
    big = pd.DataFrame({"g": rng.choice(list("abc"), 3000),
                        "v": np.round(rng.normal(20, 5, 3000), 2)})
    a = grouped_robust_stats(
        rd.from_pandas(big, override_num_blocks=1), "g", "v")
    b = grouped_robust_stats(
        rd.from_pandas(big, override_num_blocks=8), "g", "v")
    pd.testing.assert_frame_equal(a, b)  # exact census => bitwise
