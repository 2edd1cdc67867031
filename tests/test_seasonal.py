"""Seasonal decomposition: DuckDB window parity on the daily event
series, closed-form synthetic checks, guards."""

import duckdb
import numpy as np
import pandas as pd
import pytest

from cerberus_ray.pipelines.training_queries import q_seasonal_report
from cerberus_ray.stages.seasonal import (seasonal_decompose_series,
                                          seasonal_strength)

SF = "/root/testdata/sf0.001"


def test_duckdb_parity_on_events(ray_session):
    got = q_seasonal_report(SF).to_pandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{SF}/events.parquet')")
    want = con.execute("""
        WITH d AS (SELECT CAST(ts AS DATE) AS day,
                          CAST(COUNT(*) AS DOUBLE) AS n
                   FROM events GROUP BY 1),
        o AS (SELECT day, n,
                     ROW_NUMBER() OVER (ORDER BY day) - 1 AS i FROM d),
        t AS (SELECT *, CASE WHEN i >= 3
                              AND i <= (SELECT MAX(i) FROM o) - 3
                THEN AVG(n) OVER (ORDER BY i ROWS BETWEEN 3 PRECEDING
                                  AND 3 FOLLOWING) END AS trend
              FROM o),
        s AS (SELECT i % 7 AS p, AVG(n - trend) AS sm FROM t
              WHERE trend IS NOT NULL GROUP BY 1),
        c AS (SELECT AVG(sm) AS ctr FROM s)
        SELECT t.day, t.n, t.trend, s.sm - c.ctr AS seasonal,
               t.n - t.trend - (s.sm - c.ctr) AS resid
        FROM t JOIN s ON t.i % 7 = s.p, c ORDER BY t.day""").df()
    # the sf0.001 event range is gap-free, so the SQL needs no calendar
    # fill; assert that premise so a future generator change surfaces
    assert len(got) == len(want)
    np.testing.assert_allclose(got["n"], want["n"])
    np.testing.assert_allclose(got["trend"], want["trend"], atol=1e-6)
    np.testing.assert_allclose(got["seasonal"], want["seasonal"],
                               atol=1e-6)
    np.testing.assert_allclose(got["resid"], want["resid"], atol=1e-6)
    con.close()


def test_pure_weekly_pattern_plus_trend():
    # value = linear trend + exact weekly pattern → resid ≈ 0 where
    # trend exists, strength == 1
    pat = np.array([5.0, -3, 0, 2, -1, -2, -1])
    n = 8 * 7
    v = 0.5 * np.arange(n) + pat[np.arange(n) % 7]
    dec = seasonal_decompose_series(
        pd.DataFrame({"t": range(n), "v": v}), "v", 7)
    inner = dec.dropna(subset=["trend"])
    np.testing.assert_allclose(inner["resid"], 0.0, atol=1e-9)
    assert seasonal_strength(dec) == 1.0
    # trend edge rule: first/last half-window rows are NULL
    assert dec["trend"].isna().sum() == 6


def test_constant_series_no_seasonality():
    dec = seasonal_decompose_series(
        pd.DataFrame({"t": range(30), "v": [4.0] * 30}), "v", 5)
    np.testing.assert_allclose(dec["seasonal"], 0.0, atol=1e-12)
    assert np.isnan(seasonal_strength(dec))  # zero variance


def test_guards():
    df = pd.DataFrame({"t": range(10), "v": np.arange(10.0)})
    with pytest.raises(ValueError):
        seasonal_decompose_series(df, "v", 4)   # even
    with pytest.raises(ValueError):
        seasonal_decompose_series(df, "v", 1)   # too small
