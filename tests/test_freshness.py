"""Freshness/gap validation: DuckDB window-median parity on real
events, planted stale key and internal gap, single-event keys,
determinism."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from cerberus_ray.stages.freshness import (freshness_report,
                                           freshness_summary,
                                           global_max_ts)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events_ds(ray_session):
    import ray.data as rd

    return rd.read_parquet(f"{SF}/events.parquet",
                           columns=["user_id", "ts"])


def test_freshness_matches_duckdb(events_ds):
    asof = global_max_ts(events_ds, "ts")
    got = freshness_report(events_ds, "user_id", "ts", asof=asof,
                           factor=3.0).to_pandas()
    con = duckdb.connect()
    con.execute(f"create view events as select * from "
                f"read_parquet('{SF}/events.parquet')")
    want = con.execute("""
        WITH gaps AS (
          SELECT user_id,
                 floor(epoch(ts))::BIGINT AS sec,
                 floor(epoch(ts))::BIGINT
                   - lag(floor(epoch(ts))::BIGINT) OVER
                     (PARTITION BY user_id ORDER BY ts) AS gap
          FROM events
        )
        SELECT user_id,
               COUNT(*) AS n_events,
               MAX(sec) AS last_ts_s,
               median(gap) AS median_gap_s,
               COALESCE(MAX(gap), 0)::DOUBLE AS max_gap_s
        FROM gaps GROUP BY 1 ORDER BY 1
    """).fetchdf()
    assert len(got) == len(want)
    np.testing.assert_array_equal(got["user_id"], want["user_id"])
    np.testing.assert_array_equal(got["n_events"], want["n_events"])
    np.testing.assert_array_equal(got["last_ts_s"], want["last_ts_s"])
    np.testing.assert_allclose(got["median_gap_s"], want["median_gap_s"],
                               rtol=0, atol=0)
    np.testing.assert_allclose(got["max_gap_s"], want["max_gap_s"],
                               rtol=0, atol=0)
    # staleness against the same asof
    asof_s = int((asof - pd.Timestamp(0)) // pd.Timedelta(seconds=1))
    np.testing.assert_array_equal(
        got["staleness_s"], asof_s - want["last_ts_s"].to_numpy())


def test_freshness_planted_anomalies(ray_session):
    base = pd.Timestamp("2025-06-01")
    rows = []
    # steady key: every 60 s through the WHOLE window (past key 3's
    # hole-shifted end, so the global-max asof leaves it fresh)
    for i in range(221):
        rows.append({"user_id": 1, "ts": base + pd.Timedelta(seconds=60 * i)})
    # stale key: every 60 s but stops halfway
    for i in range(50):
        rows.append({"user_id": 2, "ts": base + pd.Timedelta(seconds=60 * i)})
    # gap key: every 60 s with one 2-hour hole, ends fresh
    for i in range(100):
        off = 60 * i + (7200 if i >= 50 else 0)
        rows.append({"user_id": 3, "ts": base + pd.Timedelta(seconds=off)})
    # single-event key: no cadence → never stale
    rows.append({"user_id": 4, "ts": base})
    df = pd.DataFrame(rows)
    asof = df["ts"].max()
    per = freshness_report(rd.from_pandas(df), "user_id", "ts",
                           asof=asof, factor=3.0).to_pandas()
    by = per.set_index("user_id")
    assert not by.loc[1, "stale"] and by.loc[1, "n_internal_gaps"] == 0
    assert by.loc[2, "stale"]          # stopped ~50 min before asof
    assert not by.loc[3, "stale"]      # ends fresh...
    assert by.loc[3, "n_internal_gaps"] == 1   # ...but has the hole
    assert by.loc[3, "max_gap_s"] == 7260.0
    assert not by.loc[4, "stale"] and by.loc[4, "n_events"] == 1
    assert np.isnan(by.loc[4, "median_gap_s"])

    s = freshness_summary(rd.from_pandas(df), "user_id", "ts",
                          asof=asof, factor=3.0).to_pandas()
    assert s["n_keys"].iloc[0] == 4
    assert s["n_stale"].iloc[0] == 1
    assert s["n_keys_with_internal_gaps"].iloc[0] == 1
    assert s["max_gap_s"].iloc[0] == 7260.0


def test_freshness_deterministic_across_layouts(events_ds, ray_session):
    a = freshness_report(events_ds, "user_id", "ts", factor=3.0)
    b = freshness_report(events_ds.repartition(7), "user_id", "ts",
                         factor=3.0)
    assert a.equals(b)
