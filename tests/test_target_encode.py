"""Target encoding: DuckDB window parity for smoothed and LOO forms,
hand closed forms, singleton NaN, layout invariance."""

import duckdb
import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from cerberus_ray.sources.io import read_table
from cerberus_ray.stages.target_encode import (loo_encode,
                                               target_encoding_map)

SF = "/root/testdata/sf0.001"


def _purchase_events():
    ev = read_table(f"{SF}/events.parquet",
                    columns=["user_id", "event_id", "event_type",
                             "value"]).to_pandas()
    # binary target in 2-dp units: 1.0 when the event is a purchase
    ev["y"] = np.where(ev["event_type"] == "purchase", 1.0, 0.0)
    return ev[["user_id", "event_id", "y"]]


def test_smoothed_map_duckdb_parity(ray_session):
    ev = _purchase_events()
    got = target_encoding_map(rd.from_pandas(ev,
                                             override_num_blocks=4),
                              "user_id", "y", m=10.0)
    con = duckdb.connect()
    con.register("ev", ev)
    want = con.execute("""
        WITH c AS (SELECT user_id,
                          CAST(ROUND(y * 100) AS BIGINT) yc FROM ev),
        per AS (SELECT user_id, COUNT(*) n, SUM(yc) s FROM c
                GROUP BY 1),
        g AS (SELECT CAST(SUM(s) AS DOUBLE) / SUM(n) / 100.0
                AS prior FROM per)
        SELECT user_id, CAST(n AS BIGINT) n,
               (CAST(s AS DOUBLE) / 100.0 + 10.0 * prior)
                 / (n + 10.0) AS encoding,
               prior
        FROM per, g ORDER BY user_id""").df()
    con.close()
    pd.testing.assert_frame_equal(got.reset_index(drop=True), want,
                                  check_dtype=False)


def test_loo_duckdb_parity(ray_session):
    ev = _purchase_events()
    got = (loo_encode(rd.from_pandas(ev, override_num_blocks=3),
                      "user_id", "y").to_pandas()
           .sort_values("event_id").reset_index(drop=True))
    con = duckdb.connect()
    con.register("ev", ev)
    want = con.execute("""
        WITH c AS (SELECT user_id, event_id, y,
                          CAST(ROUND(y * 100) AS BIGINT) yc FROM ev)
        SELECT user_id, event_id, y,
               CASE WHEN COUNT(*) OVER w > 1 THEN
                 CAST(SUM(yc) OVER w - yc AS DOUBLE)
                   / (COUNT(*) OVER w - 1) / 100.0
               END AS loo
        FROM c WINDOW w AS (PARTITION BY user_id)
        ORDER BY event_id""").df()
    con.close()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_hand_case_and_singleton(ray_session):
    df = pd.DataFrame({"c": ["a", "a", "a", "b"],
                       "e": [0, 1, 2, 3],
                       "y": [1.0, 0.0, 1.0, 1.0]})
    m = target_encoding_map(rd.from_pandas(df), "c", "y", m=2.0)
    prior = 0.75
    np.testing.assert_allclose(
        m.set_index("c")["encoding"]["a"],
        (2.0 + 2.0 * prior) / (3 + 2.0), atol=1e-12)
    np.testing.assert_allclose(
        m.set_index("c")["encoding"]["b"],
        (1.0 + 2.0 * prior) / (1 + 2.0), atol=1e-12)
    out = (loo_encode(rd.from_pandas(df), "c", "y").to_pandas()
           .sort_values("e"))
    # a-rows: LOO of [1,0,1] -> [(0+1)/2, (1+1)/2, (1+0)/2]
    np.testing.assert_allclose(out["loo"].iloc[:3],
                               [0.5, 1.0, 0.5], atol=1e-12)
    assert np.isnan(out["loo"].iloc[3])  # singleton category


def test_layout_invariance(ray_session):
    ev = _purchase_events()
    a = target_encoding_map(rd.from_pandas(ev,
                                           override_num_blocks=1),
                            "user_id", "y")
    b = target_encoding_map(rd.from_pandas(ev,
                                           override_num_blocks=8),
                            "user_id", "y")
    pd.testing.assert_frame_equal(a, b)  # exact-int census
