"""Ordered funnel: hand-built sequences, strict-after semantics, DuckDB
parity on the real events table, bucket-count invariance."""

import duckdb
import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from cerberus_ray.pipelines.funnel import funnel_counts


def events():
    rows = [
        # u1 completes the funnel in order
        (1, "view", 10), (1, "click", 20), (1, "purchase", 30),
        # u2 clicks BEFORE viewing → reaches view only
        (2, "click", 5), (2, "view", 10),
        # u3 view+click, purchase exactly AT the click time → strict: no
        (3, "view", 1), (3, "click", 2), (3, "purchase", 2),
        # u4 completes via its SECOND click (first is pre-view)
        (4, "click", 1), (4, "view", 2), (4, "click", 3), (4, "purchase", 9),
        # u5 purchase only → no stage reached
        (5, "purchase", 1),
        # u6 view only
        (6, "view", 7),
    ]
    return pd.DataFrame(rows, columns=["user_id", "event_type", "ts"]) \
        .assign(ts=lambda d: pd.to_datetime(d["ts"], unit="s"))


def test_hand_funnel(ray_session):
    out = funnel_counts(rd.from_pandas(events(), override_num_blocks=3),
                        ["view", "click", "purchase"]).to_pandas()
    assert out["stage"].tolist() == ["view", "click", "purchase"]
    # view: u1,u2,u3,u4,u6 = 5; click-after-view: u1,u3,u4 = 3;
    # purchase-after-that: u1,u4 = 2 (u3 fails strict >)
    assert out["n_users"].tolist() == [5, 3, 2]


def test_bucket_invariance_and_validation(ray_session):
    ds = rd.from_pandas(events())
    a = funnel_counts(ds, ["view", "click"], n_buckets=2).to_pandas()
    b = funnel_counts(ds, ["view", "click"], n_buckets=17).to_pandas()
    pd.testing.assert_frame_equal(a, b)
    with pytest.raises(ValueError):
        funnel_counts(ds, [])
    with pytest.raises(ValueError):
        funnel_counts(ds, ["view", "view"])


def test_duckdb_parity_sf0001(ray_session):
    from cerberus_ray.pipelines.training_queries import q_funnel_report

    sf = "/root/testdata/sf0.001"
    mine = q_funnel_report(sf).to_pandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{sf}/events.parquet')")
    orc = con.execute("""
        WITH s0 AS (SELECT user_id, MIN(ts) t FROM events
                    WHERE event_type = 'view' GROUP BY user_id),
        s1 AS (SELECT e.user_id, MIN(e.ts) t FROM events e
               JOIN s0 USING (user_id)
               WHERE e.event_type = 'click' AND e.ts > s0.t
               GROUP BY e.user_id),
        s2 AS (SELECT e.user_id, MIN(e.ts) t FROM events e
               JOIN s1 USING (user_id)
               WHERE e.event_type = 'purchase' AND e.ts > s1.t
               GROUP BY e.user_id)
        SELECT * FROM (
          SELECT 'view' AS stage, CAST(COUNT(*) AS BIGINT) AS n_users FROM s0
          UNION ALL
          SELECT 'click', CAST(COUNT(*) AS BIGINT) FROM s1
          UNION ALL
          SELECT 'purchase', CAST(COUNT(*) AS BIGINT) FROM s2)
    """).fetch_df()
    pd.testing.assert_frame_equal(mine, orc, check_dtype=False)
    # funnel counts are non-increasing
    n = mine["n_users"].tolist()
    assert all(a >= b for a, b in zip(n, n[1:]))
