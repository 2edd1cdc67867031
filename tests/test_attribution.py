"""First/last-touch attribution: DuckDB IGNORE-NULLS window parity,
hand journeys, direct-credit edge, layout invariance."""

import duckdb
import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from cerberus_ray.sources.io import read_table
from cerberus_ray.stages.attribution import touch_attribution

SF = "/root/testdata/sf0.001"


def test_duckdb_window_parity(ray_session):
    ev = read_table(f"{SF}/events.parquet",
                    columns=["user_id", "ts", "event_id",
                             "event_type", "value"])
    got = touch_attribution(ev, "user_id", ["ts", "event_id"],
                            "event_type", "value",
                            conversion="purchase")
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{SF}/events.parquet')")
    want = con.execute("""
        WITH t AS (
          SELECT event_type, value,
                 LAST_VALUE(CASE WHEN event_type != 'purchase'
                            THEN event_type END IGNORE NULLS)
                   OVER w AS lt,
                 FIRST_VALUE(CASE WHEN event_type != 'purchase'
                             THEN event_type END IGNORE NULLS)
                   OVER w AS ft
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING
                       AND CURRENT ROW)),
        conv AS (SELECT COALESCE(ft, 'direct') ft,
                        COALESCE(lt, 'direct') lt,
                        CAST(ROUND(value * 100) AS BIGINT) cents
                 FROM t WHERE event_type = 'purchase')
        SELECT 'first_touch' model, ft channel,
               CAST(COUNT(*) AS BIGINT) n_conversions,
               CAST(SUM(cents) AS BIGINT) / 100.0 revenue
        FROM conv GROUP BY 2
        UNION ALL
        SELECT 'last_touch', lt, CAST(COUNT(*) AS BIGINT),
               CAST(SUM(cents) AS BIGINT) / 100.0
        FROM conv GROUP BY 2
        ORDER BY 1, 2""").df()
    con.close()
    assert got["n_conversions"].sum() > 0
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_hand_journeys(ray_session):
    # u1: view -> click -> BUY(10) -> BUY(5)
    #   first_touch: view gets both; last_touch: click gets both
    # u2: BUY(3) with no touch -> direct under both models
    df = pd.DataFrame({
        "u": ["u1"] * 4 + ["u2"],
        "t": [1, 2, 3, 4, 1],
        "i": [0, 1, 2, 3, 4],
        "ch": ["view", "click", "buy", "buy", "buy"],
        "v": [0.0, 0.0, 10.0, 5.0, 3.0]})
    got = touch_attribution(rd.from_pandas(df, override_num_blocks=3),
                            "u", ["t", "i"], "ch", "v",
                            conversion="buy", n_buckets=2)
    want = pd.DataFrame({
        "model": ["first_touch", "first_touch", "last_touch",
                  "last_touch"],
        "channel": ["direct", "view", "click", "direct"],
        "n_conversions": [1, 2, 2, 1],
        "revenue": [3.0, 15.0, 15.0, 3.0]})
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_layout_invariance_and_empty(ray_session):
    rng = np.random.default_rng(13)
    df = pd.DataFrame({
        "u": rng.integers(0, 40, 1500),
        "t": rng.integers(0, 10_000, 1500),
        "i": np.arange(1500),
        "ch": rng.choice(["a", "b", "c", "conv"], 1500),
        "v": np.round(rng.uniform(0, 50, 1500), 2)})
    a = touch_attribution(rd.from_pandas(df, override_num_blocks=1),
                          "u", ["t", "i"], "ch", "v",
                          conversion="conv")
    b = touch_attribution(rd.from_pandas(df, override_num_blocks=7),
                          "u", ["t", "i"], "ch", "v",
                          conversion="conv", n_buckets=5)
    pd.testing.assert_frame_equal(a, b)
    # conversions total is conserved across models
    f = a[a["model"] == "first_touch"]
    l = a[a["model"] == "last_touch"]
    assert f["n_conversions"].sum() == l["n_conversions"].sum()
    np.testing.assert_allclose(f["revenue"].sum(), l["revenue"].sum())
    # no conversions at all -> empty frame, stable columns
    none = touch_attribution(
        rd.from_pandas(df[df["ch"] != "conv"]), "u", ["t", "i"],
        "ch", "v", conversion="conv")
    assert list(none.columns) == ["model", "channel",
                                  "n_conversions", "revenue"]
    assert len(none) == 0
