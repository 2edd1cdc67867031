"""Clamped running balance: sequential-loop reference, DuckDB
reflection-identity window parity, hand vectors, layout invariance."""

import duckdb
import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from cerberus_ray.sources.io import read_table
from cerberus_ray.stages.balance import clamped_running_balance

SF = "/root/testdata/sf0.001"


def _wallet_events():
    """Wallet semantics on events: purchases spend, everything else
    accrues — mixed-sign deltas with a floor at 0."""
    ev = read_table(f"{SF}/events.parquet",
                    columns=["user_id", "ts", "event_id",
                             "event_type", "value"]).to_pandas()
    ev["delta"] = np.where(ev["event_type"] == "purchase",
                           -ev["value"], ev["value"])
    return ev[["user_id", "ts", "event_id", "delta"]]


def test_sequential_reference(ray_session):
    ev = _wallet_events()
    got = clamped_running_balance(
        rd.from_pandas(ev, override_num_blocks=4), "user_id",
        ["ts", "event_id"], "delta").to_pandas() \
        .sort_values(["user_id", "ts", "event_id"]) \
        .reset_index(drop=True)
    # plain sequential loop per user — the semantics definition
    for uid, sub in ev.groupby("user_id"):
        sub = sub.sort_values(["ts", "event_id"])
        b, want, clamps = 0, [], []
        for x in np.rint(sub["delta"].to_numpy() * 100).astype(int):
            nb = b + int(x)
            clamps.append(nb < 0)
            b = max(0, nb)
            want.append(b / 100.0)
        g = got[got["user_id"] == uid]
        np.testing.assert_allclose(g["balance"].to_numpy(), want)
        assert g["clamped"].tolist() == clamps


def test_duckdb_reflection_parity(ray_session):
    ev = _wallet_events()
    got = clamped_running_balance(
        rd.from_pandas(ev, override_num_blocks=3), "user_id",
        ["ts", "event_id"], "delta").to_pandas() \
        .sort_values(["user_id", "ts", "event_id"]) \
        .reset_index(drop=True)[["user_id", "ts", "event_id",
                                 "balance"]]
    con = duckdb.connect()
    con.register("ev", ev)
    want = con.execute("""
        WITH c AS (SELECT user_id, ts, event_id,
                          CAST(ROUND(delta * 100) AS BIGINT) x
                   FROM ev),
        s AS (SELECT user_id, ts, event_id,
                     SUM(x) OVER w AS run
              FROM c WINDOW w AS (PARTITION BY user_id
                                  ORDER BY ts, event_id
                                  ROWS UNBOUNDED PRECEDING))
        SELECT user_id, ts, event_id,
               (run - LEAST(0, MIN(run) OVER w)) / 100.0 AS balance
        FROM s WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS UNBOUNDED PRECEDING)
        ORDER BY user_id, ts, event_id""").df()
    con.close()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_hand_vector_and_guards(ray_session):
    df = pd.DataFrame({"k": ["a"] * 4, "t": [1, 2, 3, 4],
                       "d": [-5.0, 3.0, -4.0, 2.0]})
    got = clamped_running_balance(rd.from_pandas(df), "k", ["t"],
                                  "d").to_pandas() \
        .sort_values("t").reset_index(drop=True)
    assert got["balance"].tolist() == [0.0, 3.0, 0.0, 2.0]
    assert got["clamped"].tolist() == [True, False, True, False]
    with pytest.raises(ValueError):
        clamped_running_balance(rd.from_pandas(df), "k", ["t"], "d",
                                floor=1.0)


def test_layout_invariance(ray_session):
    ev = _wallet_events()
    a = clamped_running_balance(
        rd.from_pandas(ev, override_num_blocks=1), "user_id",
        ["ts", "event_id"], "delta").to_pandas() \
        .sort_values(["user_id", "ts", "event_id"]) \
        .reset_index(drop=True)
    b = clamped_running_balance(
        rd.from_pandas(ev, override_num_blocks=7), "user_id",
        ["ts", "event_id"], "delta", n_buckets=5).to_pandas() \
        .sort_values(["user_id", "ts", "event_id"]) \
        .reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
