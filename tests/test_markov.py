"""Markov transition mining: DuckDB LEAD-window parity on events,
multi-block determinism, boundary semantics (no cross-key pairs)."""

import duckdb
import numpy as np
import pandas as pd
import ray.data as rd

from cerberus_ray.sources.io import read_table
from cerberus_ray.stages.markov import transition_matrix

SF = "/root/testdata/sf0.001"


def test_duckdb_parity_on_events(ray_session):
    ev = read_table(f"{SF}/events.parquet",
                    columns=["user_id", "ts", "event_id", "event_type"])
    got = transition_matrix(ev, "user_id", ["ts", "event_id"],
                            "event_type")
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{SF}/events.parquet')")
    want = con.execute(
        "SELECT state, next_state, CAST(COUNT(*) AS BIGINT) AS n FROM ("
        "  SELECT event_type AS state, LEAD(event_type) OVER ("
        "    PARTITION BY user_id ORDER BY ts, event_id) AS next_state"
        "  FROM events) WHERE next_state IS NOT NULL "
        "GROUP BY 1, 2 ORDER BY 1, 2").df()
    tot = want.groupby("state")["n"].transform("sum")
    pd.testing.assert_frame_equal(
        got[["state", "next_state", "n"]], want)
    np.testing.assert_allclose(got["p"], want["n"] / tot, atol=1e-6)
    # row-normalization: outgoing probabilities sum to 1 per state
    np.testing.assert_allclose(got.groupby("state")["p"].sum(), 1.0,
                               atol=1e-4)
    con.close()


def test_no_cross_key_pairs(ray_session):
    # two users, interleaved arrival order; no (a_end -> b_start) pair
    df = pd.DataFrame({
        "k": [1, 2, 1, 2], "t": [1, 1, 2, 2], "i": [0, 1, 2, 3],
        "s": ["a", "x", "b", "y"]})
    got = transition_matrix(rd.from_pandas(df, override_num_blocks=2),
                            "k", ["t", "i"], "s")
    assert set(zip(got["state"], got["next_state"])) == {("a", "b"),
                                                         ("x", "y")}
    assert (got["n"] == 1).all() and (got["p"] == 1.0).all()


def test_multiblock_determinism(ray_session):
    rng = np.random.default_rng(3)
    df = pd.DataFrame({
        "k": rng.integers(0, 50, 2000),
        "t": rng.integers(0, 10_000, 2000),
        "i": np.arange(2000),
        "s": rng.choice(list("abcd"), 2000)})
    a = transition_matrix(rd.from_pandas(df, override_num_blocks=1),
                          "k", ["t", "i"], "s")
    b = transition_matrix(rd.from_pandas(df, override_num_blocks=7),
                          "k", ["t", "i"], "s", n_buckets=5)
    pd.testing.assert_frame_equal(a, b)
