"""Markov transition mining: DuckDB LEAD-window parity on events,
multi-block determinism, boundary semantics (no cross-key pairs)."""

import duckdb
import numpy as np
import pandas as pd
import ray.data as rd

from cerberus_ray.sources.io import read_table
from cerberus_ray.stages.markov import (entropy_rate,
                                        stationary_distribution,
                                        transition_matrix)

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


def test_order2_duckdb_parity(ray_session):
    ev = read_table(f"{SF}/events.parquet",
                    columns=["user_id", "ts", "event_id", "event_type"])
    got = transition_matrix(ev, "user_id", ["ts", "event_id"],
                            "event_type", order=2)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{SF}/events.parquet')")
    want = con.execute(
        "SELECT s1 || '>' || s2 AS state, s3 AS next_state, "
        "CAST(COUNT(*) AS BIGINT) AS n FROM ("
        "  SELECT event_type AS s1,"
        "    LEAD(event_type, 1) OVER w AS s2,"
        "    LEAD(event_type, 2) OVER w AS s3"
        "  FROM events WINDOW w AS ("
        "    PARTITION BY user_id ORDER BY ts, event_id)) "
        "WHERE s3 IS NOT NULL GROUP BY 1, 2 ORDER BY 1, 2").df()
    pd.testing.assert_frame_equal(got[["state", "next_state", "n"]],
                                  want)
    con.close()


def test_stationary_distribution(ray_session):
    # two-state chain with known closed form: pi = (b, a)/(a+b) for
    # P = [[1-a, a], [b, 1-b]]
    tm = pd.DataFrame({
        "state": ["x", "x", "y", "y"],
        "next_state": ["x", "y", "x", "y"],
        "n": [70, 30, 60, 40],
        "p": [0.7, 0.3, 0.6, 0.4]})
    got = stationary_distribution(tm).set_index("state")["pi"]
    a, b = 0.3, 0.6
    np.testing.assert_allclose(got["x"], b / (a + b), atol=1e-6)
    np.testing.assert_allclose(got["y"], a / (a + b), atol=1e-6)
    # eigenvector cross-check on the real events chain
    ev = read_table(f"{SF}/events.parquet",
                    columns=["user_id", "ts", "event_id", "event_type"])
    tm2 = transition_matrix(ev, "user_id", ["ts", "event_id"],
                            "event_type")
    got2 = stationary_distribution(tm2)
    states = list(got2["state"])
    P = np.zeros((len(states), len(states)))
    idx = {s: i for i, s in enumerate(states)}
    for s, ns, p in zip(tm2["state"], tm2["next_state"], tm2["p"]):
        P[idx[s], idx[ns]] = p
    P /= P.sum(axis=1, keepdims=True)
    w, v = np.linalg.eig(P.T)
    vec = np.real(v[:, np.argmin(np.abs(w - 1))])
    vec = vec / vec.sum()
    np.testing.assert_allclose(got2["pi"], vec, atol=1e-5)


def test_stationary_absorbing_state(ray_session):
    # 'end' never transitions out → treated as absorbing; all mass
    # drains into it
    tm = pd.DataFrame({
        "state": ["a", "a"], "next_state": ["a", "end"],
        "n": [50, 50], "p": [0.5, 0.5]})
    got = stationary_distribution(tm).set_index("state")["pi"]
    np.testing.assert_allclose(got["end"], 1.0, atol=1e-6)


def test_entropy_rate_closed_form(ray_session):
    # two-state chain: H = pi_x*H(row_x) + pi_y*H(row_y) in closed form
    tm = pd.DataFrame({
        "state": ["x", "x", "y", "y"],
        "next_state": ["x", "y", "x", "y"],
        "n": [70, 30, 60, 40],
        "p": [0.7, 0.3, 0.6, 0.4]})
    got = entropy_rate(tm)
    a, b = 0.3, 0.6
    pi = np.array([b, a]) / (a + b)

    def hrow(ps):
        ps = np.asarray(ps)
        return float(-(ps * np.log(ps)).sum())

    want = pi[0] * hrow([0.7, 0.3]) + pi[1] * hrow([0.6, 0.4])
    np.testing.assert_allclose(got["entropy_rate"], want, atol=1e-7)
    np.testing.assert_allclose(got["max_entropy"], np.log(2), atol=1e-9)
    np.testing.assert_allclose(
        got["predictability"], 1 - want / np.log(2), atol=1e-7)


def test_entropy_rate_deterministic_chain(ray_session):
    # a->b->a cycle: every next-state is certain => H=0, pred=1
    tm = pd.DataFrame({
        "state": ["a", "b"], "next_state": ["b", "a"],
        "n": [10, 10], "p": [1.0, 1.0]})
    got = entropy_rate(tm)
    assert got["entropy_rate"] == 0.0
    assert got["predictability"] == 1.0
    # empty matrix -> NaNs, not a crash
    empty = entropy_rate(tm.iloc[0:0])
    assert np.isnan(empty["entropy_rate"])


def test_entropy_rate_events_reference(ray_session):
    # independent reference on the real chain: build P and pi with
    # numpy directly from the DuckDB-verified transition counts
    ev = read_table(f"{SF}/events.parquet",
                    columns=["user_id", "ts", "event_id", "event_type"])
    tm = transition_matrix(ev, "user_id", ["ts", "event_id"],
                           "event_type")
    got = entropy_rate(tm)
    pi = stationary_distribution(tm).set_index("state")["pi"]
    want = 0.0
    for s, sub in tm.groupby("state"):
        p = sub["n"].to_numpy(float)
        p = p / p.sum()
        want += pi[s] * float(-(p * np.log(p)).sum())
    np.testing.assert_allclose(got["entropy_rate"], want, atol=1e-6)
    m = len(set(tm["state"]) | set(tm["next_state"]))
    np.testing.assert_allclose(got["max_entropy"], np.log(m), atol=1e-9)
    assert 0.0 <= got["predictability"] <= 1.0


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
