"""Sequential patterns: DuckDB EXISTS-self-join parity, hand-built
semantics (strict order, a→a repeats), layout invariance, guards."""

import duckdb
import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from cerberus_ray.pipelines.seqpat import frequent_sequences


def _log(n_users=80, seed=6):
    rng = np.random.default_rng(seed)
    rows = []
    for u in range(n_users):
        n = rng.integers(2, 10)
        ts = np.sort(rng.choice(100_000, n, replace=False))
        evs = rng.choice(["view", "click", "cart", "buy"], n)
        for t, e in zip(ts, evs):
            rows.append((u, int(t), e))
    return pd.DataFrame(rows, columns=["user_id", "ts", "ev"])


def _oracle(df):
    con = duckdb.connect()
    con.register("ev", df)
    return con.execute("""
        with pairs as (
          select distinct e1.user_id, e1.ev a, e2.ev b
          from ev e1 join ev e2 using (user_id)
          where e1.ts < e2.ts)
        select a antecedent, b consequent, count(*) n_keys
        from pairs group by a, b
        order by n_keys desc, antecedent, consequent""").df()


def test_matches_duckdb_exists_join(ray_session):
    df = _log()
    got = frequent_sequences(rd.from_pandas(df, override_num_blocks=5),
                             "user_id", "ts", "ev", n_buckets=8)
    want = _oracle(df)
    pd.testing.assert_frame_equal(
        got[["antecedent", "consequent", "n_keys"]], want,
        check_dtype=False)
    n_users = df["user_id"].nunique()
    np.testing.assert_allclose(got["support"],
                               (want["n_keys"] / n_users).round(6))


def test_hand_built_semantics(ray_session):
    # u1: a@1 b@2 a@3  → a→b (1<2), b→a (2<3), a→a (1<3)
    # u2: b@1 a@2      → b→a only
    df = pd.DataFrame({"user_id": [1, 1, 1, 2, 2],
                       "ts": [1, 2, 3, 1, 2],
                       "ev": ["a", "b", "a", "b", "a"]})
    got = frequent_sequences(rd.from_pandas(df), "user_id", "ts", "ev",
                             n_buckets=2)
    d = {(r.antecedent, r.consequent): r.n_keys
         for r in got.itertuples()}
    assert d == {("b", "a"): 2, ("a", "b"): 1, ("a", "a"): 1}
    # min_support filter
    flt = frequent_sequences(rd.from_pandas(df), "user_id", "ts", "ev",
                             min_support=0.75, n_buckets=2)
    assert list(flt["antecedent"]) == ["b"]


def test_layout_invariance(ray_session):
    df = _log(n_users=40, seed=2)
    a = frequent_sequences(rd.from_pandas(df, override_num_blocks=2),
                           "user_id", "ts", "ev", n_buckets=4)
    b = frequent_sequences(rd.from_pandas(df, override_num_blocks=9),
                           "user_id", "ts", "ev", n_buckets=16)
    pd.testing.assert_frame_equal(a, b)


def test_guards(ray_session):
    df = _log(n_users=5)
    with pytest.raises(ValueError):
        frequent_sequences(rd.from_pandas(df), "user_id", "ts", "ev",
                           min_support=1.5)
    with pytest.raises(Exception, match="max_items_per_key"):
        frequent_sequences(rd.from_pandas(df), "user_id", "ts", "ev",
                           max_items_per_key=1)
