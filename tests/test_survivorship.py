"""Golden-record survivorship: DuckDB LAST_VALUE IGNORE NULLS parity,
null-never-overwrites semantics, entity-resolution composition,
multi-block invariance."""

import duckdb
import numpy as np
import pandas as pd
import ray.data as rd

from cerberus_ray.sources.io import read_table
from cerberus_ray.stages.survivorship import golden_records

SF = "/root/testdata/sf0.001"


def test_duckdb_parity_on_orders(ray_session):
    orders = read_table(f"{SF}/orders.parquet",
                        columns=["o_custkey", "o_orderdate",
                                 "o_orderkey", "o_orderstatus",
                                 "o_totalprice"])
    got = golden_records(orders, "o_custkey",
                         ["o_orderdate", "o_orderkey"],
                         ["o_orderstatus", "o_totalprice"])
    con = duckdb.connect()
    con.execute(f"CREATE VIEW orders AS SELECT * FROM "
                f"read_parquet('{SF}/orders.parquet')")
    want = con.execute("""
        SELECT o_custkey,
               CAST(ANY_VALUE(n) AS BIGINT) AS n_members,
               ANY_VALUE(ls) AS o_orderstatus,
               ANY_VALUE(lt) AS o_totalprice
        FROM (SELECT o_custkey,
                     COUNT(*) OVER w AS n,
                     LAST_VALUE(o_orderstatus IGNORE NULLS) OVER
                       (w ORDER BY o_orderdate, o_orderkey ROWS BETWEEN
                        UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
                       AS ls,
                     LAST_VALUE(o_totalprice IGNORE NULLS) OVER
                       (w ORDER BY o_orderdate, o_orderkey ROWS BETWEEN
                        UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
                       AS lt
              FROM orders WINDOW w AS (PARTITION BY o_custkey))
        GROUP BY o_custkey ORDER BY o_custkey""").df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    con.close()


def test_null_never_overwrites(ray_session):
    df = pd.DataFrame({
        "c": [1, 1, 1, 2, 2],
        "t": [1, 2, 3, 1, 2],
        "i": [0, 1, 2, 3, 4],
        "email": ["a@x", None, None, None, "b@y"],
        "phone": [None, "111", None, "222", None]})
    got = golden_records(rd.from_pandas(df, override_num_blocks=2),
                         "c", ["t", "i"], ["email", "phone"]
                         ).set_index("c")
    # cluster 1: email stays a@x (later rows are null), phone = 111
    assert got.loc[1, "email"] == "a@x"
    assert got.loc[1, "phone"] == "111"
    assert got.loc[1, "n_members"] == 3
    # cluster 2: latest email wins, phone survives from the older row
    assert got.loc[2, "email"] == "b@y"
    assert got.loc[2, "phone"] == "222"


def test_composes_with_entity_resolution(ray_session):
    from cerberus_ray.pipelines.entity_resolution import resolve_entities

    df = pd.DataFrame({
        "id": [1, 2, 3],
        "name": ["ACME Corp", "acme corp", "Zeta LLC"],
        "t": [1, 2, 1],
        "city": ["NYC", None, "LA"]})
    tagged, _ = resolve_entities(rd.from_pandas(df), "id", "name", k=1)
    got = golden_records(tagged, "canonical", ["t", "id"], ["city"])
    g = got.set_index("canonical")
    # the two ACME spellings resolve to one cluster; the later row has
    # a null city, so NYC survives
    assert len(got) == 2
    assert (g["n_members"] == [2, 1]).all() or \
        set(g["n_members"]) == {1, 2}
    acme = g[g["n_members"] == 2].iloc[0]
    assert acme["city"] == "NYC"


def test_multiblock_invariance(ray_session):
    rng = np.random.default_rng(21)
    n = 4000
    df = pd.DataFrame({
        "c": rng.integers(0, 300, n),
        "t": rng.integers(0, 10_000, n),
        "i": np.arange(n),
        "v": np.where(rng.random(n) < 0.3, np.nan, rng.normal(size=n))})
    a = golden_records(rd.from_pandas(df, override_num_blocks=1),
                       "c", ["t", "i"], ["v"])
    b = golden_records(rd.from_pandas(df, override_num_blocks=8),
                       "c", ["t", "i"], ["v"], n_buckets=8)
    pd.testing.assert_frame_equal(a, b)
