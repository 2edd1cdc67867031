"""BFS hop distance (recursive-CTE oracle + mode agreement) and
incremental grouped-aggregate maintenance (full-recompute parity)."""

import duckdb
import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from cerberus_ray.pipelines.bfs import hop_distance
from cerberus_ray.sources.io import read_table
from cerberus_ray.stages.delta_agg import (apply_delta, finalize,
                                           grouped_state)

SF = "/root/testdata/sf0.001"


def _orders_graph():
    """The deterministic orders-derived graph shared with
    triangle/kcore reports: custkey ↔ 1500 + (orderkey mod 50)
    (the dst shift keeps the two id spaces disjoint; mod 50 makes
    shared hubs so the graph has real multi-hop structure)."""
    import pyarrow as pa

    ds = read_table(f"{SF}/orders.parquet",
                    columns=["o_orderkey", "o_custkey"])

    def derive(b: pa.Table) -> pa.Table:
        ok = b["o_orderkey"].to_numpy(zero_copy_only=False)
        return pa.Table.from_pydict({
            "src": b["o_custkey"],
            "dst": pa.array(1500 + (ok % 50), pa.int64())})

    return ds.map_batches(derive, batch_format="pyarrow",
                          zero_copy_batch=True)


def test_bfs_recursive_cte_parity(ray_session):
    g = _orders_graph()
    got = hop_distance(g, source=1, mode="driver")
    edges = g.to_pandas().drop_duplicates()
    con = duckdb.connect()
    con.register("edges_raw", edges)
    want = con.execute("""
        WITH RECURSIVE und AS (
          SELECT src s, dst d FROM edges_raw WHERE src != dst
          UNION
          SELECT dst s, src d FROM edges_raw WHERE src != dst),
        walk(node, dist) AS (
          SELECT CAST(1 AS BIGINT), CAST(0 AS BIGINT)
          UNION
          SELECT d, dist + 1 FROM walk JOIN und ON s = node
          WHERE dist < 12)
        SELECT node, CAST(MIN(dist) AS BIGINT) dist FROM walk
        GROUP BY 1 ORDER BY 2, 1""").df()
    con.close()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert got["dist"].max() >= 2  # the graph is not a star


def test_bfs_modes_agree_and_guards(ray_session):
    g = _orders_graph()
    d = hop_distance(g, source=1, mode="driver")
    s = hop_distance(g, source=1, mode="shuffle")
    pd.testing.assert_frame_equal(d, s)
    with pytest.raises(ValueError):
        hop_distance(g, source=1, mode="nope")
    # unreachable nodes are absent; isolated source returns itself
    tiny = rd.from_pandas(pd.DataFrame(
        {"src": [10, 11], "dst": [11, 12]}))
    out = hop_distance(tiny, source=99, mode="driver")
    assert out.to_dict("list") == {"node": [99], "dist": [0]}


def test_bfs_hand_chain_and_directed(ray_session):
    # chain 1-2-3-4 plus a shortcut 1-3: dist(4) == 2 via shortcut
    df = pd.DataFrame({"src": [1, 2, 3, 1], "dst": [2, 3, 4, 3]})
    got = hop_distance(rd.from_pandas(df, override_num_blocks=2),
                       source=1, mode="driver")
    assert dict(zip(got["node"], got["dist"])) == {1: 0, 2: 1, 3: 1,
                                                   4: 2}
    sh = hop_distance(rd.from_pandas(df), source=1, mode="shuffle")
    pd.testing.assert_frame_equal(got, sh)
    # directed: edges only flow src->dst
    dg = hop_distance(rd.from_pandas(pd.DataFrame(
        {"src": [1, 2], "dst": [2, 1]})), source=1, mode="driver",
        directed=True)
    assert dict(zip(dg["node"], dg["dist"])) == {1: 0, 2: 1}
    back = hop_distance(rd.from_pandas(pd.DataFrame(
        {"src": [2, 3], "dst": [1, 2]})), source=1, mode="driver",
        directed=True)
    assert dict(zip(back["node"], back["dist"])) == {1: 0}


def test_delta_agg_insert_parity(ray_session):
    orders = read_table(f"{SF}/orders.parquet",
                        columns=["o_orderpriority", "o_orderdate",
                                 "o_totalprice"])
    import pyarrow as pa
    import pyarrow.compute as pc

    cut = pa.scalar(pd.Timestamp("1998-01-01"))

    def before(b):
        return b.filter(pc.less(b["o_orderdate"], cut))

    def after(b):
        return b.filter(pc.greater_equal(b["o_orderdate"], cut))

    base = orders.map_batches(before, batch_format="pyarrow")
    delta = orders.map_batches(after, batch_format="pyarrow")
    st = grouped_state(base, ["o_orderpriority"], "o_totalprice")
    st2 = apply_delta(st, delta, ["o_orderpriority"], "o_totalprice")
    full = grouped_state(orders, ["o_orderpriority"], "o_totalprice")
    pd.testing.assert_frame_equal(st2, full)  # bitwise: exact ints
    aggs = {"n_orders": "count", "total": "sum", "avg_price": "mean",
            "lo": "min", "hi": "max"}
    pd.testing.assert_frame_equal(
        finalize(st2, ["o_orderpriority"], aggs),
        finalize(full, ["o_orderpriority"], aggs))


def test_delta_agg_duckdb_parity(ray_session):
    orders = read_table(f"{SF}/orders.parquet",
                        columns=["o_orderpriority", "o_totalprice"])
    st = grouped_state(orders, ["o_orderpriority"], "o_totalprice")
    got = finalize(st, ["o_orderpriority"],
                   {"n_orders": "count", "total": "sum",
                    "avg_price": "mean", "lo": "min", "hi": "max"})
    con = duckdb.connect()
    want = con.execute(f"""
        WITH c AS (SELECT o_orderpriority,
                          CAST(ROUND(o_totalprice * 100) AS BIGINT) v
                   FROM read_parquet('{SF}/orders.parquet'))
        SELECT o_orderpriority,
               CAST(COUNT(*) AS BIGINT) n_orders,
               CAST(SUM(v) AS BIGINT) / 100.0 total,
               (CAST(SUM(v) AS DOUBLE) / COUNT(*)) / 100.0 avg_price,
               MIN(v) / 100.0 lo, MAX(v) / 100.0 hi
        FROM c GROUP BY 1 ORDER BY 1""").df()
    con.close()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_delta_agg_deletes_and_guards(ray_session):
    df = pd.DataFrame({"g": list("aabbb"),
                       "v": [1.0, 2.0, 3.0, 4.0, 5.0]})
    st = grouped_state(rd.from_pandas(df), ["g"], "v",
                       track_minmax=False)
    # retract one 'a' row and ALL 'b' rows -> b drops out of the view
    dl = pd.DataFrame({"g": list("abbb"), "v": [1.0, 3.0, 4.0, 5.0]})
    st2 = apply_delta(st, rd.from_pandas(dl), ["g"], "v",
                      deletes=True)
    fin = finalize(st2, ["g"], {"n": "count", "s": "sum"})
    assert fin.to_dict("list") == {"g": ["a"], "n": [1], "s": [2.0]}
    # min/max state refuses deletes
    st_mm = grouped_state(rd.from_pandas(df), ["g"], "v")
    with pytest.raises(ValueError, match="not retractable"):
        apply_delta(st_mm, rd.from_pandas(dl), ["g"], "v",
                    deletes=True)
    # over-retraction raises
    with pytest.raises(ValueError, match="over-retraction"):
        apply_delta(st2, rd.from_pandas(dl), ["g"], "v", deletes=True)
    # min/max finalize on a minmax-free state raises
    with pytest.raises(ValueError, match="does not track"):
        finalize(st2, ["g"], {"lo": "min"})
