"""Triangle counting: DuckDB three-way-join parity, driver/shuffle
mode agreement, known graphs, self-loop/parallel-edge collapse."""

import duckdb
import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from cerberus_ray.pipelines.triangles import triangle_count

SQL = """
WITH e AS (SELECT DISTINCT least({a}, {b}) AS u, greatest({a}, {b}) AS v
           FROM {src} WHERE {a} <> {b})
SELECT COUNT(*) FROM e e1
JOIN e e2 ON e2.u = e1.u AND e2.v > e1.v
JOIN e e3 ON e3.u = e1.v AND e3.v = e2.v
"""


def _random_graph(n_nodes=60, n_edges=400, seed=13):
    rng = np.random.default_rng(seed)
    return pd.DataFrame({
        "src": rng.integers(0, n_nodes, n_edges),
        "dst": rng.integers(0, n_nodes, n_edges)})


def test_k4_has_four_triangles(ray_session):
    edges = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    df = pd.DataFrame(edges, columns=["src", "dst"])
    r = triangle_count(rd.from_pandas(df), mode="driver")
    assert r == {"n_nodes": 4, "n_edges": 6, "n_triangles": 4}


def test_duckdb_parity_random(ray_session):
    df = _random_graph()
    want = duckdb.sql(SQL.format(a="src", b="dst", src="df")).fetchone()[0]
    r = triangle_count(rd.from_pandas(df, override_num_blocks=5),
                       mode="driver")
    assert r["n_triangles"] == want
    n_nodes = duckdb.sql(
        "SELECT COUNT(DISTINCT x) FROM (SELECT src AS x FROM df "
        "WHERE src <> dst UNION ALL SELECT dst FROM df "
        "WHERE src <> dst)").fetchone()[0]
    assert r["n_nodes"] == n_nodes


def test_mode_agreement(ray_session):
    df = _random_graph(n_nodes=40, n_edges=300, seed=7)
    ds = rd.from_pandas(df, override_num_blocks=4)
    a = triangle_count(ds, mode="driver")
    b = triangle_count(ds, mode="shuffle", n_buckets=8, num_partitions=4)
    assert a == b and a["n_triangles"] > 0


def test_self_loops_and_parallel_edges_collapse(ray_session):
    df = pd.DataFrame({"src": [1, 1, 2, 2, 3, 1, 5],
                       "dst": [2, 2, 3, 1, 1, 1, 5]})
    r = triangle_count(rd.from_pandas(df, override_num_blocks=3),
                       mode="driver")
    # distinct simple edges: (1,2), (2,3), (1,3) → one triangle
    assert r == {"n_nodes": 3, "n_edges": 3, "n_triangles": 1}


def test_empty_and_unknown_mode(ray_session):
    df = pd.DataFrame({"src": [7], "dst": [7]})  # only a self-loop
    r = triangle_count(rd.from_pandas(df), mode="driver")
    assert r == {"n_nodes": 0, "n_edges": 0, "n_triangles": 0}
    with pytest.raises(ValueError):
        triangle_count(rd.from_pandas(df), mode="nope")


def test_orders_derived_graph_parity(ray_session):
    sf = "/root/testdata/sf0.01"   # sf0.001's derived graph is
    # triangle-free (1500 nodes, ~1500 edges) — sf0.01 gives a real count
    con = duckdb.connect()
    con.execute(f"CREATE VIEW orders AS SELECT * FROM "
                f"read_parquet('{sf}/orders.parquet')")
    want = con.execute(SQL.format(
        a="o_custkey", b="1 + (o_orderkey % 1500)",
        src="orders")).fetchone()[0]
    ds = rd.read_parquet(f"{sf}/orders.parquet",
                         columns=["o_orderkey", "o_custkey"])

    import pyarrow as pa

    def derive(b: pa.Table) -> pa.Table:
        ok = b["o_orderkey"].to_numpy(zero_copy_only=False)
        return pa.Table.from_pydict({
            "src": b["o_custkey"],
            "dst": pa.array(1 + (ok % 1500), pa.int64())})

    edges = ds.map_batches(derive, batch_format="pyarrow",
                           zero_copy_batch=True)
    assert want > 0
    assert triangle_count(edges, mode="driver")["n_triangles"] == want
