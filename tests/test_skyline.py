"""2-D skyline / Pareto frontier: DuckDB NOT EXISTS dominance parity,
duplicate-point multiplicity, maximize flip, partition invariance."""

import duckdb
import numpy as np
import pandas as pd
import ray.data as rd

from cerberus_ray.pipelines.skyline import skyline2d

SF = "/root/testdata/sf0.001"

SQL = """
WITH d AS (SELECT {x} AS x, {y} AS y, CAST(COUNT(*) AS BIGINT) AS n
           FROM {src} WHERE {x} IS NOT NULL AND {y} IS NOT NULL
           GROUP BY 1, 2)
SELECT x, y, n FROM d r
WHERE NOT EXISTS (
  SELECT 1 FROM d s
  WHERE s.x <= r.x AND s.y <= r.y AND (s.x < r.x OR s.y < r.y))
ORDER BY x, y
"""


def _frame(n=800, seed=3):
    rng = np.random.default_rng(seed)
    return pd.DataFrame({"x": rng.integers(0, 60, n),
                         "y": rng.integers(0, 60, n)})


def test_duckdb_parity_synthetic(ray_session):
    df = _frame()
    got = skyline2d(rd.from_pandas(df, override_num_blocks=6), "x", "y")
    want = duckdb.sql(SQL.format(x="x", y="y", src="df")).fetchdf()
    pd.testing.assert_frame_equal(
        got.astype({"x": "int64", "y": "int64", "n": "int64"}),
        want.astype({"x": "int64", "y": "int64", "n": "int64"}))


def test_duckdb_parity_part_table(ray_session):
    con = duckdb.connect()
    con.execute(f"CREATE VIEW part AS SELECT * FROM "
                f"read_parquet('{SF}/part.parquet')")
    want = con.execute(SQL.format(x="p_retailprice", y="p_size",
                                  src="part")).fetchdf()
    pt = rd.read_parquet(f"{SF}/part.parquet",
                         columns=["p_retailprice", "p_size"])
    got = skyline2d(pt, "p_retailprice", "p_size")
    assert got["p_retailprice"].tolist() == want["x"].tolist()
    assert got["p_size"].astype("int64").tolist() == want["y"].tolist()
    assert got["n"].tolist() == want["n"].tolist()


def test_duplicates_survive_together(ray_session):
    # two identical frontier points: neither dominates the other
    df = pd.DataFrame({"x": [1, 1, 5, 9], "y": [9, 9, 5, 1]})
    got = skyline2d(rd.from_pandas(df, override_num_blocks=2), "x", "y")
    assert got.values.tolist() == [[1, 9, 2], [5, 5, 1], [9, 1, 1]]


def test_dominated_points_drop(ray_session):
    df = pd.DataFrame({"x": [1, 2, 2, 3], "y": [1, 1, 5, 3]})
    got = skyline2d(rd.from_pandas(df), "x", "y")
    # (1,1) dominates everything else (including the equal-y (2,1))
    assert got.values.tolist() == [[1, 1, 1]]


def test_maximize_flip(ray_session):
    df = _frame(seed=7)
    got = skyline2d(rd.from_pandas(df), "x", "y", maximize=("x", "y"))
    neg = df.copy()
    neg["x"], neg["y"] = -neg["x"], -neg["y"]
    want = duckdb.sql(SQL.format(x="x", y="y", src="neg")).fetchdf()
    want["x"], want["y"] = -want["x"], -want["y"]
    assert (set(map(tuple, got.values.tolist()))
            == set(map(tuple, want.values.tolist())))


def test_partition_invariance(ray_session):
    df = _frame(seed=9)
    outs = [skyline2d(rd.from_pandas(df, override_num_blocks=b), "x", "y")
            for b in (1, 11)]
    pd.testing.assert_frame_equal(outs[0], outs[1])
