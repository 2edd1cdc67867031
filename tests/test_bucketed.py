"""Bucketed layout + co-located joins: DuckDB join parity (inner +
left), layout-mismatch guard, missing-bucket handling, row preservation
vs the native shuffle join."""

import duckdb
import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from cerberus_ray.stages.bucketed import (BucketLayoutMismatch,
                                          bucketed_join, write_bucketed)

SF = "/root/testdata/sf0.001"


@pytest.fixture
def lake(tmp_path, ray_session):
    orders = rd.read_parquet(f"{SF}/orders.parquet",
                             columns=["o_orderkey", "o_custkey",
                                      "o_totalprice"])
    cust = rd.read_parquet(f"{SF}/customer.parquet",
                           columns=["c_custkey", "c_nationkey"])
    a = write_bucketed(orders, str(tmp_path / "orders"), "o_custkey",
                       n_buckets=8)
    b = write_bucketed(cust, str(tmp_path / "cust"), "c_custkey",
                       n_buckets=8)
    return a, b


def test_inner_join_duckdb_parity(lake, ray_session):
    a, b = lake
    got = (bucketed_join(a, b).to_pandas()
           .sort_values("o_orderkey").reset_index(drop=True))
    want = duckdb.sql(
        f"SELECT o.o_orderkey, c.c_nationkey "
        f"FROM read_parquet('{SF}/orders.parquet') o "
        f"JOIN read_parquet('{SF}/customer.parquet') c "
        f"ON o.o_custkey = c.c_custkey ORDER BY o.o_orderkey").fetchdf()
    assert got["o_orderkey"].tolist() == want["o_orderkey"].tolist()
    assert got["c_nationkey"].tolist() == want["c_nationkey"].tolist()


def test_left_join_preserves_unmatched(tmp_path, ray_session):
    left = pd.DataFrame({"k": [1, 2, 3, 4], "v": [10, 20, 30, 40]})
    right = pd.DataFrame({"k": [2, 4], "w": ["x", "y"]})
    a = write_bucketed(rd.from_pandas(left), str(tmp_path / "l"), "k",
                       n_buckets=4)
    b = write_bucketed(rd.from_pandas(right), str(tmp_path / "r"), "k",
                       n_buckets=4)
    got = (bucketed_join(a, b, how="left").to_pandas()
           .sort_values("k").reset_index(drop=True))
    assert got["k"].tolist() == [1, 2, 3, 4]
    assert got["w"].fillna("∅").tolist() == ["∅", "x", "∅", "y"]


def test_layout_mismatch_raises(tmp_path, ray_session):
    df = pd.DataFrame({"k": [1, 2], "v": [1.0, 2.0]})
    a = write_bucketed(rd.from_pandas(df), str(tmp_path / "a"), "k",
                       n_buckets=4)
    b = write_bucketed(rd.from_pandas(df), str(tmp_path / "b"), "k",
                       n_buckets=8)
    with pytest.raises(BucketLayoutMismatch):
        bucketed_join(a, b)
    with pytest.raises(ValueError):
        bucketed_join(a, a, how="full")


def test_empty_sides(tmp_path, ray_session):
    df = pd.DataFrame({"k": pd.array([], dtype="int64"),
                       "v": pd.array([], dtype="float64")})
    full = pd.DataFrame({"k": [1], "v": [1.0]})
    e = write_bucketed(rd.from_pandas(df), str(tmp_path / "e"), "k",
                       n_buckets=4)
    f = write_bucketed(rd.from_pandas(full), str(tmp_path / "f"), "k",
                       n_buckets=4)
    assert bucketed_join(f, e).count() == 0      # empty right, inner
    assert bucketed_join(e, f).count() == 0      # empty left


def test_bucketed_groupby_duckdb_parity(lake, ray_session):
    from cerberus_ray.stages.bucketed import bucketed_groupby

    a, _ = lake
    got = (bucketed_groupby(a, {"n": ("", "count"),
                                "total": ("o_totalprice", "sum"),
                                "avg_price": ("o_totalprice", "mean")})
           .to_pandas().sort_values("o_custkey").reset_index(drop=True))
    want = duckdb.sql(
        f"SELECT o_custkey, CAST(COUNT(*) AS BIGINT) n, "
        f"SUM(o_totalprice) total, AVG(o_totalprice) avg_price "
        f"FROM read_parquet('{SF}/orders.parquet') "
        f"GROUP BY o_custkey ORDER BY o_custkey").fetchdf()
    assert got["o_custkey"].tolist() == want["o_custkey"].tolist()
    assert got["n"].tolist() == want["n"].tolist()
    np.testing.assert_allclose(got["total"].to_numpy(),
                               want["total"].to_numpy(), rtol=1e-12)
    np.testing.assert_allclose(got["avg_price"].to_numpy(),
                               want["avg_price"].to_numpy(), rtol=1e-12)
    # keys never straddle buckets: the per-bucket aggregate is final —
    # no key appears twice in the union
    assert got["o_custkey"].is_unique
    with pytest.raises(ValueError):
        bucketed_groupby(a, {"m": ("o_totalprice", "median")})


def test_matches_native_shuffle_join(lake, ray_session):
    a, b = lake
    got = bucketed_join(a, b)
    orders = rd.read_parquet(f"{SF}/orders.parquet",
                             columns=["o_orderkey", "o_custkey"])
    cust = rd.read_parquet(f"{SF}/customer.parquet",
                           columns=["c_custkey", "c_nationkey"])
    native = orders.join(cust, join_type="inner", num_partitions=4,
                         on=("o_custkey",), right_on=("c_custkey",))
    assert got.count() == native.count()