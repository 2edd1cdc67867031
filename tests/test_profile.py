"""Profiling discovery: DuckDB parity for inclusion dependencies (FK
discovery) on real testdata relationships and for candidate-key mining,
NULL semantics, shuffle-mode agreement."""

import duckdb
import numpy as np
import pandas as pd
import ray.data as rd

from cerberus_ray.sources.io import read_table
from cerberus_ray.stages.profile import (candidate_key_profile,
                                         inclusion_profile)

SF = "/root/testdata/sf0.001"


def test_fk_discovery_on_testdata(ray_session):
    orders = read_table(f"{SF}/orders.parquet",
                        columns=["o_custkey", "o_orderkey"])
    customer = read_table(f"{SF}/customer.parquet",
                          columns=["c_custkey", "c_nationkey"])
    nation = read_table(f"{SF}/nation.parquet", columns=["n_nationkey"])
    got = inclusion_profile([
        ("orders.custkey⊆customer", orders, "o_custkey",
         customer, "c_custkey"),
        ("customer.nationkey⊆nation", customer, "c_nationkey",
         nation, "n_nationkey"),
        ("customer.custkey⊆orders", customer, "c_custkey",
         orders, "o_custkey"),
    ])
    con = duckdb.connect()
    for t in ("orders", "customer", "nation"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{SF}/{t}.parquet')")
    want_miss = con.execute(
        "SELECT COUNT(*) FROM (SELECT DISTINCT c_custkey FROM customer "
        "EXCEPT SELECT DISTINCT o_custkey FROM orders)").fetchone()[0]
    want_na = con.execute(
        "SELECT COUNT(DISTINCT c_custkey) FROM customer").fetchone()[0]
    g = got.set_index("pair")
    # generated FKs hold by construction
    assert bool(g.loc["orders.custkey⊆customer", "is_subset"])
    assert bool(g.loc["customer.nationkey⊆nation", "is_subset"])
    assert g.loc["orders.custkey⊆customer", "containment"] == 1.0
    # reverse direction: whatever DuckDB says (customer coverage of
    # orders is a data property, not a generator guarantee)
    rev = g.loc["customer.custkey⊆orders"]
    assert rev["n_missing"] == want_miss
    assert rev["n_distinct_a"] == want_na
    np.testing.assert_allclose(rev["containment"],
                               1 - want_miss / want_na, atol=1e-6)
    assert bool(rev["is_subset"]) == (want_miss == 0)
    con.close()


def test_fk_discovery_negative_direction(ray_session):
    # synthetic: half of A's keys are absent from B
    a = pd.DataFrame({"x": np.arange(100)})
    b = pd.DataFrame({"y": np.arange(0, 100, 2)})
    got = inclusion_profile(
        [("p", rd.from_pandas(a, override_num_blocks=3), "x",
          rd.from_pandas(b), "y")]).iloc[0]
    assert got["n_missing"] == 50
    assert got["containment"] == 0.5
    assert not bool(got["is_subset"])


def test_null_counts_as_missing(ray_session):
    a = pd.DataFrame({"x": [1, 2, 2, None]})
    b = pd.DataFrame({"y": [1, 2, 3]})
    got = inclusion_profile(
        [("p", rd.from_pandas(a), "x", rd.from_pandas(b), "y")])
    r = got.iloc[0]
    assert r["n_distinct_a"] == 3          # 1, 2, NULL
    assert r["n_missing"] == 1             # the NULL
    assert not bool(r["is_subset"])


def test_candidate_keys_on_testdata(ray_session):
    orders = read_table(f"{SF}/orders.parquet",
                        columns=["o_orderkey", "o_custkey",
                                 "o_orderstatus"])
    got = candidate_key_profile(
        orders, [["o_orderkey"], ["o_custkey"],
                 ["o_custkey", "o_orderstatus"]]).set_index("key")
    con = duckdb.connect()
    con.execute(f"CREATE VIEW orders AS SELECT * FROM "
                f"read_parquet('{SF}/orders.parquet')")
    n = con.execute("SELECT COUNT(*) FROM orders").fetchone()[0]
    for key, cols in [("o_orderkey", "o_orderkey"),
                      ("o_custkey", "o_custkey"),
                      ("o_custkey+o_orderstatus",
                       "o_custkey, o_orderstatus")]:
        nd, ndup = con.execute(
            f"SELECT COUNT(*), COUNT(*) FILTER (n > 1) FROM ("
            f"SELECT COUNT(*) AS n FROM orders GROUP BY {cols})"
        ).fetchone()
        assert got.loc[key, "n_distinct"] == nd, key
        assert got.loc[key, "n_dup_keys"] == ndup, key
        assert got.loc[key, "n_rows"] == n
        assert bool(got.loc[key, "is_key"]) == (nd == n)
    assert bool(got.loc["o_orderkey", "is_key"])
    assert not bool(got.loc["o_custkey", "is_key"])
    con.close()


def test_mode_agreement(ray_session):
    rng = np.random.default_rng(2)
    a = pd.DataFrame({"x": rng.integers(0, 500, 3000)})
    b = pd.DataFrame({"y": rng.integers(200, 600, 3000)})
    dsa, dsb = rd.from_pandas(a, override_num_blocks=4), rd.from_pandas(b)
    p_drv = inclusion_profile([("p", dsa, "x", dsb, "y")], mode="driver")
    p_shf = inclusion_profile([("p", dsa, "x", dsb, "y")], mode="shuffle")
    pd.testing.assert_frame_equal(p_drv, p_shf)
    k_drv = candidate_key_profile(dsa, [["x"]], mode="driver")
    k_shf = candidate_key_profile(dsa, [["x"]], mode="shuffle")
    pd.testing.assert_frame_equal(k_drv, k_shf)
