"""TPC-H Q3/Q10-shape multi-join queries: bit-exact DuckDB parity via
the shared integer-units revenue kernel, and broadcast/shuffle mode
agreement for the Q3 customer semi-filter."""

import duckdb
import pandas as pd
import pytest

from cerberus_ray.pipelines.tpch_extra import (
    q3_shipping_priority,
    q5_local_supplier_volume,
    q10_returned_items,
)

SF_DIR = "/root/testdata/sf0.001"

#: shared revenue kernel, interpolated into the SQL (exact int64 10^-4
#: units; final cents via integer (sum+50)//100 — same as _cents)
REV_E4 = ("CAST(ROUND(l_extendedprice * 100) AS BIGINT) * "
          "CAST(ROUND((1 - l_discount) * 100) AS BIGINT)")
CENTS = "((CAST(SUM({rev}) AS BIGINT) + 50) // 100) / 100.0"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in ["customer", "orders", "lineitem", "nation", "supplier",
              "region"]:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                  f"read_parquet('{SF_DIR}/{t}.parquet')")
    return c


def test_q3_matches_duckdb(ray_session, con):
    mine = q3_shipping_priority(SF_DIR).to_pandas()
    theirs = con.execute(f"""
        SELECT l_orderkey,
               {CENTS.format(rev=REV_E4)} AS revenue,
               o_orderdate, o_orderpriority
        FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < DATE '1998-01-01'
          AND l_shipdate > DATE '1998-01-01'
        GROUP BY l_orderkey, o_orderdate, o_orderpriority
        ORDER BY revenue DESC, o_orderdate, l_orderkey
        LIMIT 10""").df()
    assert len(mine) == 10
    pd.testing.assert_frame_equal(mine, theirs, check_dtype=False)


def test_q3_modes_agree(ray_session):
    b = q3_shipping_priority(SF_DIR, mode="broadcast").to_pandas()
    s = q3_shipping_priority(SF_DIR, mode="shuffle").to_pandas()
    pd.testing.assert_frame_equal(b, s)
    with pytest.raises(ValueError):
        q3_shipping_priority(SF_DIR, mode="nope")


def test_fact_join_modes_agree(ray_session):
    b = q3_shipping_priority(SF_DIR, join_mode="broadcast").to_pandas()
    s = q3_shipping_priority(SF_DIR, join_mode="shuffle").to_pandas()
    pd.testing.assert_frame_equal(b, s)
    b10 = q10_returned_items(SF_DIR, join_mode="broadcast").to_pandas()
    s10 = q10_returned_items(SF_DIR, join_mode="shuffle").to_pandas()
    pd.testing.assert_frame_equal(b10, s10)
    with pytest.raises(ValueError):
        q3_shipping_priority(SF_DIR, join_mode="nope")
    with pytest.raises(ValueError):
        q10_returned_items(SF_DIR, join_mode="nope")


def test_q10_matches_duckdb(ray_session, con):
    mine = q10_returned_items(SF_DIR).to_pandas()
    theirs = con.execute(f"""
        SELECT c_custkey, c_name,
               {CENTS.format(rev=REV_E4)} AS revenue,
               c_acctbal, n_name
        FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN nation ON c_nationkey = n_nationkey
        WHERE o_orderdate >= DATE '1997-01-01'
          AND o_orderdate < DATE '1997-07-01'
          AND l_returnflag = 'R'
        GROUP BY c_custkey, c_name, c_acctbal, n_name
        ORDER BY revenue DESC, c_custkey
        LIMIT 20""").df()
    assert len(mine) == 20
    pd.testing.assert_frame_equal(mine, theirs, check_dtype=False)


def test_q5_matches_duckdb(ray_session, con):
    mine = q5_local_supplier_volume(SF_DIR).to_pandas()
    theirs = con.execute(f"""
        SELECT n_name, {CENTS.format(rev=REV_E4)} AS revenue
        FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE c_nationkey = s_nationkey
          AND r_name = 'ASIA'
          AND o_orderdate >= DATE '1996-01-01'
          AND o_orderdate < DATE '1997-01-01'
        GROUP BY n_name
        ORDER BY revenue DESC, n_name""").df()
    assert len(mine) > 0
    pd.testing.assert_frame_equal(mine, theirs, check_dtype=False)


def test_q5_modes_agree(ray_session):
    frames = [
        q5_local_supplier_volume(SF_DIR, cust_mode=cm,
                                 join_mode=jm).to_pandas()
        for cm in ("broadcast", "shuffle")
        for jm in ("broadcast", "shuffle")]
    for f in frames[1:]:
        pd.testing.assert_frame_equal(frames[0], f)
    with pytest.raises(ValueError):
        q5_local_supplier_volume(SF_DIR, cust_mode="nope")
    with pytest.raises(ValueError):
        q5_local_supplier_volume(SF_DIR, join_mode="nope")


def test_q3_rerun_deterministic(ray_session):
    a = q3_shipping_priority(SF_DIR).to_pandas()
    b = q3_shipping_priority(SF_DIR).to_pandas()
    pd.testing.assert_frame_equal(a, b)


def test_q7_matches_duckdb(ray_session, con):
    from cerberus_ray.pipelines.tpch_extra import q7_volume_shipping

    mine = q7_volume_shipping(SF_DIR).to_pandas()
    theirs = con.execute(f"""
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS l_year,
               {CENTS.format(rev=REV_E4)} AS revenue
        FROM lineitem
        JOIN orders ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_8')
            OR (n1.n_name = 'NATION_8' AND n2.n_name = 'NATION_3'))
          AND l_shipdate >= DATE '1996-01-01'
          AND l_shipdate < DATE '1998-01-01'
        GROUP BY supp_nation, cust_nation, l_year
        ORDER BY supp_nation, cust_nation, l_year""").df()
    assert len(mine) > 0
    pd.testing.assert_frame_equal(mine, theirs, check_dtype=False)


def test_q7_modes_agree(ray_session):
    from cerberus_ray.pipelines.tpch_extra import q7_volume_shipping

    outs = [q7_volume_shipping(SF_DIR, cust_mode=cm,
                               join_mode=jm).to_pandas()
            for cm in ("broadcast", "shuffle")
            for jm in ("broadcast", "shuffle")]
    for o in outs[1:]:
        pd.testing.assert_frame_equal(outs[0], o)
    with pytest.raises(ValueError):
        q7_volume_shipping(SF_DIR, cust_mode="nope")
    with pytest.raises(ValueError):
        q7_volume_shipping(SF_DIR, nation_a="NOPE")


def test_q8_matches_duckdb(ray_session, con):
    from cerberus_ray.pipelines.tpch_extra import q8_market_share

    con.execute(f"CREATE VIEW IF NOT EXISTS part AS SELECT * FROM "
                f"read_parquet('{SF_DIR}/part.parquet')")
    mine = q8_market_share(SF_DIR).to_pandas()
    theirs = con.execute(f"""
        WITH v AS (
          SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) o_year,
                 {REV_E4} AS rev_e4, n2.n_name AS supp_nation
          FROM lineitem
          JOIN part ON p_partkey = l_partkey
          JOIN orders ON o_orderkey = l_orderkey
          JOIN customer ON c_custkey = o_custkey
          JOIN supplier ON s_suppkey = l_suppkey
          JOIN nation n1 ON c_nationkey = n1.n_nationkey
          JOIN nation n2 ON s_nationkey = n2.n_nationkey
          JOIN region ON n1.n_regionkey = r_regionkey
          WHERE r_name = 'ASIA' AND p_type = 'ECONOMY'
            AND o_orderdate >= DATE '1996-01-01'
            AND o_orderdate < DATE '1998-01-01')
        SELECT o_year,
               CAST(SUM(CASE WHEN supp_nation = 'NATION_8'
                             THEN rev_e4 ELSE 0 END) AS DOUBLE)
               / CAST(SUM(rev_e4) AS DOUBLE) AS mkt_share
        FROM v GROUP BY o_year ORDER BY o_year""").df()
    assert len(mine) == 2
    pd.testing.assert_frame_equal(mine, theirs, check_dtype=False)


def test_q8_modes_agree(ray_session):
    from cerberus_ray.pipelines.tpch_extra import q8_market_share

    a = q8_market_share(SF_DIR, join_mode="broadcast").to_pandas()
    b = q8_market_share(SF_DIR, join_mode="shuffle").to_pandas()
    pd.testing.assert_frame_equal(a, b)
    with pytest.raises(ValueError):
        q8_market_share(SF_DIR, target_nation="NOPE")
