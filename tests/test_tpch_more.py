"""Adapted TPC-H Q4/Q6/Q12/Q14/Q15/Q17/Q18/Q19/Q22 shapes: bit-exact
DuckDB parity via the shared integer-units kernels, plus planner-mode
agreement for every dual-path stage."""

import duckdb
import pandas as pd
import pytest

from cerberus_ray.pipelines.tpch_more import (
    Q19_ARMS,
    q4_order_priority,
    q6_revenue_change,
    q12_priority_class,
    q14_promo_revenue,
    q15_top_supplier,
    q17_small_quantity_revenue,
    q18_large_volume_customers,
    q19_disjunctive_revenue,
    q22_stale_customers,
)

SF_DIR = "/root/testdata/sf0.001"

REV_E4 = ("CAST(ROUND(l_extendedprice * 100) AS BIGINT) * "
          "CAST(ROUND((1 - l_discount) * 100) AS BIGINT)")
CENTS = "((CAST(SUM({rev}) AS BIGINT) + 50) // 100) / 100.0"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in ["customer", "orders", "lineitem", "supplier", "part"]:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                  f"read_parquet('{SF_DIR}/{t}.parquet')")
    return c


def test_q6_matches_duckdb(ray_session, con):
    mine = q6_revenue_change(SF_DIR).to_pandas()
    theirs = con.execute(f"""
        SELECT {CENTS.format(rev=(
            "CAST(ROUND(l_extendedprice * 100) AS BIGINT) * "
            "CAST(ROUND(l_discount * 100) AS BIGINT)"))} AS revenue,
               CAST(COUNT(*) AS BIGINT) AS n_rows
        FROM lineitem
        WHERE l_shipdate >= DATE '1996-01-01'
          AND l_shipdate < DATE '1997-01-01'
          AND CAST(ROUND(l_discount * 100) AS BIGINT) BETWEEN 4 AND 6
          AND l_quantity < 24""").df()
    assert mine["n_rows"].iloc[0] > 0
    pd.testing.assert_frame_equal(mine, theirs, check_dtype=False)


def test_q4_matches_duckdb(ray_session, con):
    mine = q4_order_priority(SF_DIR).to_pandas()
    theirs = con.execute("""
        SELECT o_orderpriority,
               CAST(COUNT(*) AS BIGINT) AS order_count
        FROM orders
        WHERE o_orderdate >= DATE '1996-01-01'
          AND o_orderdate < DATE '1997-01-01'
          AND EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o_orderkey
                        AND l_returnflag = 'R')
        GROUP BY 1 ORDER BY 1""").df()
    assert len(mine) >= 3
    pd.testing.assert_frame_equal(mine, theirs, check_dtype=False)


def test_q4_modes_agree(ray_session):
    d = q4_order_priority(SF_DIR, exists_mode="driver").to_pandas()
    s = q4_order_priority(SF_DIR, exists_mode="shuffle").to_pandas()
    pd.testing.assert_frame_equal(d, s, check_dtype=False)
    with pytest.raises(ValueError):
        q4_order_priority(SF_DIR, exists_mode="nope")


def test_q12_matches_duckdb(ray_session, con):
    mine = q12_priority_class(SF_DIR).to_pandas()
    theirs = con.execute("""
        SELECT l_linestatus,
               CAST(SUM(CASE WHEN o_orderpriority IN
                   ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)
                   AS BIGINT) AS high_line_count,
               CAST(SUM(CASE WHEN o_orderpriority IN
                   ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END)
                   AS BIGINT) AS low_line_count
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        WHERE l_shipdate >= DATE '1996-01-01'
          AND l_shipdate < DATE '1997-01-01'
        GROUP BY 1 ORDER BY 1""").df()
    assert mine["high_line_count"].sum() > 0
    pd.testing.assert_frame_equal(mine, theirs, check_dtype=False)


def test_q12_modes_agree(ray_session):
    b = q12_priority_class(SF_DIR, join_mode="broadcast").to_pandas()
    s = q12_priority_class(SF_DIR, join_mode="shuffle").to_pandas()
    pd.testing.assert_frame_equal(b, s, check_dtype=False)
    with pytest.raises(ValueError):
        q12_priority_class(SF_DIR, join_mode="nope")


def test_q14_matches_duckdb(ray_session, con):
    mine = q14_promo_revenue(SF_DIR).to_pandas()
    theirs = con.execute(f"""
        WITH j AS (
          SELECT {REV_E4} AS rev_e4,
                 (p_type = 'PROMO') AS is_promo
          FROM lineitem JOIN part ON p_partkey = l_partkey
          WHERE l_shipdate >= DATE '1996-01-01'
            AND l_shipdate < DATE '1996-04-01')
        SELECT 100.0 * CAST(SUM(CASE WHEN is_promo THEN rev_e4
                                     ELSE 0 END) AS DOUBLE)
                 / CAST(SUM(rev_e4) AS DOUBLE) AS promo_revenue_pct,
               ((CAST(SUM(CASE WHEN is_promo THEN rev_e4 ELSE 0 END)
                  AS BIGINT) + 50) // 100) / 100.0 AS promo_revenue,
               ((CAST(SUM(rev_e4) AS BIGINT) + 50) // 100) / 100.0
                 AS total_revenue
        FROM j""").df()
    assert 0 < mine["promo_revenue_pct"].iloc[0] < 100
    pd.testing.assert_frame_equal(mine, theirs, check_dtype=False)


def test_q15_matches_duckdb(ray_session, con):
    mine = q15_top_supplier(SF_DIR).to_pandas()
    theirs = con.execute(f"""
        WITH rev AS (
          SELECT l_suppkey AS s_key,
                 {CENTS.format(rev=REV_E4)} AS total_revenue
          FROM lineitem
          WHERE l_shipdate >= DATE '1996-01-01'
            AND l_shipdate < DATE '1996-07-01'
          GROUP BY 1)
        SELECT s_suppkey, s_name, total_revenue
        FROM rev JOIN supplier ON s_suppkey = s_key
        WHERE total_revenue = (SELECT MAX(total_revenue) FROM rev)
        ORDER BY s_suppkey""").df()
    assert len(mine) >= 1
    pd.testing.assert_frame_equal(mine, theirs, check_dtype=False)


def test_q17_matches_duckdb(ray_session, con):
    mine = q17_small_quantity_revenue(SF_DIR).to_pandas()
    theirs = con.execute("""
        WITH lane AS (
          SELECT l_partkey, l_quantity, l_extendedprice
          FROM lineitem JOIN part ON p_partkey = l_partkey
          WHERE p_brand = 'Brand#25'),
        thr AS (
          SELECT l_partkey AS p,
                 0.2 * (CAST(SUM(CAST(ROUND(l_quantity) AS BIGINT))
                             AS DOUBLE) / COUNT(*)) AS t
          FROM lane GROUP BY 1),
        small AS (
          SELECT CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS cents
          FROM lane JOIN thr ON p = l_partkey
          WHERE l_quantity < t)
        SELECT CAST(SUM(cents) AS BIGINT) / 100.0 / 7.0 AS avg_yearly,
               CAST(SUM(cents) AS BIGINT) / 100.0 AS total_revenue,
               CAST(COUNT(*) AS BIGINT) AS n_small
        FROM small""").df()
    assert mine["n_small"].iloc[0] > 0
    pd.testing.assert_frame_equal(mine, theirs, check_dtype=False)


def test_q18_matches_duckdb(ray_session, con):
    mine = q18_large_volume_customers(SF_DIR).to_pandas()
    theirs = con.execute("""
        WITH big AS (
          SELECT l_orderkey, SUM(l_quantity) AS sum_qty
          FROM lineitem GROUP BY 1 HAVING SUM(l_quantity) > 150)
        SELECT c_custkey, c_name, o_orderkey, o_orderdate,
               o_totalprice, sum_qty
        FROM big
        JOIN orders ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        ORDER BY o_totalprice DESC, o_orderdate, o_orderkey
        LIMIT 100""").df()
    assert len(mine) > 10
    pd.testing.assert_frame_equal(mine, theirs, check_dtype=False)


def test_q18_modes_agree(ray_session):
    d = q18_large_volume_customers(SF_DIR,
                                   agg_mode="driver").to_pandas()
    s = q18_large_volume_customers(SF_DIR,
                                   agg_mode="shuffle").to_pandas()
    pd.testing.assert_frame_equal(d, s, check_dtype=False)
    with pytest.raises(ValueError):
        q18_large_volume_customers(SF_DIR, agg_mode="nope")


def test_q19_matches_duckdb(ray_session, con):
    mine = q19_disjunctive_revenue(SF_DIR).to_pandas()
    arms = " OR ".join(
        f"(p_brand = '{b}' AND p_size BETWEEN {slo} AND {shi} "
        f"AND l_quantity BETWEEN {qlo} AND {qhi})"
        for b, slo, shi, qlo, qhi in Q19_ARMS)
    theirs = con.execute(f"""
        SELECT {CENTS.format(rev=REV_E4)} AS revenue,
               CAST(COUNT(*) AS BIGINT) AS n_rows
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE {arms}""").df()
    assert mine["n_rows"].iloc[0] > 0
    pd.testing.assert_frame_equal(mine, theirs, check_dtype=False)


def test_q22_matches_duckdb(ray_session, con):
    mine = q22_stale_customers(SF_DIR).to_pandas()
    theirs = con.execute("""
        WITH bal AS (
          SELECT c_custkey, c_mktsegment,
                 CAST(ROUND(c_acctbal * 100) AS BIGINT) AS cents
          FROM customer),
        avg_pos AS (
          SELECT AVG(cents) AS a FROM bal WHERE cents > 0)
        SELECT c_mktsegment,
               CAST(COUNT(*) AS BIGINT) AS numcust,
               CAST(SUM(cents) AS BIGINT) / 100.0 AS totacctbal
        FROM bal, avg_pos
        WHERE cents > a
          AND NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey
                            AND o_orderdate >= DATE '1999-01-01')
        GROUP BY 1 ORDER BY 1""").df()
    assert len(mine) >= 1
    pd.testing.assert_frame_equal(mine, theirs, check_dtype=False)


def test_q22_modes_agree(ray_session):
    d = q22_stale_customers(SF_DIR, anti_mode="driver").to_pandas()
    s = q22_stale_customers(SF_DIR, anti_mode="shuffle").to_pandas()
    pd.testing.assert_frame_equal(d, s, check_dtype=False)
    with pytest.raises(ValueError):
        q22_stale_customers(SF_DIR, anti_mode="nope")


def test_q13_matches_duckdb(ray_session, con):
    from cerberus_ray.pipelines.tpch_more import q13_customer_distribution
    mine = q13_customer_distribution(SF_DIR).to_pandas()
    theirs = con.execute("""
        SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
        FROM (SELECT c_custkey,
                     CAST(COUNT(o_orderkey) AS BIGINT) AS c_count
              FROM customer LEFT OUTER JOIN orders
                ON c_custkey = o_custkey
               AND o_orderpriority <> '1-URGENT'
              GROUP BY c_custkey) c_orders
        GROUP BY c_count
        ORDER BY custdist DESC, c_count DESC""").df()
    assert len(mine) > 1
    pd.testing.assert_frame_equal(mine, theirs, check_dtype=False)


def test_q13_mode_agreement(ray_session):
    from cerberus_ray.pipelines.tpch_more import q13_customer_distribution
    a = q13_customer_distribution(SF_DIR, agg_mode="driver").to_pandas()
    b = q13_customer_distribution(SF_DIR, agg_mode="shuffle").to_pandas()
    pd.testing.assert_frame_equal(a, b, check_dtype=False)
    with pytest.raises(ValueError):
        q13_customer_distribution(SF_DIR, agg_mode="bogus")


def test_q21_matches_duckdb(ray_session, con):
    from cerberus_ray.pipelines.tpch_more import q21_waiting_suppliers
    mine = q21_waiting_suppliers(SF_DIR).to_pandas()
    theirs = con.execute("""
        SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
        FROM supplier, lineitem l1, orders
        WHERE s_suppkey = l1.l_suppkey
          AND o_orderkey = l1.l_orderkey
          AND o_orderstatus = 'F'
          AND l1.l_returnflag = 'R'
          AND EXISTS (SELECT * FROM lineitem l2
                      WHERE l2.l_orderkey = l1.l_orderkey
                        AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (SELECT * FROM lineitem l3
                          WHERE l3.l_orderkey = l1.l_orderkey
                            AND l3.l_suppkey <> l1.l_suppkey
                            AND l3.l_returnflag = 'R')
        GROUP BY s_name
        ORDER BY numwait DESC, s_name
        LIMIT 100""").df()
    assert len(mine) > 0
    pd.testing.assert_frame_equal(mine, theirs, check_dtype=False)


def test_q21_mode_agreement(ray_session):
    from cerberus_ray.pipelines.tpch_more import q21_waiting_suppliers
    a = q21_waiting_suppliers(SF_DIR, pair_mode="driver").to_pandas()
    b = q21_waiting_suppliers(SF_DIR, pair_mode="shuffle").to_pandas()
    pd.testing.assert_frame_equal(a, b, check_dtype=False)
    with pytest.raises(ValueError):
        q21_waiting_suppliers(SF_DIR, pair_mode="bogus")
