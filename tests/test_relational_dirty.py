"""Relational rules must DETECT injected violations — clean driver data
exercises only the zero case. Builds dirty copies of the tables under /tmp
and checks both detection and oracle parity on them (the reference's
violating-object test style, cerberus/tests/test_bookings.py:48-56)."""

import os

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from cerberus_ray.pipelines import relational as R


@pytest.fixture(scope="module")
def dirty_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("dirty"))
    rng = np.random.default_rng(42)

    customer = pd.DataFrame({
        "c_custkey": np.r_[np.arange(1, 101), [5, 5, 17]],  # dups: 5×3, 17×2
        "c_name": [f"Customer#{i}" for i in range(103)],
    })
    orders = pd.DataFrame({
        "o_orderkey": np.arange(1, 201),
        "o_custkey": np.r_[rng.integers(1, 101, size=195),
                           [999, 999, 1000, 1001, 1002]],  # 5 orphans
        "o_totalprice": np.r_[rng.uniform(10, 1000, size=198), [-5.0, 0.0]],
        "o_orderstatus": ["F"] * 198 + ["X", "F"],
        "o_orderpriority": ["1-URGENT"] * 199 + ["9-BOGUS"],
    })
    lineitem = pd.DataFrame({
        "l_orderkey": np.r_[rng.integers(1, 201, size=395), [900, 901, 902, 903, 904]],
        "l_linenumber": np.arange(400, dtype="int32"),
        "l_quantity": np.r_[rng.uniform(1, 50, size=397), [0.0, -2.0, 5.0]],
        "l_discount": np.r_[rng.uniform(0, 0.1, size=398), [1.5, -0.1]],
        "l_tax": np.r_[rng.uniform(0, 0.08, size=399), [-0.01]],
        "l_returnflag": ["N"] * 397 + ["Z", "A", "R"],
        "l_linestatus": ["O"] * 399 + ["Q"],
        "l_extendedprice": rng.uniform(100, 10000, size=400),
    })
    for name, df in [("customer", customer), ("orders", orders),
                     ("lineitem", lineitem)]:
        pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                       os.path.join(d, f"{name}.parquet"))
    return d


@pytest.fixture(scope="module")
def dirty_con(dirty_dir):
    c = duckdb.connect()
    for t in ["customer", "orders", "lineitem"]:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                  f"read_parquet('{dirty_dir}/{t}.parquet')")
    return c


def norm(df):
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@pytest.mark.parametrize("name,min_rows", [
    ("rule_counts_lineitem", 5),
    ("rule_counts_orders", 3),
    ("unique_custkey", 2),
    ("ref_orders_custkey", 5),
])
def test_dirty_detection_and_parity(ray_session, dirty_con, dirty_dir, name,
                                    min_rows):
    mine = norm(R.QUERIES[name](dirty_dir).to_pandas())
    theirs = norm(dirty_con.execute(R.ORACLE_SQL[name]).df())
    assert len(mine) >= min_rows
    assert list(mine.columns) == list(theirs.columns)
    assert mine.astype(str).values.tolist() == theirs.astype(str).values.tolist()


def test_dirty_counts_nonzero(ray_session, dirty_dir):
    t = R.QUERIES["rule_counts_lineitem"](dirty_dir).to_pandas()
    counts = dict(zip(t["rule"], t["n_violations"]))
    assert counts["range-l_quantity"] == 2      # 0.0 and -2.0
    assert counts["range-l_discount"] == 2      # 1.5 and -0.1
    assert counts["range-l_tax"] == 1
    assert counts["enum-l_returnflag"] == 1     # 'Z'
    assert counts["enum-l_linestatus"] == 1     # 'Q'
    u = R.QUERIES["unique_custkey"](dirty_dir).to_pandas()
    assert dict(zip(u["c_custkey"], u["n"])) == {5: 3, 17: 2}


def test_order_totalprice_modes_agree(ray_session):
    """The planner's two plans — driver-merged broadcast vs the single
    hash-partitioned exchange — must be output-identical."""
    from cerberus_ray.pipelines.relational import q_order_totalprice_check

    sf = "/root/testdata/sf0.001"
    a = (q_order_totalprice_check(sf, mode="driver").to_pandas()
         .sort_values("o_orderkey").reset_index(drop=True))
    b = (q_order_totalprice_check(sf, mode="shuffle").to_pandas()
         .sort_values("o_orderkey").reset_index(drop=True))
    assert a.equals(b)
    assert len(a) > 0


def test_events_users_modes_agree(ray_session):
    from cerberus_ray.pipelines.relational import q_events_users_per_type

    sf = "/root/testdata/sf0.001"
    a = q_events_users_per_type(sf, mode="driver").to_pandas()
    b = q_events_users_per_type(sf, mode="shuffle").to_pandas()
    assert a.equals(b) and len(a) > 0


def test_revenue_per_nation_modes_agree(ray_session):
    """Broadcast lookup vs native hash-partitioned join must be
    output-identical (the fact-sized-broadcast planner's contract)."""
    from cerberus_ray.pipelines.relational2 import q_revenue_per_nation

    sf = "/root/testdata/sf0.001"
    a = q_revenue_per_nation(sf, mode="broadcast").to_pandas()
    b = q_revenue_per_nation(sf, mode="shuffle").to_pandas()
    assert a.equals(b) and len(a) > 0
    import pytest as _pytest
    with _pytest.raises(ValueError):
        q_revenue_per_nation(sf, mode="bogus")


def test_top_orders_per_nation_modes_agree(ray_session):
    from cerberus_ray.pipelines.relational2 import q_top_orders_per_nation

    sf = "/root/testdata/sf0.001"
    a = q_top_orders_per_nation(sf, mode="broadcast").to_pandas()
    b = q_top_orders_per_nation(sf, mode="shuffle").to_pandas()
    assert a.equals(b) and len(a) > 0
