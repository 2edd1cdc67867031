"""Set operations: DuckDB INTERSECT/EXCEPT/UNION parity (incl. SQL
null-equality), mode agreement, real-table check."""

import duckdb
import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from cerberus_ray.stages.setops import (
    except_distinct,
    intersect_distinct,
    union_distinct,
)

SF = "/root/testdata/sf0.001"
OPS = {"intersect": (intersect_distinct, "INTERSECT"),
       "except": (except_distinct, "EXCEPT"),
       "union": (union_distinct, "UNION")}


def _frames():
    rng = np.random.default_rng(3)
    def mk(n, seed_shift):
        df = pd.DataFrame({
            "s": rng.choice(["x", "y", "z", None], size=n),
            "k": rng.integers(0, 9, size=n).astype("float64")})
        df.loc[rng.choice(n, 5, replace=False), "k"] = np.nan
        return df
    return mk(120, 0), mk(90, 1)


def _norm(df):
    return (df.astype({"s": object})
            .sort_values(["s", "k"], na_position="last")
            .reset_index(drop=True))


@pytest.mark.parametrize("op", list(OPS))
def test_duckdb_parity_and_mode_agreement(ray_session, op):
    fa, fb = _frames()
    a = rd.from_pandas(fa, override_num_blocks=4)
    b = rd.from_pandas(fb, override_num_blocks=3)
    fn, sql_op = OPS[op]
    want = _norm(duckdb.sql(
        f"SELECT s, k FROM fa {sql_op} SELECT s, k FROM fb").fetchdf())
    for mode in ("driver", "shuffle"):
        got = _norm(fn(a, b, ["s", "k"], mode=mode))
        assert len(got) == len(want), (op, mode)
        for c in ("s", "k"):
            ga = got[c].to_numpy(dtype=object)
            wa = want[c].to_numpy(dtype=object)
            same = [(x == y) or (pd.isna(x) and pd.isna(y))
                    for x, y in zip(ga, wa)]
            assert all(same), (op, mode, c)


def test_real_tables(ray_session):
    from cerberus_ray.sources.io import read_table

    cust = read_table(f"{SF}/customer.parquet", columns=["c_custkey"])
    cust = cust.map_batches(
        lambda df: df.rename(columns={"c_custkey": "custkey"}),
        batch_format="pandas")
    ordc = read_table(f"{SF}/orders.parquet", columns=["o_custkey"])
    ordc = ordc.map_batches(
        lambda df: df.rename(columns={"o_custkey": "custkey"}),
        batch_format="pandas")
    inter = intersect_distinct(cust, ordc, ["custkey"])
    exc = except_distinct(cust, ordc, ["custkey"])
    uni = union_distinct(cust, ordc, ["custkey"])
    want = duckdb.sql(f"""
        SELECT
          (SELECT COUNT(*) FROM (SELECT c_custkey FROM
             read_parquet('{SF}/customer.parquet')
           INTERSECT SELECT o_custkey FROM
             read_parquet('{SF}/orders.parquet'))),
          (SELECT COUNT(*) FROM (SELECT c_custkey FROM
             read_parquet('{SF}/customer.parquet')
           EXCEPT SELECT o_custkey FROM
             read_parquet('{SF}/orders.parquet'))),
          (SELECT COUNT(*) FROM (SELECT c_custkey FROM
             read_parquet('{SF}/customer.parquet')
           UNION SELECT o_custkey FROM
             read_parquet('{SF}/orders.parquet')))
    """).fetchone()
    assert (len(inter), len(exc), len(uni)) == want
    # intersect and except partition the distinct left side
    n_left = duckdb.sql(f"SELECT COUNT(DISTINCT c_custkey) FROM "
                        f"read_parquet('{SF}/customer.parquet')").fetchone()[0]
    assert len(inter) + len(exc) == n_left


def test_bad_mode(ray_session):
    fa, fb = _frames()
    a, b = rd.from_pandas(fa), rd.from_pandas(fb)
    with pytest.raises(ValueError, match="unknown mode"):
        intersect_distinct(a, b, ["s"], mode="nope")


def test_separator_collision_modes_agree(ray_session):
    """Values containing the key separator must not merge distinct
    tuples in shuffle mode (escaping regression test)."""
    fa = pd.DataFrame({"c1": ["x\x1fy", "\x1eNULL\x1e"],
                       "c2": ["z", "w"]})
    fb = pd.DataFrame({"c1": ["x", None], "c2": ["y\x1fz", "w"]})
    a, b = rd.from_pandas(fa), rd.from_pandas(fb)
    def nz(df):
        return (df.astype(str).sort_values(["c1", "c2"])
                .reset_index(drop=True))

    for op, fn in [("intersect", intersect_distinct),
                   ("except", except_distinct),
                   ("union", union_distinct)]:
        d = nz(fn(a, b, ["c1", "c2"], mode="driver"))
        s = nz(fn(a, b, ["c1", "c2"], mode="shuffle"))
        assert len(d) == len(s), op
        assert d.values.tolist() == s.values.tolist(), op
    # and the would-collide tuples are NOT an intersect match
    assert len(intersect_distinct(a, b, ["c1", "c2"],
                                  mode="shuffle")) == 0
