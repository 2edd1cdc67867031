"""ROLLUP/CUBE grouped aggregates: DuckDB GROUP BY ROLLUP/CUBE parity,
partition invariance, grouping-id bitmask, real-table check."""

import duckdb
import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from cerberus_ray.stages.groupagg import rollup_agg

SF = "/root/testdata/sf0.001"


def _frame():
    rng = np.random.default_rng(5)
    return pd.DataFrame({
        "a": rng.choice(["x", "y", "z"], size=200),
        "b": rng.choice(["p", "q"], size=200),
        "v": rng.normal(10, 3, size=200).round(3)})


def _canon(df, group_cols, agg_cols):
    rows = set()
    for _, r in df.iterrows():
        key = tuple("NULL" if pd.isna(r[c]) else str(r[c])
                    for c in group_cols)
        # 3 dp: float64 summation-order residue at 1e8 magnitudes sits
        # around 1e-6 — still far inside 3 decimals
        vals = tuple(round(float(r[c]), 3) for c in agg_cols)
        rows.add(key + vals)
    return rows


AGGS = {"sum_v": ("v", "sum"), "n": ("v", "count"),
        "min_v": ("v", "min"), "mean_v": ("v", "mean")}
AGG_SQL = ("CAST(SUM(v) AS DOUBLE) sum_v, CAST(COUNT(*) AS DOUBLE) n, "
           "CAST(MIN(v) AS DOUBLE) min_v, CAST(AVG(v) AS DOUBLE) mean_v")


@pytest.mark.parametrize("cube,kw", [(False, "ROLLUP"), (True, "CUBE")])
def test_duckdb_parity(ray_session, cube, kw):
    df = _frame()
    ds = rd.from_pandas(df, override_num_blocks=4)
    got = rollup_agg(ds, ["a", "b"], AGGS, cube=cube)
    want = duckdb.sql(
        f"SELECT a, b, {AGG_SQL} FROM df GROUP BY {kw}(a, b)").fetchdf()
    assert (_canon(got, ["a", "b"], list(AGGS))
            == _canon(want, ["a", "b"], list(AGGS)))
    # row counts: rollup = finest + per-a + grand; cube adds per-b
    assert len(got) == len(want)


def test_partition_invariance(ray_session):
    df = _frame()
    outs = [rollup_agg(rd.from_pandas(df, override_num_blocks=b),
                       ["a", "b"], AGGS) for b in (1, 7)]
    pd.testing.assert_frame_equal(outs[0], outs[1])


def test_grouping_id_bitmask(ray_session):
    df = _frame()
    ds = rd.from_pandas(df)
    out = rollup_agg(ds, ["a", "b"], AGGS, grouping_id=True)
    for _, r in out.iterrows():
        want = (2 if pd.isna(r["a"]) else 0) + (1 if pd.isna(r["b"]) else 0)
        assert r["grouping_id"] == want
    assert set(out["grouping_id"]) == {0, 1, 3}  # rollup levels only


def test_orders_rollup_matches_duckdb(ray_session):
    from cerberus_ray.sources.io import read_table

    ds = read_table(f"{SF}/orders.parquet",
                    columns=["o_orderstatus", "o_orderpriority",
                             "o_totalprice"])
    got = rollup_agg(ds, ["o_orderstatus", "o_orderpriority"],
                     {"total": ("o_totalprice", "sum"),
                      "n": ("o_totalprice", "count")})
    want = duckdb.sql(
        f"SELECT o_orderstatus, o_orderpriority, "
        f"CAST(SUM(o_totalprice) AS DOUBLE) total, "
        f"CAST(COUNT(*) AS DOUBLE) n "
        f"FROM read_parquet('{SF}/orders.parquet') "
        f"GROUP BY ROLLUP(o_orderstatus, o_orderpriority)").fetchdf()
    cols = ["o_orderstatus", "o_orderpriority"]
    assert (_canon(got, cols, ["total", "n"])
            == _canon(want, cols, ["total", "n"]))


def test_grouping_sets_duckdb_parity(ray_session):
    df = _frame()
    ds = rd.from_pandas(df, override_num_blocks=4)
    got = rollup_agg(ds, ["a", "b"], AGGS,
                     sets=[("a", "b"), ("b",), ()])
    want = duckdb.sql(
        f"SELECT a, b, {AGG_SQL} FROM df "
        f"GROUP BY GROUPING SETS ((a, b), (b), ())").fetchdf()
    assert (_canon(got, ["a", "b"], list(AGGS))
            == _canon(want, ["a", "b"], list(AGGS)))
    assert len(got) == len(want)
    with pytest.raises(ValueError):
        rollup_agg(ds, ["a", "b"], AGGS, sets=[("zzz",)])
    with pytest.raises(ValueError):
        rollup_agg(ds, ["a", "b"], AGGS, sets=[])


def test_empty_and_bad_args(ray_session):
    df = _frame().iloc[:0]
    ds = rd.from_pandas(_frame())
    out = rollup_agg(rd.from_pandas(df), ["a", "b"], AGGS)
    assert len(out) == 0 and list(out.columns) == ["a", "b"] + list(AGGS)
    with pytest.raises(ValueError):
        rollup_agg(ds, [], AGGS)
    with pytest.raises(ValueError):
        rollup_agg(ds, ["a"], {"x": ("v", "median")})


def test_orders_rollup_query(ray_session):
    from cerberus_ray.pipelines.training_queries import q_orders_rollup

    out = q_orders_rollup(SF).to_pandas()
    assert len(out) == 19  # 15 finest + 3 per-status + 1 grand total
    assert set(out["grouping_id"]) == {0, 1, 3}
    assert out.equals(q_orders_rollup(SF).to_pandas())
