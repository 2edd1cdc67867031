"""Dataset constraints: DuckDB parity for functional-dependency and
per-key monotonicity violations (synthetic + real sf0.001 tables),
mode agreement, and the violations schema."""

import duckdb
import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from cerberus_ray.stages.constraints import (
    functional_dependency_violations, monotonic_violations)

SF = "/root/testdata/sf0.001"


def fd_frame() -> pd.DataFrame:
    rows = []
    for i in range(300):
        grp = f"g{i % 30}"
        dep = "one" if i % 30 != 3 else ("one" if i < 150 else "two")
        rows.append({"doc_id": f"r{i}", "a": grp, "b": dep})
    # g3 maps to {'one','two'} → every g3 row violates
    return pd.DataFrame(rows)


def test_fd_matches_duckdb_and_modes_agree(ray_session):
    df = fd_frame()
    ds = rd.from_pandas(df, override_num_blocks=5).materialize()
    v = functional_dependency_violations(ds, "a", "b").to_pandas()
    con = duckdb.connect()
    con.register("t", df)
    exp = con.execute(
        "SELECT doc_id FROM t WHERE a IN ("
        " SELECT a FROM t GROUP BY a HAVING COUNT(DISTINCT b) > 1)"
    ).fetchdf()
    assert sorted(v["doc_id"]) == sorted(exp["doc_id"])
    assert set(v["rule"]) == {"fd-a->b"}
    assert set(v["path"]) == {"b"}
    v2 = functional_dependency_violations(ds, "a", "b",
                                          mode="shuffle").to_pandas()
    assert (v.sort_values("doc_id").reset_index(drop=True)
            .equals(v2.sort_values("doc_id").reset_index(drop=True)))
    with pytest.raises(ValueError):
        functional_dependency_violations(ds, "a", "b", mode="bogus")


def test_fd_clean_dataset_no_violations(ray_session):
    df = pd.DataFrame({"doc_id": ["x", "y"], "a": ["k", "k"],
                       "b": ["v", "v"]})
    v = functional_dependency_violations(
        rd.from_pandas(df), "a", "b").to_pandas()
    assert len(v) == 0


def mono_frame() -> pd.DataFrame:
    rng = np.random.default_rng(11)
    rows = []
    for u in range(40):
        vals = np.cumsum(rng.integers(0, 5, 20))       # non-decreasing
        if u % 5 == 0:
            vals = vals.copy()
            vals[7] = vals[6] - 3                       # planted dip
        for i, v in enumerate(vals):
            rows.append({"doc_id": f"e{u}_{i}", "user": f"u{u}",
                         "ts": i, "val": int(v)})
    return pd.DataFrame(rows)


def test_monotonic_matches_duckdb(ray_session):
    df = mono_frame()
    ds = rd.from_pandas(df, override_num_blocks=6)
    v = monotonic_violations(ds, "user", "ts", "val").to_pandas()
    con = duckdb.connect()
    con.register("t", df)
    exp = con.execute(
        "SELECT doc_id FROM (SELECT doc_id, val, LAG(val) OVER ("
        " PARTITION BY \"user\" ORDER BY ts, doc_id) pv FROM t)"
        " WHERE val < pv").fetchdf()
    assert sorted(v["doc_id"]) == sorted(exp["doc_id"])
    assert len(v) == 8          # one planted dip per u0,u5,...,u35
    # strict mode also flags plateaus
    vs = monotonic_violations(ds, "user", "ts", "val",
                              strict=True).to_pandas()
    exps = con.execute(
        "SELECT doc_id FROM (SELECT doc_id, val, LAG(val) OVER ("
        " PARTITION BY \"user\" ORDER BY ts, doc_id) pv FROM t)"
        " WHERE val <= pv").fetchdf()
    assert sorted(vs["doc_id"]) == sorted(exps["doc_id"])


def test_sf0001_constraint_report_pin(ray_session):
    from cerberus_ray.pipelines.training_queries import (
        q_constraint_check_report)
    t = q_constraint_check_report(SF).to_pydict()
    con = duckdb.connect()
    exp_fd = con.execute(
        f"SELECT COUNT(*) FROM read_parquet('{SF}/orders.parquet')"
        " WHERE o_custkey IN (SELECT o_custkey FROM"
        f" read_parquet('{SF}/orders.parquet') GROUP BY o_custkey"
        " HAVING COUNT(DISTINCT o_orderpriority) > 1)").fetchone()[0]
    exp_mono = con.execute(
        "SELECT COUNT(*) FROM (SELECT value, LAG(value) OVER ("
        " PARTITION BY user_id ORDER BY ts, event_id) pv FROM"
        f" read_parquet('{SF}/events.parquet')) WHERE value < pv"
    ).fetchone()[0]
    assert t["n_fd_violations"] == [int(exp_fd)]
    assert t["n_monotonic_violations"] == [int(exp_mono)]


def test_dc_matches_duckdb_on_orders(ray_session):
    """Denial constraint on real sf0.001 orders: no customer may have a
    later order with a smaller total — flagged set == the O(n²) SQL
    self-join's DISTINCT participant list."""
    from cerberus_ray.sources.io import read_table
    from cerberus_ray.stages.constraints import (
        denial_constraint_violations)

    ds = read_table(f"{SF}/orders.parquet",
                    columns=["o_orderkey", "o_custkey", "o_orderdate",
                             "o_totalprice"])
    v = denial_constraint_violations(
        ds, "o_custkey", "o_orderdate", "o_totalprice",
        b_op="<", id_col="o_orderkey").to_pandas()
    con = duckdb.connect()
    exp = con.execute(f"""
        WITH t AS (SELECT * FROM read_parquet('{SF}/orders.parquet'))
        SELECT DISTINCT id FROM (
          SELECT r.o_orderkey AS id FROM t r JOIN t s
            ON r.o_custkey = s.o_custkey
           AND ((r.o_orderdate > s.o_orderdate
                 AND r.o_totalprice < s.o_totalprice)
                OR (s.o_orderdate > r.o_orderdate
                    AND s.o_totalprice < r.o_totalprice)))
        ORDER BY id""").df()
    assert len(v) > 0
    assert sorted(v["doc_id"]) == sorted(exp["id"].astype(str))
    assert set(v.columns) == {"doc_id", "rule", "path", "detail"}
    assert v["doc_id"].is_unique


@pytest.mark.parametrize("b_op", [">", "!="])
def test_dc_other_ops_match_bruteforce(ray_session, b_op):
    rng = np.random.default_rng(7)
    df = pd.DataFrame({
        "doc_id": [f"r{i}" for i in range(400)],
        "g": rng.integers(0, 25, 400),
        "a": rng.integers(0, 12, 400),
        "b": rng.integers(0, 6, 400).astype(float)})
    from cerberus_ray.stages.constraints import (
        denial_constraint_violations)

    ds = rd.from_pandas(df, override_num_blocks=4).materialize()
    v = denial_constraint_violations(ds, "g", "a", "b",
                                     b_op=b_op).to_pandas()
    flagged = set()
    for _, grp in df.groupby("g"):
        av, bv, ids = (grp["a"].to_numpy(), grp["b"].to_numpy(),
                       grp["doc_id"].to_numpy())
        for i in range(len(grp)):
            for j in range(len(grp)):
                if av[i] > av[j] and (
                        bv[i] < bv[j] if b_op == "<" else
                        bv[i] > bv[j] if b_op == ">" else
                        bv[i] != bv[j]):
                    flagged.add(ids[i])
                    flagged.add(ids[j])
    assert sorted(v["doc_id"]) == sorted(flagged)


def test_dc_composite_key_nulls_and_guard(ray_session):
    from cerberus_ray.stages.constraints import (
        denial_constraint_violations)

    df = pd.DataFrame({
        "doc_id": ["x1", "x2", "x3", "x4", "x5"],
        "k1": ["a", "a", "a", "b", "a"],
        "k2": [1, 1, 2, 1, 1],
        "a": [1.0, 2.0, 2.0, 2.0, np.nan],
        "b": [5.0, 4.0, 9.0, 9.0, 0.0]})
    ds = rd.from_pandas(df).materialize()
    # only (x1, x2) share the (a,1) composite group with a-order and
    # a b-inversion; x3 is in (a,2), x4 in (b,1), x5 has NULL a
    v = denial_constraint_violations(ds, ["k1", "k2"], "a", "b",
                                     b_op="<").to_pandas()
    assert sorted(v["doc_id"]) == ["x1", "x2"]
    with pytest.raises(ValueError):
        denial_constraint_violations(ds, "k1", "a", "b", b_op="<=")


def test_cfd_matches_duckdb_and_exempts_nonmatching(ray_session):
    """CFD (pattern o_orderstatus='F': o_custkey → o_orderpriority)
    flags exactly DuckDB's matching-subset FD violators; rows outside
    the pattern are exempt even when the unconditional FD fails."""
    from cerberus_ray.sources.io import read_table
    from cerberus_ray.stages.constraints import conditional_fd_violations

    ds = read_table(f"{SF}/orders.parquet",
                    columns=["o_orderkey", "o_custkey",
                             "o_orderstatus", "o_orderpriority"])
    v = conditional_fd_violations(
        ds, "o_custkey", "o_orderpriority", {"o_orderstatus": "F"},
        key_col="o_orderkey").to_pandas()
    con = duckdb.connect()
    exp = con.execute(f"""
        WITH m AS (SELECT * FROM read_parquet('{SF}/orders.parquet')
                   WHERE o_orderstatus = 'F')
        SELECT CAST(o_orderkey AS VARCHAR) AS id FROM m
        WHERE o_custkey IN (SELECT o_custkey FROM m GROUP BY o_custkey
                            HAVING COUNT(DISTINCT o_orderpriority) > 1)
        ORDER BY id""").df()
    assert len(v) > 0
    assert sorted(v["doc_id"]) == sorted(exp["id"])
    # modes agree; empty condition guarded
    v2 = conditional_fd_violations(
        ds, "o_custkey", "o_orderpriority", {"o_orderstatus": "F"},
        key_col="o_orderkey", mode="shuffle").to_pandas()
    assert sorted(v2["doc_id"]) == sorted(v["doc_id"])
    with pytest.raises(ValueError):
        conditional_fd_violations(ds, "o_custkey", "o_orderpriority",
                                  {}, key_col="o_orderkey")


def test_cfd_null_condition_rows_exempt(ray_session):
    from cerberus_ray.stages.constraints import conditional_fd_violations

    df = pd.DataFrame({
        "doc_id": ["a", "b", "c", "d"],
        "cond": ["x", "x", None, "y"],
        "det": ["g", "g", "g", "g"],
        "dep": ["1", "2", "3", "4"]})
    ds = rd.from_pandas(df).materialize()
    v = conditional_fd_violations(ds, "det", "dep", {"cond": "x"}
                                  ).to_pandas()
    # only a, b match the pattern; they disagree on dep → both flagged
    assert sorted(v["doc_id"]) == ["a", "b"]
