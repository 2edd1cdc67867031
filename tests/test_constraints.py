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
