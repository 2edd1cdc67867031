"""Grouped approximate distinct (per-group HyperLogLog): error bound
vs exact, bit-exact layout invariance (register max is commutative/
associative), driver/shuffle agreement, and real-table sanity."""

import duckdb
import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from cerberus_ray.stages.groupagg import grouped_approx_distinct

P = 12
TOL = 3 * 1.04 / np.sqrt(1 << P)   # 3 sigma of the HLL standard error


def _frame(n=60_000, seed=0):
    rng = np.random.default_rng(seed)
    return pd.DataFrame({
        "grp": rng.choice(["a", "b", "c", "d"], n),
        # group-dependent cardinality: values drawn from ranges of
        # very different sizes
        "val": rng.integers(0, 50_000, n)})


def test_error_bound_vs_exact(ray_session):
    df = _frame()
    ds = rd.from_pandas(df, override_num_blocks=6).materialize()
    out = grouped_approx_distinct(ds, "grp", "val", p=P)
    exact = df.groupby("grp")["val"].nunique()
    assert list(out["grp"]) == sorted(exact.index)
    for _, r in out.iterrows():
        e = exact[r["grp"]]
        assert abs(r["approx_distinct"] - e) / e < TOL


def test_layout_invariance_bitexact_and_mode_agreement(ray_session):
    df = _frame(seed=4)
    a = grouped_approx_distinct(
        rd.from_pandas(df, override_num_blocks=1).materialize(),
        "grp", "val", p=P)
    b = grouped_approx_distinct(
        rd.from_pandas(df.sample(frac=1.0, random_state=2),
                       override_num_blocks=11).materialize(),
        "grp", "val", p=P)
    pd.testing.assert_frame_equal(a, b)   # bit-exact, not approximate
    c = grouped_approx_distinct(
        rd.from_pandas(df, override_num_blocks=7).materialize(),
        "grp", "val", p=P, mode="shuffle")
    pd.testing.assert_frame_equal(a, c)
    with pytest.raises(ValueError):
        grouped_approx_distinct(rd.from_pandas(df), "grp", "val",
                                mode="bogus")


def test_string_values_against_duckdb_exact(ray_session):
    sf = "/root/testdata/sf0.001"
    from cerberus_ray.sources.io import read_table

    ev = read_table(f"{sf}/events.parquet",
                    columns=["event_type", "user_id"])
    out = grouped_approx_distinct(ev, "event_type", "user_id", p=P)
    exact = duckdb.connect().execute(
        f"""SELECT event_type, COUNT(DISTINCT user_id) n
            FROM read_parquet('{sf}/events.parquet')
            GROUP BY 1 ORDER BY 1""").df()
    assert list(out["event_type"]) == list(exact["event_type"])
    for a, e in zip(out["approx_distinct"], exact["n"]):
        assert abs(a - e) / e < TOL
