"""IPW/stratified ATE: bias removal on confounded data, DuckDB census
parity, positivity accounting, layout invariance, guards."""

import duckdb
import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from cerberus_ray.stages.causal import ipw_ate_report


def _confounded(n=4000, effect=2.0, seed=13):
    """Stratum z drives BOTH treatment probability and the outcome, so
    the naive diff is badly biased upward; the true effect is 2.0."""
    rng = np.random.default_rng(seed)
    z = rng.choice(["a", "b", "c"], n, p=[0.5, 0.3, 0.2])
    pz = {"a": 0.1, "b": 0.5, "c": 0.9}
    base = {"a": 0.0, "b": 3.0, "c": 6.0}
    t = (rng.random(n) < np.vectorize(pz.get)(z)).astype(np.int64)
    y = (np.vectorize(base.get)(z) + effect * t
         + rng.normal(0, 0.5, n))
    return pd.DataFrame({"z": z, "t": t, "y": y})


def test_removes_confounding_bias(ray_session):
    df = _confounded()
    r = ipw_ate_report(rd.from_pandas(df, override_num_blocks=6),
                       "t", "y", ["z"]).to_pandas().iloc[0]
    assert r["naive_diff"] > 3.0          # confounded way above 2.0
    assert abs(r["ate_ipw"] - 2.0) < 0.15
    assert abs(r["ate_ipw"] - 2.0) < 4 * r["ate_se"]
    assert r["n_strata"] == 3 and r["n_off_support"] == 0
    assert r["n_rows"] == len(df)


def test_matches_duckdb_stratified_estimator(ray_session):
    df = _confounded(n=1500, seed=7)
    r = ipw_ate_report(rd.from_pandas(df, override_num_blocks=4),
                       "t", "y", ["z"]).to_pandas().iloc[0]
    con = duckdb.connect()
    con.register("obs", df)
    got = con.execute("""
        with s as (
          select z, count(*) n,
                 avg(case when t=1 then y end) mt,
                 avg(case when t=0 then y end) mc
          from obs group by z
          having sum(t) > 0 and sum(1-t) > 0)
        select sum(n * (mt - mc)) / sum(n) ate,
               (select avg(case when t=1 then y end)
                       - avg(case when t=0 then y end) from obs) naive
        from s""").df().iloc[0]
    assert abs(r["ate_ipw"] - got["ate"]) < 1e-6
    assert abs(r["naive_diff"] - got["naive"]) < 1e-6


def test_off_support_strata_counted_not_dropped_silently(ray_session):
    df = _confounded(n=800, seed=3)
    # stratum 'd': control-only rows (no treated arm)
    extra = pd.DataFrame({"z": ["d"] * 50, "t": 0,
                          "y": np.linspace(0, 1, 50)})
    both = pd.concat([df, extra], ignore_index=True)
    r = ipw_ate_report(rd.from_pandas(both), "t", "y",
                       ["z"]).to_pandas().iloc[0]
    assert r["n_off_support"] == 1
    assert r["n_strata"] == 4
    # the estimate over supported strata still recovers the effect
    assert abs(r["ate_ipw"] - 2.0) < 0.25


def test_all_off_support_reports_nan_not_zero(ray_session):
    # every stratum single-armed: 'no overlap' must read as NaN, not 0.0
    df = pd.DataFrame({"z": ["a"] * 30 + ["b"] * 30,
                       "t": [1] * 30 + [0] * 30,
                       "y": np.linspace(0, 1, 60)})
    r = ipw_ate_report(rd.from_pandas(df), "t", "y",
                       ["z"]).to_pandas().iloc[0]
    assert r["n_off_support"] == 2 and r["n_strata"] == 2
    assert np.isnan(r["ate_ipw"]) and np.isnan(r["ate_se"])
    assert np.isfinite(r["naive_diff"])


def test_layout_invariance(ray_session):
    df = _confounded(n=1000, seed=5)
    a = ipw_ate_report(rd.from_pandas(df, override_num_blocks=2),
                       "t", "y", ["z"]).to_pandas()
    b = ipw_ate_report(rd.from_pandas(df, override_num_blocks=9),
                       "t", "y", ["z"]).to_pandas()
    pd.testing.assert_frame_equal(a, b)


def test_guards(ray_session):
    df = _confounded(n=100)
    with pytest.raises(ValueError, match="non-empty"):
        ipw_ate_report(rd.from_pandas(df), "t", "y", [])
    bad = df.assign(t=df["t"] + 1)
    with pytest.raises(Exception, match="binary"):
        ipw_ate_report(rd.from_pandas(bad), "t", "y", ["z"])
