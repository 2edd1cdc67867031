"""Welch A/B test: DuckDB AVG/VAR_SAMP-derived statistic parity,
planted-effect significance vs null, NaN exclusion, guards."""

import duckdb
import math

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from cerberus_ray.stages.abtest import welch_ab_test


def _frame(effect=0.5, n=2000, seed=3):
    rng = np.random.default_rng(seed)
    return pd.DataFrame({
        "arm": ["control"] * n + ["treatment"] * n,
        "m": np.r_[rng.normal(10, 2, n), rng.normal(10 + effect, 2, n)],
        "noise": rng.normal(0, 1, 2 * n)})


def test_duckdb_statistic_parity(ray_session):
    df = _frame()
    got = welch_ab_test(rd.from_pandas(df, override_num_blocks=5),
                        "arm", ["m"], control="control",
                        treatment="treatment").iloc[0]
    nc, mc, vc, nt, mt, vt = duckdb.sql(
        "SELECT COUNT(*) FILTER (arm='control'),"
        " AVG(m) FILTER (arm='control'),"
        " VAR_SAMP(m) FILTER (arm='control'),"
        " COUNT(*) FILTER (arm='treatment'),"
        " AVG(m) FILTER (arm='treatment'),"
        " VAR_SAMP(m) FILTER (arm='treatment') FROM df").fetchone()
    se2 = vc / nc + vt / nt
    t = (mt - mc) / math.sqrt(se2)
    assert abs(got["t_stat"] - t) < 1e-5
    assert got["n_control"] == nc and got["n_treatment"] == nt
    assert abs(got["mean_treatment"] - mt) < 1e-6


def test_effect_detected_null_not(ray_session):
    df = _frame(effect=0.5)
    r = welch_ab_test(rd.from_pandas(df), "arm", ["m", "noise"],
                      control="control", treatment="treatment")
    r = r.set_index("metric")
    assert r.loc["m", "p_approx"] < 1e-6        # real effect
    assert r.loc["m", "lift"] > 0.03
    assert r.loc["noise", "p_approx"] > 0.01    # null metric


def test_nan_rows_excluded(ray_session):
    df = _frame(n=200)
    df.loc[::5, "m"] = np.nan
    got = welch_ab_test(rd.from_pandas(df, override_num_blocks=3),
                        "arm", ["m"], control="control",
                        treatment="treatment").iloc[0]
    assert got["n_control"] == (df["arm"] == "control").sum() - 40


def test_tiny_group_raises(ray_session):
    df = pd.DataFrame({"arm": ["control", "treatment"], "m": [1.0, 2.0]})
    with pytest.raises(ValueError):
        welch_ab_test(rd.from_pandas(df), "arm", ["m"],
                      control="control", treatment="treatment")


def test_bh_adjustment(ray_session):
    from cerberus_ray.stages.abtest import bh_adjust

    # textbook example: BH on sorted p-values
    p = [0.01, 0.04, 0.03, 0.005, 0.2]
    q = bh_adjust(p)
    # reference: statsmodels-equivalent step-up by hand
    import numpy as np

    order = np.argsort(p)
    ranked = np.array(p)[order] * len(p) / (np.arange(len(p)) + 1)
    ref = np.minimum.accumulate(ranked[::-1])[::-1]
    want = np.empty(len(p)); want[order] = np.minimum(ref, 1.0)
    np.testing.assert_allclose(q, want)
    assert (q >= np.array(p) - 1e-12).all()      # q ≥ p always
    assert q.max() <= 1.0
    # the report carries the q-value column
    df = _frame(effect=0.5, n=500)
    r = welch_ab_test(rd.from_pandas(df), "arm", ["m", "noise"],
                      control="control", treatment="treatment")
    assert "p_bh" in r.columns
    assert (r["p_bh"] >= r["p_approx"] - 1e-12).all()


def test_cuped_variance_reduction(ray_session):
    import ray.data as rd

    from cerberus_ray.stages.abtest import cuped_ab_test

    # covariate strongly predicts the metric; a small true lift hides
    # in the raw variance but CUPED exposes it
    rng = np.random.default_rng(47)
    n = 4000
    pre = rng.normal(10, 3, n)
    arm = np.where(np.arange(n) % 2 == 0, "A", "B")
    lift = np.where(arm == "B", 0.3, 0.0)
    y = pre * 1.0 + lift + rng.normal(0, 0.5, n)
    df = pd.DataFrame({"arm": arm, "y": y, "pre": pre})
    out = cuped_ab_test(rd.from_pandas(df, override_num_blocks=4),
                        "arm", "y", "pre", control="A",
                        treatment="B").iloc[0]
    # θ ≈ 1 (slope of y on pre), large variance reduction, both lifts
    # near the truth, CUPED t much bigger
    np.testing.assert_allclose(out["theta"], 1.0, atol=0.05)
    assert out["var_reduction"] > 0.9
    np.testing.assert_allclose(out["lift_cuped"], 0.3, atol=0.1)
    assert abs(out["t_cuped"]) > 3 * abs(out["t_raw"])
    assert out["p_cuped"] < 0.001


def test_cuped_numpy_reference_and_unbiasedness(ray_session):
    import ray.data as rd

    from cerberus_ray.stages.abtest import cuped_ab_test

    rng = np.random.default_rng(53)
    n = 1000
    pre = rng.normal(0, 1, n)
    arm = np.where(rng.random(n) < 0.5, "A", "B")
    y = 0.7 * pre + rng.normal(0, 1, n)
    df = pd.DataFrame({"arm": arm, "y": y, "pre": pre})
    out = cuped_ab_test(rd.from_pandas(df, override_num_blocks=3),
                        "arm", "y", "pre", control="A",
                        treatment="B").iloc[0]
    # numpy reference for theta (pooled) and adjusted means
    theta = np.cov(pre, y, ddof=1)[0, 1] / np.var(pre, ddof=1)
    np.testing.assert_allclose(out["theta"], theta, atol=1e-4)
    yadj = y - theta * (pre - pre.mean())
    la = yadj[arm == "B"].mean() - yadj[arm == "A"].mean()
    np.testing.assert_allclose(out["lift_cuped"], la, atol=1e-4)
    # no true effect → CUPED must not invent one
    assert out["p_cuped"] > 0.01


def test_cuped_guards_and_determinism(ray_session):
    import pytest as _pytest
    import ray.data as rd

    from cerberus_ray.stages.abtest import cuped_ab_test

    df = pd.DataFrame({"arm": ["A", "B"], "y": [1.0, 2.0],
                       "pre": [0.0, 1.0]})
    with _pytest.raises(ValueError):
        cuped_ab_test(rd.from_pandas(df), "arm", "y", "pre",
                      control="A", treatment="B")
    rng = np.random.default_rng(59)
    big = pd.DataFrame({
        "arm": rng.choice(["A", "B"], 500),
        "y": rng.normal(size=500), "pre": rng.normal(size=500)})
    a = cuped_ab_test(rd.from_pandas(big, override_num_blocks=1),
                      "arm", "y", "pre", control="A", treatment="B")
    b = cuped_ab_test(rd.from_pandas(big, override_num_blocks=6),
                      "arm", "y", "pre", control="A", treatment="B")
    pd.testing.assert_frame_equal(a, b)
