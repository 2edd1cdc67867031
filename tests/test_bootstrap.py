"""Poisson bootstrap CI: coverage of the true mean, agreement with the
normal-theory interval, exact partition invariance, determinism,
guards."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from cerberus_ray.stages.bootstrap import bootstrap_mean_ci


def _frame(n=20_000, mu=7.0, sd=2.0, seed=3):
    rng = np.random.default_rng(seed)
    return pd.DataFrame({"k": np.arange(n, dtype=np.int64),
                         "v": rng.normal(mu, sd, n)})


def test_ci_covers_and_matches_normal_theory(ray_session):
    df = _frame()
    r = bootstrap_mean_ci(rd.from_pandas(df, override_num_blocks=6),
                          "v", "k", n_replicas=300)
    assert r["ci_lo"] < 7.0 < r["ci_hi"]
    assert abs(r["mean"] - df["v"].mean()) < 1e-12
    # bootstrap SE ≈ sd/sqrt(n) within 25%
    theory = df["v"].std(ddof=1) / np.sqrt(len(df))
    assert 0.75 * theory < r["se"] < 1.25 * theory
    # interval width ≈ 2·1.96·se
    width = r["ci_hi"] - r["ci_lo"]
    assert 0.7 * 3.92 * theory < width < 1.3 * 3.92 * theory


def test_exact_partition_invariance(ray_session):
    df = _frame(n=3000, seed=9)
    outs = [bootstrap_mean_ci(
        rd.from_pandas(df, override_num_blocks=b), "v", "k",
        n_replicas=50) for b in (1, 11)]
    # weights are pure in (key, replica); only float summation GROUPING
    # differs across layouts → identical to the last ulp-or-two
    for key in ("mean", "ci_lo", "ci_hi", "se"):
        assert abs(outs[0][key] - outs[1][key]) < 1e-10, key
    assert outs[0]["n"] == outs[1]["n"]
    # same layout, rerun → bit-identical
    again = bootstrap_mean_ci(
        rd.from_pandas(df, override_num_blocks=11), "v", "k",
        n_replicas=50)
    assert again == outs[1]


def test_nan_excluded_and_guards(ray_session):
    df = _frame(n=500)
    df.loc[::5, "v"] = np.nan
    r = bootstrap_mean_ci(rd.from_pandas(df), "v", "k", n_replicas=30)
    assert r["n"] == 400
    with pytest.raises(ValueError):
        bootstrap_mean_ci(rd.from_pandas(df), "v", "k", alpha=2.0)
    empty = pd.DataFrame({"k": [1], "v": [np.nan]})
    with pytest.raises(ValueError):
        bootstrap_mean_ci(rd.from_pandas(empty), "v", "k")
