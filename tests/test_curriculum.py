"""Curriculum ordering: bins ascend with difficulty, rows preserved,
seeded determinism across layouts, interleave keeps same-domain runs
short, run-length stitch handles block boundaries."""

import numpy as np
import pandas as pd
import ray.data as rd

from cerberus_ray.pipelines.curriculum import (curriculum_order,
                                               run_length_report)


def _corpus(n=3000, seed=11):
    rng = np.random.default_rng(seed)
    return pd.DataFrame({
        "doc_id": np.arange(n, dtype=np.int64),
        "lang": rng.choice(["en", "de", "fr"], n, p=[0.5, 0.3, 0.2]),
        "difficulty": rng.gamma(2.0, 10.0, n)})


def test_order_properties(ray_session):
    df = _corpus()
    ordered = curriculum_order(
        rd.from_pandas(df, override_num_blocks=6), "doc_id",
        "difficulty", n_bins=4).to_pandas()
    # every row survives exactly once
    assert sorted(ordered["doc_id"]) == list(range(len(df)))
    # bins are non-decreasing along the output
    assert (np.diff(ordered["bin"]) >= 0).all()
    # difficulty bins are ordered: every bin-b difficulty ≤ every
    # bin-(b+1) threshold crossing — check via bin means monotone
    means = ordered.groupby("bin")["difficulty"].mean()
    assert means.is_monotonic_increasing
    # roughly equal-mass bins (quantile thresholds)
    sizes = ordered["bin"].value_counts()
    assert sizes.max() / sizes.min() < 1.3


def test_interleave_short_runs(ray_session):
    df = _corpus()
    ordered = curriculum_order(
        rd.from_pandas(df, override_num_blocks=6), "doc_id",
        "difficulty", n_bins=4)
    rep = run_length_report(ordered, "lang").set_index("domain")
    # geometric run bound: majority domain p=0.5 over 3000 rows →
    # P(run ≥ 25) is ~3000·0.5²⁵ ≈ 1e-4; assert a loose cap
    assert rep["max_run"].max() < 30
    np.testing.assert_allclose(rep["share"].sum(), 1.0, atol=1e-5)
    assert rep["n"].sum() == len(df)


def test_determinism_and_anticurriculum(ray_session):
    df = _corpus()
    a = curriculum_order(rd.from_pandas(df, override_num_blocks=1),
                         "doc_id", "difficulty").to_pandas()
    b = curriculum_order(rd.from_pandas(df, override_num_blocks=8),
                         "doc_id", "difficulty").to_pandas()
    pd.testing.assert_frame_equal(a, b)
    rev = curriculum_order(rd.from_pandas(df), "doc_id", "difficulty",
                           ascending=False).to_pandas()
    assert rev.groupby("bin")["difficulty"].mean().is_monotonic_decreasing


def test_run_length_boundary_stitch(ray_session):
    # a run spanning three whole blocks stitches to one run of 9
    df = pd.DataFrame({"d": ["a"] * 9 + ["b"] * 3})
    ds = rd.from_pandas(df, override_num_blocks=4)  # 3-row blocks
    rep = run_length_report(ds, "d").set_index("domain")
    assert rep.loc["a", "max_run"] == 9
    assert rep.loc["b", "max_run"] == 3
    assert rep.loc["a", "n"] == 9
