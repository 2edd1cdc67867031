"""Isolation forest: per-row reference parity, planted-outlier
separation, determinism + layout invariance, NaN routing, guards."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from cerberus_ray.pipelines.iforest import (_c, fit_iforest,
                                            score_iforest)


def _frame(n=800, n_out=12, seed=9):
    rng = np.random.default_rng(seed)
    X = rng.standard_normal((n, 3))
    out = rng.uniform(8, 12, size=(n_out, 3)) * rng.choice(
        [-1, 1], size=(n_out, 3))
    df = pd.DataFrame(np.vstack([X, out]), columns=["a", "b", "c"])
    df["is_outlier"] = [0] * n + [1] * n_out
    return df


def _ref_path(x, tree):
    """Per-row python traversal — the vectorized walk's oracle."""
    node, depth = 0, 0.0
    while tree["feat"][node] >= 0:
        f = tree["feat"][node]
        node = (tree["left"][node] if x[f] < tree["thr"][node]
                else tree["right"][node])
        depth += 1.0
    return depth + tree["adj"][node]


def test_scores_match_per_row_reference(ray_session):
    df = _frame(n=200, n_out=5)
    ds = rd.from_pandas(df, override_num_blocks=3)
    m = fit_iforest(ds, ["a", "b", "c"], n_trees=20, subsample=64)
    scored = score_iforest(ds, m).to_pandas()
    cn = float(_c(np.array([m.subsample]))[0])
    X = df[["a", "b", "c"]].to_numpy(np.float64)
    exp = np.array([
        2.0 ** (-np.mean([_ref_path(x, t) for t in m.trees]) / cn)
        for x in X])
    # scored rows keep input order within map_batches; sort by key cols
    got = scored.sort_values(["a", "b", "c"])["anomaly_score"].to_numpy()
    want = df.assign(e=exp).sort_values(["a", "b", "c"])["e"].to_numpy()
    np.testing.assert_allclose(got, want, atol=1e-12)


def test_planted_outliers_separate(ray_session):
    df = _frame()
    ds = rd.from_pandas(df, override_num_blocks=5)
    m = fit_iforest(ds, ["a", "b", "c"], n_trees=100)
    s = score_iforest(ds, m).to_pandas()
    top = s.nlargest(12, "anomaly_score")
    assert top["is_outlier"].mean() > 0.9
    assert (s[s["is_outlier"] == 1]["anomaly_score"].min()
            > s[s["is_outlier"] == 0]["anomaly_score"].quantile(0.99))


def test_determinism_and_layout_invariance(ray_session):
    df = _frame(n=300, n_out=6, seed=4)
    m1 = fit_iforest(rd.from_pandas(df, override_num_blocks=2),
                     ["a", "b", "c"], n_trees=15, subsample=64)
    m2 = fit_iforest(rd.from_pandas(df, override_num_blocks=2),
                     ["a", "b", "c"], n_trees=15, subsample=64)
    for t1, t2 in zip(m1.trees, m2.trees):
        np.testing.assert_array_equal(t1["feat"], t2["feat"])
        np.testing.assert_allclose(t1["thr"], t2["thr"])
    # fixed model → identical scores regardless of scoring layout
    a = (score_iforest(rd.from_pandas(df, override_num_blocks=2), m1)
         .to_pandas().sort_values(["a", "b"])["anomaly_score"])
    b = (score_iforest(rd.from_pandas(df, override_num_blocks=9), m1)
         .to_pandas().sort_values(["a", "b"])["anomaly_score"])
    np.testing.assert_allclose(a.to_numpy(), b.to_numpy(), atol=0)


def test_nan_rows_score_null(ray_session):
    df = _frame(n=100, n_out=2)
    df.loc[3, "a"] = np.nan
    ds = rd.from_pandas(df)
    m = fit_iforest(ds, ["a", "b", "c"], n_trees=10, subsample=32)
    s = score_iforest(ds, m).to_pandas()
    assert s["anomaly_score"].isna().sum() == 1
    assert s.loc[s["a"].isna(), "anomaly_score"].isna().all()


def test_guards(ray_session):
    df = _frame(n=50, n_out=1)
    with pytest.raises(ValueError):
        fit_iforest(rd.from_pandas(df), ["a"], n_trees=0)
    with pytest.raises(ValueError):
        fit_iforest(rd.from_pandas(df), ["a"], subsample=1)
