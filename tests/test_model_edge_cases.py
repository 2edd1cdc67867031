"""Regression tests for the round-5 model-family review findings:
degenerate inputs (constant features, zero-probability symbols,
empty blocks), init validation, skewed-length HMM memory chunking,
and DuckDB regr_r2 parity for constant-y groups."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd


def test_gbdt_all_constant_features(ray_session):
    """Zero interior bin edges everywhere → a degenerate base-score
    model, not an argmax-of-empty crash."""
    from cerberus_ray.pipelines.gbdt import fit_gbdt, score_gbdt

    df = pd.DataFrame({
        "f0": [1.0] * 40, "f1": [2.0] * 40,
        "label": [0, 1] * 20})
    m = fit_gbdt(rd.from_pandas(df, override_num_blocks=2).materialize(),
                 ["f0", "f1"], "label", n_rounds=2, depth=2)
    out = score_gbdt(rd.from_pandas(df), m).to_pandas()
    # all rows identical → one shared score near the base rate
    assert out["score"].nunique() == 1
    assert 0.3 < out["score"].iloc[0] < 0.7


def test_gmm_custom_component_count_and_init_validation(ray_session):
    from cerberus_ray.pipelines.gmm import fit_gmm

    rng = np.random.default_rng(0)
    df = pd.DataFrame({
        "embedding": [rng.normal(size=4).tolist() for _ in range(60)]})
    ds = rd.from_pandas(df, override_num_blocks=3).materialize()
    mu = np.array([[0.0] * 4, [1.0] * 4, [-1.0] * 4])
    var = np.ones((3, 4))
    w = np.full(3, 1 / 3)
    # 3 components with the default k=4 parameter: reshape must follow
    # the EFFECTIVE count
    m = fit_gmm(ds, init_means=mu, init_variances=var, init_weights=w,
                n_iters=2)
    assert m.k == 3 and m.means.shape == (3, 4)
    with pytest.raises(ValueError, match="init_variances"):
        fit_gmm(ds, init_means=mu)


def test_hmm_validates_n_iters_and_survives_degenerate_params(
        ray_session):
    from cerberus_ray.pipelines.hmm import fit_hmm, forward_backward

    df = pd.DataFrame({
        "k": ["a"] * 4 + ["b"] * 4,
        "ts": list(range(4)) * 2,
        "obs": ["x", "y", "x", "y"] * 2})
    ds = rd.from_pandas(df).materialize()
    with pytest.raises(ValueError, match="n_iters"):
        fit_hmm(ds, "k", "ts", "obs", n_iters=0)
    # zero-probability first observation must not NaN-poison the stats
    pi = np.array([1.0, 0.0])
    A = np.array([[0.5, 0.5], [0.5, 0.5]])
    B = np.array([[0.0, 1.0], [1.0, 0.0]])   # state 0 never emits sym 0
    g, xi, ll = forward_backward(np.array([0, 1]), pi, A, B)
    assert np.isfinite(ll) and np.isfinite(g).all()


def test_hmm_skewed_lengths_chunking_agreement(ray_session):
    """One long sequence among many short ones: the chunked padded
    batches must reproduce the unchunked fit (same sufficient stats up
    to float addition order)."""
    from cerberus_ray.pipelines.hmm import fit_hmm

    rng = np.random.default_rng(1)
    rows = []
    for i in range(30):
        for t in range(3):
            rows.append({"k": f"s{i:02d}", "ts": t,
                         "obs": str(rng.integers(0, 3))})
    for t in range(400):  # the one long sequence
        rows.append({"k": "long", "ts": t,
                     "obs": str(rng.integers(0, 3))})
    df = pd.DataFrame(rows)
    ds = rd.from_pandas(df).materialize()
    m = fit_hmm(ds, "k", "ts", "obs", n_states=2, n_iters=4)
    assert np.isfinite(m.loglik[-1])
    assert np.allclose(m.A.sum(axis=1), 1.0)
    assert np.allclose(m.B.sum(axis=1), 1.0)


def test_grouped_ols_constant_y_matches_duckdb(ray_session):
    """regr_r2 semantics: constant y with varying x is a PERFECT fit
    (1.0), NULL only when var(x)=0."""
    import duckdb

    from cerberus_ray.pipelines.linreg import grouped_simple_ols

    df = pd.DataFrame({
        "g": ["flat"] * 4 + ["norm"] * 4,
        "x": [1.0, 2.0, 3.0, 4.0] * 2,
        "y": [5.0, 5.0, 5.0, 5.0, 1.0, 2.0, 2.5, 4.0]})
    out = grouped_simple_ols(rd.from_pandas(df), "g", "x", "y")
    got = dict(zip(out["g"], out["r2"]))
    con = duckdb.connect()
    con.register("t", df)
    ref = dict(con.execute(
        "SELECT g, regr_r2(y, x) FROM t GROUP BY g").fetchall())
    assert got["flat"] == ref["flat"] == 1.0
    assert abs(got["norm"] - ref["norm"]) < 1e-9


def test_calibration_curve_drops_nan_probs(ray_session):
    from cerberus_ray.pipelines.logreg import calibration_curve

    df = pd.DataFrame({
        "p": [0.05, 0.05, np.nan, 0.95],
        "label": [0, 0, 1, 1]})
    out = calibration_curve(rd.from_pandas(df), n_bins=10)
    assert int(out["n"].sum()) == 3          # the NaN row is excluded
    assert np.isfinite(out["mean_p"]).all()


def test_coxph_survives_empty_and_allnan_blocks(ray_session):
    from cerberus_ray.pipelines.coxph import fit_coxph

    rng = np.random.default_rng(2)
    good = pd.DataFrame({
        "x": rng.normal(size=40),
        "time": rng.exponential(size=40) + 0.1,
        "event": rng.integers(0, 2, size=40).astype(float)})
    bad = pd.DataFrame({"x": [np.nan] * 5,
                        "time": [np.nan] * 5,
                        "event": [np.nan] * 5})
    ds = rd.from_pandas(pd.concat([bad, good], ignore_index=True),
                        override_num_blocks=4)
    m = fit_coxph(ds, "time", "event", ["x"], n_iters=3)
    assert np.isfinite(m.coef).all()
    allnan = rd.from_pandas(bad)
    with pytest.raises(ValueError, match="no complete"):
        fit_coxph(allnan, "time", "event", ["x"], n_iters=1)


def test_poisson_rejects_negative_outcomes(ray_session):
    from cerberus_ray.pipelines.poisson import fit_poisson

    df = pd.DataFrame({"x": [1.0, 2.0, 3.0, 4.0],
                       "y": [-5.0, 10.0, 12.0, 9.0]})
    with pytest.raises(ValueError, match="non-negative"):
        fit_poisson(rd.from_pandas(df), ["x"], "y", n_iters=2)


def test_iforest_ulp_range_and_null_scores(ray_session):
    from cerberus_ray.pipelines.iforest import fit_iforest, score_iforest

    # near-degenerate feature: values an ulp apart → uniform() can
    # return exactly lo; must fit, not crash
    df = pd.DataFrame({
        "a": [1.0, 1.0 + 1e-16] * 20,
        "b": np.arange(40, dtype=float)})
    m = fit_iforest(rd.from_pandas(df), ["a", "b"], n_trees=20,
                    subsample=16)
    nan_df = pd.DataFrame({"a": [1.0, np.nan], "b": [2.0, 3.0]})
    scored = score_iforest(rd.from_pandas(nan_df), m)
    t = scored.to_arrow_refs()
    import ray as _ray
    tab = _ray.get(t[0])
    col = tab["anomaly_score"]
    assert col.null_count == 1  # a REAL null, not a NaN float


def test_nmf_empty_raises(ray_session):
    from cerberus_ray.pipelines.nmf import fit_nmf

    empty = rd.from_pandas(pd.DataFrame({"text": pd.Series(dtype=str)}))
    with pytest.raises((ValueError, Exception)):
        fit_nmf(empty, k=2)


def test_copula_erf_accuracy():
    import math

    from cerberus_ray.pipelines.copula import _erf

    xs = np.linspace(-4, 4, 2001)
    ref = np.array([math.erf(x) for x in xs])
    assert np.abs(_erf(xs) - ref).max() < 2e-7
