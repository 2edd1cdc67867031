"""Histogram GBDT: exact in-memory reference parity, monotone training
loss, partition invariance, scoring, degenerate features."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from cerberus_ray.pipelines.gbdt import (
    GBDTModel, _apply_tree, _bin_matrix, _margin, _partial_leaf_ids,
    fit_gbdt, quantile_bin_edges, score_gbdt)


def _frame(n=2000, seed=7):
    """Nonlinear target with main effects (so level-wise roots split)
    plus an interaction (so depth-2 beats a single stump)."""
    rng = np.random.default_rng(seed)
    x1 = rng.normal(size=n)
    x2 = rng.uniform(-2, 2, size=n)
    x3 = rng.normal(size=n)          # noise feature
    logits = 1.2 * x1 - 0.8 * x2 + 2.5 * ((x1 > 0.3) & (x2 < 0))
    y = (rng.random(n) < 1 / (1 + np.exp(-logits))).astype(np.int64)
    return pd.DataFrame({"x1": x1, "x2": x2, "x3": x3, "y": y})


def _reference_fit(df, cols, edges, *, n_rounds, depth, lr=0.3,
                   lam=1.0, min_hess=1e-3):
    """Same algorithm, single numpy process, full-matrix histograms."""
    tb = pa.Table.from_pandas(df[cols])
    bins = _bin_matrix(tb, cols, edges)
    y = df["y"].to_numpy(np.float64)
    nb = max(len(e) for e in edges) + 1
    nf = len(cols)
    p0 = min(max(y.mean(), 1e-6), 1 - 1e-6)
    base = float(np.log(p0 / (1 - p0)))
    trees, losses = [], []
    for _ in range(n_rounds):
        n_internal = 2 ** depth - 1
        feat = np.full(n_internal, -1, np.int32)
        split = np.zeros(n_internal, np.int32)
        last = None
        for level in range(depth):
            m = _margin(bins, trees, base)
            p = 1 / (1 + np.exp(-m))
            g, h = p - y, p * (1 - p)
            if level == 0:
                losses.append(round(float(
                    -(y * np.log(np.clip(p, 1e-12, 1))
                      + (1 - y) * np.log(np.clip(1 - p, 1e-12, 1))).mean()),
                    10))
            node = _partial_leaf_ids(bins, feat, split, level)
            G = np.zeros((2 ** level, nf, nb))
            H = np.zeros((2 ** level, nf, nb))
            for j in range(nf):
                idx = node * nb + bins[:, j]
                G[:, j, :] = np.bincount(
                    idx, weights=g, minlength=2 ** level * nb
                ).reshape(2 ** level, nb)
                H[:, j, :] = np.bincount(
                    idx, weights=h, minlength=2 ** level * nb
                ).reshape(2 ** level, nb)
            last = (G, H)
            bi = 2 ** level - 1
            for nd in range(2 ** level):
                gtot, htot = G[nd].sum(), H[nd].sum()
                if htot <= min_hess:
                    continue
                gl = np.cumsum(G[nd][:, :-1], axis=1)
                hl = np.cumsum(H[nd][:, :-1], axis=1)
                gr, hr = gtot - gl, htot - hl
                ok = (hl >= min_hess) & (hr >= min_hess)
                gain = 0.5 * (gl ** 2 / (hl + lam) + gr ** 2 / (hr + lam)
                              - gtot ** 2 / (htot + lam))
                gain = np.where(ok, np.round(gain, 9), -np.inf)
                jj = int(np.argmax(gain))
                if gain.flat[jj] <= 0:
                    continue
                feat[bi + nd] = jj // (nb - 1)
                split[bi + nd] = jj % (nb - 1)
        G, H = last
        leaf = np.zeros(2 ** depth)
        bi = 2 ** (depth - 1) - 1
        for nd in range(2 ** (depth - 1)):
            f = feat[bi + nd]
            if f < 0:
                v = -G[nd].sum() / (H[nd].sum() + lam) * lr
                leaf[2 * nd] = leaf[2 * nd + 1] = v
                continue
            s = split[bi + nd]
            gl, hl = G[nd][f, :s + 1].sum(), H[nd][f, :s + 1].sum()
            gr, hr = G[nd][f].sum() - gl, H[nd][f].sum() - hl
            leaf[2 * nd] = -gl / (hl + lam) * lr
            leaf[2 * nd + 1] = -gr / (hr + lam) * lr
        trees.append({"feat": feat, "split": split, "leaf": leaf})
    return GBDTModel(feature_cols=cols, bin_edges=edges, trees=trees,
                     base_score=base, depth=depth, learning_rate=lr,
                     train_logloss=losses)


COLS = ["x1", "x2", "x3"]


def test_matches_reference(ray_session):
    df = _frame()
    ds = rd.from_pandas(df, override_num_blocks=7)
    m = fit_gbdt(ds, COLS, "y", n_rounds=3, depth=2, n_bins=16)
    ref = _reference_fit(df, COLS, m.bin_edges, n_rounds=3, depth=2)
    for t, rt in zip(m.trees, ref.trees):
        np.testing.assert_array_equal(t["feat"], rt["feat"])
        np.testing.assert_array_equal(t["split"], rt["split"])
        np.testing.assert_allclose(t["leaf"], rt["leaf"], atol=1e-9)
    np.testing.assert_allclose(m.train_logloss[:3], ref.train_logloss,
                               atol=1e-8)


def test_loss_decreases_and_auc(ray_session):
    df = _frame()
    ds = rd.from_pandas(df, override_num_blocks=4)
    m = fit_gbdt(ds, COLS, "y", n_rounds=5, depth=2, n_bins=16)
    ll = m.train_logloss
    assert len(ll) == 6
    assert all(b < a for a, b in zip(ll, ll[1:])), ll
    scored = score_gbdt(ds, m).to_pandas()
    s, y = scored["score"].to_numpy(), scored["y"].to_numpy()
    # main-effect + interaction target: trees must rank well
    order = np.argsort(s)
    ranks = np.empty(len(s)); ranks[order] = np.arange(1, len(s) + 1)
    npos = y.sum()
    auc = (ranks[y == 1].sum() - npos * (npos + 1) / 2) / (
        npos * (len(y) - npos))
    assert auc > 0.85, auc
    assert ((s > 0) & (s < 1)).all()


def test_partition_invariance(ray_session):
    """With fixed bin edges training is exactly layout-invariant
    (histogram partials are pure sums); sketch-derived edges are only
    approximately layout-stable, so loss must agree loosely."""
    df = _frame(n=1200, seed=11)
    edges = quantile_bin_edges(rd.from_pandas(df), COLS, n_bins=16)
    m3 = fit_gbdt(rd.from_pandas(df, override_num_blocks=3), COLS, "y",
                  n_rounds=2, depth=2, bin_edges=edges)
    m13 = fit_gbdt(rd.from_pandas(df, override_num_blocks=13), COLS, "y",
                   n_rounds=2, depth=2, bin_edges=edges)
    for t3, t13 in zip(m3.trees, m13.trees):
        np.testing.assert_array_equal(t3["feat"], t13["feat"])
        np.testing.assert_array_equal(t3["split"], t13["split"])
        np.testing.assert_allclose(t3["leaf"], t13["leaf"], atol=1e-9)
    np.testing.assert_allclose(m3.train_logloss, m13.train_logloss,
                               atol=1e-9)
    # layout-specific sketch edges: same quality, not same trees
    a = fit_gbdt(rd.from_pandas(df, override_num_blocks=3), COLS, "y",
                 n_rounds=2, depth=2, n_bins=16)
    b = fit_gbdt(rd.from_pandas(df, override_num_blocks=13), COLS, "y",
                 n_rounds=2, depth=2, n_bins=16)
    assert abs(a.train_logloss[-1] - b.train_logloss[-1]) < 0.02


def test_feature_importance_ignores_noise(ray_session):
    df = _frame(n=1500, seed=21)
    ds = rd.from_pandas(df, override_num_blocks=4)
    m = fit_gbdt(ds, COLS, "y", n_rounds=4, depth=2, n_bins=16)
    imp = m.feature_importance()
    assert abs(sum(imp.values()) - 1.0) < 1e-6
    assert imp["x3"] < 0.05                 # pure-noise feature
    assert imp["x1"] > 0.3 and imp["x2"] > 0.1


def test_constant_feature_never_chosen_and_depth1(ray_session):
    df = _frame(n=600, seed=3)
    df["const"] = 1.0
    ds = rd.from_pandas(df, override_num_blocks=3)
    m = fit_gbdt(ds, COLS + ["const"], "y", n_rounds=2, depth=1,
                 n_bins=8)
    cidx = 3
    for t in m.trees:
        assert (t["feat"] != cidx).all()
        assert len(t["leaf"]) == 2
    assert m.train_logloss[-1] < m.train_logloss[0]


def test_bin_edges_monotone_and_nan_handling(ray_session):
    df = _frame(n=400, seed=1)
    df.loc[:20, "x1"] = np.nan
    ds = rd.from_pandas(df, override_num_blocks=2)
    edges = quantile_bin_edges(ds, ["x1"], n_bins=8)
    assert (np.diff(edges[0]) > 0).all()
    m = fit_gbdt(ds, ["x1", "x2"], "y", n_rounds=1, depth=1, n_bins=8)
    s = score_gbdt(ds, m).to_pandas()["score"]
    assert s.notna().all()


def test_bad_params(ray_session):
    df = _frame(n=50)
    ds = rd.from_pandas(df)
    with pytest.raises(ValueError):
        fit_gbdt(ds, COLS, "y", n_rounds=0)
    with pytest.raises(ValueError):
        fit_gbdt(ds, COLS, "y", depth=0)
    with pytest.raises(ValueError, match="uint8"):
        fit_gbdt(ds, COLS, "y", n_bins=300)  # would wrap uint8 codes
    with pytest.raises(ValueError, match="255"):
        fit_gbdt(ds, COLS, "y",
                 bin_edges=[np.arange(300.0) for _ in COLS])


def test_l2_regression_objective(ray_session):
    rng = np.random.default_rng(41)
    n = 2000
    x1 = rng.uniform(-2, 2, n)
    x2 = rng.uniform(-2, 2, n)
    y = np.sin(x1) * 2 + (x2 > 0) * 1.5 + rng.normal(0, 0.1, n)
    df = pd.DataFrame({"x1": x1, "x2": x2, "y": y})
    ds = rd.from_pandas(df, override_num_blocks=4)
    m = fit_gbdt(ds, ["x1", "x2"], "y", n_rounds=20, depth=2,
                 n_bins=32, objective="l2", learning_rate=0.3)
    # MSE loss drops by >5x and predictions track the surface
    assert m.train_logloss[-1] < m.train_logloss[0] / 5, \
        m.train_logloss[::5]
    assert abs(m.base_score - y.mean()) < 1e-9
    s = score_gbdt(ds, m).to_pandas()
    resid = s["score"] - s["y"]
    assert resid.abs().mean() < 0.4
    # regression scores are NOT squashed to (0,1)
    assert s["score"].max() > 1.5
    with pytest.raises(ValueError, match="objective"):
        fit_gbdt(ds, ["x1"], "y", objective="huber")
