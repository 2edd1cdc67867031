"""Implicit ALS: dense numpy reference parity, monotone objective,
planted-preference recovery, layout invariance, guards."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from cerberus_ray.pipelines.als import (fit_implicit_als,
                                        recommend_items)

ITEMS = ["click", "play", "purchase", "return", "share", "view"]


def _log(n_users=40, seed=3):
    """Two planted cohorts: even users interact with items 0-2, odd
    users with items 3-5 (plus sparse noise)."""
    rng = np.random.default_rng(seed)
    rows = []
    for u in range(n_users):
        pref = ITEMS[:3] if u % 2 == 0 else ITEMS[3:]
        for _ in range(rng.integers(5, 12)):
            rows.append((f"u{u:03d}", rng.choice(pref)))
        if rng.random() < 0.3:
            rows.append((f"u{u:03d}", rng.choice(ITEMS)))
    return pd.DataFrame(rows, columns=["user_id", "item"])


def _reference(df, k, alpha, reg, iters, seed):
    """Dense implicit ALS (Hu et al. 2008), identical init."""
    users = np.sort(df["user_id"].unique())
    items = sorted(df["item"].unique())
    uidx = {u: i for i, u in enumerate(users)}
    iidx = {v: i for i, v in enumerate(items)}
    cnt = np.zeros((len(users), len(items)))
    for u, it in df.itertuples(index=False):
        cnt[uidx[u], iidx[it]] += 1
    C = 1.0 + alpha * cnt
    P = (cnt > 0).astype(np.float64)
    rng = np.random.default_rng(seed)
    Y = 0.1 * rng.standard_normal((len(items), k))
    X = np.zeros((len(users), k))
    eye = reg * np.eye(k)
    losses = []
    for _ in range(iters):
        YtY = Y.T @ Y
        for u in range(len(users)):
            cu = C[u]
            A = YtY + (Y.T * (cu - 1.0)) @ Y + eye
            X[u] = np.linalg.solve(A, Y.T @ (cu * P[u]))
        S = X @ Y.T
        loss = float((C * (P - S) ** 2).sum()
                     + reg * ((X ** 2).sum() + (Y ** 2).sum()))
        losses.append(loss)
        XtX = X.T @ X
        for i in range(len(items)):
            ci = C[:, i]
            A = XtX + (X.T * (ci - 1.0)) @ X + eye
            Y[i] = np.linalg.solve(A, X.T @ (ci * P[:, i]))
    return users, items, X, Y, losses


def test_matches_dense_reference(ray_session):
    df = _log()
    m = fit_implicit_als(rd.from_pandas(df, override_num_blocks=5),
                         "user_id", "item", k=4, alpha=20.0, reg=0.5,
                         n_iters=4, n_buckets=8, seed=11)
    users, items, X, Y, losses = _reference(df, 4, 20.0, 0.5, 4, 11)
    assert list(m.item_ids) == items
    np.testing.assert_allclose(m.item_factors, Y, atol=1e-8)
    np.testing.assert_allclose(m.losses, losses, rtol=1e-9)
    uf = (m.user_factors.to_pandas()
          .sort_values("user_id").reset_index(drop=True))
    assert list(uf["user_id"]) == list(users)
    got = uf[[f"f{j}" for j in range(4)]].to_numpy()
    # user_factors are the half-step AFTER the last item solve — one
    # extra user solve vs the reference loop's X; recompute it
    eye = 0.5 * np.eye(4)
    C = None
    ref_final = np.zeros_like(X)
    cntm = pd.crosstab(df["user_id"], df["item"]).reindex(
        index=users, columns=items, fill_value=0).to_numpy(np.float64)
    Cm = 1.0 + 20.0 * cntm
    Pm = (cntm > 0).astype(np.float64)
    YtY = Y.T @ Y
    for u in range(len(users)):
        A = YtY + (Y.T * (Cm[u] - 1.0)) @ Y + eye
        ref_final[u] = np.linalg.solve(A, Y.T @ (Cm[u] * Pm[u]))
    np.testing.assert_allclose(got, ref_final, atol=1e-8)


def test_monotone_loss_and_recovery(ray_session):
    df = _log(n_users=60, seed=9)
    m = fit_implicit_als(rd.from_pandas(df, override_num_blocks=4),
                         "user_id", "item", k=6, alpha=40.0, reg=0.1,
                         n_iters=6, n_buckets=8)
    assert all(b <= a * (1 + 1e-9) for a, b in
               zip(m.losses, m.losses[1:])), m.losses
    recs = recommend_items(m, top_n=1).to_pandas()
    recs["u"] = recs["user_id"].str[1:].astype(int)
    even = recs[recs["u"] % 2 == 0]["item"]
    odd = recs[recs["u"] % 2 == 1]["item"]
    assert (even.isin(ITEMS[:3])).mean() > 0.9
    assert (odd.isin(ITEMS[3:])).mean() > 0.9


def test_user_col_starting_with_f(ray_session):
    # recommend_items must use the fit-time column name, not infer it
    # from the schema (a 'from_id' key would look like a factor column)
    df = _log(n_users=20, seed=3).rename(columns={"user_id": "from_id"})
    m = fit_implicit_als(rd.from_pandas(df), "from_id", "item", k=4,
                         n_iters=3, materialize_users=True)
    recs = recommend_items(m, top_n=2).to_pandas()
    assert "from_id" in recs.columns
    assert set(recs["from_id"]) == set(df["from_id"])


def test_layout_invariance(ray_session):
    df = _log(n_users=30, seed=5)
    a = fit_implicit_als(rd.from_pandas(df, override_num_blocks=2),
                         "user_id", "item", k=3, n_iters=3,
                         n_buckets=4)
    b = fit_implicit_als(rd.from_pandas(df, override_num_blocks=11),
                         "user_id", "item", k=3, n_iters=3,
                         n_buckets=16)
    np.testing.assert_allclose(a.item_factors, b.item_factors,
                               atol=1e-8)
    np.testing.assert_allclose(a.losses, b.losses, rtol=1e-8)


def test_driver_bucket_mode_agreement(ray_session):
    df = _log(n_users=25, seed=12)
    ds = rd.from_pandas(df, override_num_blocks=3)
    a = fit_implicit_als(ds, "user_id", "item", k=3, n_iters=3,
                         n_buckets=4, mode="driver")
    b = fit_implicit_als(ds, "user_id", "item", k=3, n_iters=3,
                         n_buckets=4, mode="bucket")
    np.testing.assert_allclose(a.item_factors, b.item_factors,
                               atol=1e-9)
    np.testing.assert_allclose(a.losses, b.losses, rtol=1e-9)
    ua = a.user_factors.to_pandas().sort_values("user_id")
    ub = b.user_factors.to_pandas().sort_values("user_id")
    np.testing.assert_allclose(
        ua[[f"f{j}" for j in range(3)]].to_numpy(),
        ub[[f"f{j}" for j in range(3)]].to_numpy(), atol=1e-9)


def test_count_col_equivalent_to_repeats(ray_session):
    df = _log(n_users=20, seed=7)
    pre = (df.groupby(["user_id", "item"], as_index=False)
           .size().rename(columns={"size": "n"}))
    a = fit_implicit_als(rd.from_pandas(df), "user_id", "item",
                         k=3, n_iters=2, n_buckets=4)
    b = fit_implicit_als(rd.from_pandas(pre), "user_id", "item",
                         k=3, n_iters=2, n_buckets=4, count_col="n")
    np.testing.assert_allclose(a.item_factors, b.item_factors,
                               atol=1e-9)


def test_guards(ray_session):
    df = _log(n_users=10)
    with pytest.raises(ValueError, match="max_items"):
        fit_implicit_als(rd.from_pandas(df), "user_id", "item",
                         max_items=2)
    m = fit_implicit_als(rd.from_pandas(df), "user_id", "item",
                         k=3, n_iters=1, materialize_users=False)
    with pytest.raises(ValueError, match="materialize_users"):
        recommend_items(m)
