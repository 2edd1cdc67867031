"""Bucketed MMD two-sample drift: closed-form parity, null
calibration, planted-shift detection, determinism."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from cerberus_ray.stages import mmd as M


def _gauss_frame(n, d, seed, shift=0.0):
    rng = np.random.default_rng(seed)
    V = rng.normal(size=(n, d))
    V[:, 0] += shift
    return pd.DataFrame({"vec_id": np.arange(n, dtype=np.int64),
                         "embedding": list(V.astype(np.float32))})


def test_mmd2_unbiased_matches_naive_loop():
    rng = np.random.default_rng(0)
    X, Y = rng.normal(size=(6, 3)), rng.normal(size=(5, 3))
    gamma = 0.37
    got = M.mmd2_unbiased(X, Y, gamma)
    k = lambda a, b: np.exp(-gamma * ((a - b) ** 2).sum())
    sxx = np.mean([k(X[i], X[j]) for i in range(6) for j in range(6)
                   if i != j])
    syy = np.mean([k(Y[i], Y[j]) for i in range(5) for j in range(5)
                   if i != j])
    sxy = np.mean([k(x, y) for x in X for y in Y])
    assert abs(got - (sxx + syy - 2 * sxy)) < 1e-12
    # identical samples → MMD²_u ≈ 0 up to the unbiasing correction
    assert abs(M.mmd2_unbiased(X, X, gamma)) < 0.25


def test_mmd_null_vs_shift_and_determinism(ray_session):
    ds_x = rd.from_pandas(_gauss_frame(300, 8, seed=1))
    ds_null = rd.from_pandas(_gauss_frame(300, 8, seed=2))
    ds_shift = rd.from_pandas(_gauss_frame(300, 8, seed=3, shift=2.0))

    null = M.mmd_drift_summary(ds_x, ds_null, n_buckets=6,
                               n_perm=100, seed=42).to_pandas()
    assert not null["drift"].iloc[0]
    assert null["n_tested"].iloc[0] == 6

    shift = M.mmd_drift_summary(ds_x, ds_shift, n_buckets=6,
                                n_perm=100, seed=42).to_pandas()
    assert shift["drift"].iloc[0]
    assert shift["n_reject"].iloc[0] >= shift["binom_crit"].iloc[0]
    assert shift["mean_mmd2"].iloc[0] > null["mean_mmd2"].iloc[0]

    # deterministic across calls (counter-based buckets/perms/bandwidth)
    a = M.mmd_drift_buckets(ds_x, ds_shift, n_buckets=6, n_perm=50,
                            seed=42)
    b = M.mmd_drift_buckets(ds_x, ds_shift, n_buckets=6, n_perm=50,
                            seed=42)
    assert a.equals(b)
    assert a.num_rows == 6


def test_mmd_degenerate_bucket(ray_session):
    """A side too small to populate every bucket yields NaN/no-verdict
    rows, never a crash, and the summary only counts tested buckets."""
    ds_x = rd.from_pandas(_gauss_frame(40, 4, seed=5))
    ds_y = rd.from_pandas(_gauss_frame(3, 4, seed=6))
    s = M.mmd_drift_summary(ds_x, ds_y, n_buckets=8, n_perm=20,
                            seed=42).to_pandas()
    assert s["n_tested"].iloc[0] <= s["n_buckets"].iloc[0]
    per = M.mmd_drift_buckets(ds_x, ds_y, n_buckets=8, n_perm=20,
                              seed=42).to_pandas()
    skipped = per[per["mmd2"].isna()]
    assert (~skipped["reject"]).all()
