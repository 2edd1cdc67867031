"""Kernel two-sample drift test on embedding columns: bucketed unbiased
MMD² (maximum mean discrepancy, Gretton et al. 2012) with an RBF kernel
and a within-bucket permutation null.

The multivariate complement of the per-feature KS/PSI checks in
`stages/drift.py` and the classifier C2ST (`pipelines/c2st.py`): MMD
sees JOINT distribution shift directly in embedding space with no
model fit, and the permutation test gives a calibrated reject/accept
per bucket.

Scale shape (the B-test of Zaremba et al. 2013): rows hash-bucket by id
into ``n_buckets`` groups, each bucket computes its own unbiased MMD²
and permutation p-value on a (m+n)² kernel matrix bounded by the
bucket size — choosing n_buckets ∝ rows keeps per-task work constant,
the whole test is ONE keyed exchange (vectors ride the shuffle once,
like embedding near-dup), and the driver sees only per-bucket verdict
rows. Under H₀ each bucket is an independent level-α test, so the
cross-bucket rejection count is Binomial(B, α) — the summary flags
drift when the observed rejections exceed the Binomial tail bound, a
combination rule that needs no cross-bucket data movement.

Determinism: bucket assignment, the bandwidth sample (global K smallest
id hashes — layout-invariant) and the permutation draws (Generator
seeded per bucket) are all counter-based on ids, so reruns and block
layouts reproduce identical reports.

Tests: tests/test_mmd.py (closed-form parity, null calibration,
planted-shift detection, determinism).
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pandas as pd
import pyarrow as pa

from ..determinism import hash_idx

__all__ = ["mmd2_unbiased", "mmd_drift_buckets", "mmd_drift_summary"]


def _sq_dists(A: np.ndarray, B: np.ndarray) -> np.ndarray:
    aa = (A * A).sum(axis=1)[:, None]
    bb = (B * B).sum(axis=1)[None, :]
    return np.maximum(aa + bb - 2.0 * (A @ B.T), 0.0)


def mmd2_unbiased(X: np.ndarray, Y: np.ndarray, gamma: float) -> float:
    """Unbiased MMD²_u with k(x,y)=exp(−γ‖x−y‖²) (Gretton 2012 eq. 3):
    off-diagonal means of K_xx and K_yy minus twice the mean of K_xy."""
    m, n = len(X), len(Y)
    kxx = np.exp(-gamma * _sq_dists(X, X))
    kyy = np.exp(-gamma * _sq_dists(Y, Y))
    kxy = np.exp(-gamma * _sq_dists(X, Y))
    sxx = (kxx.sum() - m) / (m * (m - 1))
    syy = (kyy.sum() - n) / (n * (n - 1))
    return float(sxx + syy - 2.0 * kxy.mean())


def _bandwidth_sample(ds, vec_col: str, id_col: str, *, k: int,
                      seed: int) -> np.ndarray:
    """(k, d) vectors whose id hashes are globally smallest — a
    layout-invariant seeded sample: per-block top-k by hash partials,
    driver merge (k² driver work, corpus-size-independent)."""
    def partial(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        h = hash_idx(ids, seed, 101)
        take = np.argsort(h)[:k]
        return pa.Table.from_pydict({
            "h": pa.array(h[take].astype(np.uint64)),
            "v": b[vec_col].take(pa.array(take))})

    pdf = ds.map_batches(partial, batch_format="pyarrow",
                         zero_copy_batch=True).to_pandas()
    order = np.argsort(pdf["h"].to_numpy())[:k]
    return np.stack([np.asarray(v, dtype=np.float64)
                     for v in pdf["v"].to_numpy()[order]])


def median_heuristic_gamma(ds_x, ds_y, *, vec_col: str = "embedding",
                           id_col: str = "vec_id", k: int = 128,
                           seed: int = 42) -> float:
    """γ = 1 / median ‖x−y‖² over a pooled layout-invariant sample —
    the standard RBF bandwidth rule; computed once, broadcast into the
    bucket kernel."""
    S = np.concatenate([_bandwidth_sample(ds_x, vec_col, id_col, k=k,
                                          seed=seed),
                        _bandwidth_sample(ds_y, vec_col, id_col, k=k,
                                          seed=seed + 1)])
    d = _sq_dists(S, S)
    med = float(np.median(d[np.triu_indices(len(S), 1)]))
    return 1.0 / med if med > 0 else 1.0


def mmd_drift_buckets(ds_x, ds_y, *, vec_col: str = "embedding",
                      id_col: str = "vec_id", n_buckets: int = 8,
                      gamma: Optional[float] = None, n_perm: int = 200,
                      alpha: float = 0.05, seed: int = 42) -> pa.Table:
    """→ per-bucket (bucket, n_x, n_y, mmd2, p_perm, reject): one keyed
    exchange hash-partitioned on bucket id; each bucket's permutation
    test reuses its pooled kernel matrix (permutations re-index, never
    recompute)."""
    if gamma is None:
        gamma = median_heuristic_gamma(ds_x, ds_y, vec_col=vec_col,
                                       id_col=id_col, seed=seed)
    gamma = float(gamma)

    def tag(side: int):
        def fn(b: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            ids = b[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
            bucket = (hash_idx(ids * 2 + side, seed, 7)
                      % np.uint64(n_buckets)).astype(np.int64)
            # normalize element type so the two-sided union's schema is
            # homogeneous whatever each input's block provenance was
            vec = pc.cast(b[vec_col], pa.list_(pa.float64()))
            return pa.Table.from_pydict({
                "bucket": pa.array(bucket),
                "side": pa.array(np.full(len(ids), side, np.int64)),
                "rid": pa.array(ids),
                vec_col: vec})
        return fn

    both = (ds_x.map_batches(tag(0), batch_format="pyarrow",
                             zero_copy_batch=True)
            .union(ds_y.map_batches(tag(1), batch_format="pyarrow",
                                    zero_copy_batch=True)))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        bkt = int(g["bucket"].iloc[0])
        # canonical row order — map_groups arrival order is not stable
        g = g.sort_values(["side", "rid"], kind="mergesort")
        side = g["side"].to_numpy()
        Z = np.stack([np.asarray(v, dtype=np.float64)
                      for v in g[vec_col].to_numpy()])
        m = int((side == 0).sum())
        n = int((side == 1).sum())
        if m < 2 or n < 2:
            return pd.DataFrame({"bucket": [bkt], "n_x": [m], "n_y": [n],
                                 "mmd2": [np.nan], "p_perm": [np.nan],
                                 "reject": [False]})
        K = np.exp(-gamma * _sq_dists(Z, Z))

        def stat(ix: np.ndarray) -> float:
            x = ix[:m]
            y = ix[m:]
            sxx = (K[np.ix_(x, x)].sum() - m) / (m * (m - 1))
            syy = (K[np.ix_(y, y)].sum() - n) / (n * (n - 1))
            return float(sxx + syy - 2.0 * K[np.ix_(x, y)].mean())

        base = np.arange(m + n)
        obs = stat(base)
        rng = np.random.default_rng(
            int(hash_idx(np.array([bkt], dtype=np.int64), seed, 13)[0]))
        ge = sum(stat(rng.permutation(m + n)) >= obs
                 for _ in range(n_perm))
        p = (ge + 1) / (n_perm + 1)
        return pd.DataFrame({"bucket": [bkt], "n_x": [m], "n_y": [n],
                             "mmd2": [round(obs, 10)],
                             "p_perm": [round(p, 6)],
                             "reject": [p <= alpha]})

    out = (both.groupby("bucket").map_groups(per_bucket)
           .to_pandas().sort_values("bucket").reset_index(drop=True))
    return pa.Table.from_pandas(out, preserve_index=False)


def mmd_drift_summary(ds_x, ds_y, *, alpha: float = 0.05,
                      **kw) -> pa.Table:
    """One-row verdict: (n_buckets, n_tested, n_reject, mean_mmd2,
    binom_crit, drift). Under H₀ rejections ~ Binomial(B, α); ``drift``
    fires when n_reject exceeds the smallest c with
    P[Bin(B, α) ≥ c] ≤ α — a cross-bucket combination needing only the
    per-bucket verdict rows."""
    per = mmd_drift_buckets(ds_x, ds_y, alpha=alpha, **kw).to_pandas()
    tested = per[~per["mmd2"].isna()]
    b = len(tested)
    n_rej = int(tested["reject"].sum())
    # exact Binomial(b, alpha) upper-tail critical value
    crit = b + 1
    if b:
        pmf = [(1 - alpha) ** b]
        for i in range(1, b + 1):
            pmf.append(pmf[-1] * (b - i + 1) / i * alpha / (1 - alpha))
        tail = np.cumsum(pmf[::-1])[::-1]  # tail[c] = P[X >= c]
        ok = np.nonzero(tail <= alpha)[0]
        crit = int(ok[0]) if len(ok) else b + 1
    mean_mmd2 = float(tested["mmd2"].mean()) if b else float("nan")
    return pa.Table.from_pydict({
        "n_buckets": pa.array([len(per)], pa.int64()),
        "n_tested": pa.array([b], pa.int64()),
        "n_reject": pa.array([n_rej], pa.int64()),
        "mean_mmd2": pa.array([round(mean_mmd2, 10)], pa.float64()),
        "binom_crit": pa.array([crit], pa.int64()),
        "drift": pa.array([n_rej >= crit], pa.bool_()),
    })
