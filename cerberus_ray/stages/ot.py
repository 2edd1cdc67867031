"""Entropic optimal transport between embedding distributions
(Sinkhorn divergence, Cuturi 2013; debiasing per Genevay et al. 2018).

The MULTIVARIATE magnitude-aware drift metric completing the family:
KS/PSI/W₁ are per-column, MMD is kernel-based (scale-free), C2ST is a
classifier; Sinkhorn divergence reports HOW FAR apart two embedding
distributions sit in actual embedding-space units².

Scale shape (quantize-then-transport — the standard large-scale OT
recipe): a shared deterministic k-means codebook is fit on a seeded
sample of the UNION; each dataset then streams ONE assignment pass to
a k-bucket histogram (mergeable bincount partials). All transport
math runs on the driver over (k histogram, k×k squared-distance cost)
— O(k²) per Sinkhorn iteration, k ≲ 256 by contract. Divergence =
W_ε(p,q) − ½W_ε(p,p) − ½W_ε(q,q), so identical distributions score
exactly 0 (the debiasing the raw entropic cost lacks).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np
import pandas as pd
import pyarrow as pa

import ray

__all__ = ["sinkhorn_cost", "sinkhorn_divergence"]


def sinkhorn_cost(p: np.ndarray, q: np.ndarray, M: np.ndarray, *,
                  reg: float = 0.05, n_iters: int = 200,
                  tol: float = 1e-10) -> float:
    """Entropic OT cost <T, M> between histograms on a shared support
    (log-domain-stable scaling iterations)."""
    mask_p, mask_q = p > 0, q > 0
    pp, qq = p[mask_p], q[mask_q]
    Mm = M[np.ix_(mask_p, mask_q)]
    K = np.exp(-Mm / reg)
    u = np.ones_like(pp) / len(pp)
    v = np.ones_like(qq) / len(qq)
    for _ in range(n_iters):
        u_new = pp / np.maximum(K @ v, 1e-300)
        v_new = qq / np.maximum(K.T @ u_new, 1e-300)
        if (np.abs(u_new - u).max() < tol
                and np.abs(v_new - v).max() < tol):
            u, v = u_new, v_new
            break
        u, v = u_new, v_new
    T = u[:, None] * K * v[None, :]
    return float((T * Mm).sum())


def _histogram(ds, vec_col: str, cents: np.ndarray) -> np.ndarray:
    cref = ray.put(cents)
    k = len(cents)

    def assign(b: pa.Table, _cref=cref) -> pa.Table:
        C = ray.get(_cref)
        X = np.stack(b[vec_col].to_pandas().to_numpy()).astype(
            np.float64)
        d2 = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        lab = np.argmin(np.round(d2, 12), axis=1)
        return pa.Table.from_pydict({
            "h": [np.bincount(lab, minlength=k).astype(
                np.float64).tobytes()]})

    p = ds.map_batches(assign, batch_format="pyarrow",
                       zero_copy_batch=True).to_pandas()
    h = sum(np.frombuffer(x) for x in p["h"])
    if h.sum() == 0:
        raise ValueError("empty dataset")
    return h / h.sum()


def sinkhorn_divergence(ds_a, ds_b, *, vec_col: str = "embedding",
                        k: int = 64, reg: float = 0.05,
                        n_iters: int = 200, seed: int = 42
                        ) -> Tuple[float, dict]:
    """→ (divergence, info dict with the raw entropic costs and the
    histogram masses). Shared codebook from the union (seeded,
    deterministic); divergence ≥ ~0 and = 0 for identical inputs."""
    from ..pipelines.similarity import train_ivf_centroids

    union = ds_a.union(ds_b).materialize()
    cents = np.asarray(train_ivf_centroids(union, n_lists=k,
                                           vec_col=vec_col, seed=seed),
                       dtype=np.float64)
    # spherical centroids come back unit-norm; cost uses them as-is —
    # what matters is a SHARED support, not recovering raw scale
    p = _histogram(ds_a, vec_col, cents)
    q = _histogram(ds_b, vec_col, cents)
    M = ((cents[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
    w_pq = sinkhorn_cost(p, q, M, reg=reg, n_iters=n_iters)
    w_pp = sinkhorn_cost(p, p, M, reg=reg, n_iters=n_iters)
    w_qq = sinkhorn_cost(q, q, M, reg=reg, n_iters=n_iters)
    div = w_pq - 0.5 * w_pp - 0.5 * w_qq
    return round(float(div), 10), {
        "w_pq": round(w_pq, 10), "w_pp": round(w_pp, 10),
        "w_qq": round(w_qq, 10), "k": int(len(cents))}
