"""Distributed Gaussian-mixture EM (diagonal covariance).

Soft probabilistic clustering over an embedding/feature column — the
density-model counterpart to the engine's hard spherical k-means
(``similarity.train_ivf_centroids``; used by doc_cluster/semdedup).
Dempster-Laird-Rubin 1977 EM, Ray-Data-first:

- **E+accumulate in one streamed pass per iteration.** Component
  parameters (weights, means, diagonal variances — O(k·d), tiny) are
  broadcast; each block computes log-responsibilities with a stable
  logsumexp and emits the mergeable sufficient statistics
  (Σr, Σr·x, Σr·x², log-likelihood, n) — one (k×d)-sized row per
  block. No per-row state, retry-safe, block-order invariant up to
  float addition.
- **M on the driver.** Parameter updates are O(k·d) closed forms.
  The data log-likelihood is recorded BEFORE each update, so the
  trajectory is monotone non-decreasing — EM's guarantee and the
  test's gate.
- **Init is deterministic**: seeded whole-table-unbiased sample,
  lexsorted (arrival-order-proof), evenly strided rows as means;
  sample variance as the shared initial diagonal. Pass ``init_means``
  etc. to pin initialization exactly (layout-invariance tests do).

``assign_gmm`` appends argmax-posterior component + max posterior per
row, streamed.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional

import numpy as np
import pandas as pd
import pyarrow as pa

import ray

__all__ = ["GMMModel", "fit_gmm", "assign_gmm"]

_VAR_FLOOR = 1e-6


@dataclass
class GMMModel:
    weights: np.ndarray          # (k,)
    means: np.ndarray            # (k, d)
    variances: np.ndarray        # (k, d) diagonal
    loglik: List[float] = field(default_factory=list)
    vec_col: str = "embedding"

    @property
    def k(self) -> int:
        return len(self.weights)


def _mat(b: pa.Table, vec_col: str) -> np.ndarray:
    # handles BOTH list<float> and Ray's tensor-extension layout, and
    # empty blocks (which Ray Data legitimately delivers — a bare
    # np.stack([]) would raise "need at least one array to stack")
    v = b[vec_col].to_pandas().to_numpy()
    if len(v) == 0:
        return np.empty((0, 0), dtype=np.float64)
    return np.stack(v).astype(np.float64)


def _log_resp(X: np.ndarray, w, mu, var):
    """→ (log responsibilities (n,k), per-row log-likelihood (n,))."""
    # log N(x|mu,diag var) summed over dims, vectorized over components
    lp = -0.5 * (((X[:, None, :] - mu[None, :, :]) ** 2
                  / var[None, :, :]).sum(axis=2)
                 + np.log(2 * np.pi * var).sum(axis=1)[None, :])
    lp = lp + np.log(w)[None, :]
    mx = lp.max(axis=1, keepdims=True)
    lse = mx[:, 0] + np.log(np.exp(lp - mx).sum(axis=1))
    return lp - lse[:, None], lse


def fit_gmm(ds, *, vec_col: str = "embedding", k: int = 4,
            n_iters: int = 10, sample_rows: int = 4096, seed: int = 42,
            init_means: Optional[np.ndarray] = None,
            init_variances: Optional[np.ndarray] = None,
            init_weights: Optional[np.ndarray] = None) -> GMMModel:
    """Fit a k-component diagonal GMM; ``n_iters=0`` returns the
    deterministic init (the parity tests' handle)."""
    if k < 1:
        raise ValueError("k must be >= 1")
    if init_means is None:
        n = ds.count()
        if n == 0:
            raise ValueError("empty dataset")
        if n > sample_rows:
            frac = min(1.0, (sample_rows * 1.25) / n)
            sample = (ds.random_sample(frac, seed=seed)
                      .limit(sample_rows).to_pandas())
            if len(sample) < max(k, sample_rows // 4):
                sample = ds.limit(sample_rows).to_pandas()
        else:
            sample = ds.limit(sample_rows).to_pandas()
        X = np.stack(sample[vec_col].to_numpy()).astype(np.float64)
        X = X[np.lexsort(X.T[::-1])]
        stride = max(len(X) // k, 1)
        mu = X[::stride][:k].copy()
        if len(mu) < k:
            raise ValueError(f"need >= {k} rows to init {k} components")
        var = np.tile(np.maximum(X.var(axis=0), _VAR_FLOOR), (k, 1))
        w = np.full(k, 1.0 / k)
    else:
        if init_variances is None or init_weights is None:
            raise ValueError(
                "init_means requires init_variances and init_weights")
        mu = np.asarray(init_means, dtype=np.float64)
        var = np.asarray(init_variances, dtype=np.float64)
        w = np.asarray(init_weights, dtype=np.float64)
        if not (len(mu) == len(var) == len(w)):
            raise ValueError("init arrays must share the component count")
    model = GMMModel(weights=w, means=mu, variances=var,
                     vec_col=vec_col)

    for _ in range(n_iters):
        pref = ray.put((model.weights, model.means, model.variances))

        def partial(b: pa.Table, _pref=pref) -> pa.Table:
            wv, muv, varv = ray.get(_pref)
            X = _mat(b, vec_col)
            if not len(X):
                kk, dd = muv.shape
                z = np.zeros((kk, dd))
                return pa.Table.from_pydict({
                    "rsum": [np.zeros(kk).tobytes()],
                    "rx": [z.tobytes()], "rx2": [z.tobytes()],
                    "ll": [0.0], "n": [0]})
            lr, lse = _log_resp(X, wv, muv, varv)
            r = np.exp(lr)                      # (n, k)
            return pa.Table.from_pydict({
                "rsum": [r.sum(axis=0).tobytes()],
                "rx": [(r.T @ X).tobytes()],
                "rx2": [(r.T @ (X * X)).tobytes()],
                "ll": [float(lse.sum())],
                "n": [len(X)]})

        parts = ds.map_batches(partial, batch_format="pyarrow",
                               zero_copy_batch=True).to_pandas()
        d = model.means.shape[1]
        # the EFFECTIVE component count — init_means may differ from k
        kk = model.k
        rsum = sum(np.frombuffer(x) for x in parts["rsum"])
        rx = sum(np.frombuffer(x).reshape(kk, d) for x in parts["rx"])
        rx2 = sum(np.frombuffer(x).reshape(kk, d) for x in parts["rx2"])
        n = int(parts["n"].sum())
        model.loglik.append(round(float(parts["ll"].sum()) / n, 10))
        rsum = np.maximum(rsum, 1e-12)
        model.weights = rsum / n
        model.means = rx / rsum[:, None]
        model.variances = np.maximum(
            rx2 / rsum[:, None] - model.means ** 2, _VAR_FLOOR)
    return model


def assign_gmm(ds, model: GMMModel, *, out_col: str = "component"):
    """Append argmax-posterior component id + max posterior."""
    pref = ray.put((model.weights, model.means, model.variances))
    vec_col = model.vec_col

    def assign(b: pa.Table, _pref=pref) -> pa.Table:
        wv, muv, varv = ray.get(_pref)
        X = _mat(b, vec_col)
        if not len(X):
            return (b.append_column(out_col,
                                    pa.array([], pa.int64()))
                    .append_column("posterior",
                                   pa.array([], pa.float64())))
        lr, _ = _log_resp(X, wv, muv, varv)
        comp = np.argmax(np.round(lr, 12), axis=1)   # stable ties
        return (b.append_column(out_col, pa.array(comp.astype(np.int64)))
                .append_column("posterior", pa.array(
                    np.exp(lr[np.arange(len(X)), comp]))))

    return ds.map_batches(assign, batch_format="pyarrow",
                          zero_copy_batch=True)
