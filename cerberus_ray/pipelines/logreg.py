"""Distributed logistic regression over hashed text features.

The gradient-based sibling of the Naive-Bayes quality classifier
(`quality_classifier.py`): L2-regularized binary logistic regression
fit by full-batch Newton/IRLS (default — per-block ``(XᵀSX, Xᵀ(p−y))``
partials, one (B+1)² driver solve per iteration, a handful of
iterations) or plain gradient descent (O(B)-exchange fallback for very
wide features) — every iteration is ONE streamed ``map_batches`` pass,
partials merged by summing on the driver. Deterministic:
no sampling, no row order dependence (gradient partials sum exactly),
fixed iteration count — so retries, repartitions and cluster resizes
reproduce the same model bit-for-bit.

Scale shape: weights broadcast once per iteration (B+1 floats);
exchange per iteration is #blocks × (B+1)² floats for IRLS (the reason
for the documented B ≲ 4k bound) or #blocks × (B+1) for GD; nothing
anywhere is O(rows) on the driver. Exact full-batch convex optimization
is the parameter-server-free textbook plan.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List

import numpy as np
import pandas as pd
import pyarrow as pa

from .doc_cluster import _doc_vectors


@dataclass
class LogRegModel:
    weights: np.ndarray          # (B,) hashed-feature weights
    bias: float
    n_features: int
    iters: int
    reg: float


def _features(b: pa.Table, text_col: str, n_features: int) -> np.ndarray:
    texts = b[text_col].to_numpy(zero_copy_only=False)
    return _doc_vectors(texts, n_features)


def fit_logreg(ds, *, text_col: str = "text", label_col: str = "label",
               n_features: int = 1024, iters: int = 50,
               reg: float = 1e-3, lr: float = 1.0,
               method: str = "irls") -> LogRegModel:
    """Fit on rows whose ``label_col`` ∈ {0, 1} → :class:`LogRegModel`.

    ``method='irls'`` (default): Newton / iteratively-reweighted least
    squares — each iteration is one pass emitting per-block
    ``(XᵀSX, Xᵀ(p−y))`` partials (S = p(1−p)); the driver solves one
    (B+1)² system. Converges in a handful of iterations; the (B+1)²
    partial bounds the hashed width (fine to B ≈ 4k — beyond that the
    production answer is L-BFGS, out of scope and documented).
    ``method='gd'``: plain full-batch gradient descent with step
    ``lr/L`` (L ≤ 1/4 + reg on unit rows) — the O(B)-exchange path kept
    for the exact numpy-parity contract and for very wide features."""
    import ray

    n = ds.count()
    if not n:
        raise ValueError("empty training set")
    if method not in ("irls", "gd"):
        raise ValueError(f"unknown method {method!r}")
    w = np.zeros(n_features + 1, dtype=np.float64)   # [weights, bias]
    d = n_features + 1

    for it in range(iters):
        ref = ray.put(w)

        def grad_partial(b: pa.Table, hess: bool) -> pa.Table:
            wv = ray.get(ref)
            X = _features(b, text_col, n_features)
            Xa = np.hstack([X, np.ones((len(X), 1))])
            y = b[label_col].to_numpy(zero_copy_only=False).astype(
                np.float64)
            p = 1.0 / (1.0 + np.exp(-(Xa @ wv)))
            g = Xa.T @ (p - y)
            payload = [g.tobytes()]
            if hess:
                s = p * (1.0 - p)
                H = (Xa * s[:, None]).T @ Xa
                payload.append(H.tobytes())
            return pa.Table.from_pydict({
                "g": pa.array([payload[0]], pa.binary()),
                "h": pa.array([payload[1] if hess else b""],
                              pa.binary())})

        hess = method == "irls"
        parts = ds.map_batches(
            lambda b, hess=hess: grad_partial(b, hess),
            batch_format="pyarrow", zero_copy_batch=True).to_pandas()
        g = np.zeros(d, dtype=np.float64)
        H = np.zeros((d, d), dtype=np.float64)
        # sum partials in sorted-bytes order: float addition is order-
        # dependent and blocks ARRIVE in nondeterministic order — this
        # pins rerun-bitwise determinism for a fixed block layout
        for _, row in (parts.sort_values("g").iterrows()):
            g += np.frombuffer(row["g"], dtype=np.float64)
            if hess:
                H += np.frombuffer(row["h"],
                                   dtype=np.float64).reshape(d, d)
        g /= n
        g[:-1] += reg * w[:-1]                        # L2 on weights only
        if method == "gd":
            # Lipschitz bound includes the appended BIAS column: an
            # augmented unit row [x;1] has ‖·‖² ≤ 2, so L ≤ 2/4 + reg —
            # the old 0.25 denominator put lr=1 at the 2/L divergence
            # boundary on correlated data
            w = w - (lr / (0.5 + reg)) * g            # step ≈ lr/L
        else:
            H /= n
            H[np.arange(n_features), np.arange(n_features)] += reg
            H[np.arange(d), np.arange(d)] += 1e-9     # numeric floor
            w = w - np.linalg.solve(H, g)
            if float(np.abs(g).max()) < 1e-10:
                break
    return LogRegModel(weights=w[:-1], bias=float(w[-1]),
                       n_features=n_features, iters=iters, reg=reg)


def calibration_curve(scored_ds, *, label_col: str = "label",
                      p_col: str = "p", n_bins: int = 10) -> pd.DataFrame:
    """Reliability diagram over a scored dataset → frame (bin, n,
    mean_p, frac_pos): equal-width probability bins, each comparing the
    mean predicted probability against the empirical positive rate — a
    calibrated model sits on the diagonal. One streamed pass of
    (bin, n, Σp, Σy) partials, bounded by ``n_bins``."""
    if n_bins < 2:
        raise ValueError(f"n_bins must be ≥ 2, got {n_bins}")

    def partial(b: pa.Table) -> pa.Table:
        p = b[p_col].to_numpy(zero_copy_only=False)
        y = b[label_col].to_numpy(zero_copy_only=False).astype(
            np.float64)
        # a NaN probability has no bin (the int cast is undefined and
        # used to land on bin 0, poisoning its mean_p) — drop the row
        ok = ~np.isnan(p)
        if not ok.all():
            p, y = p[ok], y[ok]
        bins = np.clip((p * n_bins).astype(np.int64), 0, n_bins - 1)
        t = pa.table({"bin": pa.array(bins, pa.int64()),
                      "p": pa.array(p, pa.float64()),
                      "y": pa.array(y, pa.float64())})
        return t.group_by("bin").aggregate(
            [([], "count_all"), ("p", "sum"), ("y", "sum")])

    g = (scored_ds.map_batches(partial, batch_format="pyarrow",
                               zero_copy_batch=True).to_pandas()
         .sort_values("bin")
         .groupby("bin", as_index=False).sum())
    return pd.DataFrame({
        "bin": g["bin"].astype("int64"),
        "n": g["count_all"].astype("int64"),
        "mean_p": np.round(g["p_sum"] / g["count_all"], 6),
        "frac_pos": np.round(g["y_sum"] / g["count_all"], 6)})


def score_logreg(ds, model: LogRegModel, *, text_col: str = "text",
                 key_col: str = "doc_id", carry_cols: List[str] = ()):
    """→ Dataset (key, p): P(label=1) per row — one streamed pass, the
    model broadcast once."""
    import ray

    ref = ray.put((model.weights, model.bias))

    def score(b: pa.Table) -> pa.Table:
        wv, bias = ray.get(ref)
        X = _features(b, text_col, model.n_features)
        p = 1.0 / (1.0 + np.exp(-(X @ wv + bias)))
        cols = {"key": b[key_col],
                "p": pa.array(np.round(p, 6), pa.float64())}
        for c in carry_cols:
            cols[c] = b[c]
        return pa.Table.from_pydict(cols)

    return ds.map_batches(score, batch_format="pyarrow",
                          zero_copy_batch=True)
