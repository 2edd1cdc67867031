"""Distributed quantile regression (pinball/check loss) via IRLS.

Conditional-quantile fits — the engine's third regression family after
exact OLS (`linreg`, squared loss, mean) and Theil-Sen (median slope,
robustness): minimize Σ ρ_q(y − Xw) with ρ_q(r) = r·(q − 1{r<0})
(Koenker & Bassett 1978), by iteratively-reweighted least squares —
the standard smooth approximation where each iteration solves the
weighted normal equations with w_i = |q − 1{r_i<0}| / max(|r_i|, ε).

Ray-Data shape per iteration (same contract as `linreg.fit_ols`):
one streamed pass emitting per-block (XᵀWX, XᵀWy, Σ pinball loss, n)
partials — O(d²) bytes per block — driver solve O(d³), few
iterations. The ORDER-PINNED partial merge (sorted bytes) makes reruns
bitwise deterministic. Pinball loss is recorded BEFORE each update;
the trajectory must not increase (the tests' gate), and held coverage
P(y ≤ ŷ) must land near q.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Sequence

import numpy as np
import pyarrow as pa

__all__ = ["QuantRegModel", "fit_quantreg", "fit_quantreg_multi",
           "predict_quantreg"]


@dataclass
class QuantRegModel:
    feature_cols: List[str]
    coef: np.ndarray
    intercept: float
    q: float
    n: int
    pinball: List[float] = field(default_factory=list)
    coverage: float = float("nan")       # in-sample P(y <= pred)


#: auto planner: below this many matrix ENTRIES (rows × (d+1)) the
#: narrow (X, y) matrix is pulled to the driver ONCE and the IRLS
#: iterations run locally — IRLS needs ~40 tiny O(d²) passes and the
#: per-pass streamed-stage fixed cost dominates small inputs; beyond
#: the band the streamed path (identical math, agreement-tested) runs
DRIVER_ENTRY_LIMIT = 20_000_000


def fit_quantreg_multi(ds, feature_cols: Sequence[str],
                       target_col: str, quantiles: Sequence[float], *,
                       n_iters: int = 40, eps: float = 1e-6,
                       reg: float = 1e-8, init: str = "zero",
                       mode: str = "auto") -> List[QuantRegModel]:
    """IRLS fit of SEVERAL quantiles sharing every data pass: one
    streamed pass per iteration carries the K weight vectors together
    (stats are K small blocks), so fitting q10/q50/q90 costs the same
    scans as one quantile. A final evaluation pass records
    pinball/coverage of the RETURNED weights (the loop's running
    values trail one update behind). ``mode``: 'driver' pulls the
    narrow matrix once and iterates locally; 'stream' is the
    at-scale path; 'auto' picks by input size."""
    qs = [float(q) for q in quantiles]
    if not qs or any(not 0.0 < q < 1.0 for q in qs):
        raise ValueError("each q must be in (0, 1)")
    if init not in ("zero", "ols"):
        raise ValueError("init must be 'zero' or 'ols'")
    if mode not in ("auto", "driver", "stream"):
        raise ValueError(f"unknown mode {mode!r}")
    cols = list(feature_cols)
    d = len(cols) + 1
    K = len(qs)
    if mode == "auto":
        mode = ("driver" if ds.count() * d <= DRIVER_ENTRY_LIMIT
                else "stream")
    if mode == "driver":
        pdf = (ds.select_columns(cols + [target_col]).to_pandas()
               .dropna())
        X = np.column_stack([pdf[c].to_numpy(np.float64)
                             for c in cols] + [np.ones(len(pdf))])
        y = pdf[target_col].to_numpy(np.float64)
        if len(y) <= len(cols):
            raise ValueError(f"{len(y)} usable rows cannot fit "
                             f"{len(cols)} features + intercept")
        W = np.zeros((K, d))
        if init == "ols":
            W[:] = np.linalg.solve(X.T @ X + reg * np.eye(d),
                                   X.T @ y)[None, :]
        models = []
        for k, q in enumerate(qs):
            m = QuantRegModel(feature_cols=cols, coef=W[k, :-1],
                              intercept=0.0, q=q, n=len(y))
            w = W[k]
            for _it in range(n_iters + 1):
                r = y - X @ w
                m.pinball.append(round(
                    float((r * (q - (r < 0))).sum()) / len(y), 10))
                m.coverage = round(float((r <= 0).mean()), 6)
                if _it == n_iters:
                    break
                wt = np.abs(q - (r < 0)) / np.maximum(np.abs(r), eps)
                A = (X * wt[:, None]).T @ X + reg * np.eye(d)
                w = np.linalg.solve(A, (X * wt[:, None]).T @ y)
            m.coef = w[:-1]
            m.intercept = float(w[-1])
            models.append(m)
        return models

    # narrow + pin: the IRLS loop rescans ~n_iters× — without this a
    # wide computed lineage re-executes (and re-reads every column)
    # once per pass (the coxph pattern)
    ds = ds.select_columns(cols + [target_col]).materialize()
    W = np.zeros((K, d))
    if init == "ols":
        from .linreg import fit_ols

        m0 = fit_ols(ds, cols, target_col)
        W[:] = np.append(m0.coef, m0.intercept)[None, :]
    models = [QuantRegModel(feature_cols=cols, coef=W[k, :-1],
                            intercept=0.0, q=qs[k], n=0)
              for k in range(K)]
    blk = d * d + d + 2                   # per-quantile stat block
    for _it in range(n_iters + 1):        # last pass = evaluation only
        Wcur = W.copy()

        def partial(b: pa.Table, _W=Wcur) -> pa.Table:
            t = b.select(cols + [target_col]).drop_null()
            X = np.column_stack(
                [t[c].to_numpy(zero_copy_only=False).astype(np.float64)
                 for c in cols] + [np.ones(t.num_rows)])
            y = t[target_col].to_numpy(zero_copy_only=False).astype(
                np.float64)
            stats = np.empty(K * blk + 1)
            for k, q in enumerate(qs):
                r = y - X @ _W[k]
                pin = float((r * (q - (r < 0))).sum())
                wt = np.abs(q - (r < 0)) / np.maximum(np.abs(r), eps)
                Xw = X * wt[:, None]
                stats[k * blk:(k + 1) * blk] = np.concatenate([
                    (Xw.T @ X).ravel(), Xw.T @ y, [pin],
                    [float((r <= 0).sum())]])
            stats[-1] = float(len(y))
            return pa.Table.from_pydict({
                "s": pa.array([stats.tobytes()], pa.binary())})

        parts = ds.map_batches(partial, batch_format="pyarrow",
                               zero_copy_batch=True).to_pandas()
        acc = np.zeros(K * blk + 1)
        for raw in sorted(parts["s"]):     # order-pinned float merge
            acc += np.frombuffer(raw, dtype=np.float64)
        n = int(acc[-1])
        if n <= len(cols):
            raise ValueError(f"{n} usable rows cannot fit {len(cols)} "
                             "features + intercept")
        for k in range(K):
            s = acc[k * blk:(k + 1) * blk]
            xtwx = s[:d * d].reshape(d, d)
            xtwy = s[d * d:d * d + d]
            models[k].pinball.append(round(float(s[-2]) / n, 10))
            models[k].coverage = round(float(s[-1]) / n, 6)
            if _it < n_iters:
                A = xtwx + reg * np.eye(d)
                W[k] = np.linalg.solve(A, xtwy)
    for k in range(K):
        models[k].coef = W[k, :-1]
        models[k].intercept = float(W[k, -1])
        models[k].n = n
    return models


def fit_quantreg(ds, feature_cols: Sequence[str], target_col: str, *,
                 q: float = 0.5, n_iters: int = 40, eps: float = 1e-6,
                 reg: float = 1e-8) -> QuantRegModel:
    """Single-quantile convenience wrapper over
    :func:`fit_quantreg_multi`."""
    return fit_quantreg_multi(ds, feature_cols, target_col, [q],
                              n_iters=n_iters, eps=eps, reg=reg)[0]


def predict_quantreg(ds, model: QuantRegModel, *,
                     out_col: str = "pred"):
    cols = list(model.feature_cols)
    coef, b0 = model.coef, model.intercept

    def pred(b: pa.Table) -> pa.Table:
        X = np.column_stack(
            [b[c].to_numpy(zero_copy_only=False).astype(np.float64)
             for c in cols])
        return b.append_column(out_col,
                               pa.array(X @ coef + b0, pa.float64()))

    return ds.map_batches(pred, batch_format="pyarrow",
                          zero_copy_batch=True)
