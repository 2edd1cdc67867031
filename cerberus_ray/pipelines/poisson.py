"""Poisson regression (log-link GLM) via distributed IRLS.

Count-outcome modeling — the fourth regression family (exact OLS,
Theil-Sen, quantile IRLS, and now counts): y ~ Poisson(exp(Xw)),
fit by Fisher scoring, which for the canonical log link is IRLS with
W = diag(μ) and working response z = Xw + (y − μ)/μ (McCullagh &
Nelder 1989).

Ray-Data shape per iteration (the `linreg`/`quantreg` contract): one
streamed pass emitting per-block (XᵀWX, XᵀWz, deviance, n) partials —
O(d²) bytes — driver solve O(d³); order-pinned sorted-bytes merge for
bitwise rerun determinism. Deviance is recorded BEFORE each update
(monotone, the tests' gate) and a final evaluation pass scores the
returned weights.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Sequence

import numpy as np
import pyarrow as pa

__all__ = ["PoissonModel", "fit_poisson", "predict_poisson"]


@dataclass
class PoissonModel:
    feature_cols: List[str]
    coef: np.ndarray
    intercept: float
    n: int
    deviance: List[float] = field(default_factory=list)


def fit_poisson(ds, feature_cols: Sequence[str], target_col: str, *,
                n_iters: int = 12, reg: float = 1e-8,
                max_eta: float = 30.0) -> PoissonModel:
    """Fisher-scoring fit; init = intercept-only at log(mean(y))
    (one cheap moment pass), so the first step is already scaled."""
    cols = list(feature_cols)
    d = len(cols) + 1
    # narrow + pin: the IRLS loop rescans ~n_iters× — without this a
    # wide computed lineage re-executes per pass (the coxph pattern)
    ds = ds.select_columns(cols + [target_col]).materialize()

    from ray.data.aggregate import Count, Min, Sum

    tot = ds.aggregate(Sum(target_col), Min(target_col), Count())
    ymin = tot.get(f"min({target_col})")
    if ymin is not None and float(ymin) < 0:
        # only the MEAN was checked before: individually negative
        # outcomes slipped through and produced garbage coefficients
        raise ValueError(
            f"Poisson outcome must be non-negative: min({target_col}) "
            f"= {float(ymin)}")
    ybar = float(tot[f"sum({target_col})"] or 0) / max(
        int(tot["count()"]), 1)
    if ybar < 0:
        raise ValueError("Poisson outcome must be non-negative")
    w = np.zeros(d)
    w[-1] = np.log(max(ybar, 1e-9))

    model = PoissonModel(feature_cols=cols, coef=w[:-1],
                         intercept=float(w[-1]), n=0)
    n = 0
    for _it in range(n_iters + 1):        # final pass = evaluation
        wcur = w.copy()

        def partial(b: pa.Table, _w=wcur) -> pa.Table:
            t = b.select(cols + [target_col]).drop_null()
            X = np.column_stack(
                [t[c].to_numpy(zero_copy_only=False).astype(np.float64)
                 for c in cols] + [np.ones(t.num_rows)])
            y = t[target_col].to_numpy(zero_copy_only=False).astype(
                np.float64)
            eta = np.clip(X @ _w, -max_eta, max_eta)
            mu = np.exp(eta)
            z = eta + (y - mu) / mu
            Xw = X * mu[:, None]
            with np.errstate(divide="ignore", invalid="ignore"):
                ylogy = np.where(y > 0, y * np.log(y / mu), 0.0)
            dev = float(2.0 * (ylogy - (y - mu)).sum())
            stats = np.concatenate([
                (Xw.T @ X).ravel(), Xw.T @ z, [dev],
                [float(len(y))]])
            return pa.Table.from_pydict({
                "s": pa.array([stats.tobytes()], pa.binary())})

        parts = ds.map_batches(partial, batch_format="pyarrow",
                               zero_copy_batch=True).to_pandas()
        acc = np.zeros(d * d + d + 2)
        for raw in sorted(parts["s"]):     # order-pinned float merge
            acc += np.frombuffer(raw, dtype=np.float64)
        n = int(acc[-1])
        if n <= len(cols):
            raise ValueError(f"{n} usable rows cannot fit {len(cols)} "
                             "features + intercept")
        model.deviance.append(round(float(acc[-2]) / n, 10))
        if _it == n_iters:
            break
        A = acc[:d * d].reshape(d, d) + reg * np.eye(d)
        w = np.linalg.solve(A, acc[d * d:d * d + d])
    model.coef = w[:-1]
    model.intercept = float(w[-1])
    model.n = n
    return model


def predict_poisson(ds, model: PoissonModel, *,
                    out_col: str = "rate"):
    """Append the predicted rate μ = exp(Xw + b)."""
    cols = list(model.feature_cols)
    coef, b0 = model.coef, model.intercept

    def pred(b: pa.Table) -> pa.Table:
        X = np.column_stack(
            [b[c].to_numpy(zero_copy_only=False).astype(np.float64)
             for c in cols])
        return b.append_column(
            out_col, pa.array(np.exp(X @ coef + b0), pa.float64()))

    return ds.map_batches(pred, batch_format="pyarrow",
                          zero_copy_batch=True)
