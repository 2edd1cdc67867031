"""Distributed multivariate linear regression (OLS / ridge) over
numeric columns — exact, one pass.

The numeric companion of `logreg.py` (hashed-text IRLS) and the
multivariate generalization of the grouped simple-regression REGR_*
aggregates (`stages/stats.py`): the normal equations need only the
sufficient statistics ``(XᵀX, Xᵀy)``, which sum exactly across blocks —
so the whole fit is ONE streamed ``map_batches`` pass emitting a
(d+1)²+(d+1)-float partial per block and ONE driver solve. No
iterations, no shuffle, nothing O(rows) anywhere; d is bounded by the
same (d+1)² partial budget as the IRLS Hessian (d ≲ 4k). Partials merge
in sorted-bytes order, so reruns are bitwise deterministic.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Sequence

import numpy as np
import pandas as pd
import pyarrow as pa


@dataclass
class OLSModel:
    feature_cols: List[str]
    coef: np.ndarray             # (d,)
    intercept: float
    r2: float
    n: int


def fit_ols(ds, feature_cols: Sequence[str], target_col: str, *,
            reg: float = 0.0) -> OLSModel:
    """→ :class:`OLSModel` minimizing ‖Xw + b − y‖² + reg·‖w‖² (rows
    with a NULL in any used column are excluded, SQL-style). R² is the
    in-sample coefficient of determination."""
    cols = list(feature_cols)
    d = len(cols) + 1                      # + intercept

    def partial(b: pa.Table) -> pa.Table:
        t = b.select(cols + [target_col]).drop_null()
        X = np.column_stack(
            [t[c].to_numpy(zero_copy_only=False).astype(np.float64)
             for c in cols] + [np.ones(t.num_rows)])
        y = t[target_col].to_numpy(zero_copy_only=False).astype(
            np.float64)
        xtx = X.T @ X
        xty = X.T @ y
        stats = np.concatenate([xtx.ravel(), xty,
                                [float(y @ y), float(t.num_rows)]])
        return pa.Table.from_pydict({
            "s": pa.array([stats.tobytes()], pa.binary())})

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True).to_pandas()
    acc = np.zeros(d * d + d + 2, dtype=np.float64)
    for raw in sorted(parts["s"]):         # order-pinned float merge
        acc += np.frombuffer(raw, dtype=np.float64)
    xtx = acc[:d * d].reshape(d, d)
    xty = acc[d * d:d * d + d]
    yty, n = float(acc[-2]), int(acc[-1])
    if n <= len(cols):
        raise ValueError(f"{n} usable rows cannot fit {len(cols)} "
                         f"features + intercept")
    A = xtx.copy()
    A[np.arange(len(cols)), np.arange(len(cols))] += reg
    w = np.linalg.solve(A, xty)
    sse = yty - 2 * w @ xty + w @ xtx @ w
    ybar = xty[-1] / n                     # Σy rides the intercept row
    sst = yty - n * ybar * ybar
    r2 = 1.0 - sse / sst if sst > 0 else 0.0
    return OLSModel(feature_cols=cols, coef=w[:-1],
                    intercept=float(w[-1]), r2=float(r2), n=n)


def predict_ols(ds, model: OLSModel, *, out_col: str = "pred"):
    """→ Dataset + ``out_col``: one streamed pass, model broadcast."""
    import ray

    ref = ray.put((model.coef, model.intercept))
    cols = model.feature_cols

    def pred(b: pa.Table) -> pa.Table:
        w, b0 = ray.get(ref)
        X = np.column_stack(
            [b[c].to_numpy(zero_copy_only=False).astype(np.float64)
             for c in cols])
        return b.append_column(out_col, pa.array(X @ w + b0,
                                                 pa.float64()))

    return ds.map_batches(pred, batch_format="pyarrow",
                          zero_copy_batch=True)
