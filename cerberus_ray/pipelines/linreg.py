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


def grouped_simple_ols(ds, group_col: str, x_col: str, y_col: str, *,
                       min_n: int = 3) -> pd.DataFrame:
    """Per-group simple linear regression — SQL's windowless
    ``regr_slope/regr_intercept/regr_r2 ... GROUP BY`` re-expressed as
    ONE streamed pass of per-(group) moment partials (n, Σx, Σy, Σxy,
    Σx², Σy² — SQL regr_* semantics: rows where EITHER side is NULL
    are excluded pairwise) and closed forms on the census frame.
    Groups with fewer than ``min_n`` pairs or zero x-variance return
    NULL slope (SQL returns NULL on zero variance too).

    → frame (group, n, slope, intercept, r2) sorted by group;
    DuckDB regr_* parity in tests/test_linreg.py."""
    def partial(b: pa.Table) -> pa.Table:
        df = b.select([group_col, x_col, y_col]).to_pandas().dropna()
        x = df[x_col].to_numpy(np.float64)
        y = df[y_col].to_numpy(np.float64)
        g = (df.assign(_n=1.0, _sx=x, _sy=y, _sxy=x * y, _sxx=x * x,
                       _syy=y * y)
             .groupby(group_col, as_index=False)
             [["_n", "_sx", "_sy", "_sxy", "_sxx", "_syy"]].sum())
        return pa.Table.from_pandas(g, preserve_index=False)

    cen = (ds.map_batches(partial, batch_format="pyarrow",
                          zero_copy_batch=True)
           .to_pandas().groupby(group_col, as_index=False).sum())
    n = cen["_n"].to_numpy()
    sx, sy = cen["_sx"].to_numpy(), cen["_sy"].to_numpy()
    sxy = cen["_sxy"].to_numpy()
    sxx, syy = cen["_sxx"].to_numpy(), cen["_syy"].to_numpy()
    vx = sxx - sx * sx / n
    vy = syy - sy * sy / n
    cov = sxy - sx * sy / n
    ok = (n >= min_n) & (vx > 0)
    slope = np.where(ok, cov / np.where(vx > 0, vx, 1.0), np.nan)
    intercept = np.where(ok, (sy - slope * sx) / n, np.nan)
    # DuckDB/Postgres regr_r2: NULL only when var(x)=0; a constant-y
    # group with varying x is a PERFECT horizontal fit → 1.0
    r2 = np.where(ok,
                  np.where(vy > 0,
                           cov * cov
                           / np.where((vx * vy) > 0, vx * vy, 1.0),
                           1.0),
                  np.nan)
    out = pd.DataFrame({group_col: cen[group_col],
                        "n": n.astype(np.int64),
                        "slope": np.round(slope, 10),
                        "intercept": np.round(intercept, 10),
                        "r2": np.round(r2, 10)})
    return out.sort_values(group_col).reset_index(drop=True)
