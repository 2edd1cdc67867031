"""Observational causal effect estimation: stratified / IPW ATE.

The engine's estimation counterpart to the Simpson DETECTION screen
(``stats.simpson_check``): when treatment assignment depends on
observed strata (confounding), the naive treated-vs-control mean
difference is biased; with exact within-stratum propensities
e(s) = n_treated(s)/n(s), the Horvitz-Thompson inverse-propensity
estimator is algebraically the classic stratified estimator
Σ_s (n_s/N)·(ȳ_t(s) − ȳ_c(s)) (Rosenbaum & Rubin 1983; Lunceford &
Davidian 2004) — both are computed here from ONE mergeable census.

Scale shape: per-block partials of (n, n_t, Σy_t, Σy_t², Σy_c, Σy_c²)
per stratum — rows ∝ distinct strata (bounded by assumption: discrete
confounders; continuous confounders must be bucketed by the caller,
e.g. via the engine's quantile edges) — merged on the driver; all
estimator math runs on the census frame. Strata missing an arm carry
no within-stratum contrast: they are excluded and counted in
``n_off_support`` (the positivity-violation report, not silently
dropped).
"""

from __future__ import annotations

from typing import List, Sequence

import numpy as np
import pandas as pd
import pyarrow as pa

__all__ = ["ipw_ate_report"]


def ipw_ate_report(ds, treatment_col: str, outcome_col: str,
                   strata_cols: Sequence[str]) -> pa.Table:
    """→ one row: (n_rows, n_strata, n_off_support, naive_diff,
    ate_ipw, ate_se). ``treatment_col`` must be 0/1-coercible."""
    strata = list(strata_cols)
    if not strata:
        raise ValueError("strata_cols must be non-empty")

    def partial(b: pa.Table) -> pa.Table:
        df = b.select(strata + [treatment_col, outcome_col]).to_pandas()
        t = df[treatment_col].to_numpy()
        if set(np.unique(t)) - {0, 1, True, False}:
            raise ValueError(f"{treatment_col} must be binary 0/1")
        t = t.astype(np.float64)
        y = df[outcome_col].to_numpy(np.float64)
        df = df.assign(_n=1.0, _nt=t, _syt=t * y, _sy2t=t * y * y,
                       _syc=(1 - t) * y, _sy2c=(1 - t) * y * y)
        g = (df.groupby(strata, as_index=False, dropna=False)
             [["_n", "_nt", "_syt", "_sy2t", "_syc", "_sy2c"]].sum())
        return pa.Table.from_pandas(g, preserve_index=False)

    census = (ds.map_batches(partial, batch_format="pyarrow",
                             zero_copy_batch=True)
              .to_pandas()
              .groupby(strata, as_index=False, dropna=False).sum())
    n = census["_n"].to_numpy()
    nt = census["_nt"].to_numpy()
    nc = n - nt
    N = float(n.sum())
    on = (nt > 0) & (nc > 0)
    # naive difference (no adjustment)
    naive = (float(census["_syt"].sum()) / max(nt.sum(), 1)
             - float(census["_syc"].sum()) / max(nc.sum(), 1))
    syt, syc = census["_syt"].to_numpy(), census["_syc"].to_numpy()
    s2t, s2c = census["_sy2t"].to_numpy(), census["_sy2c"].to_numpy()
    mt = np.divide(syt, nt, out=np.zeros_like(syt), where=nt > 0)
    mc = np.divide(syc, nc, out=np.zeros_like(syc), where=nc > 0)
    if not on.any():
        # no stratum has both arms: 'no overlap', not 'no effect' —
        # n_off_support flags the condition, the estimate is undefined
        return pa.Table.from_pydict({
            "n_rows": pa.array([int(N)], pa.int64()),
            "n_strata": pa.array([len(census)], pa.int64()),
            "n_off_support": pa.array([len(census)], pa.int64()),
            "naive_diff": pa.array([round(naive, 6)], pa.float64()),
            "ate_ipw": pa.array([float("nan")], pa.float64()),
            "ate_se": pa.array([float("nan")], pa.float64())})
    w = n[on] / n[on].sum()
    ate = float((w * (mt[on] - mc[on])).sum())
    # stratified SE: Σ w² (v_t/n_t + v_c/n_c), sample variances
    vt = np.divide(s2t - nt * mt ** 2, np.maximum(nt - 1, 1),
                   out=np.zeros_like(s2t), where=nt > 1)
    vc = np.divide(s2c - nc * mc ** 2, np.maximum(nc - 1, 1),
                   out=np.zeros_like(s2c), where=nc > 1)
    se = float(np.sqrt((w ** 2 * (vt[on] / np.maximum(nt[on], 1)
                                  + vc[on] / np.maximum(nc[on], 1)))
                       .sum()))
    return pa.Table.from_pydict({
        "n_rows": pa.array([int(N)], pa.int64()),
        "n_strata": pa.array([len(census)], pa.int64()),
        "n_off_support": pa.array([int((~on).sum())], pa.int64()),
        "naive_diff": pa.array([round(naive, 6)], pa.float64()),
        "ate_ipw": pa.array([round(ate, 6)], pa.float64()),
        "ate_se": pa.array([round(se, 6)], pa.float64())})
