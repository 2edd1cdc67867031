"""Survey raking (iterative proportional fitting / IPF): find
per-cell weights so the weighted two-way contingency table matches
prescribed row and column marginal totals — the classic reweighting
method (Deming & Stephan 1940, public), and the marginal-matching
companion of `mixing.domain_kl_weights` (which reweights ONE
categorical axis by KL; raking balances TWO axes simultaneously).

The data side is one exact (a, b) count census (bounded by the two
category domains); IPF runs on the driver over that |A|×|B| matrix —
alternately scaling rows then columns until both weighted marginals
match. IPF converges to the minimum-KL adjustment whenever a feasible
table exists (classical result); structural zeros make some targets
infeasible, which this implementation detects and RAISES on (a target
mass on an empty row/column can never be matched).

Scale shape: census partials per block, constant-size driver loop,
weights broadcastable to any downstream stage. No exchange.
"""

from __future__ import annotations

from typing import Dict

import numpy as np
import pandas as pd
import pyarrow as pa

__all__ = ["rake_weights"]


def rake_weights(ds, col_a: str, col_b: str, *,
                 target_a: Dict[str, float],
                 target_b: Dict[str, float],
                 max_iter: int = 200, tol: float = 1e-10
                 ) -> pd.DataFrame:
    """→ per-cell DataFrame (col_a, col_b, n, weight) sorted by
    (a, b): Σ_b n·w over a equals target_a[a]·N and symmetrically for
    b, where N is the total row count (targets are PROPORTIONS and
    must each sum to 1). Raises on infeasible targets (mass on an
    empty category, or non-convergence within max_iter)."""

    def partial(b: pa.Table) -> pa.Table:
        n = len(b)
        return pa.Table.from_pydict({
            "a": b[col_a], "b": b[col_b],
            "n": pa.array(np.ones(n, np.int64), pa.int64()),
        }).group_by(["a", "b"]).aggregate([("n", "sum")])

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True).to_pandas()
    census = (parts.groupby(["a", "b"], as_index=False)["n_sum"]
              .sum().rename(columns={"n_sum": "n"})
              .sort_values(["a", "b"]).reset_index(drop=True))
    if not len(census):
        raise ValueError("rake_weights: empty input")
    for t, name in ((target_a, "target_a"), (target_b, "target_b")):
        s = float(sum(t.values()))
        if abs(s - 1.0) > 1e-9:
            raise ValueError(f"{name} proportions must sum to 1 "
                             f"(got {s})")
    a_vals = sorted(census["a"].unique())
    b_vals = sorted(census["b"].unique())
    missing_a = [k for k, v in target_a.items()
                 if v > 0 and k not in a_vals]
    missing_b = [k for k, v in target_b.items()
                 if v > 0 and k not in b_vals]
    if missing_a or missing_b:
        raise ValueError(f"infeasible targets: mass on empty "
                         f"categories {missing_a + missing_b}")
    ai = {v: i for i, v in enumerate(a_vals)}
    bi = {v: i for i, v in enumerate(b_vals)}
    m = np.zeros((len(a_vals), len(b_vals)))
    for a, b_, n in zip(census["a"], census["b"], census["n"]):
        m[ai[a], bi[b_]] = n
    n_total = float(m.sum())
    ta = np.array([target_a.get(a, 0.0) for a in a_vals]) * n_total
    tb = np.array([target_b.get(b_, 0.0) for b_ in b_vals]) * n_total

    w = np.ones_like(m)
    converged = False
    for _ in range(max_iter):
        rows = (m * w).sum(axis=1)
        with np.errstate(invalid="ignore", divide="ignore"):
            ra = np.where(rows > 0, ta / rows, 1.0)
        w *= ra[:, None]
        cols = (m * w).sum(axis=0)
        with np.errstate(invalid="ignore", divide="ignore"):
            rb = np.where(cols > 0, tb / cols, 1.0)
        w *= rb[None, :]
        err_a = np.abs((m * w).sum(axis=1) - ta).max()
        err_b = np.abs((m * w).sum(axis=0) - tb).max()
        if max(err_a, err_b) <= tol * n_total:
            converged = True
            break
    if not converged:
        raise RuntimeError(
            f"IPF did not converge within {max_iter} iterations "
            f"(marginal error {max(err_a, err_b):.3g}) — the targets "
            f"are likely infeasible given the table's zero pattern")
    census["weight"] = [w[ai[a], bi[b_]] for a, b_ in
                        zip(census["a"], census["b"])]
    out = census.rename(columns={"a": col_a, "b": col_b})
    return out[[col_a, col_b, "n", "weight"]]
