"""2-D skyline (Pareto frontier) with an algebraic per-block partial.

``skyline(A ∪ B) = skyline(skyline(A) ∪ skyline(B))`` — the frontier is
an algebraic reduction, so each block collapses to its own (tiny)
frontier inside ``map_batches`` and the driver finishes on the union of
partials: no shuffle, no all-pairs, driver cost O(Σ block frontiers),
which for random data is O(#blocks × log block_rows).

Dominance is the standard minimize-both definition: ``s`` dominates
``r`` iff ``s.x ≤ r.x ∧ s.y ≤ r.y`` with strict inequality in at least
one coordinate. Exact duplicates of a frontier point therefore all
survive (no strict coordinate) — reported via the ``n`` multiplicity
column rather than repeated rows. The DuckDB oracle is the NOT EXISTS
dominance anti-join over distinct points (tests/test_skyline.py).
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd
import pyarrow as pa


def _frontier_distinct(x: np.ndarray, y: np.ndarray,
                       n: np.ndarray) -> pd.DataFrame:
    """Frontier over DISTINCT (x, y) points with multiplicities ``n``
    (minimize both). Vectorized: lexsort by (x asc, y asc); per distinct
    x only the min-y point can survive (same x, larger y is dominated);
    then a strict running-min scan over x-ascending candidates — a
    candidate with y equal to the running min is dominated by an
    earlier, strictly-smaller-x point."""
    order = np.lexsort((y, x))
    xs, ys, ns = x[order], y[order], n[order]
    first_x = np.r_[True, xs[1:] != xs[:-1]] if len(xs) else np.array(
        [], dtype=bool)
    cx, cy, cn = xs[first_x], ys[first_x], ns[first_x]
    prev_min = np.minimum.accumulate(np.r_[np.inf, cy.astype(np.float64)])[:-1]
    keep = cy < prev_min
    return pd.DataFrame({"x": cx[keep], "y": cy[keep], "n": cn[keep]})


def _distinct_counts(df: pd.DataFrame) -> pd.DataFrame:
    return (df.groupby(["x", "y"], as_index=False)["n"].sum())


def skyline2d(ds, x_col: str, y_col: str, *,
              maximize: Sequence[str] = ()) -> pd.DataFrame:
    """→ pandas frame ``(x_col, y_col, n)``: the Pareto-optimal distinct
    points of the dataset under minimize-``x``/minimize-``y`` (flip any
    column listed in ``maximize`` to maximize it), with ``n`` = how many
    input rows sit exactly on that point. Sorted by (x, y).

    NULLs in either coordinate are excluded (SQL comparison semantics:
    a NULL coordinate can neither dominate nor be dominated)."""
    flip_x = x_col in maximize
    flip_y = y_col in maximize

    def partial(b: pa.Table) -> pa.Table:
        t = b.select([x_col, y_col]).drop_null()
        x = t[x_col].to_numpy(zero_copy_only=False)
        y = t[y_col].to_numpy(zero_copy_only=False)
        if flip_x:
            x = -x
        if flip_y:
            y = -y
        d = _distinct_counts(pd.DataFrame(
            {"x": x, "y": y, "n": np.ones(len(x), dtype=np.int64)}))
        f = _frontier_distinct(d["x"].to_numpy(), d["y"].to_numpy(),
                               d["n"].to_numpy())
        return pa.Table.from_pandas(f, preserve_index=False)

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True).to_pandas()
    if not len(parts):
        return pd.DataFrame({x_col: [], y_col: [], "n": []})
    d = _distinct_counts(parts)
    out = _frontier_distinct(d["x"].to_numpy(), d["y"].to_numpy(),
                             d["n"].to_numpy())
    if flip_x:
        out["x"] = -out["x"]
    if flip_y:
        out["y"] = -out["y"]
    out = out.rename(columns={"x": x_col, "y": y_col})
    out["n"] = out["n"].astype("int64")
    return (out.sort_values([x_col, y_col])
            .reset_index(drop=True))
