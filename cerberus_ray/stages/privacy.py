"""Small-group privacy checks: k-anonymity and l-diversity over
quasi-identifier combinations.

A training-data release leaks identity when a quasi-identifier
combination (e.g. user × event-type × coarse location) isolates fewer
than ``k`` rows — the Sweeney k-anonymity criterion (public method);
l-diversity additionally requires ≥ ``l`` distinct SENSITIVE values
inside each group so a small group doesn't reveal the sensitive
attribute by unanimity.

Scale shape: unlike the dedup family (which only surfaces groups with
count ≥ 2), here the SINGLETONS are the violators, so the full group
census is needed. Two wired modes, the module's usual planner
convention:

- ``driver``: per-block pyarrow hash-aggregate partials → driver merge
  — one row per distinct combo, the documented bound (right when the
  quasi-identifier domain is bounded: enum × enum × bucket).
- ``shuffle``: map-side combined partials → ``groupby(combo)`` sum —
  the path when combos approach row count (near-unique identifiers are
  exactly the risky case at 10¹² rows).

Both modes agreement-tested; counts DuckDB-parity-tested
(tests/test_privacy.py).
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np
import pandas as pd
import pyarrow as pa

#: above this many input rows the auto planner stops trusting the
#: driver-side distinct-combo merge
DRIVER_ROW_LIMIT = 5_000_000


def _group_counts(ds, cols: List[str], mode: str, distinct_col=None):
    def partial(b: pa.Table) -> pa.Table:
        return b.group_by(cols).aggregate([([], "count_all")])

    if mode == "driver":
        pdf = ds.map_batches(partial, batch_format="pyarrow",
                             zero_copy_batch=True).to_pandas()
        if not len(pdf):
            return pdf
        plan = {"count_all": "sum"}
        g = pdf.groupby(cols, as_index=False, dropna=False).agg(plan)
        if distinct_col:
            # distinct counts don't sum across blocks — re-derive from
            # distinct (combo, value) pairs, still one streamed pass
            def pairs(b: pa.Table) -> pa.Table:
                return (b.select(cols + [distinct_col])
                        .group_by(cols + [distinct_col])
                        .aggregate([]))

            pp = ds.map_batches(pairs, batch_format="pyarrow",
                                zero_copy_batch=True).to_pandas()
            nd = (pp.drop_duplicates(cols + [distinct_col])
                  .groupby(cols, as_index=False, dropna=False)
                  .size().rename(columns={"size": "n_distinct"}))
            g = g.merge(nd, on=cols, how="left")
        return g.rename(columns={"count_all": "n"})
    if mode == "shuffle":
        from ray.data.aggregate import Count

        agg = ds.groupby(cols).aggregate(Count())
        pdf = agg.to_pandas().rename(columns={"count()": "n"})
        if distinct_col:
            dd = (ds.groupby(cols + [distinct_col]).aggregate(Count())
                  .groupby(cols).aggregate(Count()).to_pandas())
            dd = dd.rename(columns={"count()": "n_distinct"})
            pdf = pdf.merge(dd, on=cols, how="left")
        return pdf
    raise ValueError(f"unknown mode {mode!r}")


def k_anonymity_report(ds, quasi_cols: Sequence[str], *, k: int = 5,
                       l: Optional[int] = None,
                       sensitive_col: Optional[str] = None,
                       mode: str = "auto") -> pa.Table:
    """→ one-row summary: (n_rows, n_groups, n_groups_below_k,
    n_rows_at_risk, min_group_size [, n_groups_below_l]). ``l`` with
    ``sensitive_col`` adds the l-diversity census."""
    quasi_cols = list(quasi_cols)
    if (l is None) != (sensitive_col is None):
        raise ValueError("l and sensitive_col come together")
    if mode == "auto":
        mode = ("driver" if ds.count() <= DRIVER_ROW_LIMIT else "shuffle")
    g = _group_counts(ds, quasi_cols, mode,
                      distinct_col=sensitive_col)
    if not len(g):
        cols = {"n_rows": [0], "n_groups": [0], "n_groups_below_k": [0],
                "n_rows_at_risk": [0], "min_group_size": [0]}
        if l is not None:
            cols["n_groups_below_l"] = [0]
        return pa.Table.from_pydict(cols)
    below = g[g["n"] < k]
    out = {
        "n_rows": pa.array([int(g["n"].sum())], pa.int64()),
        "n_groups": pa.array([len(g)], pa.int64()),
        "n_groups_below_k": pa.array([len(below)], pa.int64()),
        "n_rows_at_risk": pa.array([int(below["n"].sum())], pa.int64()),
        "min_group_size": pa.array([int(g["n"].min())], pa.int64()),
    }
    if l is not None:
        out["n_groups_below_l"] = pa.array(
            [int((g["n_distinct"] < l).sum())], pa.int64())
    return pa.Table.from_pydict(out)


def dp_grouped_counts(ds, cols: Sequence[str], *, epsilon: float = 1.0,
                      seed: int = 42, mode: str = "auto",
                      round_digits: int = 4) -> pd.DataFrame:
    """ε-differentially-private grouped counts: the exact census (via
    the module's driver/shuffle planner) plus Laplace(1/ε) noise — the
    Dwork et al. 2006 mechanism, sensitivity 1 for counting queries
    over disjoint groups with a FIXED public group domain (caveat: the
    released group LIST here is data-dependent; for a strict DP
    release, join against a public domain and release every group).

    Determinism (the engine contract): noise is counter-based — a
    uniform draw from the hash of (seed, group key) through the
    inverse Laplace CDF — so reruns and layout changes release the
    SAME noisy values (a nondeterministic release would burn privacy
    budget per rerun).

    → frame (cols..., n_noisy) sorted by cols; true counts are not
    returned."""
    from ..determinism import hash_strings

    if epsilon <= 0:
        raise ValueError("epsilon must be positive")
    cols = list(cols)
    if mode == "auto":
        mode = ("driver" if ds.count() <= DRIVER_ROW_LIMIT
                else "shuffle")
    g = _group_counts(ds, cols, mode)
    if not len(g):
        return pd.DataFrame({c: [] for c in cols + ["n_noisy"]})
    g = g.sort_values(cols, na_position="last").reset_index(drop=True)
    key = g[cols].astype(str).agg("\x1f".join, axis=1).to_numpy(object)
    h = hash_strings(np.char.add(f"dp:{seed}:", key.astype(str)))
    # u ∈ (-0.5, 0.5); inverse CDF: -sign(u)·ln(1-2|u|)/ε
    u = (h.astype(np.float64) / 2.0 ** 64) - 0.5
    u = np.clip(u, -0.5 + 1e-12, 0.5 - 1e-12)
    noise = -np.sign(u) * np.log1p(-2.0 * np.abs(u)) / epsilon
    g["n_noisy"] = np.round(g["n"].to_numpy(np.float64) + noise,
                            round_digits)
    return g[cols + ["n_noisy"]]


def t_closeness_report(ds, quasi_cols: Sequence[str],
                       sensitive_col: str, *, t: float = 0.2,
                       ordered: bool = False,
                       mode: str = "auto") -> pa.Table:
    """t-closeness census (Li, Li & Venkatasubramanian 2007): every
    quasi-identifier group's SENSITIVE-value distribution must stay
    within ``t`` of the global distribution — the refinement of
    l-diversity that catches skewed-but-diverse groups (a group that is
    80% one diagnosis "satisfies" l=2 yet leaks).

    Distance: total variation ½ Σ|p_g − q| for categorical domains;
    with ``ordered=True`` the normalized Earth-Mover's distance
    Σ|cumsum(p_g − q)| / (m−1) over the sorted domain (the paper's
    ordered-attribute metric — a one-bucket shift in a wide domain
    counts less than a far shift).

    Scale shape: one (quasi × sensitive) census through the module's
    driver/shuffle planner — census rows ∝ combo × domain cardinality
    (bounded when both are; near-unique quasi-identifiers are the risky
    case and route through 'shuffle'); the pivot/distance math runs on
    that census frame, never on raw rows.

    → one row: (n_rows, n_groups, n_groups_above_t, max_distance,
    mean_distance, t, measure)."""
    quasi_cols = list(quasi_cols)
    if mode == "auto":
        mode = ("driver" if ds.count() <= DRIVER_ROW_LIMIT else "shuffle")
    census = _group_counts(ds, quasi_cols + [sensitive_col], mode)
    measure = "emd" if ordered else "tv"
    if not len(census):
        return pa.Table.from_pydict({
            "n_rows": pa.array([0], pa.int64()),
            "n_groups": pa.array([0], pa.int64()),
            "n_groups_above_t": pa.array([0], pa.int64()),
            "max_distance": pa.array([0.0], pa.float64()),
            "mean_distance": pa.array([0.0], pa.float64()),
            "t": pa.array([float(t)], pa.float64()),
            "measure": pa.array([measure], pa.string())})
    M = census.pivot_table(index=quasi_cols, columns=sensitive_col,
                           values="n", aggfunc="sum", fill_value=0,
                           dropna=False)
    M = M.reindex(sorted(M.columns), axis=1)  # ordered domain ascending
    counts = M.to_numpy(dtype=np.float64)
    row_tot = counts.sum(axis=1, keepdims=True)
    p = counts / row_tot
    q = counts.sum(axis=0) / counts.sum()
    diff = p - q[None, :]
    if ordered and counts.shape[1] > 1:
        dist = np.abs(np.cumsum(diff, axis=1)).sum(axis=1) / (
            counts.shape[1] - 1)
    else:
        dist = 0.5 * np.abs(diff).sum(axis=1)
    return pa.Table.from_pydict({
        "n_rows": pa.array([int(counts.sum())], pa.int64()),
        "n_groups": pa.array([len(M)], pa.int64()),
        "n_groups_above_t": pa.array([int((dist > t).sum())], pa.int64()),
        "max_distance": pa.array([round(float(dist.max()), 6)],
                                 pa.float64()),
        "mean_distance": pa.array([round(float(dist.mean()), 6)],
                                  pa.float64()),
        "t": pa.array([float(t)], pa.float64()),
        "measure": pa.array([measure], pa.string())})
