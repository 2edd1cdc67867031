"""Quantile normalization across groups: map each group's value
distribution onto the POOLED distribution (batch-effect correction —
the standard preprocessing step when per-source measurement scales
drift; public method, e.g. Bolstad et al. 2003 for arrays). The ML
companion of `stages/drift.py`: drift DETECTS per-source distribution
shift, this REMOVES it.

Like `stages/ranktests.py`, it exploits the bounded 2-dp domain: the
per-(group, value) count census is a sufficient statistic. Each
distinct (group, value) maps to the pooled type-1 (``quantile_disc``)
quantile at its within-group MIDRANK position; the position index is
computed with INTEGER ceil-division ((2·cum_before + t + 1)·N +
2·n_g − 1) // (2·n_g), so there is no float boundary to disagree with
the oracle about.

Scale shape: census partials per block (#groups × #distinct values),
closed-form mapping on the driver, and an optional streamed transform
that applies the broadcast mapping per batch with one composite-key
searchsorted. No exchange anywhere.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .ranktests import _group_value_census

__all__ = ["quantile_normalize_map", "apply_quantile_map"]


def quantile_normalize_map(ds, group_col: str, value_col: str, *,
                           scale: int = 100) -> pd.DataFrame:
    """→ mapping DataFrame (group_col, value, norm_value) sorted by
    (group, value), in original units: every row of ``group_col=g,
    value_col=v`` should be replaced by ``norm_value``."""
    census = _group_value_census(ds, group_col, value_col, scale)
    if not len(census):
        return pd.DataFrame({group_col: [], "value": [],
                             "norm_value": []})
    census = census.sort_values(["g", "v"]).reset_index(drop=True)
    pooled = (census.groupby("v", as_index=False)["n"].sum()
              .sort_values("v").reset_index(drop=True))
    pool_v = pooled["v"].to_numpy(np.int64)
    cw = np.cumsum(pooled["n"].to_numpy(np.int64))
    n_total = int(cw[-1])

    g = census["g"].to_numpy()
    t = census["n"].to_numpy(np.int64)
    # within-group cumulative count BEFORE each distinct value
    starts = np.flatnonzero(np.r_[True, g[1:] != g[:-1]])
    sizes = np.diff(np.r_[starts, len(g)])
    cum = np.cumsum(t)
    grp_tot = np.add.reduceat(t, starts)
    # per-group exclusive cumsum
    base = np.repeat(cum[starts] - t[starts], sizes)
    cum_before = cum - t - base
    n_g = np.repeat(grp_tot, sizes)
    # integer ceil position of the midrank quantile in the pooled CDF
    # (Python ints: (2c+t+1)·N can exceed int64 at 10¹²-row scale; the
    # loop is over the domain-bounded census, not rows)
    pos = np.array(
        [int(((2 * int(c) + int(tt) + 1) * n_total
              + 2 * int(ng) - 1) // (2 * int(ng)))
         for c, tt, ng in zip(cum_before, t, n_g)], dtype=np.int64)
    idx = np.searchsorted(cw, pos, side="left")
    idx = np.clip(idx, 0, len(pool_v) - 1)
    return pd.DataFrame({
        group_col: g, "value": census["v"].to_numpy(np.int64) / scale,
        "norm_value": pool_v[idx] / scale})


def apply_quantile_map(ds, mapping: pd.DataFrame, group_col: str,
                       value_col: str, *, scale: int = 100,
                       out_col: str | None = None):
    """Streamed transform: replace ``value_col`` (or write
    ``out_col``) using the broadcast mapping — one composite-key
    searchsorted per batch. Unmapped (group, value) pairs raise (the
    mapping must come from the same corpus or a superset census)."""
    import ray

    out_col = out_col or value_col
    # per-group (sorted values, norms) — groups are domain-bounded, so
    # the per-batch work is one mask + one searchsorted per group (no
    # string-key joins: np.char.add is ~3µs/element, never in kernels)
    per_group = {}
    for gval, sub in mapping.groupby(group_col, sort=True):
        v = np.rint(sub["value"].to_numpy(np.float64)
                    * scale).astype(np.int64)
        o = np.argsort(v, kind="mergesort")
        per_group[gval] = (v[o],
                           sub["norm_value"].to_numpy(np.float64)[o])
    ref = ray.put(per_group)

    def transform(b: pa.Table) -> pa.Table:
        pg = ray.get(ref)
        gv = b[group_col].to_numpy(zero_copy_only=False)
        vv = np.rint(b[value_col].to_numpy(zero_copy_only=False)
                     * scale).astype(np.int64)
        out = np.empty(len(vv), np.float64)
        for gval in pd.unique(gv):
            if gval not in pg:
                raise ValueError(f"apply_quantile_map: unmapped "
                                 f"group {gval!r}")
            keys, norm = pg[gval]
            m = gv == gval
            pos = np.searchsorted(keys, vv[m])
            pos_c = np.clip(pos, 0, max(len(keys) - 1, 0))
            if not (keys[pos_c] == vv[m]).all():
                raise ValueError("apply_quantile_map: unmapped "
                                 "(group, value) pair in batch")
            out[m] = norm[pos_c]
        cols = {c: b[c] for c in b.column_names}
        cols[out_col] = pa.array(out, pa.float64())
        return pa.Table.from_pydict(cols)

    return ds.map_batches(transform, batch_format="pyarrow",
                          zero_copy_batch=True)
