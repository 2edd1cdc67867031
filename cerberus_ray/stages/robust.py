"""Robust grouped location/scale statistics — trimmed mean, winsorized
mean, MAD — as CLOSED FORMS over the exact per-(group, value) census
(`ranktests._group_value_census`): the third member of the
census-sufficient-statistic family (ranks → ranktests, quantile maps →
quantile_norm, robust moments → here). Complements
`stages/outliers.py`, which transforms/flags rows against GLOBAL
fences; these summarize per group without materializing any rows.

All arithmetic is exact integers (counts, weighted partial sums in
1/scale units) until the final division, so results are
layout-invariant and bit-comparable with the DuckDB window oracles in
tests/test_robust.py. One census pass, no exchange.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .ranktests import _group_value_census

__all__ = ["grouped_robust_stats"]


def _per_group(census: pd.DataFrame):
    """Yield (group, values int64 asc, counts int64) per group from a
    (g, v, n) census sorted by (g, v)."""
    for g, sub in census.groupby("g", sort=True):
        yield g, sub["v"].to_numpy(np.int64), sub["n"].to_numpy(
            np.int64)


def _trim_bounds(counts: np.ndarray, k: int):
    """Exact weighted removal of the k smallest and k largest items:
    → per-value kept counts (int64)."""
    cum = np.cumsum(counts)
    n = int(cum[-1])
    kept = counts.copy()
    # remove k from the bottom
    take = np.minimum(counts, np.maximum(0, k - (cum - counts)))
    kept = kept - take
    # remove k from the top (mirror)
    cum_hi = np.cumsum(counts[::-1])[::-1]  # count at-or-above value
    take_hi = np.minimum(counts,
                         np.maximum(0, k - (cum_hi - counts)))
    kept = kept - np.minimum(take_hi, kept)
    return kept, n


def _disc_quantile(values: np.ndarray, counts: np.ndarray,
                   pos: int) -> int:
    """1-based lower order statistic from a weighted census."""
    idx = int(np.searchsorted(np.cumsum(counts), pos))
    return int(values[min(idx, len(values) - 1)])


def grouped_robust_stats(ds, group_col: str, value_col: str, *,
                         trim: float = 0.1,
                         scale: int = 100) -> pd.DataFrame:
    """→ one row per group: (group_col, n, trimmed_mean,
    winsorized_mean, median, mad), sorted by group.

    - trimmed_mean drops the ⌊trim·n⌋ smallest AND largest values;
    - winsorized_mean clamps them to the surviving extremes;
    - median / mad use the LOWER (``quantile_disc``) order statistic,
      the engine's exact-integer convention (Brown-Forsythe, RFM)."""
    if not 0 <= trim < 0.5:
        raise ValueError(f"trim must be in [0, 0.5), got {trim}")
    census = _group_value_census(ds, group_col, value_col, scale)
    rows = []
    if len(census):
        census = census.sort_values(["g", "v"]).reset_index(drop=True)
        for g, v, c in _per_group(census):
            n = int(c.sum())
            k = int(np.floor(trim * n))
            kept, _ = _trim_bounds(c, k)
            kept_n = int(kept.sum())
            tmean = (float(int((v * kept).sum())) / kept_n / scale
                     if kept_n else float("nan"))
            # winsorize: clamp the k removed at each end to the
            # surviving extremes
            nz = np.flatnonzero(kept)
            if len(nz):
                lo_v, hi_v = int(v[nz[0]]), int(v[nz[-1]])
                wsum = int((v * kept).sum()) + k * lo_v + k * hi_v
                wmean = float(wsum) / n / scale
            else:
                wmean = float("nan")
            med = _disc_quantile(v, c, (n + 1) // 2)
            # MAD: census of |v - med| derives directly from the census
            av = np.abs(v - med)
            order = np.argsort(av, kind="mergesort")
            mad = _disc_quantile(av[order], c[order], (n + 1) // 2)
            rows.append({group_col: g, "n": n, "trimmed_mean": tmean,
                         "winsorized_mean": wmean,
                         "median": med / scale, "mad": mad / scale})
    out = pd.DataFrame(rows, columns=[group_col, "n", "trimmed_mean",
                                      "winsorized_mean", "median",
                                      "mad"])
    return out.reset_index(drop=True)
