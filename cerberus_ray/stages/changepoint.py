"""Single change-point detection per key — the scaled-CUSUM mean-shift
statistic (standard likelihood-ratio form for a Gaussian mean change,
public method; the one-split core of binary segmentation).

For each key's time-ordered series the candidate split at position i
(1 ≤ i < n) scores ``sqrt(i·(n−i)/n) · |mean(left) − mean(right)|``;
the detector reports the argmax split, its score, and both segment
means. Fully vectorizable ACROSS keys: one keyed exchange, then prefix
sums + group-boundary masks inside each bucket — no per-key Python
(the `keyed_window` contract). The statistic is pure arithmetic over
window sums, so the DuckDB oracle mirrors it exactly with SUM() OVER
windows (tests/test_changepoint.py).

Scale note: one pass, output one row per key. Multiple change points =
recurse on the two halves (binary segmentation) — per-key recursion the
caller drives on the detected splits; the single-split primitive is the
distributed part.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .keyed_window import keyed_apply


def single_changepoint(ds, key_col: str, ts_col: str, value_col: str,
                       *, n_buckets: int = 32, round_digits: int = 6):
    """→ Dataset (key_col, n, cp_index, score, mean_left, mean_right):
    ``cp_index`` = size of the left segment at the best split (1-based
    count of rows before the change); keys with < 2 rows are skipped.
    Ties break on the smaller cp_index (deterministic)."""

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        d = g.sort_values([key_col, ts_col],
                          kind="mergesort").reset_index(drop=True)
        keys = d[key_col]
        v = d[value_col].to_numpy(dtype=np.float64)
        new = keys.ne(keys.shift()).to_numpy()
        gid = np.cumsum(new) - 1                     # 0-based key index
        # per-key sizes and global prefix sums
        sizes = np.bincount(gid)
        starts = np.r_[0, np.cumsum(sizes)[:-1]]
        cs = np.cumsum(v)
        base = np.r_[0.0, cs][starts[gid]]           # sum before key
        pref = cs - base                             # within-key prefix
        i = np.arange(len(v)) - starts[gid] + 1      # within-key pos
        n = sizes[gid].astype(np.float64)
        tot = (np.r_[0.0, cs][starts[gid] + sizes[gid]] - base)
        # candidate split AFTER row i (valid for i < n)
        valid = i < n
        ml = pref / i
        mr = (tot - pref) / np.maximum(n - i, 1)
        stat = np.sqrt(i * (n - i) / n) * np.abs(ml - mr)
        stat = np.where(valid, stat, -np.inf)
        # per-key argmax with smaller-index tie-break: stable lexsort
        order = np.lexsort((i, -stat, gid))
        first = np.r_[True, gid[order][1:] != gid[order][:-1]]
        best = order[first]
        ok = sizes[gid[best]] >= 2
        best = best[ok]
        return pd.DataFrame({
            key_col: keys.to_numpy()[best],
            "n": sizes[gid[best]].astype(np.int64),
            "cp_index": i[best].astype(np.int64),
            "score": np.round(stat[best], round_digits),
            "mean_left": np.round(ml[best], round_digits),
            "mean_right": np.round(mr[best], round_digits)})

    return keyed_apply(ds, key_col, kernel, n_buckets=n_buckets)
