"""Generic interval join: all (left, right) row pairs whose closed
intervals overlap — the two-table temporal/range join (room bookings ×
maintenance windows, sessions × incidents). Generalizes the keyed
overlap self-sweep of the booking rules (cerberus/models/booking.py:72-83)
to two arbitrary tables.

Predicate: ``l_start ≤ r_end AND r_start ≤ l_end`` (closed-interval
overlap); ``how='contains'`` instead keeps pairs where the left interval
fully contains the right.

Execution shape: one ``keyed_apply`` hash exchange on the equality key
co-locates both sides (``on=None`` degrades to a single bucket —
driver-sized inputs only, documented); inside each bucket the rights
sort by start and every left resolves a CANDIDATE WINDOW with two
``np.searchsorted`` calls — starts in ``[l_start − max_right_length,
l_end]`` — then the exact predicate filters the expanded pairs. The
max-length band is the standard banded interval-join bound: candidate
count per left is output size plus the rights whose start falls in the
band, so heavily skewed interval lengths (one year-long right among
millisecond rights) widen the band — split such tables by duration
class first (documented contract)."""

from __future__ import annotations

from typing import Optional

import numpy as np
import pandas as pd

__all__ = ["interval_join"]

_SIDE = "__ij_side"
_ALLKEY = "__ij_all"


def interval_join(left_ds, right_ds, *, on: Optional[str] = None,
                  left_start: str = "start", left_end: str = "end",
                  right_start: str = "start", right_end: str = "end",
                  how: str = "overlap", suffix: str = "_r",
                  n_buckets: int = 32):
    """→ Dataset: one row per qualifying pair — all left columns plus
    the right columns (collisions suffixed; the right's key column is
    dropped, it always equals the left's). Interval columns must be
    NUMERIC (cast datetimes to epoch ints first — the keyed path shifts
    values arithmetically per key)."""
    if how not in ("overlap", "contains"):
        raise ValueError(f"unknown how {how!r}")
    from .keyed_window import keyed_apply

    lcols = list(left_ds.schema().names)
    rcols = list(right_ds.schema().names)
    ren = {c: (c + suffix if c in lcols else c)
           for c in rcols if c != on}
    r_out = [ren[c] for c in rcols if c != on]
    out_cols = lcols + r_out
    key = on if on is not None else _ALLKEY
    unified = (lcols if on is None else lcols) + r_out

    def tag(side: int):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            # drop null-bounded intervals up front: SQL range predicates
            # on NULL are false, and a NaN reaching gmin/gmax/band would
            # poison the whole bucket's shifted sweep
            bounds = ([left_start, left_end] if side == 0
                      else [right_start, right_end])
            df = df.dropna(subset=bounds)
            out = df.rename(columns=ren) if side else df.copy()
            for c in unified:
                if c not in out.columns:
                    out[c] = None
            if on is None:
                out[_ALLKEY] = np.int8(0)
            out[_SIDE] = np.int8(side)
            cols = unified + ([_ALLKEY] if on is None else [])
            return out[cols + [_SIDE]]
        return fn

    u = (left_ds.map_batches(tag(0), batch_format="pandas")
         .union(right_ds.map_batches(tag(1), batch_format="pandas")))
    rs, re_ = ren[right_start], ren[right_end]

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        Lg = g[g[_SIDE] == 0]
        Rg = g[g[_SIDE] == 1]
        if not len(Lg) or not len(Rg):
            return pd.DataFrame({c: [] for c in out_cols})
        L, R = Lg[lcols], Rg[r_out]
        ls_v = L[left_start].to_numpy()
        le_v = L[left_end].to_numpy()
        rs_v = R[rs].to_numpy()
        re_v = R[re_].to_numpy()
        if on is not None:
            # one vectorized sweep for ALL keys: shift each key's
            # intervals into a disjoint region (2×span apart) so the
            # banded sweep never pairs across keys — a cross-key pair
            # would need an overlap wider than a region gap
            codes, _ = pd.factorize(pd.concat(
                [Lg[key], Rg[key]], ignore_index=True), sort=False)
            cl, cr = codes[:len(L)], codes[len(L):]
            gmin = min(ls_v.min(), rs_v.min())
            gmax = max(le_v.max(), re_v.max())
            step = (gmax - gmin) * 2 + 1
            L = L.assign(__ls=ls_v + cl * step, __le=le_v + cl * step)
            R = R.assign(__rs=rs_v + cr * step, __re=re_v + cr * step)
            return _pairs(L, R, "__ls", "__le", "__rs", "__re", how,
                          out_cols)
        return _pairs(L, R, left_start, left_end, rs, re_, how, out_cols)

    return keyed_apply(u, key, kernel, n_buckets=n_buckets)


def _pairs(L: pd.DataFrame, R: pd.DataFrame, ls: str, le: str, rs: str,
           re_: str, how: str, out_cols) -> pd.DataFrame:
    R = R.sort_values(rs, kind="mergesort").reset_index(drop=True)
    r_start = R[rs].to_numpy()
    r_end = R[re_].to_numpy()
    band = (r_end - r_start).max()
    l_start = L[ls].to_numpy()
    l_end = L[le].to_numpy()
    lo = np.searchsorted(r_start, l_start - band, side="left")
    hi = np.searchsorted(r_start, l_end, side="right")
    counts = np.maximum(0, hi - lo)
    li = np.repeat(np.arange(len(L)), counts)
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    ri = (np.arange(int(counts.sum())) - np.repeat(starts, counts)
          + np.repeat(lo, counts))
    if how == "overlap":
        ok = (l_start[li] <= r_end[ri]) & (r_start[ri] <= l_end[li])
    else:  # contains
        ok = (l_start[li] <= r_start[ri]) & (r_end[ri] <= l_end[li])
    li, ri = li[ok], ri[ok]
    out = pd.concat([L.iloc[li].reset_index(drop=True),
                     R.iloc[ri].reset_index(drop=True)], axis=1)
    return out[out_cols]
