"""Grouped value-concentration metrics: Lorenz/Gini, Herfindahl (HHI)
and top-share of a member's value total within its group — "how
concentrated is revenue across customers per nation". Complements
`stages/skew.key_skew_report` (count concentration over ONE global key
distribution) with per-group VALUE concentration.

Reference analogue: the reference's per-group money roll-ups
(/root/reference/cerberus/models/invoice.py:211-231) extended to the
inequality statistics a mixture-weighting pipeline needs (e.g. "is one
source dominating this domain's token budget?" before reweighting).

Scale shape: member totals are the only fact-bounded intermediate.
``driver`` mode merges per-block pyarrow (group, member) partials on
the driver (band-bounded, the engine's small-key convention);
``shuffle`` resolves member totals with Ray's hash groupby and computes
the per-group metrics inside a `keyed_apply` exchange — both share one
vectorized metric kernel (lexsort + per-group cumsum, no Python per
group), agreement-tested.

Values are 2-dp money → EXACT int64 cents; Σi·xᵢ and Σx² are exact
integer sums (Python-int merged), so Gini/HHI are single float
divisions — DuckDB window-SQL parity is bit-tight (ties contribute the
same Σi·xᵢ under any tie order because equal values commute).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .keyed_window import keyed_apply

__all__ = ["concentration_by_group"]

#: beyond this many (group, member) combos the driver merge is the
#: wrong plan — same band as the engine's other driver-mode merges
_DRIVER_MAX_COMBOS = 5_000_000


def _metrics(df: pd.DataFrame, group_col: str) -> pd.DataFrame:
    """Vectorized per-group metrics over a (group, cents) member-total
    frame: one lexsort, per-group cumsums, no per-group Python."""
    if not len(df):
        return pd.DataFrame({group_col: pd.Series([], dtype=object),
                             "n_members": pd.Series([], dtype="int64"),
                             "total": pd.Series([], dtype="float64"),
                             "gini": pd.Series([], dtype="float64"),
                             "hhi": pd.Series([], dtype="float64"),
                             "top1_share": pd.Series([],
                                                     dtype="float64")})
    d = df.sort_values([group_col, "cents"],
                       kind="mergesort").reset_index(drop=True)
    g = d[group_col].to_numpy()
    x = d["cents"].to_numpy(np.int64)
    starts = np.flatnonzero(np.r_[True, g[1:] != g[:-1]])
    sizes = np.diff(np.r_[starts, len(g)])
    # within-group 1-based rank (values ascending)
    rank = np.arange(len(g), dtype=np.int64) - np.repeat(starts,
                                                         sizes) + 1
    xf = x.astype(np.float64)
    tot = np.add.reduceat(xf, starts)
    ixs = np.add.reduceat(rank.astype(np.float64) * xf, starts)
    sq = np.add.reduceat(xf * xf, starts)
    nn = sizes.astype(np.float64)
    with np.errstate(invalid="ignore", divide="ignore"):
        gini = np.where(tot > 0,
                        2.0 * ixs / (nn * tot) - (nn + 1.0) / nn, 0.0)
        hhi = np.where(tot > 0, sq / (tot * tot), np.nan)
        top1 = np.where(tot > 0,
                        np.maximum.reduceat(xf, starts) / tot, np.nan)
    return pd.DataFrame({
        group_col: g[starts], "n_members": sizes.astype("int64"),
        "total": tot / 100.0, "gini": gini, "hhi": hhi,
        "top1_share": top1})


def concentration_by_group(ds, group_col: str, member_col: str,
                           value_col: str, *, mode: str = "auto",
                           n_buckets: int = 32,
                           scale: int = 100) -> pd.DataFrame:
    """→ one row per group: (group_col, n_members, total, gini, hhi,
    top1_share), sorted by group. Member totals are Σ value over the
    member's rows in exact integer 1/scale units; nulls drop per SQL
    SUM semantics."""

    def to_cents(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        col = b[value_col]
        if col.null_count:
            b = b.filter(pc.is_valid(col))
            col = b[value_col]
        v = col.to_numpy(zero_copy_only=False)
        return pa.Table.from_pydict({
            group_col: b[group_col], member_col: b[member_col],
            "cents": pa.array(np.rint(v * scale).astype(np.int64),
                              pa.int64())})

    lane = ds.map_batches(to_cents, batch_format="pyarrow",
                          zero_copy_batch=True)
    if mode == "auto":
        mode = ("driver" if lane.count() <= _DRIVER_MAX_COMBOS
                else "shuffle")
    if mode == "driver":
        def partial(b: pa.Table) -> pa.Table:
            return b.group_by([group_col, member_col]).aggregate(
                [("cents", "sum")])

        parts = lane.map_batches(partial, batch_format="pyarrow",
                                 zero_copy_batch=True).to_pandas()
        member = parts.groupby([group_col, member_col],
                               as_index=False)["cents_sum"].sum()
        member = member.rename(columns={"cents_sum": "cents"})
        out = _metrics(member[[group_col, "cents"]], group_col)
    elif mode == "shuffle":
        member = lane.groupby([group_col, member_col]).sum("cents")

        def kernel(g: pd.DataFrame) -> pd.DataFrame:
            d = g.rename(columns={"sum(cents)": "cents"})
            return _metrics(d[[group_col, "cents"]], group_col)

        out = keyed_apply(member, group_col, kernel,
                          n_buckets=n_buckets).to_pandas()
    else:
        raise ValueError(f"unknown mode: {mode!r}")
    return out.sort_values(group_col).reset_index(drop=True)
