"""Incremental grouped-aggregate maintenance (materialized-view
delta refresh): keep a compact mergeable STATE per group, fold insert
(and optionally delete) deltas into it, finalize on demand — the
aggregate analogue of `pipelines/incremental.py`'s delta-scoped
revalidation and `pipelines/merge.py`'s row upserts. At 10¹² rows the
point is that a refresh touches O(|delta| + #affected groups), never
the base table.

State per (group, tracked column): (count, sum, min, max) — every
supported finalizer (count/sum/mean/min/max) is a closed form over it.
Sums are held in EXACT integer 1/scale units (the engine's money
convention) so state merges are order-independent and a maintained
view is BITWISE-equal to a full recompute, not approximately equal.

Deletes: count/sum/mean retract exactly. min/max are NOT retractable
from this state (removing the current extremum needs the group's full
multiset); ``apply_delta(..., deletes=True)`` therefore RAISES if the
state tracks min/max — callers either recompute those groups from
source or keep insert-only views. This is the standard
materialized-view distinction (algebraic vs holistic retraction), made
loud instead of silent.
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

import numpy as np
import pandas as pd
import pyarrow as pa

__all__ = ["grouped_state", "apply_delta", "finalize"]

_STATE_FNS = ("count", "sum", "min", "max")


def _state_partials(ds, group_cols, value_col: str, scale: int):
    def partial(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        col = b[value_col]
        if col.null_count:
            b = b.filter(pc.is_valid(col))
            col = b[value_col]
        v = np.rint(col.to_numpy(zero_copy_only=False)
                    * scale).astype(np.int64)
        t = pa.Table.from_pydict({
            **{g: b[g] for g in group_cols},
            "n": pa.array(np.ones(len(v), np.int64), pa.int64()),
            "s": pa.array(v, pa.int64()),
            "mn": pa.array(v, pa.int64()),
            "mx": pa.array(v, pa.int64())})
        return t.group_by(list(group_cols)).aggregate(
            [("n", "sum"), ("s", "sum"), ("mn", "min"), ("mx", "max")])

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True).to_pandas()
    if not len(parts):
        return pd.DataFrame(columns=[*group_cols, "n", "s", "mn",
                                     "mx"])
    out = parts.groupby(list(group_cols), as_index=False).agg(
        n=("n_sum", "sum"), s=("s_sum", "sum"),
        mn=("mn_min", "min"), mx=("mx_max", "max"))
    return out


def grouped_state(ds, group_cols: Sequence[str], value_col: str, *,
                  scale: int = 100, track_minmax: bool = True
                  ) -> pd.DataFrame:
    """Build the mergeable per-group state from a Dataset: columns
    (group_cols…, n, s, mn, mx) — exact integers. ``track_minmax=
    False`` drops mn/mx so the state stays delete-retractable."""
    st = _state_partials(ds, list(group_cols), value_col, scale)
    st = st.sort_values(list(group_cols)).reset_index(drop=True)
    if not track_minmax:
        st = st.drop(columns=["mn", "mx"])
    return st


def apply_delta(state: pd.DataFrame, delta_ds,
                group_cols: Sequence[str], value_col: str, *,
                scale: int = 100, deletes: bool = False
                ) -> pd.DataFrame:
    """Fold a delta Dataset into ``state``. ``deletes=True`` treats
    every delta row as a retraction (count/sum shrink); it RAISES if
    the state tracks min/max. Groups whose count reaches 0 drop out of
    the state; a negative count raises (over-retraction = the delta
    does not match the view)."""
    group_cols = list(group_cols)
    has_minmax = "mn" in state.columns
    if deletes and has_minmax:
        raise ValueError(
            "min/max are not retractable from (count,sum,min,max) "
            "state — rebuild with track_minmax=False or recompute "
            "the affected groups from source")
    d = _state_partials(delta_ds, group_cols, value_col, scale)
    if deletes:
        d["n"] = -d["n"]
        d["s"] = -d["s"]
    if not has_minmax and len(d):
        d = d.drop(columns=["mn", "mx"])
    merged = pd.concat([state, d], ignore_index=True)
    aggs = {"n": ("n", "sum"), "s": ("s", "sum")}
    if has_minmax:
        aggs["mn"] = ("mn", "min")
        aggs["mx"] = ("mx", "max")
    out = merged.groupby(group_cols, as_index=False).agg(**aggs)
    if (out["n"] < 0).any():
        bad = out[out["n"] < 0][group_cols].iloc[0].to_dict()
        raise ValueError(f"over-retraction: group {bad} would have "
                         f"negative count — delta does not match the "
                         f"maintained view")
    out = out[out["n"] > 0]
    return out.sort_values(group_cols).reset_index(drop=True)


def finalize(state: pd.DataFrame, group_cols: Sequence[str],
             aggs: Dict[str, str], *, scale: int = 100
             ) -> pd.DataFrame:
    """→ final view: one output column per ``aggs`` entry (name → fn ∈
    {count, sum, mean, min, max}), values back in original units."""
    group_cols = list(group_cols)
    out = state[group_cols].copy()
    for name, fn in aggs.items():
        if fn == "count":
            out[name] = state["n"].astype("int64")
        elif fn == "sum":
            out[name] = state["s"].astype("int64") / scale
        elif fn == "mean":
            out[name] = (state["s"].to_numpy(np.float64)
                         / state["n"].to_numpy(np.float64)) / scale
        elif fn in ("min", "max"):
            col = "mn" if fn == "min" else "mx"
            if col not in state.columns:
                raise ValueError(f"state does not track {fn} "
                                 f"(built with track_minmax=False)")
            out[name] = state[col].astype("int64") / scale
        else:
            raise ValueError(f"unsupported finalizer {fn!r}")
    return out.sort_values(group_cols).reset_index(drop=True)
