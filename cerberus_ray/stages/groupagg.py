"""Map-side combined grouped aggregation with a driver-side final merge.

The right plan when the GROUP CARDINALITY is small (weeks, types, langs,
months — bounded by the domain, not the data): each block produces one
partial row per group (pyarrow hash aggregate), and the driver merges
(#blocks × #groups) tiny rows with pandas. No Ray all-to-all — measured
~3 s fixed cost per groupby on this Ray version (BASELINE.md) — and the
pattern stays correct at any input size because the output is bounded.

For unbounded group keys (order ids, doc ids) use the uniqueness/shuffle
machinery instead.
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import pandas as pd
import pyarrow as pa


def grouped_agg(ds, group_cols: Sequence[str],
                aggs: Dict[str, Tuple[str, str]]) -> pd.DataFrame:
    """→ pandas frame: one row per group.

    ``aggs`` maps output column → (input column, fn) with fn ∈
    {count, sum, mean, min, max}. ``count`` counts rows (input column
    ignored). Means are merged exactly from (sum, non-null count)
    partials — SQL AVG ignores NULLs, so the divisor is the aggregated
    column's own non-null count, not the group's row count.
    """
    group_cols = list(group_cols)
    pa_aggs: List[Tuple[str, str]] = []
    need_count = False
    for out_col, (col, fn) in aggs.items():
        if fn == "count":
            need_count = True
        elif fn == "mean":
            pa_aggs.append((col, "sum"))
            pa_aggs.append((col, "count"))  # non-null count (AVG divisor)
        elif fn in ("sum", "min", "max"):
            pa_aggs.append((col, fn))
        else:
            raise ValueError(f"unsupported agg {fn!r}")
    pa_aggs = sorted(set(pa_aggs))
    if need_count:
        pa_aggs.append(([], "count_all"))

    def partial(b: pa.Table) -> pa.Table:
        return b.group_by(group_cols).aggregate(pa_aggs)

    pdf = ds.map_batches(partial, batch_format="pyarrow",
                         zero_copy_batch=True).to_pandas()
    if not len(pdf):
        cols = group_cols + list(aggs)
        return pd.DataFrame({c: [] for c in cols})

    merge_plan = {}
    for col, fn in pa_aggs:
        if fn == "count_all":
            merge_plan["count_all"] = "sum"
        else:
            # partial sums AND partial counts both merge by summing
            merge_plan[f"{col}_{fn}"] = "sum" if fn in ("sum", "count") else fn
    g = pdf.groupby(group_cols, as_index=False, dropna=False).agg(merge_plan)

    out = g[group_cols].copy()
    for out_col, (col, fn) in aggs.items():
        if fn == "count":
            out[out_col] = g["count_all"].astype("int64")
        elif fn == "mean":
            # divide by the column's non-null count; a 0-count group
            # yields NaN, matching SQL AVG = NULL over all-NULL input
            out[out_col] = g[f"{col}_sum"] / g[f"{col}_count"].replace(0, pd.NA)
        elif fn == "sum":
            out[out_col] = g[f"{col}_sum"]
        else:
            out[out_col] = g[f"{col}_{fn}"]
    return out.sort_values(group_cols).reset_index(drop=True)
