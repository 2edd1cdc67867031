"""Pivot (long→wide) and unpivot (wide→long) reshaping.

``pivot`` is SQL conditional aggregation — one output column per
distinct value of the pivot column::

    SELECT idx, SUM(CASE WHEN p = 'a' THEN v END) AS a, ... GROUP BY idx

The pivot-value domain is bounded (it becomes the schema), so the wide
row width is small; the INDEX cardinality is the data-sized axis and
drives the mode planner, mirroring ``uniqueness.duplicate_key_counts``:

- ``driver`` (small/mid index cardinality): per-block pyarrow
  hash-aggregate partials on (index, pivot) stream to the driver —
  O(#index × #pivot-values) tiny rows — and reshape there.
- ``shuffle``: each block reshapes its partials to wide rows, then one
  ``groupby(index).aggregate`` exchange merges them (Sum/Min/Max are
  mergeable; mean merges from sum+count partials). The beyond-driver-
  memory path; high fixed cost that amortizes on genuinely big inputs.

Missing (index, pivot-value) combinations follow the SQL conditional-
aggregation convention: ``count`` → 0, every other agg → NULL.

``unpivot`` (SQL UNPIVOT / pandas melt) is a stateless streamed
per-batch transform — no exchange, no driver state.

Reference shape: the reporting matrices the reference renders as
per-status × per-month tables (cerberus/crm/views.py dashboard
breakdowns) — computed there row-by-row in Python, here as one
conditional aggregation.
"""

from __future__ import annotations

from typing import List, Sequence

import numpy as np
import pandas as pd
import pyarrow as pa

__all__ = ["pivot", "unpivot", "pivot_values"]

_AGGS = ("sum", "count", "min", "max", "mean")


def pivot_values(ds, pivot_col: str, *, max_values: int = 10_000) -> List:
    """Distinct pivot-column values (per-block unique partials, driver
    set union — bounded because the values become output COLUMNS; raises
    beyond ``max_values`` instead of exploding the schema)."""
    parts = ds.map_batches(
        lambda b: pa.Table.from_pydict(
            {pivot_col: b[pivot_col].unique()}),
        batch_format="pyarrow", zero_copy_batch=True).to_pandas()
    vals = sorted(parts[pivot_col].dropna().unique().tolist())
    if len(vals) > max_values:
        raise ValueError(
            f"{len(vals)} distinct pivot values exceed max_values="
            f"{max_values}; a pivot this wide is a schema explosion — "
            "aggregate or bucket the pivot column first")
    return vals


def _partial(b: pa.Table, index_cols: List[str], pivot_col: str,
             value_col: str, fns: List[str]) -> pa.Table:
    return b.group_by(index_cols + [pivot_col]).aggregate(
        [(value_col, f) for f in fns])


def pivot(ds, index_cols: Sequence[str], pivot_col: str, value_col: str,
          agg: str = "sum", *, values: Sequence | None = None,
          mode: str = "auto", n_rows_hint: int = 0) -> pd.DataFrame:
    """→ pandas frame: one row per distinct ``index_cols`` tuple, one
    column per pivot value (named ``str(value)``), cells aggregated with
    ``agg`` ∈ {sum, count, min, max, mean}. Pass ``values`` to pin the
    output schema (and column order) regardless of the data; discovered
    values are sorted. Rows with a null pivot key (no SQL column can
    hold them) or a null index key are dropped — documented convention,
    identical in both modes."""
    if agg not in _AGGS:
        raise ValueError(f"unsupported agg {agg!r}; one of {_AGGS}")
    index_cols = list(index_cols)
    vals = list(values) if values is not None else pivot_values(ds, pivot_col)
    names = [str(v) for v in vals]
    if len(set(names)) != len(names):
        raise ValueError("pivot values collide after str() naming")

    if mode == "auto":
        n = n_rows_hint or ds.count()
        mode = "driver" if n <= 5_000_000 else "shuffle"

    fns = ["sum", "count"] if agg == "mean" else [agg]

    if mode == "driver":
        pdf = ds.map_batches(
            lambda b: _partial(b, index_cols, pivot_col, value_col, fns),
            batch_format="pyarrow", zero_copy_batch=True).to_pandas()
        pdf = pdf[pdf[pivot_col].notna()
                  & pdf[index_cols].notna().all(axis=1)]
        if not len(pdf):
            return pd.DataFrame({c: [] for c in index_cols + names})
        merged = pdf.groupby(index_cols + [pivot_col], as_index=False,
                             dropna=False).agg(
            {f"{value_col}_{f}": ("sum" if f in ("sum", "count") else f)
             for f in fns})
        if agg == "mean":
            cell = merged[f"{value_col}_sum"] / merged[
                f"{value_col}_count"].replace(0, np.nan)
        else:
            cell = merged[f"{value_col}_{agg}"]
        merged = merged.assign(__cell=cell)
        wide = merged.pivot_table(index=index_cols, columns=pivot_col,
                                  values="__cell", aggfunc="first",
                                  dropna=False)
        wide = wide.reindex(columns=vals)
        wide.columns = [str(c) for c in wide.columns]
        wide = wide.reset_index()
    else:  # shuffle
        wide = _pivot_shuffle(ds, index_cols, pivot_col, value_col, agg,
                              vals, names, fns)

    if agg == "count":
        wide[names] = wide[names].fillna(0).astype("int64")
    return (wide[index_cols + names].sort_values(index_cols)
            .reset_index(drop=True))


def _pivot_shuffle(ds, index_cols, pivot_col, value_col, agg, vals, names,
                   fns) -> pd.DataFrame:
    from ray.data.aggregate import Max, Min, Sum

    def to_wide(b: pa.Table) -> pd.DataFrame:
        g = _partial(b, index_cols, pivot_col, value_col, fns).to_pandas()
        g = g[g[pivot_col].notna() & g[index_cols].notna().all(axis=1)]
        frames = {}
        for f in fns:
            w = g.pivot_table(index=index_cols, columns=pivot_col,
                              values=f"{value_col}_{f}", aggfunc="first",
                              dropna=False).reindex(columns=vals)
            w.columns = [f"{n}__{f}" for n in names]
            frames.update({c: w[c] for c in w.columns})
        out = pd.DataFrame(frames)
        if agg == "count":  # absent combos must merge as 0, not null
            out = out.fillna(0.0)
        return out.reset_index()

    wide_parts = ds.map_batches(to_wide, batch_format="pyarrow",
                                zero_copy_batch=True)
    agg_cls = {"sum": Sum, "count": Sum, "mean": Sum,
               "min": Min, "max": Max}[agg]
    ray_aggs = [agg_cls(f"{n}__{f}", ignore_nulls=True,
                        alias_name=f"{n}__{f}")
                for n in names for f in fns]
    merged = (wide_parts.groupby(index_cols).aggregate(*ray_aggs)
              .repartition(8).to_pandas())
    out = merged[index_cols].copy()
    for n in names:
        if agg == "mean":
            out[n] = merged[f"{n}__sum"] / merged[f"{n}__count"].replace(
                0, np.nan)
        else:
            out[n] = merged[f"{n}__{fns[0]}"]
    return out


def unpivot(ds, id_cols: Sequence[str], value_cols: Sequence[str], *,
            var_name: str = "variable", value_name: str = "value",
            drop_null: bool = False):
    """Wide→long melt as a streamed per-batch transform (→ Dataset with
    columns ``id_cols + [var_name, value_name]``). ``drop_null=True``
    matches SQL UNPIVOT's default of omitting NULL cells; the default
    keeps them (pandas ``melt`` semantics)."""
    id_cols, value_cols = list(id_cols), list(value_cols)

    def melt(df: pd.DataFrame) -> pd.DataFrame:
        out = df.melt(id_vars=id_cols, value_vars=value_cols,
                      var_name=var_name, value_name=value_name)
        if drop_null:
            out = out[out[value_name].notna()]
        return out

    return ds.map_batches(melt, batch_format="pandas")
