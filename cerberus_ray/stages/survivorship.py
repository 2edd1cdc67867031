"""Golden-record survivorship (MDM merge step): collapse each entity
cluster to ONE canonical row where every field carries its most-recent
NON-NULL value — the standard "latest wins, but never overwrite data
with a hole" rule downstream of entity resolution
(`pipelines/entity_resolution.resolve_entities` produces the cluster
column this consumes).

One `keyed_apply` hash exchange co-locates each cluster; the kernel is
fully vectorized: sort by (cluster, *order_cols), per-field forward
fill within cluster boundaries (a groupby.ffill — C code), take the
last row per cluster. Output is one row per cluster (bounded by
entities, not rows).

DuckDB parity (LAST_VALUE(col IGNORE NULLS) OVER the full partition)
in tests/test_survivorship.py.
"""

from __future__ import annotations

from typing import Sequence

import pandas as pd

__all__ = ["golden_records"]


def golden_records(ds, cluster_col: str, order_cols: Sequence[str],
                   field_cols: Sequence[str], *,
                   n_buckets: int = 32) -> pd.DataFrame:
    """→ frame (cluster_col, n_members, *field_cols) sorted by
    cluster; each field is its cluster's last non-null value in
    ``order_cols`` order (include a unique tiebreak column), NULL only
    if the field is null across the whole cluster."""
    from .keyed_window import keyed_apply

    order_cols = list(order_cols)
    field_cols = list(field_cols)

    def kern(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([cluster_col] + order_cols, kind="mergesort")
        gb = g.groupby(cluster_col, sort=False)
        filled = gb[field_cols].ffill()
        out = filled.groupby(g[cluster_col], sort=False).tail(1).copy()
        out.insert(0, cluster_col,
                   g.loc[out.index, cluster_col].to_numpy())
        out["n_members"] = gb.size().to_numpy()
        return out.reset_index(drop=True)

    pdf = keyed_apply(
        ds.select_columns(
            list(dict.fromkeys([cluster_col] + order_cols
                               + field_cols))),
        cluster_col, kern, n_buckets=n_buckets).to_pandas()
    if not len(pdf):
        return pd.DataFrame({c: [] for c in [cluster_col, "n_members"]
                             + field_cols})
    return (pdf.sort_values(cluster_col).reset_index(drop=True)
            [[cluster_col, "n_members"] + field_cols])
