"""Aggregation-consistency rules.

Reference pattern: a stored/derived total must equal the recomputation from
child line items — Invoice.total == adjustment + Σ(line×qty) computed BOTH
as a SQL annotation and a Python property and asserted equal
(cerberus/models/invoice.py:37-47 vs :283-297; tests
cerberus/tests/test_invoices.py:107-131,166-188). The engine generalizes
this to: per-key child aggregate (map-side partial sums → groupby over
partials) compared against the parent's stored column; a mismatch beyond
``tol`` emits a violation row.

Scale notes: the shuffle carries ONE partial row per (key, block), not the
child rows; the parent side ships only (key, stored value). The comparison
join runs as union → groupby(key) → map_groups — a Ray-native hash join
that never materializes on the driver.
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..schema import VIOLATIONS


def aggregate_consistency(child_ds, parent_ds, *, child_key: str,
                          parent_key: str, child_value: Callable,
                          parent_col: str, rule: str, tol: float = 0.01,
                          missing_parent_ok: bool = True):
    """→ Dataset of violation rows where Σ child_value ≠ parent value.

    ``child_value(batch) -> pa.Array`` computes the per-row contribution
    (e.g. extendedprice × (1 − discount) × (1 + tax)) vectorized.
    """

    def child_partial(batch: pa.Table) -> pa.Table:
        v = child_value(batch)
        t = pa.Table.from_arrays(
            [pc.cast(batch[child_key], pa.string()), pc.cast(v, pa.float64())],
            names=["k", "v"])
        agg = t.group_by("k").aggregate([("v", "sum")])
        return pa.Table.from_arrays(
            [agg["k"], agg["v_sum"],
             pa.array(["c"] * agg.num_rows, type=pa.string())],
            names=["k", "v", "src"])

    def parent_side(batch: pa.Table) -> pa.Table:
        return pa.Table.from_arrays(
            [pc.cast(batch[parent_key], pa.string()),
             pc.cast(batch[parent_col], pa.float64()),
             pa.array(["p"] * batch.num_rows, type=pa.string())],
            names=["k", "v", "src"])

    c = child_ds.map_batches(child_partial, batch_format="pyarrow",
                             zero_copy_batch=True)
    p = parent_ds.map_batches(parent_side, batch_format="pyarrow",
                              zero_copy_batch=True)

    def compare(g: pd.DataFrame) -> pd.DataFrame:
        key = g["k"].iloc[0]
        child_total = g.loc[g["src"] == "c", "v"].sum()
        parents = g.loc[g["src"] == "p", "v"]
        if len(parents) == 0:
            if missing_parent_ok:
                return pd.DataFrame(columns=["doc_id", "rule", "path", "detail"])
            return pd.DataFrame({"doc_id": [key], "rule": [rule],
                                 "path": [parent_col],
                                 "detail": ["no parent row for child aggregate"]})
        stored = float(parents.iloc[0])
        if abs(child_total - stored) <= tol:
            return pd.DataFrame(columns=["doc_id", "rule", "path", "detail"])
        return pd.DataFrame({
            "doc_id": [key], "rule": [rule], "path": [parent_col],
            "detail": [f"stored {stored:.2f} != recomputed {child_total:.2f}"],
        })

    out = c.union(p).groupby("k").map_groups(compare, batch_format="pandas")

    def cast(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return VIOLATIONS.empty_table()
        return batch.cast(VIOLATIONS)

    return out.map_batches(cast, batch_format="pyarrow")
