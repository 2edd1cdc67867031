"""Aggregation-consistency rules.

Reference pattern: a stored/derived total must equal the recomputation from
child line items — Invoice.total == adjustment + Σ(line×qty) computed BOTH
as a SQL annotation and a Python property and asserted equal
(cerberus/models/invoice.py:37-47 vs :283-297; tests
cerberus/tests/test_invoices.py:107-131,166-188). The engine generalizes
this to: per-key child aggregate (map-side partial sums → keyed exchange)
compared against the parent's stored column; a mismatch beyond ``tol``
emits a violation row.

Scale notes: the shuffle carries ONE partial row per (key, block), not the
child rows; the parent side ships only (key, stored value, tag). The
comparison runs as union → hash-bucketed keyed_apply — one VECTORIZED
pandas kernel per bucket (not one Python call per key) that never
materializes on the driver.
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..schema import VIOLATIONS
from .keyed_window import keyed_apply

#: unified exchange schema for keyed child/parent compares:
#: k (string key), v (float payload), src ('c' child / 'p' parent),
#: extra (parent-side tag, e.g. an FSM state; '' on child rows)
_EMPTY_V = pd.DataFrame({c: pd.Series(dtype=object)
                         for c in ["doc_id", "rule", "path", "detail"]})


def keyed_compare(child_ds, parent_ds, *, child_side: Callable,
                  parent_side: Callable,
                  compare: Callable[[pd.DataFrame], pd.DataFrame],
                  n_buckets: int | None = None, n_rows_hint: int = 0):
    """Generic streamed child-vs-parent keyed comparison.

    ``child_side(batch) -> pa.Table`` and ``parent_side(batch) ->
    pa.Table`` each emit rows in the unified (k, v, src, extra) schema;
    the union is hash-bucketed on k and ``compare`` (a vectorized
    multi-key pandas kernel returning violation rows) runs once per
    bucket. Every row of a key lands in exactly one bucket, so compare
    sees whole keys. → Dataset of VIOLATIONS-schema rows."""
    if n_buckets is None and n_rows_hint <= 0:
        # size from the RAW inputs (metadata-backed for table scans and
        # from_arrow — free), never by counting the mapped union, which
        # would execute the whole exchange lineage once just for sizing.
        # Side emitters usually project/aggregate (input sum ≈ exchange
        # rows); a list-exploding child is off by its mean list length —
        # fine for a bucket-count heuristic, pass n_rows_hint to pin it.
        n_rows_hint = child_ds.count() + parent_ds.count()
    c = child_ds.map_batches(child_side, batch_format="pyarrow",
                             zero_copy_batch=True)
    p = parent_ds.map_batches(parent_side, batch_format="pyarrow",
                              zero_copy_batch=True)
    out = keyed_apply(c.union(p), "k", compare, n_buckets=n_buckets,
                      n_rows_hint=n_rows_hint)

    def cast(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return VIOLATIONS.empty_table()
        return batch.cast(VIOLATIONS)

    return out.map_batches(cast, batch_format="pyarrow")


def side_row(batch_cols, *, src: str, extra=None) -> pa.Table:
    """Assemble a (k, v, src, extra) exchange table from (k, v) arrays."""
    k, v = batch_cols
    n = len(k)
    return pa.Table.from_arrays(
        [pc.cast(k, pa.string()), pc.cast(v, pa.float64()),
         pa.array([src] * n, type=pa.string()),
         extra if extra is not None
         else pa.array([""] * n, type=pa.string())],
        names=["k", "v", "src", "extra"])


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
        return side_row((agg["k"], agg["v_sum"]), src="c")

    def parent_row(batch: pa.Table) -> pa.Table:
        return side_row((batch[parent_key], batch[parent_col]), src="p")

    def compare(d: pd.DataFrame) -> pd.DataFrame:
        sums = d.loc[d["src"] == "c"].groupby("k")["v"].sum()
        par = d.loc[d["src"] == "p"].drop_duplicates("k")
        out = []
        if len(par):
            stored = par.set_index("k")["v"]
            tot = sums.reindex(stored.index).fillna(0.0)
            bad = (tot - stored).abs() > tol
            out.extend(
                {"doc_id": k, "rule": rule, "path": parent_col,
                 "detail": f"stored {stored[k]:.2f} != "
                           f"recomputed {tot[k]:.2f}"}
                for k in stored.index[bad])
        if not missing_parent_ok:
            orphans = sums.index.difference(par["k"])
            out.extend({"doc_id": k, "rule": rule, "path": parent_col,
                        "detail": "no parent row for child aggregate"}
                       for k in orphans)
        return pd.DataFrame(out) if out else _EMPTY_V.copy()

    return keyed_compare(child_ds, parent_ds, child_side=child_partial,
                         parent_side=parent_row, compare=compare)
