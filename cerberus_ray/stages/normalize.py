"""Normalization stages — run BEFORE validation, mirroring Django's
clean→save order (SURVEY.md §2.4; reference normalizers M8-M12, M24-M25).

The interleaved-doc normalizer only touches span ``text`` (whitespace
minimization); ``(kind, media_ref, order)`` pass through untouched, and
``span_sequence_equal`` asserts the driver invariant from
BASELINE.json input_hint.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray

from ..functions import strings as S


def normalize_spans_batch(batch: pa.Table, *, minimize_ws: bool = True) -> pa.Table:
    """Rebuild spans with normalized text; all other fields byte-identical."""
    spans = batch["spans"]
    if isinstance(spans, pa.ChunkedArray):
        spans = spans.combine_chunks()
    flat = pc.list_flatten(spans)
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    text = flat.field("text")
    if minimize_ws:
        text = S.minimize_whitespace(text)
        # minimize_whitespace fills nulls via RE2; restore null mask
        text = pc.if_else(pc.is_valid(flat.field("text")), text,
                          pa.nulls(len(flat), pa.string()))
    struct = pa.StructArray.from_arrays(
        [flat.field("kind"), text, flat.field("media_ref"), flat.field("offset")],
        names=["kind", "text", "media_ref", "offset"])
    counts = pc.list_value_length(spans).to_numpy(zero_copy_only=False)
    counts = np.nan_to_num(counts).astype(np.int64)
    offsets = np.zeros(len(counts) + 1, dtype=np.int32)
    np.cumsum(counts, out=offsets[1:])
    new_spans = pa.ListArray.from_arrays(pa.array(offsets, type=pa.int32()), struct)
    idx = batch.schema.get_field_index("spans")
    return batch.set_column(idx, "spans", new_spans)


def normalize_spans(ds, *, minimize_ws: bool = True):
    return ds.map_batches(
        lambda b: normalize_spans_batch(b, minimize_ws=minimize_ws),
        batch_format="pyarrow", zero_copy_batch=True)


def span_sequence_equal(a: pa.Table, b: pa.Table,
                        fields: Sequence[str] = ("kind", "media_ref", "offset")) -> bool:
    """Driver invariant: per-row span-sequence equality of (kind, media_ref,
    order) between input and output (text may be normalized)."""
    if a.num_rows != b.num_rows:
        return False
    fa = pc.list_flatten(a["spans"])
    fb = pc.list_flatten(b["spans"])
    if isinstance(fa, pa.ChunkedArray):
        fa = fa.combine_chunks()
    if isinstance(fb, pa.ChunkedArray):
        fb = fb.combine_chunks()
    if len(fa) != len(fb):
        return False
    la = pc.list_value_length(a["spans"])
    lb = pc.list_value_length(b["spans"])
    if not pc.all(pc.equal(pc.fill_null(la, -1), pc.fill_null(lb, -1))).as_py():
        return False
    for f in fields:
        x, y = fa.field(f), fb.field(f)
        eq = pc.or_kleene(pc.equal(x, y),
                          pc.and_(pc.is_null(x), pc.is_null(y)))
        if not pc.all(pc.fill_null(eq, False)).as_py():
            return False
    return True


def backfill_from_parent(child_ds, parent_ds, *, child_fk: str,
                         parent_key: str, copy_cols: dict):
    """M24 value backfill (reference: Charge.save customer := invoice.customer,
    cerberus/models/charge.py:138-139; Payment.save, invoice.py:368-371):
    fill null child columns from the parent row via a broadcast lookup
    (parent assumed dimension-sized; ray.put once)."""
    cols = [parent_key] + list(copy_cols.values())
    pdf = parent_ds.map_batches(lambda b: b.select(cols),
                                batch_format="pyarrow").to_pandas()
    lookup = pdf.set_index(parent_key)
    ref = ray.put(lookup)

    def _clean(v):
        if v is None or (isinstance(v, float) and np.isnan(v)):
            return None
        return v

    def fill(batch: pa.Table) -> pa.Table:
        lk = ray.get(ref)
        fk = batch[child_fk].to_numpy(zero_copy_only=False)
        out = batch
        for child_col, parent_col in copy_cols.items():
            cur = batch[child_col].to_numpy(zero_copy_only=False)
            isnull = pc.is_null(batch[child_col]).to_numpy(zero_copy_only=False)
            fills = np.array(
                [_clean(lk[parent_col].get(k)) if (n and _clean(k) is not None)
                 else _clean(v)
                 for v, n, k in zip(cur, isnull, fk)], dtype=object)
            idx = out.schema.get_field_index(child_col)
            out = out.set_column(idx, child_col,
                                 pa.array(fills, type=batch[child_col].type))
        return out

    return child_ds.map_batches(fill, batch_format="pyarrow")


def grouped_impute_stats(ds, group_col: str, cols: Sequence[str], *,
                         strategy: str = "mean", n_buckets: int = 32):
    """Per-group fill statistics for ``impute_by_group`` → pandas frame
    indexed by group with one column per imputed col. ``mean`` uses
    exact (Σ, n) block partials (null-skipping, partials summed in
    sorted group order for layout determinism); ``median`` needs whole
    groups, so it rides one keyed_apply exchange. Groups whose values
    are ALL null get NaN (left unfilled downstream — surfaced, not
    invented)."""
    import pandas as pd

    cols = list(cols)
    if strategy == "mean":
        def partial(df: "pd.DataFrame") -> "pd.DataFrame":
            g = df.groupby(group_col, sort=False)[cols]
            s = g.sum(min_count=1)
            n = g.count()
            s.columns = [f"s_{c}" for c in cols]
            n.columns = [f"n_{c}" for c in cols]
            return pd.concat([s, n], axis=1).reset_index()

        parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
        # pin the float-merge order across block layouts
        parts = parts.sort_values(list(parts.columns), kind="mergesort")
        agg = parts.groupby(group_col, sort=True).sum(min_count=1)
        out = pd.DataFrame(index=agg.index)
        for c in cols:
            out[c] = agg[f"s_{c}"] / agg[f"n_{c}"].where(
                agg[f"n_{c}"] > 0)
        return out
    if strategy == "median":
        from .keyed_window import keyed_apply

        def kern(g: "pd.DataFrame") -> "pd.DataFrame":
            return (g.groupby(group_col, sort=False)[cols].median()
                    .reset_index())

        pdf = keyed_apply(ds.select_columns([group_col, *cols]),
                          group_col, kern,
                          n_buckets=n_buckets).to_pandas()
        return pdf.set_index(group_col).sort_index()
    raise ValueError(f"unknown impute strategy {strategy!r}")


def impute_by_group(ds, group_col: str, cols: Sequence[str], *,
                    strategy: str = "mean", n_buckets: int = 32):
    """Fill nulls in ``cols`` with the column's per-group mean/median
    (SQL ``COALESCE(x, AVG(x) OVER (PARTITION BY g))`` semantics — the
    DuckDB oracle in tests/test_normalize.py) → same-schema Dataset.
    The ETL imputation step before featurization: stats pass first
    (group-bounded), then one broadcast lookup fill per batch
    (``ray.put`` once, never re-shipped). Groups with no observed
    values keep their nulls."""
    stats = grouped_impute_stats(ds, group_col, cols,
                                 strategy=strategy, n_buckets=n_buckets)
    ref = ray.put(stats)
    cols = list(cols)

    def fill(b: pa.Table) -> pa.Table:
        lk = ray.get(ref)
        keys = b[group_col].to_numpy(zero_copy_only=False)
        out = b
        for c in cols:
            vals = lk[c].reindex(keys).to_numpy(dtype=np.float64)
            filled = pc.coalesce(
                pc.cast(b[c], pa.float64()),
                pa.array(vals, pa.float64()))
            out = out.set_column(out.schema.get_field_index(c), c,
                                 filled)
        return out

    return ds.map_batches(fill, batch_format="pyarrow",
                          zero_copy_batch=True)
