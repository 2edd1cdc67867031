"""Incremental validation — re-validate only the documents whose CONTENT
changed between two corpus snapshots.

At 10^12 documents a full re-validation per ingest is the dominant cost;
the standard fix is content-delta scoping: diff the new snapshot against
the previous one (`snapshot_diff` — one keyed exchange over compact
(key, 63-bit content hash) rows), then run the rule families only where
they can produce NEW results:

- row-local span rules + referential (broadcast media catalog): strictly
  per-row ⇒ delta-only is EXACT — unchanged docs reproduce their prior
  violations by definition (rule-set hash equality is the caller's
  contract, same invalidation key as `state/checkpoint.py`).
- uniqueness: inherently cross-corpus ⇒ cannot be delta-scoped; it runs
  over the FULL new snapshot's key column only (a one-column pass through
  the mode-planned `duplicate_key_counts` — cheap relative to span work).

This composes with (not replaces) `run_flagship_checkpointed`'s
fragment-completion resume: checkpoints skip work already DONE this run;
the snapshot delta skips work whose INPUT did not change across runs.

The interleaved spans column is canonicalized to one string per document
(kind/text/media_ref/offset of every span, field- and row-delimited) so
span-sequence equality — the input_hint's per-row invariant — is exactly
what the content hash witnesses.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray

from ..determinism import hash_strings

__all__ = ["span_content_strings", "content_view", "delta_keys",
           "filter_to_keys", "incremental_validate"]

_US, _RS = "\x1f", "\x1e"   # field / row delimiters (cannot occur in data)


def span_content_strings(b: pa.Table, *, spans_col: str = "spans"
                         ) -> pa.Array:
    """One canonical string per row: every span's (kind, text, media_ref,
    offset) joined with unit/record separators. Vectorized flatten; the
    per-row join uses the list offsets, not a Python loop over spans."""
    col = b[spans_col].combine_chunks()
    if isinstance(col, pa.ChunkedArray):      # zero-chunk edge
        col = pa.concat_arrays(col.chunks) if col.num_chunks else \
            pa.array([], type=col.type)
    offs = col.offsets.to_numpy(zero_copy_only=False)
    flat = col.flatten()
    names = [f.name for f in col.type.value_type]
    parts = [pc.fill_null(pc.cast(flat.field(n), pa.string()), "")
             .to_numpy(zero_copy_only=False) for n in names]
    if len(parts[0]):
        per_span = parts[0]
        for p in parts[1:]:
            per_span = np.char.add(np.char.add(per_span.astype(str), _US),
                                   p.astype(str))
    else:
        per_span = np.array([], dtype=object)
    out = []
    for i in range(b.num_rows):
        out.append(_RS.join(per_span[offs[i]:offs[i + 1]]))
    return pa.array(out, pa.string())


def content_view(ds, *, key_col: str = "doc_id",
                 spans_col: Optional[str] = "spans",
                 text_col: Optional[str] = None):
    """→ Dataset (doc_id, text=canonical content string): the compact
    form `snapshot_diff` consumes. Pass ``text_col`` for flat tables,
    ``spans_col`` for interleaved ones."""

    def view(b: pa.Table) -> pa.Table:
        if text_col is not None:
            content = pc.fill_null(pc.cast(b[text_col], pa.string()), "")
        else:
            content = span_content_strings(b, spans_col=spans_col)
        return pa.Table.from_arrays(
            [pc.cast(b[key_col], pa.string()), content],
            names=["doc_id", "text"])

    return ds.map_batches(view, batch_format="pyarrow",
                          zero_copy_batch=True)


def delta_keys(old_view, new_view, *, mode: str = "auto") -> np.ndarray:
    """→ sorted array of doc_ids that are ``added`` or ``changed`` in the
    new snapshot (the re-validation set; size ∝ churn, not corpus)."""
    from .snapshot_diff import snapshot_diff

    diff = snapshot_diff(old_view, new_view, mode=mode)

    def pick(b: pa.Table) -> pa.Table:
        m = pc.is_in(b["status"], value_set=pa.array(["added", "changed"]))
        return b.filter(m).select(["key"])

    pdf = diff.map_batches(pick, batch_format="pyarrow").to_pandas()
    if "key" not in pdf.columns or not len(pdf):
        return np.array([], dtype=object)
    return np.sort(pdf["key"].to_numpy(dtype=object))


def filter_to_keys(ds, keys: np.ndarray, *, key_col: str = "doc_id"):
    """Streamed semi-join against a broadcast sorted key-hash array —
    the referential-stage membership shape, O(churn) memory per worker."""
    kh = np.sort(hash_strings(keys.astype(object))) if len(keys) else \
        np.array([], dtype=np.uint64)
    ref = ray.put(kh)

    def keep(b: pa.Table) -> pa.Table:
        hs = ray.get(ref)
        if not len(hs):
            return b.slice(0, 0)
        k = pc.cast(b[key_col], pa.string()).to_numpy(zero_copy_only=False)
        h = hash_strings(k)
        pos = np.clip(np.searchsorted(hs, h), 0, len(hs) - 1)
        return b.filter(pa.array(hs[pos] == h))

    return ds.map_batches(keep, batch_format="pyarrow",
                          zero_copy_batch=True)


def incremental_validate(old_docs, new_docs, media_ds, *,
                         key_col: str = "doc_id",
                         text_max_len: int = 256,
                         mode: str = "auto") -> dict:
    """Validate snapshot B given already-validated snapshot A.

    → dict: delta counts, the delta-scoped violations table (row-local +
    referential over added/changed docs), and the full-corpus uniqueness
    violations (key-column pass). Both inputs must be consumable twice
    (parquet-backed or materialized)."""
    from ..rules.row_rules import interleaved_ruleset
    from ..stages.referential import (referential_violations,
                                      span_media_keys)
    from ..stages.uniqueness import unique_violations
    from ..stages.validate import validate
    from .snapshot_diff import snapshot_diff_summary

    ov = content_view(old_docs, key_col=key_col)
    nv = content_view(new_docs, key_col=key_col)
    summary = snapshot_diff_summary(ov, nv)

    keys = delta_keys(ov, nv, mode=mode)
    subset = filter_to_keys(new_docs, keys, key_col=key_col).materialize()

    rs = interleaved_ruleset(text_max_len=text_max_len)
    row_v = validate(subset, rs)
    ref_v = referential_violations(
        subset, media_ds, extract=span_media_keys, parent_key="media_ref",
        rule="fk-missing", parent_name="media_catalog")
    uniq_v = unique_violations(new_docs, [key_col], rule="unique-doc-id")

    keep_cols = ["doc_id", "rule", "path", "detail"]
    delta_viol = (row_v.select_columns(keep_cols)
                  .union(ref_v.select_columns(keep_cols)).to_pandas()
                  .sort_values(keep_cols).reset_index(drop=True))
    uniq = uniq_v.to_pandas()[keep_cols]
    return {"summary": summary, "n_revalidated": int(subset.count()),
            "delta_violations": delta_viol,
            "uniqueness_violations": uniq}
