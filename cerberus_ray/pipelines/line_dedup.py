"""Corpus-wide exact LINE deduplication — drop lines that recur across
documents (navigation chrome, cookie banners, license headers, boilerplate).

This is the line-granular member of the dedup family (public recipe:
C4's repeated-span removal, Raffel et al. 2020; RefinedWeb / Dolma run
exact line or paragraph dedup corpus-wide before model training). It
complements `substring_dedup.py` (n-token windows WITHIN flowing text)
with newline-delimited structural units. Reference analogue: the
uniqueness rule family at sub-row granularity (SURVEY.md §2.7 O6,
/root/reference/cerberus/models/booking.py:50,57-64).

Semantics (deterministic and partition-invariant by construction):

- A line's identity is its whitespace-stripped content; blank lines are
  never dedup candidates (they are structure, not content).
- A line is *duplicated* when it occurs in ≥ ``min_docs`` DISTINCT
  documents (within-doc repeats do not count — same contract as
  ``substring_dedup``).
- ``keep='none'`` (default) cuts every occurrence — boilerplate removal.
  ``keep='first'`` leaves the lexicographically smallest ``key_col``
  document untouched for that line — every occurrence THERE survives
  (within-doc repeats are ``cut_within_doc_repeats``' job) — and cuts
  all other documents' occurrences (deterministic winner, independent
  of block order — the `exact_dedup_keep_first` contract at line
  granularity; pinned by the pandas/DuckDB dual reference in tests).

Ray shape (two passes, the fused two-pass design shared with the MinHash
and substring stages):

- Pass 1: per-block explode → strip → per-doc distinct line hashes →
  (hash, doc-count, min-key) partials via pyarrow hash aggregate.
  ``mode='driver'`` merges partials on the driver (bounded: the driver
  holds one row per DISTINCT line hash that appears in ≥2 blocks'
  partials — at most the distinct-line universe; right at bench scale
  where Ray's fixed shuffle cost dominates); ``mode='shuffle'`` routes
  through ``groupby(h).aggregate(Sum, Min)`` and filters to true
  duplicates BEFORE collecting, so the driver only ever holds
  cross-doc-duplicated lines (∝ boilerplate volume, not corpus size).
- Pass 2: the duplicated set — (sorted hashes, parallel min-key array) —
  broadcasts once via ``ray.put``; one streamed pass rebuilds each doc's
  text with duplicated lines removed. Membership is a searchsorted;
  reassembly is one ``'\\n'.join`` per REWRITTEN doc (string building is
  inherently per-doc; untouched docs pass through byte-identical with no
  join at all).
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from ..determinism import hash_strings

__all__ = ["duplicated_line_set", "cut_duplicated_lines",
           "cut_within_doc_repeats", "line_dedup_report"]

#: unit → (arrow splitter kwargs, pandas split pattern, rejoin separator).
#: 'line' splits on every newline; 'paragraph' on blank lines (the
#: Dolma/RefinedWeb paragraph-dedup granularity). Rewritten docs re-join
#: with the canonical separator; untouched docs pass through byte-exact.
_UNITS = {"line": ("\n", False, "\n"),
          "paragraph": (r"\n[ \t]*\n", True, "\n\n")}


def _block_lines(texts, unit: str = "line") -> Tuple[np.ndarray, np.ndarray]:
    """→ (doc_idx, unit_hash) for every non-blank stripped line/paragraph,
    one row per (doc, distinct unit). All-Arrow: split → flatten → trim,
    with doc attribution from the list lengths."""
    import pyarrow.compute as pc
    pat, is_regex, _ = _UNITS[unit]
    arr = texts if isinstance(texts, (pa.Array, pa.ChunkedArray)) else \
        pa.array(pd.Series(texts, dtype=object).fillna(""), pa.string())
    filled = pc.fill_null(arr, "")
    lst = (pc.split_pattern_regex(filled, pat) if is_regex
           else pc.split_pattern(filled, pat))
    flat = pc.utf8_trim_whitespace(lst.combine_chunks().flatten()
                                   if isinstance(lst, pa.ChunkedArray)
                                   else lst.flatten())
    lens = pc.list_value_length(lst).to_numpy(zero_copy_only=False)
    doc_all = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
    keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    if not keep.any():
        z = np.array([], dtype=np.int64)
        return z, np.array([], dtype=np.uint64)
    doc_idx = doc_all[keep]
    h = hash_strings(flat.filter(pa.array(keep)))
    # per-doc distinct: a doc repeating its own line is one occurrence
    order = np.lexsort((h, doc_idx))
    d, hh = doc_idx[order], h[order]
    first = np.ones(len(hh), dtype=bool)
    first[1:] = (d[1:] != d[:-1]) | (hh[1:] != hh[:-1])
    return d[first], hh[first]


def duplicated_line_set(ds, *, text_col: str = "text",
                        key_col: str = "doc_id", min_docs: int = 2,
                        mode: str = "driver", unit: str = "line"
                        ) -> Tuple[np.ndarray, np.ndarray]:
    """→ (sorted uint64 hashes, parallel min-key string array) of
    lines/paragraphs occurring in ≥ min_docs distinct documents."""
    if mode not in ("driver", "shuffle"):
        raise ValueError(f"unknown mode {mode!r}")
    if unit not in _UNITS:
        raise ValueError(f"unknown unit {unit!r}")

    def partial(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        keys = pc.cast(b[key_col], pa.string()).to_numpy(zero_copy_only=False)
        d, h = _block_lines(b[text_col], unit)
        # int64 VIEW of the uint64 hash: Ray's hash groupby handles
        # int64 natively, while uint64 values >= 2^63 degrade the
        # shuffle-mode exchange to per-row pickled objects
        t = pa.Table.from_pydict({
            "h": pa.array(h.view(np.int64), pa.int64()),
            "k": pa.array(keys[d] if len(d) else [], pa.string())})
        g = t.group_by("h").aggregate([([], "count_all"), ("k", "min")])
        return pa.Table.from_arrays(
            [g["h"], g["count_all"], g["k_min"]], names=["h", "c", "k"])

    partials = ds.map_batches(partial, batch_format="pyarrow",
                              zero_copy_batch=True)
    empty = (np.array([], dtype=np.uint64), np.array([], dtype=object))
    if mode == "driver":
        pdf = partials.to_pandas()
        if "h" not in pdf.columns or not len(pdf):
            return empty
        agg = pdf.groupby("h").agg(c=("c", "sum"), k=("k", "min"))
        agg = agg[agg["c"] >= min_docs]
        # h travelled as an int64 bit-view; consumers searchsorted in
        # UINT64 order, so sort by the uint64 view (int64 order differs
        # for hashes >= 2^63) and keep the keepers array parallel
        hu = agg.index.to_numpy().astype(np.int64).view(np.uint64)
        order = np.argsort(hu, kind="mergesort")
        return hu[order], agg["k"].to_numpy(dtype=object)[order]

    from ray.data.aggregate import Min, Sum
    merged = (partials.groupby("h")
              .aggregate(Sum("c", alias_name="c"),
                         Min("k", alias_name="k")))

    def only_dups(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        return b.filter(pc.greater_equal(b["c"], min_docs)).select(["h", "k"])

    pdf = (merged.map_batches(only_dups, batch_format="pyarrow")
           .to_pandas())
    if "h" not in pdf.columns or not len(pdf):
        return empty
    hu = pdf["h"].to_numpy().astype(np.int64).view(np.uint64)
    order = np.argsort(hu, kind="mergesort")
    return hu[order], pdf["k"].to_numpy(dtype=object)[order]


def cut_duplicated_lines(ds, dup: Tuple[np.ndarray, np.ndarray], *,
                         text_col: str = "text", key_col: str = "doc_id",
                         keep: str = "none", unit: str = "line"):
    """Rewrite ``text_col`` with duplicated lines/paragraphs removed
    (``keep='none'``) or removed everywhere except the min-key document
    (``keep='first'``). Untouched docs are preserved byte-identically;
    matching is on stripped content, removal takes the whole raw unit
    (rewritten docs re-join with the unit's canonical separator)."""
    if keep not in ("none", "first"):
        raise ValueError(f"unknown keep policy {keep!r}")
    if unit not in _UNITS:
        raise ValueError(f"unknown unit {unit!r}")
    upat, uregex, usep = _UNITS[unit]
    hashes, keepers = dup
    ref = ray.put((np.asarray(hashes, dtype=np.uint64),
                   np.asarray(keepers, dtype=object)))

    def cut(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        dup_h, dup_k = ray.get(ref)
        if not len(dup_h):
            return b
        texts = b[text_col].to_numpy(zero_copy_only=False)
        keys = pc.cast(b[key_col], pa.string()).to_numpy(zero_copy_only=False)
        s = pd.Series(texts, dtype=object).fillna("")
        lines = (s.str.split(upat, regex=True) if uregex
                 else s.str.split(upat))
        ex = lines.explode()
        doc_idx = ex.index.to_numpy(dtype=np.int64)
        raw = ex.to_numpy(dtype=object)
        stripped = ex.str.strip().to_numpy(dtype=object)
        h = hash_strings(stripped)
        idx = np.searchsorted(dup_h, h)
        idx[idx >= len(dup_h)] = len(dup_h) - 1
        hit = (dup_h[idx] == h) & (stripped != "")
        if keep == "first":
            hit &= dup_k[idx] != keys[doc_idx]
        if not hit.any():
            return b
        touched = np.zeros(len(texts), dtype=bool)
        touched[doc_idx[hit]] = True
        new_texts = texts.astype(object)
        kept = ~hit
        # explode() is doc-contiguous: slice each touched doc's segment
        # via two searchsorteds instead of rescanning the whole exploded
        # array per doc (that rescan was quadratic when boilerplate
        # touches every doc — the operator's target workload)
        tdocs = np.flatnonzero(touched)
        seg_lo = np.searchsorted(doc_idx, tdocs, side="left")
        seg_hi = np.searchsorted(doc_idx, tdocs, side="right")
        for di, lo, hi in zip(tdocs, seg_lo, seg_hi):
            seg_kept = kept[lo:hi]
            new_texts[di] = usep.join(raw[lo:hi][seg_kept])
        i = b.schema.get_field_index(text_col)
        return b.set_column(i, text_col, pa.array(new_texts, pa.string()))

    return ds.map_batches(cut, batch_format="pyarrow", zero_copy_batch=True)


def line_dedup_report(ds, *, text_col: str = "text",
                      key_col: str = "doc_id", min_docs: int = 2,
                      mode: str = "driver", keep: str = "none",
                      unit: str = "line",
                      _mat: Optional[object] = None) -> pa.Table:
    """One-row summary: duplicated-line universe + removal volume.
    The input is consumed twice (pass 1 + cut) — parquet-backed inputs
    stay lazy; in-memory inputs should be materialized by the caller."""
    dup = duplicated_line_set(ds, text_col=text_col, key_col=key_col,
                              min_docs=min_docs, mode=mode, unit=unit)
    cutds = cut_duplicated_lines(ds, dup, text_col=text_col,
                                 key_col=key_col, keep=keep, unit=unit)

    def vol(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        return pa.Table.from_pydict({
            "docs": [b.num_rows],
            "chars": [int(pc.sum(pc.utf8_length(
                pc.fill_null(b[text_col], ""))).as_py() or 0)]})

    before = ds.map_batches(vol, batch_format="pyarrow",
                            zero_copy_batch=True).to_pandas().sum()
    after = cutds.map_batches(vol, batch_format="pyarrow",
                              zero_copy_batch=True).to_pandas().sum()
    return pa.Table.from_pydict({
        "n_docs": pa.array([int(before["docs"])], pa.int64()),
        "dup_lines": pa.array([len(dup[0])], pa.int64()),
        "chars_before": pa.array([int(before["chars"])], pa.int64()),
        "chars_after": pa.array([int(after["chars"])], pa.int64()),
    })


def cut_within_doc_repeats(ds, *, text_col: str = "text",
                           unit: str = "line"):
    """WITHIN-document repeat removal: keep the first occurrence of each
    repeated line/paragraph inside a document, drop the rest (C4's
    within-page duplicate-line cleanup; complements the corpus-wide
    ``cut_duplicated_lines`` whose ``min_docs`` counts DISTINCT docs).

    Stateless streamed pass — no driver state, no shuffle: repeats are a
    per-row property. Blank units are structure, never candidates;
    untouched docs pass through byte-identically; rewritten docs re-join
    with the unit's canonical separator."""
    if unit not in _UNITS:
        raise ValueError(f"unknown unit {unit!r}")
    upat, uregex, usep = _UNITS[unit]

    def cut(b: pa.Table) -> pa.Table:
        texts = b[text_col].to_numpy(zero_copy_only=False)
        s = pd.Series(texts, dtype=object).fillna("")
        parts = (s.str.split(upat, regex=True) if uregex
                 else s.str.split(upat))
        ex = parts.explode()
        doc_idx = ex.index.to_numpy(dtype=np.int64)
        raw = ex.to_numpy(dtype=object)
        stripped = ex.str.strip().to_numpy(dtype=object)
        h = hash_strings(stripped)
        dup = (pd.DataFrame({"d": doc_idx, "h": h})
               .duplicated(["d", "h"]).to_numpy())
        hit = dup & (stripped != "")
        if not hit.any():
            return b
        touched = np.zeros(len(texts), dtype=bool)
        touched[doc_idx[hit]] = True
        kept = ~hit
        new_texts = texts.astype(object)
        # segment slicing, not per-doc rescans (see cut_duplicated_lines)
        tdocs = np.flatnonzero(touched)
        seg_lo = np.searchsorted(doc_idx, tdocs, side="left")
        seg_hi = np.searchsorted(doc_idx, tdocs, side="right")
        for di, lo, hi in zip(tdocs, seg_lo, seg_hi):
            seg_kept = kept[lo:hi]
            new_texts[di] = usep.join(raw[lo:hi][seg_kept])
        i = b.schema.get_field_index(text_col)
        return b.set_column(i, text_col, pa.array(new_texts, pa.string()))

    return ds.map_batches(cut, batch_format="pyarrow", zero_copy_batch=True)
