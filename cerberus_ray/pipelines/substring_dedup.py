"""Exact repeated-substring detection — find n-token passages duplicated
ACROSS documents and the per-document token spans they cover.

This is the exact-substring complement to MinHash/SimHash whole-document
near-dup (the public recipe of Lee et al. 2021, "Deduplicating Training
Data Makes Language Models Better": repeated ≥50-token substrings —
boilerplate, licenses, quoted passages — recur across otherwise-unrelated
documents and are cut span-wise, not doc-wise). The reference's closest
analogue is the uniqueness rule family (SURVEY.md §2.7 O6,
/root/reference/cerberus/models/booking.py:50,57-64) applied at sub-row
granularity.

Ray shape (two passes, mirroring the MinHash two-pass fused design in
``dedup.py``):

- Pass 1 (``duplicated_shingle_hashes``): every block flattens its docs
  into windowed 64-bit rolling hashes (one vectorized multiply-add sweep
  per window offset — no per-window string building), dedupes them
  PER DOC (a doc repeating its own phrase is not cross-doc duplication),
  and counts docs per shingle. ``mode='driver'`` merges per-block
  pyarrow-group_by partials on the driver (right when the sampled
  shingle universe is bounded); ``mode='shuffle'`` routes the count
  through ``groupby(h).count()`` and filters BEFORE collecting, so the
  driver only ever holds true duplicates. ``sample_mod`` keeps 1/mod of
  the shingle universe (h % mod == 0) — the standard scale lever: at
  10^12 docs the full universe is ~10^15 shingles, mod 64 bounds the
  exchange while a duplicated PASSAGE of length L ≥ n still surfaces
  with ≥1 sampled window w.h.p. (L−n+1 chances).
- Pass 2 (``duplicated_spans``): the duplicated-hash set (small: true
  cross-doc duplicates only) broadcasts once via ``ray.put``; one
  streamed pass marks hit windows by searchsorted membership and merges
  overlapping/adjacent [i, i+n) windows into maximal per-doc token
  spans — the actionable "cut these ranges" output. Fully vectorized:
  span boundaries come from one gap/doc-change mask, no per-doc loop.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray

from ..determinism import hash_strings

_B = np.uint64(1099511628211)  # FNV-1a prime as the rolling-hash base


def _block_windows(texts, n: int):
    """→ (doc_idx, offset, h) for every n-token window in the block.
    One token-hash pass + n vectorized multiply-add sweeps; windows never
    cross doc boundaries. uint64 arithmetic wraps mod 2^64 by design."""
    tok_lists = [(t or "").lower().split() for t in texts]
    lens = np.array([len(t) for t in tok_lists], dtype=np.int64)
    total = int(lens.sum())
    if total == 0:
        z = np.array([], dtype=np.int64)
        return z, z, np.array([], dtype=np.uint64)
    flat = np.concatenate([np.asarray(t, dtype=object) for t in tok_lists
                           if t]) if total else np.array([], dtype=object)
    th = hash_strings(flat)
    m = total - n + 1
    if m <= 0:
        z = np.array([], dtype=np.int64)
        return z, z, np.array([], dtype=np.uint64)
    H = np.zeros(m, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for j in range(n):
            H = H * _B + th[j:j + m]
    starts = np.repeat(np.cumsum(lens) - lens, lens)[:m]  # doc start of pos
    doc_idx = np.repeat(np.arange(len(lens)), lens)[:m]
    # valid = window fits inside its own doc
    doc_end = np.repeat(np.cumsum(lens), lens)[:m]
    pos = np.arange(m, dtype=np.int64)
    valid = pos + n <= doc_end
    return doc_idx[valid], (pos - starts)[valid], H[valid]


def _distinct_doc_shingles(b: pa.Table, text_col: str, n: int,
                           sample_mod: int) -> np.ndarray:
    texts = b[text_col].to_numpy(zero_copy_only=False)
    doc_idx, _, H = _block_windows(texts, n)
    if sample_mod > 1:
        keep = H % np.uint64(sample_mod) == 0
        doc_idx, H = doc_idx[keep], H[keep]
    if not len(H):
        return np.array([], dtype=np.uint64)
    order = np.lexsort((H, doc_idx))
    d, h = doc_idx[order], H[order]
    first = np.ones(len(h), dtype=bool)
    first[1:] = (d[1:] != d[:-1]) | (h[1:] != h[:-1])
    return h[first]  # one row per (doc, shingle)


def duplicated_shingle_hashes(ds, *, text_col: str = "text", n: int = 20,
                              min_docs: int = 2, sample_mod: int = 1,
                              mode: str = "driver") -> np.ndarray:
    """Sorted hashes of n-token shingles occurring in ≥ min_docs docs."""
    if mode not in ("driver", "shuffle"):
        raise ValueError(f"unknown mode {mode!r}")

    def partial(b: pa.Table) -> pa.Table:
        h = _distinct_doc_shingles(b, text_col, n, sample_mod)
        if mode == "driver":
            # per-block combine: (h, n_docs_in_block)
            u, c = np.unique(h, return_counts=True)
            # int64 VIEW (bit pattern) — native Ray groupby; uint64
            # values >= 2^63 degrade the shuffle exchange to pickled
            # objects (same fix as line_dedup / dedup band hashes)
            return pa.Table.from_pydict({
                "h": pa.array(u.view(np.int64), pa.int64()),
                "c": pa.array(c, pa.int64())})
        return pa.Table.from_pydict(
            {"h": pa.array(h.view(np.int64), pa.int64())})

    out = ds.map_batches(partial, batch_format="pyarrow",
                         zero_copy_batch=True)
    if mode == "driver":
        pdf = out.to_pandas()
        if not len(pdf):
            return np.array([], dtype=np.uint64)
        tot = pdf.groupby("h", as_index=False)["c"].sum()
        # sort AFTER the uint64 view (int64 order differs >= 2^63)
        return np.sort(tot[tot["c"] >= min_docs]["h"]
                       .to_numpy().astype(np.int64).view(np.uint64))
    counts = out.groupby("h").count()

    def only_dups(b: pa.Table) -> pa.Table:
        mask = pc.greater_equal(b["count()"], min_docs)
        return b.filter(mask).select(["h"])

    pdf = counts.map_batches(only_dups, batch_format="pyarrow").to_pandas()
    if "h" not in pdf.columns or not len(pdf):
        return np.array([], dtype=np.uint64)
    return np.sort(pdf["h"].to_numpy().astype(np.int64).view(np.uint64))


def _hit_spans(texts, dup: np.ndarray, n: int):
    """→ (doc_idx, start_tok, end_tok) of maximal duplicated spans per
    doc: hit windows found by searchsorted membership, then overlapping/
    adjacent [i, i+n) windows merged with one gap/doc-change mask."""
    z = np.array([], dtype=np.int64)
    doc_idx, offs, H = _block_windows(texts, n)
    if not len(H) or not len(dup):
        return z, z, z
    idx = np.searchsorted(dup, H)
    idx[idx >= len(dup)] = len(dup) - 1
    hit = dup[idx] == H
    d, o = doc_idx[hit], offs[hit]
    if not len(d):
        return z, z, z
    # windows arrive sorted by (doc, offset); merge where the next
    # window starts inside-or-adjacent-to the previous one's end
    new_span = np.ones(len(d), dtype=bool)
    new_span[1:] = (d[1:] != d[:-1]) | (o[1:] > o[:-1] + n)
    starts_i = np.flatnonzero(new_span)
    ends_i = np.append(starts_i[1:] - 1, len(d) - 1)
    return d[starts_i], o[starts_i], o[ends_i] + n


def duplicated_spans(ds, dup_hashes: np.ndarray, *,
                     text_col: str = "text", key_col: str = "doc_id",
                     n: int = 20):
    """→ Dataset (doc_id, start_tok, end_tok): maximal token spans covered
    by cross-doc duplicated shingles (overlapping/adjacent windows
    merged). Deterministic; one streamed pass against the broadcast
    duplicated-hash set."""
    ref = ray.put(np.asarray(dup_hashes, dtype=np.uint64))

    def spans(b: pa.Table) -> pa.Table:
        dup = ray.get(ref)
        keys = pc.cast(b[key_col], pa.string()).to_numpy(
            zero_copy_only=False)
        texts = b[text_col].to_numpy(zero_copy_only=False)
        d, s, e = _hit_spans(texts, dup, n)
        return pa.Table.from_pydict({
            "doc_id": pa.array(keys[d] if len(d) else [], pa.string()),
            "start_tok": pa.array(s, pa.int64()),
            "end_tok": pa.array(e, pa.int64())})

    return ds.map_batches(spans, batch_format="pyarrow",
                          zero_copy_batch=True)


def cut_duplicated_substrings(ds, dup_hashes: np.ndarray, *,
                              text_col: str = "text", n: int = 20):
    """Rewrite ``text_col`` with every duplicated span's tokens removed
    (the Lee-et-al cut applied, not just reported). All other columns
    pass through untouched; docs without duplicated spans keep their
    text byte-identical. Rewritten docs are re-joined with single
    spaces (tokenization is whitespace-based, so span boundaries are
    exact in token space; original inter-token whitespace inside a
    REWRITTEN doc is normalized — the same contract as the normalize
    stage)."""
    ref = ray.put(np.asarray(dup_hashes, dtype=np.uint64))

    def cut(b: pa.Table) -> pa.Table:
        dup = ray.get(ref)
        texts = b[text_col].to_numpy(zero_copy_only=False)
        d, s, e = _hit_spans(texts, dup, n)
        if not len(d):
            return b
        new_texts = texts.astype(object)
        for di in np.unique(d):
            sel = d == di
            toks = (texts[di] or "").split()
            keep = np.ones(len(toks), dtype=bool)
            for a, z in zip(s[sel], e[sel]):
                keep[a:z] = False
            new_texts[di] = " ".join(np.asarray(toks, dtype=object)[keep])
        i = b.schema.get_field_index(text_col)
        return b.set_column(i, text_col, pa.array(new_texts, pa.string()))

    return ds.map_batches(cut, batch_format="pyarrow",
                          zero_copy_batch=True)


def repeated_substring_scan(ds, *, text_col: str = "text",
                            key_col: str = "doc_id", n: int = 20,
                            min_docs: int = 2, sample_mod: int = 1,
                            mode: str = "driver"):
    """Two-pass wrapper: → (dup_hashes, spans Dataset). The input Dataset
    is consumed twice — pass a materialized/parquet-backed Dataset."""
    dup = duplicated_shingle_hashes(ds, text_col=text_col, n=n,
                                    min_docs=min_docs,
                                    sample_mod=sample_mod, mode=mode)
    return dup, duplicated_spans(ds, dup, text_col=text_col,
                                 key_col=key_col, n=n)
