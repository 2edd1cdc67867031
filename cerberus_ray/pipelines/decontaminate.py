"""Benchmark decontamination — flag training documents that overlap a
held-out evaluation set.

The standard public-pipeline hygiene step (the GPT-3 appendix's 13-gram
overlap filter; Dodge et al. 2021 C4 audit): any training document
sharing an n-token shingle with a benchmark document is flagged (and
usually dropped) so evaluation stays uncontaminated.

Ray shape: the benchmark side is SMALL by definition (an eval set) — its
shingle-hash set broadcasts once via ``ray.put`` as a sorted uint64
array; the corpus streams through one vectorized ``map_batches`` pass
that flattens every doc's shingles, hashes them in ONE ``hash_strings``
call per block (the winnowing batch kernel's trick) and counts hits by
``searchsorted`` membership. No shuffle, no driver structure ∝ corpus.
At 10^12 docs the pass stays embarrassingly parallel; only the benchmark
set must fit worker memory (n-gram hash array, 8 B per shingle).
"""

from __future__ import annotations

from typing import List

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..determinism import hash_strings


def _shingle_hashes_flat(texts, n: int):
    """Flatten every doc's n-token shingles; hash in one vectorized call.
    → (hashes, counts): per-doc shingle counts for reduceat-style use."""
    shingles: List[str] = []
    counts = np.empty(len(texts), dtype=np.int64)
    for i, t in enumerate(texts):
        toks = (t or "").lower().split()
        m = max(len(toks) - n + 1, 0)
        counts[i] = m
        shingles.extend(" ".join(toks[j:j + n]) for j in range(m))
    h = (hash_strings(np.array(shingles, dtype=object))
         if shingles else np.array([], dtype=np.uint64))
    return h, counts


def benchmark_shingle_set(benchmark_ds, *, text_col: str = "text",
                          n: int = 8) -> np.ndarray:
    """Sorted distinct shingle hashes of the benchmark set (the small,
    broadcastable side)."""

    def block(b: pa.Table) -> pa.Table:
        texts = b[text_col].to_numpy(zero_copy_only=False)
        h, _ = _shingle_hashes_flat(texts, n)
        return pa.Table.from_pydict({"h": pa.array(np.unique(h))})

    pdf = benchmark_ds.map_batches(block, batch_format="pyarrow",
                                   zero_copy_batch=True).to_pandas()
    if "h" not in pdf.columns or not len(pdf):
        return np.array([], dtype=np.uint64)
    return np.unique(pdf["h"].to_numpy().astype(np.uint64))


def contamination_scan(docs_ds, benchmark_ds, *, text_col: str = "text",
                       key_col: str = "doc_id", n: int = 8,
                       min_hits: int = 1):
    """→ Dataset (doc_id, n_shingles, n_hits, contaminated) — one row per
    corpus document; ``contaminated`` = n_hits ≥ min_hits."""
    import ray

    bench = benchmark_shingle_set(benchmark_ds, text_col=text_col, n=n)
    ref = ray.put(bench)

    def scan(b: pa.Table) -> pa.Table:
        bh = ray.get(ref)
        texts = b[text_col].to_numpy(zero_copy_only=False)
        h, counts = _shingle_hashes_flat(texts, n)
        if len(bh) and len(h):
            pos = np.clip(np.searchsorted(bh, h), 0, len(bh) - 1)
            hit = (bh[pos] == h).astype(np.int64)
        else:
            hit = np.zeros(len(h), dtype=np.int64)
        starts = np.zeros(len(counts), dtype=np.int64)
        np.cumsum(counts[:-1], out=starts[1:])
        # per-doc hit totals; docs with zero shingles contribute zero
        hits = np.zeros(len(counts), dtype=np.int64)
        nz = counts > 0
        if hit.size and nz.any():
            sums = np.add.reduceat(hit, starts[nz])
            hits[nz] = sums
        return pa.Table.from_arrays(
            [pc.cast(b[key_col], pa.string()),
             pa.array(counts), pa.array(hits),
             pa.array(hits >= min_hits)],
            names=["doc_id", "n_shingles", "n_hits", "contaminated"])

    return docs_ds.map_batches(scan, batch_format="pyarrow",
                               zero_copy_batch=True)


def drop_contaminated(docs_ds, benchmark_ds, *, text_col: str = "text",
                      key_col: str = "doc_id", n: int = 8,
                      min_hits: int = 1):
    """Filter variant: stream the corpus, keep only clean documents
    (original columns intact) — the corpus-construction gate shape."""
    import ray

    bench = benchmark_shingle_set(benchmark_ds, text_col=text_col, n=n)
    ref = ray.put(bench)

    def keep(b: pa.Table) -> pa.Table:
        bh = ray.get(ref)
        texts = b[text_col].to_numpy(zero_copy_only=False)
        h, counts = _shingle_hashes_flat(texts, n)
        if len(bh) and len(h):
            pos = np.clip(np.searchsorted(bh, h), 0, len(bh) - 1)
            hit = (bh[pos] == h).astype(np.int64)
        else:
            hit = np.zeros(len(h), dtype=np.int64)
        starts = np.zeros(len(counts), dtype=np.int64)
        np.cumsum(counts[:-1], out=starts[1:])
        hits = np.zeros(len(counts), dtype=np.int64)
        nz = counts > 0
        if hit.size and nz.any():
            hits[nz] = np.add.reduceat(hit, starts[nz])
        return b.filter(pa.array(hits < min_hits))

    return docs_ds.map_batches(keep, batch_format="pyarrow",
                               zero_copy_batch=True)
