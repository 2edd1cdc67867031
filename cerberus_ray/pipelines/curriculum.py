"""Curriculum data ordering — the "feed easy data first, but never a
long single-domain run" arrangement step between corpus construction
and sequence packing (curriculum learning, Bengio et al. 2009; the
stratified-interleave convention of large-scale LM data loaders).

Plan (all streaming + ONE range-partition sort, the unavoidable
exchange of any global ordering):

1. difficulty bins: quantile thresholds from merged KLL sketches over
   the difficulty column (same exactness band as RFM's thresholds),
   broadcast once;
2. interleave key: a seeded per-id uniform draw — within every
   (bin, domain) stratum the draws are iid uniform, so sorting by
   (bin, u) interleaves domains in proportion to their size with
   geometrically-bounded same-domain run lengths, WITHOUT computing
   any per-domain rank (no second exchange);
3. `Dataset.sort` on the composite key.

The whole ordering is a pure function of (data, seed): reruns and
layouts produce the identical sequence (tested).

Tests: tests/test_curriculum.py.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

__all__ = ["curriculum_order", "run_length_report"]


def curriculum_order(ds, id_col: str, difficulty_col: str, *,
                     n_bins: int = 4, seed: int = 42,
                     kll_k: int = 8192, ascending: bool = True):
    """→ Dataset ordered by (difficulty bin, seeded interleave draw),
    with ``bin`` and the draw (``__cu``) appended. ``ascending=False``
    feeds hard examples first (anti-curriculum)."""
    from ..determinism import uniform01
    from ..state.kll import KLL

    def sketch(df: pd.DataFrame) -> pd.DataFrame:
        s = KLL(k=kll_k)
        s.update(df[difficulty_col].to_numpy(dtype=np.float64))
        return pd.DataFrame({"s": [s.to_bytes().hex()]})

    parts = ds.map_batches(sketch, batch_format="pandas").to_pandas()
    merged = KLL(k=kll_k)
    for hexed in parts["s"]:
        merged = merged.merge(KLL.from_bytes(bytes.fromhex(hexed)))
    thr = np.array([merged.quantile(i / n_bins)
                    for i in range(1, n_bins)])
    tref = ray.put(thr)

    def key(b: pa.Table) -> pa.Table:
        t = ray.get(tref)
        d = b[difficulty_col].to_numpy(zero_copy_only=False).astype(
            np.float64)
        binv = np.searchsorted(t, d, side="left").astype(np.int64)
        if not ascending:
            binv = (len(t)) - binv
        ids = b[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        u = uniform01(ids, seed)
        return (b.append_column("bin", pa.array(binv))
                .append_column("__cu", pa.array(u)))

    keyed = ds.map_batches(key, batch_format="pyarrow",
                           zero_copy_batch=True)
    return keyed.sort(["bin", "__cu"])


def run_length_report(ordered_ds, domain_col: str, *,
                      round_digits: int = 6) -> pd.DataFrame:
    """Interleave diagnostics over an ORDERED dataset: per domain, the
    share of rows and the longest same-domain run — the quantity a
    curriculum/interleave step is supposed to keep small. Consumes the
    order as a stream (runs are computed per block with a cross-block
    stitch on the driver: #blocks boundary rows, never the data).

    → frame (domain, n, share, max_run)."""
    counts: dict = {}
    max_run: dict = {}
    pending = None  # (domain, length) of the run open at the boundary

    def _finalize(dom, ln):
        if dom is not None:
            max_run[dom] = max(max_run.get(dom, 0), int(ln))

    # stream blocks in order; per block only VECTORIZED aggregates and
    # two edge runs reach the driver → O(#blocks) driver state
    for bt in ordered_ds.select_columns([domain_col]).iter_batches(
            batch_format="pyarrow", batch_size=None):
        dom = bt[domain_col].to_numpy(zero_copy_only=False)
        if not len(dom):
            continue
        change = np.flatnonzero(dom[1:] != dom[:-1])
        starts = np.concatenate([[0], change + 1])
        ends = np.concatenate([change + 1, [len(dom)]])
        lens = ends - starts
        doms = dom[starts]
        for d, ln in zip(*np.unique(dom, return_counts=True)):
            counts[d] = counts.get(d, 0) + int(ln)
        # interior runs (not first, not last) finalize immediately
        if len(doms) > 2:
            inner = pd.DataFrame({"d": doms[1:-1], "l": lens[1:-1]})
            for d, ln in inner.groupby("d")["l"].max().items():
                max_run[d] = max(max_run.get(d, 0), int(ln))
        first = (doms[0], int(lens[0]))
        last = (doms[-1], int(lens[-1]))
        if pending is not None and pending[0] == first[0]:
            first = (first[0], first[1] + pending[1])
        elif pending is not None:
            _finalize(*pending)
        if len(doms) == 1:
            pending = first          # whole block one run — stay open
        else:
            _finalize(*first)
            pending = last
    if pending is not None:
        _finalize(*pending)
    if not counts:
        return pd.DataFrame({"domain": [], "n": [], "share": [],
                             "max_run": []})
    total = sum(counts.values())
    out = pd.DataFrame({
        "domain": sorted(counts),
        "n": [counts[d] for d in sorted(counts)],
        "share": [round(counts[d] / total, round_digits)
                  for d in sorted(counts)],
        "max_run": [max_run.get(d, 0) for d in sorted(counts)]})
    out["n"] = out["n"].astype("int64")
    out["max_run"] = out["max_run"].astype("int64")
    return out
