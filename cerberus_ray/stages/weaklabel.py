"""Weak-supervision label aggregation (the Snorkel/data-programming
surface, Ratner et al. 2017 — the public majority-vote baseline, not
the learned generative model): combine K labeling-function columns
into one training label per row, plus the standard LF diagnostics.

Everything is one streamed vectorized pass:

- vote kernel: per row, the most common non-abstain LF output, ties
  resolved to abstain (the conservative convention) — computed as a
  per-label count stack + argmax over a HANDFUL of label values, no
  per-row Python;
- diagnostics: per-LF coverage / overlap / conflict counts (Snorkel's
  `LFAnalysis` trio) from block partials bounded by #LFs.

Tests: tests/test_weaklabel.py.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd
import pyarrow as pa

__all__ = ["weak_vote", "lf_summary"]


def weak_vote(ds, lf_cols: Sequence[str], *, abstain: int = -1,
              out_col: str = "weak_label"):
    """→ Dataset + ``out_col``: the majority non-abstain vote per row
    (ties → abstain; all-abstain → abstain). Label values must be
    small non-negative ints; ``abstain`` marks no-vote."""
    lf_cols = list(lf_cols)

    def vote(b: pa.Table) -> pa.Table:
        L = np.stack([b[c].to_numpy(zero_copy_only=False)
                      .astype(np.int64) for c in lf_cols], axis=1)
        mask = L != abstain
        if not mask.any():
            lab = np.full(len(L), abstain, dtype=np.int64)
            return b.append_column(out_col, pa.array(lab))
        labels = np.unique(L[mask])
        # counts[r, j] = #LFs voting labels[j] on row r
        counts = np.stack([((L == v) & mask).sum(axis=1)
                           for v in labels], axis=1)
        best = counts.max(axis=1)
        n_best = (counts == best[:, None]).sum(axis=1)
        arg = counts.argmax(axis=1)
        lab = np.where((best > 0) & (n_best == 1), labels[arg],
                       abstain)
        return b.append_column(out_col, pa.array(lab.astype(np.int64)))

    return ds.map_batches(vote, batch_format="pyarrow",
                          zero_copy_batch=True)


def lf_summary(ds, lf_cols: Sequence[str], *, abstain: int = -1,
               round_digits: int = 6) -> pd.DataFrame:
    """Per-LF diagnostics: coverage (votes at all), overlap (votes
    where ≥1 OTHER LF also votes), conflict (votes where another
    voting LF disagrees) — fractions of all rows, Snorkel's LFAnalysis
    definitions. One pass of (#LFs × 3 + 1) count partials.

    → frame (lf, n_rows, coverage, overlap, conflict)."""
    lf_cols = list(lf_cols)

    def part(b: pa.Table) -> pa.Table:
        L = np.stack([b[c].to_numpy(zero_copy_only=False)
                      .astype(np.int64) for c in lf_cols], axis=1)
        mask = L != abstain
        n_votes = mask.sum(axis=1)
        cov = mask.sum(axis=0)
        ov = (mask & (n_votes[:, None] >= 2)).sum(axis=0)
        conf = np.zeros(len(lf_cols), dtype=np.int64)
        for j in range(len(lf_cols)):
            others = np.delete(np.arange(len(lf_cols)), j)
            dis = (mask[:, others]
                   & (L[:, others] != L[:, j][:, None])).any(axis=1)
            conf[j] = (mask[:, j] & dis).sum()
        return pa.Table.from_pydict({
            "lf": pa.array(lf_cols, pa.string()),
            "n": pa.array([b.num_rows] * len(lf_cols), pa.int64()),
            "cov": pa.array(cov, pa.int64()),
            "ov": pa.array(ov, pa.int64()),
            "conf": pa.array(conf, pa.int64())})

    pdf = ds.map_batches(part, batch_format="pyarrow",
                         zero_copy_batch=True).to_pandas()
    g = (pdf.groupby("lf", sort=False, as_index=False)
         [["n", "cov", "ov", "conf"]].sum())
    order = {c: i for i, c in enumerate(lf_cols)}
    g = g.sort_values("lf", key=lambda s: s.map(order))
    n = g["n"].to_numpy(np.float64)
    out = pd.DataFrame({
        "lf": g["lf"].to_numpy(),
        "n_rows": g["n"].astype("int64").to_numpy(),
        "coverage": np.round(g["cov"] / n, round_digits),
        "overlap": np.round(g["ov"] / n, round_digits),
        "conflict": np.round(g["conf"] / n, round_digits)})
    return out.reset_index(drop=True)
