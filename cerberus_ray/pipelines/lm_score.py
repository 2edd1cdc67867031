"""Language-model quality scoring — per-document perplexity under a
corpus-fit unigram model.

The model-based quality-filter family of public corpus pipelines (CCNet
scores documents with a KenLM 5-gram; docs far from the reference
distribution are cut). The in-sandbox variant is a REAL scorer, not a
stub: the reference model is the corpus's own unigram distribution
(optionally a separate reference corpus), and each document's
cross-entropy / perplexity under it is exact.

Two streamed passes, no shuffle:

1. fit: token counts (the vocab machinery's per-block distinct-token
   hash aggregates) → driver merge of the frequency table, truncated to
   the top ``vocab_size`` tokens; everything else scores as one OOV
   bucket with add-one mass. The table broadcasts once via ``ray.put``
   as (sorted token array, log2-prob array) — O(vocab), never O(corpus).
2. score: per batch, flatten every doc's tokens, one ``searchsorted``
   lookup against the broadcast vocabulary, ``reduceat`` per-doc sums →
   (doc_id, n_tokens, xent, ppl). Pure vectorized numpy per block.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .vocab import _token_counts_block


def fit_unigram(ds, *, text_col: str = "text",
                vocab_size: int = 50_000) -> Tuple[np.ndarray, np.ndarray, float]:
    """→ (sorted token array, log2 p per token, log2 p for OOV).
    Add-one smoothing over vocab ∪ {OOV}."""
    pdf = ds.map_batches(
        lambda b: _token_counts_block(b, text_col),
        batch_format="pyarrow", zero_copy_batch=True).to_pandas()
    if "token" not in pdf.columns or not len(pdf):
        return (np.array([], dtype=object), np.array([], dtype=np.float64),
                0.0)
    g = (pdf.groupby("token", as_index=False)["n"].sum()
         .sort_values(["n", "token"], ascending=[False, True])
         .head(vocab_size))
    toks = g["token"].to_numpy(dtype=object)
    counts = g["n"].to_numpy(dtype=np.float64)
    total = counts.sum() + len(counts) + 1  # add-one incl. the OOV bucket
    order = np.argsort(toks)
    logp = np.log2((counts + 1.0) / total)[order]
    oov_logp = float(np.log2(1.0 / total))
    return toks[order], logp, oov_logp


def score_perplexity(docs_ds, *, text_col: str = "text",
                     key_col: str = "doc_id", vocab_size: int = 50_000,
                     reference_ds=None):
    """→ Dataset (doc_id, n_tokens, xent, ppl): cross-entropy (bits per
    token) and perplexity of each document under the unigram model fit on
    ``reference_ds`` (default: the corpus itself)."""
    import ray

    toks, logp, oov_logp = fit_unigram(
        reference_ds if reference_ds is not None else docs_ds,
        text_col=text_col, vocab_size=vocab_size)
    ref = ray.put((toks, logp, oov_logp))

    def score(b: pa.Table) -> pa.Table:
        vt, vl, oov = ray.get(ref)
        texts = b[text_col].to_numpy(zero_copy_only=False)
        flat: list = []
        counts = np.empty(len(texts), dtype=np.int64)
        for i, t in enumerate(texts):
            ts = (t or "").lower().split()
            counts[i] = len(ts)
            flat.extend(ts)
        if flat and len(vt):
            arr = np.array(flat, dtype=object)
            pos = np.clip(np.searchsorted(vt, arr), 0, len(vt) - 1)
            hit = vt[pos] == arr
            lp = np.where(hit, vl[pos], oov)
        else:
            lp = np.full(len(flat), oov, dtype=np.float64)
        starts = np.zeros(len(counts), dtype=np.int64)
        np.cumsum(counts[:-1], out=starts[1:])
        sums = np.zeros(len(counts), dtype=np.float64)
        nz = counts > 0
        if lp.size and nz.any():
            sums[nz] = np.add.reduceat(lp, starts[nz])
        xent = np.where(counts > 0, -sums / np.maximum(counts, 1), 0.0)
        return pa.Table.from_arrays(
            [pc.cast(b[key_col], pa.string()),
             pa.array(counts), pa.array(np.round(xent, 4)),
             pa.array(np.round(np.exp2(xent), 2))],
            names=["doc_id", "n_tokens", "xent", "ppl"])

    return docs_ds.map_batches(score, batch_format="pyarrow",
                               zero_copy_batch=True)
