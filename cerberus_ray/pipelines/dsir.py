"""DSIR-style data selection — hashed n-gram importance resampling.

Public method (Xie et al. 2023, "Data Selection for Language Models via
Importance Resampling", NeurIPS 2023; PAPERS.md): pick raw-corpus
documents whose hashed n-gram profile looks like a TARGET corpus.

1. Features: lowercase whitespace unigrams + bigrams hashed into a fixed
   bucket universe B (default 10,000) — the dimensionality is a CHOSEN
   constant, independent of corpus/vocabulary size.
2. Fit bucket distributions p (target) and q (raw), add-one smoothed.
3. Per-document importance log-weight
   ``logw = Σ_f c_f · (log p[f] − log q[f])`` over the doc's features.
4. Resample k docs without replacement ∝ exp(logw / temperature) with
   the Gumbel-top-k trick (Kool et al. 2019): perturb each logw with
   deterministic Gumbel noise pure in (seed, key) and keep the k
   largest — exact size, retry/partition-invariant, no RNG state.

Ray shape (all driver structures domain-bounded by B):

- fit: one streamed pass; each block emits its SPARSE nonzero
  (bucket, count) partial (≤ B rows); the driver sums into a dense
  (B,) vector — O(B), corpus-size-independent.
- score: the (B,) log-ratio vector broadcasts once via ``ray.put``;
  per block one flatten + hash + per-doc ``reduceat`` gather-sum →
  streamed ``dsir_logw`` column appended to full rows.
- select: the budget machinery's exact-k prefix cut
  (:func:`..budget.select_token_budget`) over the perturbed score —
  driver/sort mode planner inherited, final filter = two scalars.

Reference anchor: the closest reference computation is the quality-gated
corpus funnel (SURVEY.md §2 "corpus construction"); DSIR is the
target-distribution-matching refinement of that gate's score.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
import pyarrow as pa
import ray

from ..determinism import hash_strings
from .budget import select_token_budget

DEFAULT_BUCKETS = 10_000


def _doc_feature_buckets(texts: np.ndarray, n_buckets: int
                         ) -> Tuple[np.ndarray, np.ndarray]:
    """→ (flat bucket ids, per-doc feature counts). Features are
    lowercase whitespace unigrams + adjacent bigrams (joined with a
    NUL byte so 'a b'+'c' ≠ 'a'+'b c'), hashed into ``n_buckets``."""
    flat: list = []
    counts = np.empty(len(texts), dtype=np.int64)
    for i, t in enumerate(texts):
        toks = (t or "").lower().split()
        feats = toks + [a + "\x00" + b for a, b in zip(toks, toks[1:])]
        counts[i] = len(feats)
        flat.extend(feats)
    if not flat:
        return np.empty(0, dtype=np.int64), counts
    ids = (hash_strings(np.array(flat, dtype=object))
           % np.uint64(n_buckets)).astype(np.int64)
    return ids, counts


def fit_hashed_ngram_dist(ds, *, text_col: str = "text",
                          n_buckets: int = DEFAULT_BUCKETS,
                          smoothing: float = 1.0) -> np.ndarray:
    """→ dense (n_buckets,) probability vector of the corpus's hashed
    n-gram bucket distribution, add-``smoothing`` smoothed (never zero,
    so log-ratios are always finite)."""

    def partial(b: pa.Table) -> pa.Table:
        texts = b[text_col].to_numpy(zero_copy_only=False)
        ids, _ = _doc_feature_buckets(texts, n_buckets)
        dense = np.bincount(ids, minlength=n_buckets)
        nz = np.flatnonzero(dense)
        return pa.Table.from_pydict(
            {"bucket": pa.array(nz, pa.int64()),
             "n": pa.array(dense[nz], pa.int64())})

    pdf = ds.map_batches(partial, batch_format="pyarrow",
                         zero_copy_batch=True).to_pandas()
    dense = np.zeros(n_buckets, dtype=np.float64)
    if len(pdf):
        np.add.at(dense, pdf["bucket"].to_numpy(dtype=np.int64),
                  pdf["n"].to_numpy(dtype=np.float64))
    dense += smoothing
    return dense / dense.sum()


def dsir_log_ratio(target_probs: np.ndarray,
                   raw_probs: np.ndarray) -> np.ndarray:
    """→ (B,) per-bucket log importance ratio log p_target − log q_raw."""
    if target_probs.shape != raw_probs.shape:
        raise ValueError("target/raw bucket universes differ")
    return np.log(target_probs) - np.log(raw_probs)


def score_dsir(ds, log_ratio: np.ndarray, *, text_col: str = "text",
               out_col: str = "dsir_logw",
               n_buckets: Optional[int] = None):
    """Append the per-document DSIR importance log-weight (mean over the
    doc's hashed features — the per-feature normalization of the paper,
    which keeps long documents from dominating on length alone).
    Streamed; the log-ratio vector broadcasts once."""
    nb = n_buckets or len(log_ratio)
    if nb != len(log_ratio):
        raise ValueError("n_buckets does not match the log-ratio vector")
    ref = ray.put(np.ascontiguousarray(log_ratio, dtype=np.float64))

    def add(b: pa.Table) -> pa.Table:
        lr = ray.get(ref)
        texts = b[text_col].to_numpy(zero_copy_only=False)
        ids, counts = _doc_feature_buckets(texts, nb)
        vals = lr[ids] if ids.size else np.empty(0, dtype=np.float64)
        starts = np.zeros(len(counts), dtype=np.int64)
        np.cumsum(counts[:-1], out=starts[1:])
        sums = np.zeros(len(counts), dtype=np.float64)
        nz = counts > 0
        if vals.size and nz.any():
            sums[nz] = np.add.reduceat(vals, starts[nz])
        logw = np.where(counts > 0, sums / np.maximum(counts, 1), 0.0)
        return b.append_column(out_col, pa.array(logw, pa.float64()))

    return ds.map_batches(add, batch_format="pyarrow",
                          zero_copy_batch=True)


def _gumbel(idx_keys, seed: int) -> np.ndarray:
    """Deterministic standard-Gumbel noise pure in (seed, key)."""
    from ..determinism import uniform01

    u = uniform01(idx_keys, seed, salt=0xD51A)
    u = np.clip(u, 1e-12, 1.0 - 1e-12)
    return -np.log(-np.log(u))


def dsir_select(raw_ds, target_ds, k: int, *, text_col: str = "text",
                key_col: str = "doc_id",
                n_buckets: int = DEFAULT_BUCKETS, seed: int = 0,
                temperature: float = 1.0, smoothing: float = 1.0,
                mode: str = "auto"):
    """→ Dataset of exactly-k raw documents resampled without replacement
    ∝ exp(dsir_logw / temperature) — deterministic in (seed, key),
    partition-invariant. ``temperature → 0`` approaches a hard top-k by
    weight; ``temperature = 1`` is the paper's importance resampling.
    ``raw_ds`` is consumed three times (fit, score, select) — pass a
    parquet-backed or materialized Dataset."""
    if k <= 0:
        raise ValueError("k must be >= 1")
    if temperature <= 0:
        raise ValueError("temperature must be > 0")
    p = fit_hashed_ngram_dist(target_ds, text_col=text_col,
                              n_buckets=n_buckets, smoothing=smoothing)
    q = fit_hashed_ngram_dist(raw_ds, text_col=text_col,
                              n_buckets=n_buckets, smoothing=smoothing)
    lr = dsir_log_ratio(p, q)
    scored = score_dsir(raw_ds, lr, text_col=text_col,
                        n_buckets=n_buckets)

    def perturb(b: pa.Table) -> pa.Table:
        keys = b[key_col]
        if pa.types.is_integer(keys.type):
            idx = keys.to_numpy(zero_copy_only=False).astype(np.uint64)
        else:
            import pyarrow.compute as pc
            idx = hash_strings(pc.cast(keys, pa.string()).to_numpy(
                zero_copy_only=False))
        g = _gumbel(idx, seed)
        w = b["dsir_logw"].to_numpy(zero_copy_only=False)
        b = b.append_column("_dsir_key",
                            pa.array(w / temperature + g, pa.float64()))
        return b.append_column("_dsir_one",
                               pa.array(np.ones(b.num_rows, np.int64)))

    keyed = scored.map_batches(perturb, batch_format="pyarrow",
                               zero_copy_batch=True).materialize()
    out = select_token_budget(keyed, k, score_col="_dsir_key",
                              token_col="_dsir_one", key_col=key_col,
                              mode=mode)
    return out.drop_columns(["_dsir_key", "_dsir_one"])
