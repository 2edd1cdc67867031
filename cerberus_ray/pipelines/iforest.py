"""Isolation-forest anomaly scores (Liu, Ting & Zhou 2008).

The MULTIVARIATE outlier leg of the validation engine: the univariate
fence rules (`stages/outliers.py`) catch per-column extremes; isolation
scores catch rows that are jointly unusual (each column in range, the
combination rare). Standard iForest split of work:

- **Fit on the driver from a seeded sample.** The model is t tiny
  random trees over ψ-row subsamples (ψ=256 default — the paper's
  sweet spot; the forest does NOT improve with more data, so fitting
  on the whole corpus would be waste, not rigor). The sample is the
  engine's deterministic whole-table-unbiased draw (seeded
  ``random_sample``, lexsorted against arrival order); per-tree RNG is
  seed-derived, so the model is bit-reproducible.
- **Score streamed.** Trees (a few hundred int/float array nodes each)
  broadcast once; each block walks all rows through each tree with a
  masked vectorized level loop (the GBDT walk's cousin — no Python per
  row); anomaly score s = 2^(−E[h]/c(ψ)) appended per row.

Per-row python-reference parity, planted-outlier separation and
fixed-model layout invariance in tests/test_iforest.py.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Sequence

import numpy as np
import pyarrow as pa

import ray

__all__ = ["IForestModel", "fit_iforest", "score_iforest"]

_EULER = 0.5772156649015329


def _c(n) -> np.ndarray:
    """Average unsuccessful-search path length in a BST of n nodes."""
    n = np.asarray(n, dtype=np.float64)
    out = np.zeros_like(n)
    m = n > 1
    out[m] = 2.0 * (np.log(n[m] - 1.0) + _EULER) - 2.0 * (n[m] - 1.0) / n[m]
    return out


@dataclass
class IForestModel:
    feature_cols: List[str]
    # per tree: feat int32[], thr f64[], left int32[], right int32[],
    # adj f64[] (c(size) at external nodes, 0 at internal)
    trees: List[dict]
    subsample: int


def _build_tree(X: np.ndarray, rng: np.random.Generator,
                max_depth: int) -> dict:
    feat, thr, left, right, adj = [], [], [], [], []

    def grow(rows: np.ndarray, depth: int) -> int:
        idx = len(feat)
        feat.append(-1); thr.append(0.0)
        left.append(-1); right.append(-1); adj.append(0.0)
        sub = X[rows]
        lo, hi = sub.min(axis=0), sub.max(axis=0)
        splittable = np.flatnonzero(hi > lo)
        if depth >= max_depth or len(rows) <= 1 or not len(splittable):
            adj[idx] = float(_c(np.array([len(rows)]))[0])
            return idx
        f = int(rng.choice(splittable))
        t = float(rng.uniform(lo[f], hi[f]))
        mask = sub[:, f] < t
        if not mask.any() or mask.all():
            # an ulp-wide feature range can make uniform() return
            # exactly lo → an empty child whose min()/max() would
            # raise; treat the node as a leaf instead
            adj[idx] = float(_c(np.array([len(rows)]))[0])
            return idx
        feat[idx], thr[idx] = f, t
        left[idx] = grow(rows[mask], depth + 1)
        right[idx] = grow(rows[~mask], depth + 1)
        return idx

    grow(np.arange(len(X)), 0)
    return {"feat": np.array(feat, np.int32),
            "thr": np.array(thr, np.float64),
            "left": np.array(left, np.int32),
            "right": np.array(right, np.int32),
            "adj": np.array(adj, np.float64)}


def fit_iforest(ds, feature_cols: Sequence[str], *, n_trees: int = 100,
                subsample: int = 256, sample_rows: int = 8192,
                seed: int = 42) -> IForestModel:
    cols = list(feature_cols)
    if n_trees < 1 or subsample < 2:
        raise ValueError("n_trees >= 1 and subsample >= 2 required")
    n = ds.count()
    if n == 0:
        raise ValueError("empty dataset")
    if n > sample_rows:
        # exact-fraction draw, NO limit() truncation: over-drawing and
        # truncating in arrival order systematically dropped the tail
        # of the table from the fit sample (new-regime rows would
        # never inform the forest); the binomial size variance around
        # sample_rows is harmless
        frac = min(1.0, sample_rows / n)
        sample = ds.random_sample(frac, seed=seed).to_pandas()
        if len(sample) < sample_rows // 4:
            sample = ds.limit(sample_rows).to_pandas()
    else:
        sample = ds.limit(sample_rows).to_pandas()
    X = sample[cols].to_numpy(np.float64)
    X = X[~np.isnan(X).any(axis=1)]
    if len(X) < 2:
        raise ValueError("need >= 2 complete rows to fit")
    X = X[np.lexsort(X.T[::-1])]
    psi = min(subsample, len(X))
    max_depth = int(np.ceil(np.log2(psi)))
    trees = []
    for t in range(n_trees):
        rng = np.random.default_rng(seed * 1_000_003 + t)
        rows = rng.choice(len(X), size=psi, replace=False)
        trees.append(_build_tree(X[rows], rng, max_depth))
    return IForestModel(feature_cols=cols, trees=trees, subsample=psi)


def _path_lengths(X: np.ndarray, tree: dict) -> np.ndarray:
    """Vectorized masked walk → per-row path length h(x)."""
    feat, thr = tree["feat"], tree["thr"]
    left, right, adj = tree["left"], tree["right"], tree["adj"]
    node = np.zeros(len(X), dtype=np.int64)
    depth = np.zeros(len(X), dtype=np.float64)
    for _ in range(64):                      # > max tree depth
        live = feat[node] >= 0
        if not live.any():
            break
        f = feat[node[live]]
        go_left = X[live, f] < thr[node[live]]
        nxt = np.where(go_left, left[node[live]], right[node[live]])
        node[live] = nxt
        depth[live] += 1.0
    return depth + adj[node]


def score_iforest(ds, model: IForestModel, *,
                  out_col: str = "anomaly_score"):
    """Append s(x) = 2^(−E[h]/c(ψ)) ∈ (0, 1); NaN feature rows score
    null."""
    tref = ray.put(model.trees)
    cols = model.feature_cols
    cn = float(_c(np.array([model.subsample]))[0]) or 1.0

    def score(b: pa.Table, _tref=tref) -> pa.Table:
        trees = ray.get(_tref)
        X = np.column_stack([
            b[c].to_numpy(zero_copy_only=False).astype(np.float64)
            for c in cols])
        ok = ~np.isnan(X).any(axis=1)
        h = np.zeros(len(X))
        if ok.any():
            Xo = X[ok]
            acc = np.zeros(len(Xo))
            for t in trees:
                acc += _path_lengths(Xo, t)
            h[ok] = acc / len(trees)
        s = np.where(ok, np.power(2.0, -h / cn), np.nan)
        # a REAL Arrow null (mask), not a NaN float — the documented
        # contract, so drop_null / is-null filters actually work
        return b.append_column(
            out_col, pa.array(s, pa.float64(), mask=~ok))

    return ds.map_batches(score, batch_format="pyarrow",
                          zero_copy_batch=True)
