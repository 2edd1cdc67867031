"""Distributed NMF topic modeling (Lee & Seung 2000 multiplicative
updates, Frobenius objective) over hashed term-frequency vectors.

The linear-algebra topic model beside the engine's hard/soft
clusterers (spherical k-means, GMM): V ≈ W·H with W (doc × k) and
H (k × B) non-negative. Same split of state as implicit ALS:

- **H is tiny and broadcast** (k × B hashed-feature matrix).
- **W is never materialized**: each outer iteration recomputes every
  document's topic weights from (its TF vector, H) with a few inner
  multiplicative updates from a fixed uniform init — stateless,
  retry-safe, block-order independent, and exactly what makes the
  pass ONE streamed map over the corpus.
- The pass emits the mergeable H-update sufficient statistics
  (Σ WᵀV (k×B), Σ WᵀW (k×k)) plus the Frobenius loss; the driver's
  multiplicative H update is O(k·B).

The objective is recorded BEFORE each H update; trajectories must be
non-increasing (tests' gate; multiplicative updates guarantee descent
for each factor step). Topics are read through ``topic_top_words`` —
candidate words hash into the SAME buckets, so interpretability
survives the hashing trick for any supplied vocabulary.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Sequence

import numpy as np
import pandas as pd
import pyarrow as pa

import ray

from ..determinism import hash_strings
from .doc_cluster import _doc_vectors

__all__ = ["NMFModel", "fit_nmf", "topic_top_words"]

_EPS = 1e-9


@dataclass
class NMFModel:
    H: np.ndarray                # (k, B) topic-feature matrix
    n_features: int
    losses: List[float] = field(default_factory=list)

    @property
    def k(self) -> int:
        return len(self.H)


def _solve_w(V: np.ndarray, H: np.ndarray,
             inner_iters: int) -> np.ndarray:
    """Per-doc multiplicative W updates from uniform init (stateless,
    deterministic)."""
    k = len(H)
    W = np.full((len(V), k), 1.0 / k)
    HHt = H @ H.T
    for _ in range(inner_iters):
        W *= (V @ H.T) / np.maximum(W @ HHt, _EPS)
    return W


def fit_nmf(ds, *, text_col: str = "text", k: int = 8,
            n_features: int = 1024, n_iters: int = 10,
            inner_iters: int = 5, seed: int = 42) -> NMFModel:
    if k < 1 or n_features < k:
        raise ValueError("need 1 <= k <= n_features")
    rng = np.random.default_rng(seed)
    H = np.abs(rng.standard_normal((k, n_features))) + 0.1
    model = NMFModel(H=H, n_features=n_features)

    for _ in range(n_iters):
        href = ray.put(model.H)

        def partial(b: pa.Table, _href=href) -> pa.Table:
            Hb = ray.get(_href)
            texts = b[text_col].to_numpy(zero_copy_only=False)
            V = _doc_vectors(texts, n_features)
            W = _solve_w(V, Hb, inner_iters)
            loss = float(((V - W @ Hb) ** 2).sum())
            return pa.Table.from_pydict({
                "wtv": [(W.T @ V).tobytes()],
                "wtw": [(W.T @ W).tobytes()],
                "loss": [loss], "n": [len(V)]})

        p = ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True).to_pandas()
        wtv = sum(np.frombuffer(x).reshape(k, n_features)
                  for x in p["wtv"])
        wtw = sum(np.frombuffer(x).reshape(k, k) for x in p["wtw"])
        n = int(p["n"].sum()) if len(p) else 0
        if n == 0:
            raise ValueError("empty dataset: no rows to fit NMF on")
        model.losses.append(round(float(p["loss"].sum()) / n, 10))
        model.H = model.H * wtv / np.maximum(wtw @ model.H, _EPS)
    return model


def topic_top_words(model: NMFModel, words: Sequence[str], *,
                    top_n: int = 5) -> pd.DataFrame:
    """Map candidate ``words`` through the SAME hash into feature
    buckets and rank per topic. → frame (topic, word, weight) with
    ``top_n`` rows per topic (weight desc, word asc ties)."""
    words = sorted(set(words))
    if not words:
        raise ValueError("words must be non-empty")
    h = (hash_strings(np.asarray(words, dtype=object))
         % np.uint64(model.n_features)).astype(np.int64)
    rows = []
    for t in range(model.k):
        wts = model.H[t, h]
        order = np.lexsort((np.asarray(words, dtype=object), -wts))
        for i in order[:top_n]:
            rows.append((t, words[i], round(float(wts[i]), 6)))
    return pd.DataFrame(rows, columns=["topic", "word", "weight"])
