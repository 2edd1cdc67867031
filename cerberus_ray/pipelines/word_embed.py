"""Count-based word embeddings: PPMI matrix + truncated SVD
(Levy & Goldberg 2014 — the public "SGNS ≈ shifted-PMI
factorization" result; the classical alternative to SGD word2vec and
the corpus-statistics sibling of the engine's PMI collocations).

Factorization (the BPE/unigram word-table discipline again):

- distributed: ONE streamed pass of per-block WINDOWED co-occurrence
  partials restricted to the top-``vocab_size`` words — rows bounded
  by vocab² (the documented census bound), symmetric counts over
  offsets 1..window with document boundaries respected;
- driver: dense PPMI over the (V × V) census (V ≲ a few thousand by
  contract), SVD, vectors = U_d·√Σ_d with a deterministic sign fix
  (largest-|component| coordinate made positive), L2-normalized.

``similar_words`` answers nearest-neighbor queries by cosine against
the model matrix. Planted-synonym recovery, census parity vs a pure
python counter, and layout invariance in tests/test_word_embed.py.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List

import numpy as np
import pandas as pd
import pyarrow as pa

from .bpe import word_counts

__all__ = ["WordVecModel", "fit_word_vectors", "similar_words",
           "window_pair_counts"]


@dataclass
class WordVecModel:
    words: List[str]
    vectors: np.ndarray          # (V, dim), L2-normalized
    window: int

    def __getitem__(self, w: str) -> np.ndarray:
        return self.vectors[self.words.index(w)]


def window_pair_counts(ds, vocab: List[str], *, text_col: str = "text",
                       window: int = 2) -> pd.DataFrame:
    """Symmetric windowed co-occurrence counts over ``vocab`` →
    (w1, w2, n) with both orientations counted once each (so the
    census is symmetric by construction)."""
    if window < 1:
        raise ValueError("window must be >= 1")
    idx = {w: i for i, w in enumerate(vocab)}

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        toks = df[text_col].fillna("").str.lower().str.split()
        lens = toks.str.len().to_numpy(np.int64)
        flat = toks.explode().dropna().map(idx).to_numpy()
        doc = np.repeat(np.arange(len(lens)), lens)
        acc: Dict[tuple, int] = {}
        for off in range(1, window + 1):
            if len(flat) <= off:
                break
            a, b = flat[:-off], flat[off:]
            ok = (doc[:-off] == doc[off:])
            ok &= ~pd.isna(a) & ~pd.isna(b)
            pairs = pd.DataFrame({
                "w1": a[ok], "w2": b[ok]}).dropna()
            for (x, y), n in (pairs.groupby(["w1", "w2"], sort=False)
                              .size().items()):
                acc[(int(x), int(y))] = acc.get((int(x), int(y)), 0) + n
                acc[(int(y), int(x))] = acc.get((int(y), int(x)), 0) + n
        if not acc:
            return pd.DataFrame({"w1": [], "w2": [], "n": []})
        ks = np.array(list(acc))
        return pd.DataFrame({"w1": ks[:, 0], "w2": ks[:, 1],
                             "n": np.array(list(acc.values()),
                                           dtype=np.int64)})

    pdf = ds.map_batches(partial, batch_format="pandas").to_pandas()
    if not len(pdf):
        return pd.DataFrame({"w1": [], "w2": [], "n": []})
    g = pdf.groupby(["w1", "w2"], as_index=False)["n"].sum()
    g["w1"] = g["w1"].astype(np.int64)
    g["w2"] = g["w2"].astype(np.int64)
    return g


def fit_word_vectors(ds, *, text_col: str = "text",
                     vocab_size: int = 2000, window: int = 2,
                     dim: int = 64, shift: float = 1.0,
                     max_words: int = 50_000) -> WordVecModel:
    counts = word_counts(ds, text_col=text_col, max_words=max_words)
    vocab = sorted(counts.head(vocab_size).index.tolist())
    if len(vocab) < 2:
        raise ValueError("need at least 2 vocabulary words")
    V = len(vocab)
    census = window_pair_counts(ds, vocab, text_col=text_col,
                                window=window)
    M = np.zeros((V, V))
    if len(census):
        M[census["w1"], census["w2"]] = census["n"]
    total = M.sum()
    if total == 0:
        raise ValueError("no co-occurrences in window")
    row = M.sum(axis=1, keepdims=True)
    col = M.sum(axis=0, keepdims=True)
    with np.errstate(divide="ignore", invalid="ignore"):
        pmi = np.log((M * total)
                     / np.maximum(row * col, 1e-12)) - np.log(shift)
    ppmi = np.where(M > 0, np.maximum(pmi, 0.0), 0.0)
    U, S, _ = np.linalg.svd(ppmi, full_matrices=False)
    d = min(dim, V)
    vec = U[:, :d] * np.sqrt(S[:d])[None, :]
    # deterministic sign: flip so each COLUMN's largest-|x| entry > 0
    for j in range(d):
        i = int(np.argmax(np.abs(vec[:, j])))
        if vec[i, j] < 0:
            vec[:, j] = -vec[:, j]
    norms = np.linalg.norm(vec, axis=1, keepdims=True)
    vec = np.divide(vec, norms, out=np.zeros_like(vec),
                    where=norms > 0)
    return WordVecModel(words=vocab, vectors=vec, window=window)


def similar_words(model: WordVecModel, word: str, *,
                  top_n: int = 5) -> pd.DataFrame:
    if word not in model.words:
        raise KeyError(word)
    q = model[word]
    sims = model.vectors @ q
    order = np.lexsort((np.asarray(model.words, dtype=object),
                        -np.round(sims, 12)))
    rows = [(model.words[i], round(float(sims[i]), 6))
            for i in order if model.words[i] != word][:top_n]
    return pd.DataFrame(rows, columns=["word", "cosine"])
