"""Text-only document clustering: feature-hashed TF vectors + the
engine's deterministic spherical k-means — domain/topic discovery over
corpora with NO embedding column (the public hashing-vectorizer +
k-means recipe; used for mixing-weight discovery and topic audits).

Execution shape:

1. ``hashed_tf_vectors``: one streamed pass turns each document into an
   L2-normalized B-dimensional hashed term-frequency vector (tokens
   hash into a FIXED bucket universe like DSIR's features — vectorized
   ``hash_strings`` + ``np.bincount`` per doc-segment, no vocabulary
   state anywhere).
2. centroid fit reuses ``similarity.train_ivf_centroids`` (deterministic
   seeded-sample spherical k-means) on the vector column.
3. ``cluster_documents``: an assignment pass with the (k, B) centroid
   matrix broadcast once — per batch a single matmul-argmax — and a
   separate summary pass whose per-(cluster, token) count partials the
   driver merges (O(#blocks × #clusters × top-k-ish) rows, vocab-
   bounded). Two passes over the text by design: the assignment table
   and the token summaries have different shapes, and re-hashing a
   batch is cheaper than exchanging tokens keyed by cluster. The
   assignments Dataset is materialized so consuming it doesn't run the
   matmul a third time.

→ (assignments Dataset (key, cluster), summary DataFrame (cluster,
n_docs, top_tokens)).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray

from ..determinism import hash_strings

__all__ = ["hashed_tf_vectors", "cluster_documents"]


def _doc_vectors(texts: np.ndarray, n_features: int) -> np.ndarray:
    """(n_docs, B) L2-normalized hashed-TF matrix for one batch."""
    toks: list = []
    lens = np.empty(len(texts), dtype=np.int64)
    for i, t in enumerate(texts):
        ts = (t or "").lower().split()
        lens[i] = len(ts)
        toks.extend(ts)
    X = np.zeros((len(texts), n_features), dtype=np.float64)
    if toks:
        h = (hash_strings(np.asarray(toks, dtype=object))
             % np.uint64(n_features)).astype(np.int64)
        doc_ix = np.repeat(np.arange(len(texts)), lens)
        np.add.at(X, (doc_ix, h), 1.0)
    norms = np.linalg.norm(X, axis=1)
    X[norms > 0] /= norms[norms > 0, None]
    return X


def hashed_tf_vectors(ds, *, text_col: str = "text",
                      key_col: str = "doc_id",
                      n_features: int = 1024):
    """→ Dataset (key, vec): the hashed-TF document signatures (list of
    float64, unit length; all-empty docs are zero vectors)."""

    def fn(b: pa.Table) -> pa.Table:
        texts = b[text_col].to_numpy(zero_copy_only=False)
        X = _doc_vectors(texts, n_features)
        return pa.Table.from_pydict({
            "doc_id": pc.cast(b[key_col], pa.string()),
            "vec": pa.array(list(X), pa.list_(pa.float64()))})

    return ds.map_batches(fn, batch_format="pyarrow",
                          zero_copy_batch=True)


def cluster_documents(ds, *, text_col: str = "text",
                      key_col: str = "doc_id", n_clusters: int = 8,
                      n_features: int = 1024, seed: int = 42,
                      top_tokens: int = 8) -> Tuple[object, pd.DataFrame]:
    """→ (assignments Dataset (doc_id, cluster), summary DataFrame
    (cluster, n_docs, top_tokens) sorted by cluster)."""
    from .similarity import train_ivf_centroids

    # sort before the centroid fit: train_ivf_centroids samples via
    # limit(), which takes blocks in ARRIVAL order — unsorted, two runs
    # over the same parquet can hand k-means different init rows
    vecs = (hashed_tf_vectors(ds, text_col=text_col, key_col=key_col,
                              n_features=n_features)
            .sort("doc_id").materialize())
    cents = train_ivf_centroids(vecs, n_lists=n_clusters, vec_col="vec",
                                seed=seed)
    cref = ray.put(np.asarray(cents, dtype=np.float64))

    def assign(b: pa.Table) -> pa.Table:
        # maps over the MATERIALIZED (doc_id, vec) table: re-deriving
        # vectors from raw text here repeated the tokenize+hash pass —
        # the pipeline's most expensive CPU step — over the whole corpus
        c = ray.get(cref)
        from .similarity import _mat

        X = _mat(b["vec"])
        if not len(X):
            return pa.Table.from_pydict({
                "doc_id": pa.array([], pa.string()),
                "cluster": pa.array([], pa.int64())})
        lab = np.argmax(X @ c.T, axis=1).astype(np.int64)
        return pa.Table.from_pydict({
            "doc_id": b["doc_id"],
            "cluster": pa.array(lab)})

    assignments = vecs.map_batches(assign, batch_format="pyarrow",
                                   zero_copy_batch=True).materialize()

    def summarize(b: pa.Table) -> pa.Table:
        """Partial rows: token=None rows carry per-cluster doc counts,
        the rest carry block-local top token counts (over-drawn 4× so
        the driver's global top-k stays a candidate superset in the
        usual Zipf regime)."""
        c = ray.get(cref)
        texts = b[text_col].to_numpy(zero_copy_only=False)
        X = _doc_vectors(texts, n_features)
        lab = np.argmax(X @ c.T, axis=1)
        frames = []
        for j in np.unique(lab):
            sub = texts[lab == j]
            cnt = pd.Series(
                [w for t in sub for w in (t or "").lower().split()]
            ).value_counts().head(top_tokens * 4)
            frames.append(pd.DataFrame({
                "cluster": int(j), "token": cnt.index.astype(object),
                "n": cnt.to_numpy(dtype=np.int64)}))
            frames.append(pd.DataFrame({
                "cluster": [int(j)], "token": [None],
                "n": [int((lab == j).sum())]}))
        if not frames:
            return pa.Table.from_pydict({
                "cluster": pa.array([], pa.int64()),
                "token": pa.array([], pa.string()),
                "n": pa.array([], pa.int64())})
        return pa.Table.from_pandas(pd.concat(frames, ignore_index=True),
                                    preserve_index=False)

    parts = ds.map_batches(summarize, batch_format="pyarrow",
                           zero_copy_batch=True).to_pandas()
    if not len(parts):
        return assignments, pd.DataFrame(
            {"cluster": [], "n_docs": [], "top_tokens": []})
    sizes = (parts[parts["token"].isna()]
             .groupby("cluster")["n"].sum())
    tok = (parts[parts["token"].notna()]
           .groupby(["cluster", "token"], as_index=False)["n"].sum()
           .sort_values(["cluster", "n", "token"],
                        ascending=[True, False, True]))
    top = (tok.groupby("cluster").head(top_tokens)
           .groupby("cluster")["token"]
           .agg(lambda s: " ".join(s)).rename("top_tokens"))
    summary = (pd.DataFrame({"cluster": sizes.index,
                             "n_docs": sizes.to_numpy(dtype=np.int64)})
               .merge(top.reset_index(), on="cluster", how="left")
               .sort_values("cluster").reset_index(drop=True))
    return assignments, summary
