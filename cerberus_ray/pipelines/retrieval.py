"""Hybrid retrieval — reciprocal-rank fusion of lexical and vector search.

Reciprocal Rank Fusion (Cormack, Clarke & Buettcher, SIGIR 2009):
``rrf(d) = Σ_systems w_s / (k + rank_s(d))`` over each retrieval
system's ranked candidate list, with documents absent from a system
contributing nothing. RRF is the standard way training-data curation
stacks combine a BM25 pass with an embedding-ANN pass (hybrid search)
without score calibration — ranks are comparable even when raw scores
are not.

Ray-Data-first shape: the EXPENSIVE work is the per-system retrieval
(``tfidf.bm25_topk`` — streamed corpus-stat fit + per-block partial
top-k; ``similarity.brute_force_topk`` / the IVF index probe — per-block
matmul partial top-k). Each system hands the driver only its top-k
candidate list (#systems × k tiny rows by construction), so the fusion
itself is O(#systems × k) driver math — putting it anywhere else would
add an exchange to sort a few dozen rows.

Determinism: ranks come from each system's already-engine-independent
ordering (both producers round scores then tie-break on the key);
fused scores round to 6 digits and tie-break on the key, so the fused
list is block-layout-invariant.
"""

from __future__ import annotations

from typing import Dict, Mapping, Optional

import numpy as np
import pandas as pd
import pyarrow as pa

__all__ = ["rrf_fuse", "hybrid_search"]


def rrf_fuse(ranked: Mapping[str, pa.Table], *, key_col: str = "doc_id",
             k_rrf: int = 60, top_k: Optional[int] = None,
             weights: Optional[Dict[str, float]] = None) -> pa.Table:
    """Fuse per-system ranked candidate lists by reciprocal-rank fusion.

    ``ranked`` maps system name → a table whose ROW ORDER is that
    system's ranking (rank 1 = first row); only ``key_col`` is read.
    → (doc_id, rrf_score, n_systems, rank_<system>...) sorted by
    (rrf_score desc, doc_id asc). Absent documents get a null rank for
    that system. ``weights`` scales each system's 1/(k+rank) term
    (default 1.0).
    """
    if k_rrf < 1:
        raise ValueError(f"k_rrf must be >= 1, got {k_rrf}")
    names = sorted(ranked)
    w = {s: 1.0 for s in names}
    if weights:
        unknown = set(weights) - set(names)
        if unknown:
            raise ValueError(f"weights for unknown systems: {sorted(unknown)}")
        w.update(weights)

    frames = []
    for s in names:
        t = ranked[s]
        keys = [str(x) for x in t[key_col].to_pylist()]
        if len(set(keys)) != len(keys):
            raise ValueError(f"system {s!r} ranked the same key twice")
        frames.append(pd.DataFrame({
            "doc_id": keys, "system": s,
            "rank": np.arange(1, len(keys) + 1, dtype=np.int64),
            "contrib": w[s] / (k_rrf + np.arange(1, len(keys) + 1,
                                                 dtype=np.float64))}))
    if not frames or all(not len(f) for f in frames):
        cols = {"doc_id": pa.array([], pa.string()),
                "rrf_score": pa.array([], pa.float64()),
                "n_systems": pa.array([], pa.int64())}
        for s in names:
            cols[f"rank_{s}"] = pa.array([], pa.int64())
        return pa.Table.from_pydict(cols)
    long = pd.concat(frames, ignore_index=True)
    agg = long.groupby("doc_id").agg(
        rrf_score=("contrib", "sum"), n_systems=("system", "size"))
    agg["rrf_score"] = agg["rrf_score"].round(6)
    ranks = long.pivot(index="doc_id", columns="system", values="rank")
    out = agg.join(ranks).reset_index()
    out = out.sort_values(["rrf_score", "doc_id"],
                          ascending=[False, True]).reset_index(drop=True)
    if top_k is not None:
        out = out.head(top_k)
    cols = {"doc_id": pa.array(out["doc_id"], pa.string()),
            "rrf_score": pa.array(out["rrf_score"], pa.float64()),
            "n_systems": pa.array(out["n_systems"], pa.int64())}
    for s in names:
        col = (out[s] if s in out.columns
               else pd.Series([np.nan] * len(out)))
        cols[f"rank_{s}"] = pa.array(
            [None if pd.isna(v) else int(v) for v in col], pa.int64())
    return pa.Table.from_pydict(cols)


def hybrid_search(docs_ds, emb_ds, query_text: str,
                  query_vec: np.ndarray, *, k: int = 10,
                  candidates: int = 50, k_rrf: int = 60,
                  weights: Optional[Dict[str, float]] = None,
                  key_col: str = "doc_id", text_col: str = "text",
                  id_col: str = "vec_id",
                  vec_col: str = "embedding") -> pa.Table:
    """BM25 + embedding-cosine hybrid search over a shared id space.

    Runs the two streamed retrieval passes independently (each emits a
    ``candidates``-deep list), fuses with :func:`rrf_fuse`, returns the
    top ``k`` fused rows. ``docs_ds[key_col]`` and ``emb_ds[id_col]``
    must address the same documents.
    """
    from .similarity import brute_force_topk
    from .tfidf import bm25_topk

    lex = bm25_topk(docs_ds, query_text, k=candidates,
                    key_col=key_col, text_col=text_col)
    ann = brute_force_topk(emb_ds, np.atleast_2d(query_vec),
                           k=candidates, id_col=id_col, vec_col=vec_col)
    ann_ids = pa.Table.from_pydict({
        "doc_id": pa.array([str(x) for x in ann["vec_id"].to_pylist()],
                           pa.string())})
    return rrf_fuse({"bm25": lex, "ann": ann_ids}, key_col="doc_id",
                    k_rrf=k_rrf, top_k=k, weights=weights)
