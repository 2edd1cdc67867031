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
import pyarrow.compute as pc
import ray

__all__ = ["rrf_fuse", "hybrid_search", "mmr_rerank"]


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


def mmr_rerank(emb_ds, query_vec: np.ndarray, *, k: int = 10,
               candidates: int = 50, lam: float = 0.7,
               id_col: str = "vec_id", vec_col: str = "embedding",
               exclude_ids: Optional[np.ndarray] = None,
               round_digits: int = 6) -> pa.Table:
    """Maximal Marginal Relevance re-ranking (Carbonell & Goldstein,
    SIGIR 1998): greedily pick documents maximizing
    ``lam·sim(q,d) − (1−lam)·max_{s∈selected} sim(d,s)`` — relevance
    traded against redundancy, the standard diversity re-rank after a
    similarity retrieval pass (near-duplicate hits crowd out coverage).

    Shape: the streamed pass is :func:`similarity.brute_force_topk`
    (per-block matmul partial top-k); a candidate-only semi-join
    (broadcast id set, ``pc.is_in`` filter) fetches the ≤``candidates``
    surviving vectors, and the O(c²) greedy runs on the driver — tiny by
    construction, an exchange would cost more than it moves.

    → (rank, vec_id, relevance, redundancy, mmr_score) with rank 1..k.
    Determinism: relevance reuses brute-force's rounded sims; pairwise
    sims and mmr scores round to ``round_digits``; every argmax breaks
    ties on the smaller id, so output is block-layout-invariant.
    """
    from .similarity import _mat, _unit, brute_force_topk

    if not 0.0 <= lam <= 1.0:
        raise ValueError(f"lam must be in [0, 1], got {lam}")
    cand = brute_force_topk(emb_ds, np.atleast_2d(query_vec),
                            k=candidates, id_col=id_col, vec_col=vec_col,
                            exclude_ids=exclude_ids)
    empty = pa.Table.from_pydict({
        "rank": pa.array([], pa.int64()),
        "vec_id": pa.array([], pa.int64()),
        "relevance": pa.array([], pa.float64()),
        "redundancy": pa.array([], pa.float64()),
        "mmr_score": pa.array([], pa.float64())})
    if cand.num_rows == 0:
        return empty
    cand_ids = np.asarray(cand["vec_id"].to_pylist(), dtype=np.int64)
    rel_by_id = dict(zip(cand_ids.tolist(), cand["sim"].to_pylist()))
    idset = ray.put(pa.array(np.sort(cand_ids)))

    def keep(b: pa.Table) -> pa.Table:
        mask = pc.is_in(b[id_col], value_set=ray.get(idset))
        return b.filter(mask).select([id_col, vec_col])

    parts = [t for t in ray.get(
        emb_ds.map_batches(keep, batch_format="pyarrow",
                           zero_copy_batch=True).to_arrow_refs())
        if t.num_rows]
    if not parts:
        return empty
    fetched = pa.concat_tables(parts)
    ids = np.asarray(fetched[id_col].to_pylist(), dtype=np.int64)
    # the id space may hold duplicates of a candidate id; keep first
    order = np.argsort(ids, kind="stable")
    ids, uniq_pos = ids[order], np.unique(ids[order], return_index=True)[1]
    vecs = _unit(_mat(fetched[vec_col]))[order][uniq_pos]
    ids = ids[uniq_pos]
    pair = np.round(vecs @ vecs.T, round_digits)  # (c, c) pairwise cosine
    rel = np.asarray([rel_by_id[int(i)] for i in ids], dtype=np.float64)

    n = len(ids)
    selected: list[int] = []
    chosen = np.zeros(n, dtype=bool)
    red_out, score_out = [], []
    for _ in range(min(k, n)):
        red = (np.max(pair[:, selected], axis=1)
               if selected else np.zeros(n))
        score = np.round(lam * rel - (1.0 - lam) * red, round_digits)
        score[chosen] = -np.inf
        best = np.min(np.flatnonzero(score == np.max(score)))  # ties → row
        # rows are sorted by id, so min row index = smallest id
        selected.append(best)
        chosen[best] = True
        red_out.append(0.0 if len(selected) == 1
                       else float(np.round(red[best], round_digits)))
        score_out.append(float(score[best]))
    sel = np.asarray(selected)
    return pa.Table.from_pydict({
        "rank": pa.array(np.arange(1, len(sel) + 1), pa.int64()),
        "vec_id": pa.array(ids[sel], pa.int64()),
        "relevance": pa.array(rel[sel], pa.float64()),
        "redundancy": pa.array(red_out, pa.float64()),
        "mmr_score": pa.array(score_out, pa.float64())})
