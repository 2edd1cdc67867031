"""TF-IDF keyword extraction — per-document top-k terms by tf·idf.

The classic corpus-statistics operator (Sparck Jones 1972): document
frequency over the whole corpus, term frequency within each document,
idf = log2(N / df). Used by training-data pipelines for topic tagging,
boilerplate spotting (terms with df ≈ N score ~0) and near-dup triage.

Ray-Data-first shape, mirroring ``lm_score``:

1. DF fit — one streamed pass: per block, DISTINCT (doc, token) pairs
   collapse to one (token, doc_count) partial row per distinct token
   (pyarrow hash-aggregates, no Python per token); the driver merges
   O(#blocks × #distinct-tokens-per-block) partials and truncates to the
   top ``vocab_size`` tokens by df. The same bounded-vocabulary contract
   as the unigram LM: OOV terms simply don't rank. (For 10^9-token
   vocabularies the CMS heavy-hitter path in ``vocab.py`` is the
   documented swap-in for this fit.)
2. score — one streamed pass: the (sorted tokens, idf) table broadcasts
   once via ``ray.put``; each batch tokenizes, counts tf per (doc,
   token) with one pandas hash-aggregate, joins idf by ``searchsorted``,
   and emits each doc's top-k terms by (tf·idf desc, token asc).

Determinism: ties in df and in per-doc scores break by token order, so
the result is block-layout-invariant (tested).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray

__all__ = ["fit_df", "tfidf_topk"]


def _doc_token_pairs(b: pa.Table, key_col: str, text_col: str) -> pd.DataFrame:
    """→ frame (doc, token, tf): per-doc term counts, vectorized."""
    toks = pc.split_pattern_regex(
        pc.utf8_lower(pc.fill_null(b[text_col], "")), r"\s+")
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
    flat = pc.list_flatten(toks)
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    keys = b[key_col].to_numpy(zero_copy_only=False)
    doc = np.repeat(keys, lens)
    pdf = pd.DataFrame({"doc": doc,
                        "token": flat.to_numpy(zero_copy_only=False)})
    pdf = pdf[pdf["token"] != ""]
    return pdf.groupby(["doc", "token"], as_index=False).size().rename(
        columns={"size": "tf"})


def fit_df(ds, *, key_col: str = "doc_id", text_col: str = "text",
           vocab_size: int = 50_000) -> Tuple[np.ndarray, np.ndarray, int]:
    """→ (sorted token array, df per token, n_docs). One (token,
    doc_count) partial per distinct token per block; driver merge is
    bounded by the vocabulary, never token instances."""

    def partial(b: pa.Table) -> pa.Table:
        pairs = _doc_token_pairs(b, key_col, text_col)
        g = pairs.groupby("token", as_index=False)["doc"].nunique()
        return pa.Table.from_pydict({
            "token": pa.array(g["token"].to_numpy(dtype=object),
                              pa.string()),
            "df": pa.array(g["doc"].to_numpy(), pa.int64()),
            "n_docs": pa.array(np.full(len(g), -1), pa.int64()),
        }).cast(pa.schema([("token", pa.string()), ("df", pa.int64()),
                           ("n_docs", pa.int64())]))

    n_docs = int(ds.count())
    pdf = ds.map_batches(partial, batch_format="pyarrow",
                         zero_copy_batch=True).to_pandas()
    if not len(pdf):
        return np.array([], dtype=object), np.array([], np.int64), n_docs
    g = (pdf.groupby("token", as_index=False)["df"].sum()
         .sort_values(["df", "token"], ascending=[False, True])
         .head(vocab_size))
    toks = g["token"].to_numpy(dtype=object)
    dfs = g["df"].to_numpy(dtype=np.int64)
    order = np.argsort(toks)
    return toks[order], dfs[order], n_docs


def tfidf_topk(ds, *, key_col: str = "doc_id", text_col: str = "text",
               k: int = 3, vocab_size: int = 50_000,
               round_digits: int = 4):
    """→ Dataset (doc_id, token, score, rank): each document's top-k
    terms by tf·idf (idf = log2(n_docs / df); ties by token asc).

    NOTE: a doc appearing in more than one block would double-fit df —
    callers pass key-unique inputs (the engine's standard dedup
    precondition, same as snapshot_diff)."""
    toks, dfs, n_docs = fit_df(ds, key_col=key_col, text_col=text_col,
                               vocab_size=vocab_size)
    idf = (np.log2(n_docs / dfs.astype(np.float64))
           if len(dfs) else np.array([], np.float64))
    ref = ray.put((toks, idf))

    def score(b: pa.Table) -> pa.Table:
        vocab, idf_v = ray.get(ref)
        pairs = _doc_token_pairs(b, key_col, text_col)
        empty = pa.Table.from_pydict({
            "doc_id": pa.array([], pa.string()),
            "token": pa.array([], pa.string()),
            "score": pa.array([], pa.float64()),
            "rank": pa.array([], pa.int32())})
        if not len(pairs) or not len(vocab):
            return empty
        pos = np.searchsorted(vocab, pairs["token"].to_numpy(dtype=object))
        pos_c = np.clip(pos, 0, len(vocab) - 1)
        known = vocab[pos_c] == pairs["token"].to_numpy(dtype=object)
        pairs = pairs[known].assign(
            score=np.round(pairs["tf"].to_numpy()[known]
                           * idf_v[pos_c[known]], round_digits))
        pairs = pairs[pairs["score"] > 0]
        if not len(pairs):
            return empty
        pairs = pairs.sort_values(["doc", "score", "token"],
                                  ascending=[True, False, True])
        top = pairs.groupby("doc", as_index=False).head(k).copy()
        top["rank"] = top.groupby("doc").cumcount().astype(np.int32) + 1
        return pa.Table.from_pydict({
            "doc_id": pa.array(top["doc"].astype(str), pa.string()),
            "token": pa.array(top["token"].to_numpy(dtype=object),
                              pa.string()),
            "score": pa.array(top["score"].to_numpy(), pa.float64()),
            "rank": pa.array(top["rank"].to_numpy(), pa.int32())})

    return ds.map_batches(score, batch_format="pyarrow",
                          zero_copy_batch=True)


def bm25_topk(ds, query: str, *, k: int = 10, k1: float = 1.2,
              b: float = 0.75, key_col: str = "doc_id",
              text_col: str = "text") -> pa.Table:
    """BM25 full-text retrieval (Robertson & Zaragoza 2009, the Lucene
    idf variant): top-k documents for a whitespace-tokenized query.

    Only the QUERY'S terms need corpus statistics, so the fit pass is
    O(#query-terms) per block — per-block partials carry (per-term
    containing-doc counts, Σ doc length, #docs) and the driver merges a
    handful of scalars. The score pass broadcasts the tiny (terms, idf)
    table and emits per-block partial top-k; the driver merges
    #blocks × k rows. → (doc_id, score) by (score desc, doc_id asc).
    """
    q_terms = sorted({t for t in query.lower().split() if t})
    empty = pa.Table.from_pydict({"doc_id": pa.array([], pa.string()),
                                  "score": pa.array([], pa.float64())})
    if not q_terms:
        return empty
    qt = np.array(q_terms, dtype=object)

    def stats(bt: pa.Table) -> pa.Table:
        pairs = _doc_token_pairs(bt, key_col, text_col)
        toks = pc.split_pattern_regex(
            pc.utf8_lower(pc.fill_null(bt[text_col], "")), r"\s+")
        flat = pc.list_flatten(toks)
        total_len = int(pc.sum(pc.cast(
            pc.not_equal(flat, ""), pa.int64())).as_py() or 0)
        hit = pairs[pairs["token"].isin(q_terms)]
        dfs = hit.groupby("token")["doc"].nunique()
        return pa.Table.from_pydict({
            "term": pa.array(q_terms, pa.string()),
            "df": pa.array(dfs.reindex(q_terms).fillna(0)
                           .to_numpy(dtype=np.int64)),
            "toks": pa.array([total_len] * len(q_terms), pa.int64()),
            "docs": pa.array([bt.num_rows] * len(q_terms), pa.int64())})

    sp = ds.map_batches(stats, batch_format="pyarrow",
                        zero_copy_batch=True).to_pandas()
    if not len(sp):
        return empty
    g = sp.groupby("term")["df"].sum()
    n_docs = int(sp.groupby("term")["docs"].sum().iloc[0])
    total_tokens = int(sp.groupby("term")["toks"].sum().iloc[0])
    if n_docs == 0:
        return empty
    avgdl = max(total_tokens / n_docs, 1e-9)
    dfv = g.reindex(q_terms).fillna(0).to_numpy(dtype=np.float64)
    idf = np.log((n_docs - dfv + 0.5) / (dfv + 0.5) + 1.0)
    ref = ray.put((qt, idf, avgdl))

    def score(bt: pa.Table) -> pa.Table:
        terms, idfv, adl = ray.get(ref)
        pairs = _doc_token_pairs(bt, key_col, text_col)
        keys = pc.cast(bt[key_col], pa.string()).to_numpy(
            zero_copy_only=False)
        raw = bt[key_col].to_numpy(zero_copy_only=False)
        dl = (pairs.groupby("doc")["tf"].sum()
              .reindex(raw).fillna(0).to_numpy(dtype=np.float64))
        hit = pairs[pairs["token"].isin(terms)]
        if not len(hit):
            return pa.Table.from_pydict(
                {"doc_id": pa.array([], pa.string()),
                 "score": pa.array([], pa.float64())})
        pos = np.searchsorted(terms, hit["token"].to_numpy(dtype=object))
        tf = hit["tf"].to_numpy(dtype=np.float64)
        # doc length per hit row (map through the ordered raw-key frame)
        dl_map = dict(zip(raw, dl))
        dls = np.array([dl_map[d] for d in hit["doc"]], dtype=np.float64)
        s = (idfv[pos] * tf * (k1 + 1)
             / (tf + k1 * (1 - b + b * dls / adl)))
        out = (pd.DataFrame({"doc": hit["doc"].to_numpy(), "s": s})
               .groupby("doc", as_index=False)["s"].sum())
        key_map = dict(zip(raw, keys))
        out["doc_id"] = out["doc"].map(key_map)
        out["score"] = np.round(out["s"], 4)
        out = (out.sort_values(["score", "doc_id"],
                               ascending=[False, True]).head(k))
        return pa.Table.from_pandas(out[["doc_id", "score"]],
                                    preserve_index=False)

    parts = ds.map_batches(score, batch_format="pyarrow",
                           zero_copy_batch=True).to_pandas()
    if not len(parts):
        return empty
    out = (parts.sort_values(["score", "doc_id"],
                             ascending=[False, True]).head(k)
           .reset_index(drop=True))
    return pa.Table.from_pandas(out, preserve_index=False)
