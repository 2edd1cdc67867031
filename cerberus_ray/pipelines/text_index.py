"""Persisted inverted index for BM25 full-text retrieval — the
build-once scale path of :func:`tfidf.bm25_topk`, mirroring what
``ann_index.py`` is to the brute-force ANN queries: pay the corpus
scan ONCE at build, then answer every query by reading only the
token-hash partitions its terms live in.

Layout under ``out_dir``:

- ``postings/bucket=<h(token) % n_buckets>/…`` — hive-partitioned
  parquet of (token, doc_id, tf, dl) postings. A term's postings live
  in EXACTLY ONE bucket, so a query's read set is ≤ #terms
  directories, pruned at the PATH level (no footer reads outside it).
- ``postings/bucket=-1/…`` — per-build-block corpus stats rows
  (n_docs, total_tokens), the avgdl numerator/denominator; reading
  them costs one tiny partition.
- ``manifest.json`` — build parameters; probe-side mismatches raise.

The build is ONE streamed pass (tokenize → per-doc tf + doc length →
bucket tag), the write is the only exchange (hive partition). Queries
run two small passes over the pruned buckets: df per term, then the
broadcast-idf scoring pass — per-posting contributions are summed in
(doc, token) order, the same order the scan-path scorer uses, so
results match it bit-for-bit (agreement-tested).

Reference semantics: identical tokenizer and Lucene-variant idf as
``tfidf.bm25_topk`` (Robertson & Zaragoza 2009).
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa

__all__ = ["build_text_index", "bm25_topk_indexed",
           "append_text_index"]

_MANIFEST = "manifest.json"

_POST_SCHEMA = pa.schema([("bucket", pa.int64()), ("token", pa.string()),
                          ("doc_id", pa.string()), ("tf", pa.int64()),
                          ("dl", pa.int64())])


def build_text_index(ds, out_dir: str, *, n_buckets: int = 32,
                     key_col: str = "doc_id",
                     text_col: str = "text") -> str:
    """One-pass build; returns ``out_dir``."""
    from ..determinism import hash_strings
    from ..sources.io import write_partitioned
    from .tfidf import _doc_token_pairs

    def post(b: pa.Table) -> pa.Table:
        pairs = _doc_token_pairs(b, key_col, text_col)
        n_tok = int(pairs["tf"].sum()) if len(pairs) else 0
        stats = pa.Table.from_pydict({
            "bucket": pa.array([-1], pa.int64()),
            "token": pa.array([None], pa.string()),
            "doc_id": pa.array([None], pa.string()),
            "tf": pa.array([b.num_rows], pa.int64()),
            "dl": pa.array([n_tok], pa.int64())}, schema=_POST_SCHEMA)
        if not len(pairs):
            return stats
        dl = pairs.groupby("doc")["tf"].sum()
        tok = pairs["token"].to_numpy(dtype=object)
        bucket = (hash_strings(tok)
                  % np.uint64(n_buckets)).astype(np.int64)
        posts = pa.Table.from_pydict({
            "bucket": pa.array(bucket),
            "token": pa.array(tok, pa.string()),
            "doc_id": pa.array(pairs["doc"].astype(str), pa.string()),
            "tf": pa.array(pairs["tf"].to_numpy(), pa.int64()),
            "dl": pa.array(dl.reindex(pairs["doc"]).to_numpy(),
                           pa.int64())}, schema=_POST_SCHEMA)
        return pa.concat_tables([posts, stats])

    rows = ds.map_batches(post, batch_format="pyarrow",
                          zero_copy_batch=True)
    os.makedirs(out_dir, exist_ok=True)
    write_partitioned(rows, os.path.join(out_dir, "postings"), "bucket")
    with open(os.path.join(out_dir, _MANIFEST), "w") as f:
        json.dump({"n_buckets": n_buckets, "key_col": key_col,
                   "text_col": text_col, "tokenizer": "ws_lower_v1"}, f)
    return out_dir


def append_text_index(ds, index_dir: str) -> str:
    """Incremental index maintenance: add new documents WITHOUT
    rebuilding — one streamed pass over the new docs writes additional
    parquet files into the same token-hash partition directories (a
    term's postings stay in exactly one directory; hive partition
    writes are file-additive), and a new stats file joins the stats
    partition, so df/avgdl/n_docs at query time reflect the union.
    Query results after an append are IDENTICAL to a from-scratch
    build over the union (agreement-tested). Caller contract: the new
    batch must not repeat doc_ids already indexed (postings are
    (doc, token)-unique by construction within a build; cross-build
    uniqueness is the ingest pipeline's dedup responsibility —
    `stages/stream_dedup` is the engine's gate for that)."""
    from ..determinism import hash_strings
    from ..sources.io import write_partitioned
    from .tfidf import _doc_token_pairs

    with open(os.path.join(index_dir, _MANIFEST)) as f:
        man = json.load(f)
    if man.get("tokenizer") != "ws_lower_v1":
        raise ValueError(f"incompatible index tokenizer: {man!r}")
    n_buckets = int(man["n_buckets"])
    key_col, text_col = man["key_col"], man["text_col"]

    def post(b: pa.Table) -> pa.Table:
        pairs = _doc_token_pairs(b, key_col, text_col)
        n_tok = int(pairs["tf"].sum()) if len(pairs) else 0
        stats = pa.Table.from_pydict({
            "bucket": pa.array([-1], pa.int64()),
            "token": pa.array([None], pa.string()),
            "doc_id": pa.array([None], pa.string()),
            "tf": pa.array([b.num_rows], pa.int64()),
            "dl": pa.array([n_tok], pa.int64())}, schema=_POST_SCHEMA)
        if not len(pairs):
            return stats
        dl = pairs.groupby("doc")["tf"].sum()
        tok = pairs["token"].to_numpy(dtype=object)
        bucket = (hash_strings(tok)
                  % np.uint64(n_buckets)).astype(np.int64)
        posts = pa.Table.from_pydict({
            "bucket": pa.array(bucket),
            "token": pa.array(tok, pa.string()),
            "doc_id": pa.array(pairs["doc"].astype(str), pa.string()),
            "tf": pa.array(pairs["tf"].to_numpy(), pa.int64()),
            "dl": pa.array(dl.reindex(pairs["doc"]).to_numpy(),
                           pa.int64())}, schema=_POST_SCHEMA)
        return pa.concat_tables([posts, stats])

    rows = ds.map_batches(post, batch_format="pyarrow",
                          zero_copy_batch=True)
    write_partitioned(rows, os.path.join(index_dir, "postings"),
                      "bucket")
    return index_dir


def bm25_topk_indexed(index_dir: str, query: str, *, k: int = 10,
                      k1: float = 1.2, b: float = 0.75) -> pa.Table:
    """Answer a BM25 top-k query from a persisted index. Reads the
    stats partition plus one partition per distinct query term —
    → (doc_id, score) by (score desc, doc_id asc), matching
    ``bm25_topk`` on the same corpus exactly."""
    from ray.data.datasource.partitioning import PathPartitionFilter

    from ..determinism import hash_strings
    from ..sources.io import read_table

    with open(os.path.join(index_dir, _MANIFEST)) as f:
        man = json.load(f)
    if man.get("tokenizer") != "ws_lower_v1":
        raise ValueError(f"incompatible index tokenizer: {man!r}")
    root = os.path.join(index_dir, "postings")
    empty = pa.Table.from_pydict({"doc_id": pa.array([], pa.string()),
                                  "score": pa.array([], pa.float64())})
    q_terms = sorted({t for t in query.lower().split() if t})
    if not q_terms:
        return empty
    qt = np.array(q_terms, dtype=object)
    need = {str(int(h)) for h in
            hash_strings(qt) % np.uint64(man["n_buckets"])}

    stats = read_table(root, partition_filter=PathPartitionFilter.of(
        lambda kv: kv["bucket"] == "-1", style="hive")).to_pandas()
    n_docs = int(stats["tf"].sum())
    total_tokens = int(stats["dl"].sum())
    if n_docs == 0:
        return empty
    avgdl = max(total_tokens / n_docs, 1e-9)

    posts = read_table(root, partition_filter=PathPartitionFilter.of(
        lambda kv, _n=need: kv["bucket"] in _n, style="hive"))

    def hits(t: pa.Table) -> pa.Table:
        pdf = t.select(["token", "doc_id", "tf", "dl"]).to_pandas()
        return pa.Table.from_pandas(pdf[pdf["token"].isin(q_terms)],
                                    preserve_index=False)

    hit = posts.map_batches(hits, batch_format="pyarrow",
                            zero_copy_batch=True).to_pandas()
    if not len(hit):
        return empty
    # postings are (doc, token)-unique by construction → df is a count
    dfv = (hit.groupby("token")["doc_id"].size()
           .reindex(q_terms).fillna(0).to_numpy(dtype=np.float64))
    idf = np.log((n_docs - dfv + 0.5) / (dfv + 0.5) + 1.0)
    # sum per-posting contributions in the scan scorer's (doc, token)
    # order for bit-identical float results
    hit = hit.sort_values(["doc_id", "token"], kind="mergesort")
    pos = np.searchsorted(qt, hit["token"].to_numpy(dtype=object))
    tf = hit["tf"].to_numpy(dtype=np.float64)
    dls = hit["dl"].to_numpy(dtype=np.float64)
    s = (idf[pos] * tf * (k1 + 1)
         / (tf + k1 * (1 - b + b * dls / avgdl)))
    out = (pd.DataFrame({"doc_id": hit["doc_id"].to_numpy(), "s": s})
           .groupby("doc_id", as_index=False)["s"].sum())
    out["score"] = np.round(out["s"], 4)
    out = (out.sort_values(["score", "doc_id"],
                           ascending=[False, True]).head(k)
           .reset_index(drop=True))
    return pa.Table.from_pandas(out[["doc_id", "score"]],
                                preserve_index=False)
