"""TF-IDF keyword extraction: hand-computed reference parity, boilerplate
suppression (df = N scores 0 and drops out), partition invariance, and an
sf0.001 determinism pin."""

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from cerberus_ray.pipelines.tfidf import fit_df, tfidf_topk

SF = "/root/testdata/sf0.001"

DOCS = pd.DataFrame({
    "doc_id": ["d1", "d2", "d3", "d4"],
    "text": [
        "apple banana apple common",
        "banana cherry common",
        "cherry cherry durian common",
        "apple durian common",
    ]})


def reference_topk(pdf: pd.DataFrame, k: int) -> dict:
    n = len(pdf)
    df = {}
    for _, r in pdf.iterrows():
        for t in set(r["text"].split()):
            df[t] = df.get(t, 0) + 1
    out = {}
    for _, r in pdf.iterrows():
        tf = {}
        for t in r["text"].split():
            tf[t] = tf.get(t, 0) + 1
        scored = [(t, round(c * math.log2(n / df[t]), 4))
                  for t, c in tf.items()]
        scored = [(t, s) for t, s in scored if s > 0]
        scored.sort(key=lambda x: (-x[1], x[0]))
        out[r["doc_id"]] = scored[:k]
    return out


def test_matches_reference(ray_session):
    ds = rd.from_pandas(DOCS, override_num_blocks=2).materialize()
    got = tfidf_topk(ds, k=2).to_pandas()
    want = reference_topk(DOCS, 2)
    for doc, terms in want.items():
        sub = got[got["doc_id"] == doc].sort_values("rank")
        assert list(zip(sub["token"], sub["score"])) == terms
    # 'common' appears in every doc → idf 0 → never ranked
    assert "common" not in set(got["token"])


def test_df_fit_and_partition_invariance(ray_session):
    ds1 = rd.from_pandas(DOCS, override_num_blocks=1).materialize()
    ds4 = rd.from_pandas(DOCS.sample(frac=1, random_state=3),
                         override_num_blocks=4).materialize()
    t1, d1, n1 = fit_df(ds1)
    t4, d4, n4 = fit_df(ds4)
    assert n1 == n4 == 4
    assert list(t1) == list(t4)
    assert list(d1) == list(d4)
    assert dict(zip(t1, d1))["common"] == 4
    a = tfidf_topk(ds1, k=2).to_pandas().sort_values(
        ["doc_id", "rank"]).reset_index(drop=True)
    b = tfidf_topk(ds4, k=2).to_pandas().sort_values(
        ["doc_id", "rank"]).reset_index(drop=True)
    assert a.equals(b)


def test_sf0001_pin(ray_session):
    from cerberus_ray.sources.io import read_table

    ds = read_table(f"{SF}/documents.parquet",
                    columns=["doc_id", "text"]).materialize()
    out = tfidf_topk(ds, k=1).to_pandas()
    # every ranked doc has exactly one rank-1 row
    assert (out["rank"] == 1).all()
    assert out["doc_id"].is_unique
    # deterministic across runs
    out2 = tfidf_topk(ds, k=1).to_pandas()
    assert out.sort_values("doc_id").reset_index(drop=True).equals(
        out2.sort_values("doc_id").reset_index(drop=True))


# ---- BM25 retrieval ---------------------------------------------------------


def _bm25_reference(df, query, k1=1.2, b=0.75):
    import math
    terms = sorted({t for t in query.lower().split() if t})
    docs = {r.doc_id: (r.text or "").lower().split()
            for r in df.itertuples()}
    n = len(docs)
    avgdl = sum(len(t) for t in docs.values()) / max(n, 1)
    dfc = {t: sum(1 for toks in docs.values() if t in toks) for t in terms}
    idf = {t: math.log((n - dfc[t] + 0.5) / (dfc[t] + 0.5) + 1)
           for t in terms}
    scores = {}
    for did, toks in docs.items():
        s = 0.0
        for t in terms:
            tf = toks.count(t)
            if tf:
                s += idf[t] * tf * (k1 + 1) / (
                    tf + k1 * (1 - b + b * len(toks) / avgdl))
        if s > 0:
            scores[did] = round(s, 4)
    return scores


def _bm25_corpus():
    rows = [
        {"doc_id": "d1", "text": "hash join over the orders table"},
        {"doc_id": "d2", "text": "hash hash hash everywhere hash"},
        {"doc_id": "d3", "text": "sort merge join strategy"},
        {"doc_id": "d4", "text": "completely unrelated text about dogs"},
        {"doc_id": "d5", "text": "table scan then hash join table scan"},
        {"doc_id": "d6", "text": ""},
    ]
    # filler docs so idf is meaningful
    for i in range(40):
        rows.append({"doc_id": f"f{i:02d}",
                     "text": f"filler words number {i} nothing relevant"})
    return pd.DataFrame(rows)


def test_bm25_matches_reference(ray_session):
    from cerberus_ray.pipelines.tfidf import bm25_topk

    df = _bm25_corpus()
    q = "hash join table"
    out = bm25_topk(rd.from_pandas(df, override_num_blocks=4), q,
                    k=10).to_pandas()
    ref = _bm25_reference(df, q)
    got = dict(zip(out["doc_id"], out["score"]))
    want = dict(sorted(ref.items(), key=lambda kv: (-kv[1], kv[0]))[:10])
    assert set(got) == set(want)
    for d in got:
        assert got[d] == pytest.approx(want[d], abs=2e-4), d
    # the multi-term match outranks the unrelated and empty docs
    assert out["doc_id"].iloc[0] in ("d1", "d5")
    assert "d4" not in set(out["doc_id"]) or got.get("d4", 0) == 0


def test_bm25_partition_invariance_and_edges(ray_session):
    from cerberus_ray.pipelines.tfidf import bm25_topk

    df = _bm25_corpus()
    a = bm25_topk(rd.from_pandas(df, override_num_blocks=2),
                  "hash join", k=5).to_pandas()
    b = bm25_topk(rd.from_pandas(df, override_num_blocks=9),
                  "hash join", k=5).to_pandas()
    pd.testing.assert_frame_equal(a, b)
    assert bm25_topk(rd.from_pandas(df), "", k=5).num_rows == 0
    assert bm25_topk(rd.from_pandas(df), "zzz_absent", k=5).num_rows == 0
