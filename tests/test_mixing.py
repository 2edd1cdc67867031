"""Data mixing + chunking: deterministic weighted sampling proportions
and exact chunk reconstruction."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from cerberus_ray.pipelines.mixing import chunk_documents, sample_by_source


def corpus(n=3000):
    rng = np.random.default_rng(5)
    srcs = rng.choice(["web", "books", "code"], size=n, p=[0.6, 0.3, 0.1])
    return pd.DataFrame({
        "doc_id": [f"d{i:05d}" for i in range(n)],
        "source": srcs,
        "text": [f"document number {i} body" for i in range(n)]})


def test_sampling_proportions_and_determinism(ray_session):
    df = corpus()
    w = {"web": 0.25, "books": 1.0, "code": 0.0}
    a = sample_by_source(rd.from_pandas(df), w).to_pandas()
    b = sample_by_source(rd.from_pandas(df), w).to_pandas()
    assert sorted(a["doc_id"]) == sorted(b["doc_id"])  # pure in (seed, key)
    by_src = a.groupby("source").size()
    n_web = (df["source"] == "web").sum()
    assert "code" not in by_src.index               # weight 0 drops all
    assert by_src.get("books", 0) == (df["source"] == "books").sum()
    assert abs(by_src.get("web", 0) / n_web - 0.25) < 0.05
    # a different seed selects a different subset
    c = sample_by_source(rd.from_pandas(df), w, seed=7).to_pandas()
    assert sorted(c["doc_id"]) != sorted(a["doc_id"])
    with pytest.raises(ValueError):
        sample_by_source(rd.from_pandas(df), {"web": 1.5})


def test_chunking_reconstructs_tokens(ray_session):
    rng = np.random.default_rng(9)
    rows = []
    for i in range(40):
        n_tok = int(rng.integers(0, 300))
        rows.append({"doc_id": f"c{i:03d}",
                     "text": " ".join(f"t{j}" for j in range(n_tok))})
    df = pd.DataFrame(rows)
    out = (chunk_documents(rd.from_pandas(df), max_tokens=64, overlap=8)
           .to_pandas().sort_values(["doc_id", "chunk_idx"]))
    step = 64 - 8
    for doc_id, g in out.groupby("doc_id"):
        orig = df.loc[df["doc_id"] == doc_id, "text"].iloc[0].split()
        rebuilt = []
        for ci, text in zip(g["chunk_idx"], g["text"]):
            toks = text.split()
            rebuilt.extend(toks if ci == 0 else toks[8:])
        assert rebuilt == orig, doc_id
        assert (g["n_tokens"] <= 64).all()
        # every chunk but the last starts at i*step
        assert list(g["chunk_idx"]) == list(range(len(g)))
    # empty docs emit nothing
    chunked_ids = set(out["doc_id"])
    empty_ids = {r["doc_id"] for _, r in df.iterrows()
                 if not r["text"].split()}
    assert chunked_ids.isdisjoint(empty_ids)
    assert chunked_ids | empty_ids == set(df["doc_id"])
    with pytest.raises(ValueError):
        chunk_documents(rd.from_pandas(df), max_tokens=8, overlap=8)
