"""Inverted-index BM25: exact agreement with the scan-path scorer,
path-level partition pruning, df correctness vs DuckDB, guards."""

import os

import duckdb
import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from cerberus_ray.pipelines.text_index import (bm25_topk_indexed,
                                               build_text_index)
from cerberus_ray.pipelines.tfidf import bm25_topk
from cerberus_ray.sources.io import read_table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def doc_index(ray_session, tmp_path_factory):
    docs = read_table(f"{SF}/documents.parquet",
                      columns=["doc_id", "text"])
    d = str(tmp_path_factory.mktemp("tix"))
    build_text_index(docs, d, n_buckets=16)
    return docs, d


def test_scan_agreement(doc_index):
    docs, d = doc_index
    for q in ["data quality pipeline", "the", "zzz_nonexistent_token",
              "model training data data"]:
        got = bm25_topk_indexed(d, q, k=10).to_pandas()
        ref = bm25_topk(docs, q, k=10).to_pandas()
        assert list(got["doc_id"]) == list(ref["doc_id"]), q
        np.testing.assert_array_equal(got["score"], ref["score"]), q


def test_df_duckdb_parity(doc_index):
    # postings are (doc, token)-unique → per-term df from the index
    # equals DuckDB's distinct-doc count on the raw text
    _, d = doc_index
    posts = read_table(os.path.join(d, "postings")).to_pandas()
    posts = posts[posts["token"].notna()]
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{SF}/documents.parquet')")
    for term in ["data", "the"]:
        want = con.execute(
            "SELECT COUNT(*) FROM documents WHERE "
            "list_contains(string_split_regex(lower(coalesce(text, "
            "'')), '\\s+'), ?)", [term]).fetchone()[0]
        assert (posts["token"] == term).sum() == want, term
    con.close()


def test_partition_pruning(doc_index):
    # a single-term query's bucket set is one directory (+ stats)
    _, d = doc_index
    from cerberus_ray.determinism import hash_strings

    buckets = sorted(p for p in os.listdir(os.path.join(d, "postings"))
                     if p.startswith("bucket="))
    assert "bucket=-1" in buckets and len(buckets) > 2
    h = int(hash_strings(np.array(["data"], dtype=object))[0] % 16)
    assert f"bucket={h}" in buckets


def test_empty_query_and_guard(doc_index, tmp_path):
    _, d = doc_index
    assert bm25_topk_indexed(d, "   ").num_rows == 0
    import json
    bad = tmp_path / "bad"
    bad.mkdir()
    (bad / "manifest.json").write_text(json.dumps({"tokenizer": "v0"}))
    with pytest.raises(ValueError):
        bm25_topk_indexed(str(bad), "data")


def test_index_on_synthetic(ray_session, tmp_path):
    df = pd.DataFrame({
        "doc_id": ["a", "b", "c"],
        "text": ["cat dog", "cat cat cat", "bird"]})
    ds = rd.from_pandas(df, override_num_blocks=2)
    d = str(tmp_path / "ix")
    build_text_index(ds, d, n_buckets=4)
    got = bm25_topk_indexed(d, "cat", k=3).to_pandas()
    ref = bm25_topk(ds, "cat", k=3).to_pandas()
    pd.testing.assert_frame_equal(got, ref)
    assert set(got["doc_id"]) == {"a", "b"}


def test_incremental_append_equals_full_build(ray_session, tmp_path):
    from cerberus_ray.pipelines.text_index import append_text_index

    docs = read_table(f"{SF}/documents.parquet",
                      columns=["doc_id", "text"]).to_pandas()
    half1 = rd.from_pandas(docs.iloc[:len(docs) // 2],
                           override_num_blocks=2)
    half2 = rd.from_pandas(docs.iloc[len(docs) // 2:],
                           override_num_blocks=2)
    full = rd.from_pandas(docs, override_num_blocks=3)

    d_inc = str(tmp_path / "inc")
    build_text_index(half1, d_inc, n_buckets=8)
    append_text_index(half2, d_inc)
    d_full = str(tmp_path / "full")
    build_text_index(full, d_full, n_buckets=8)

    for q in ["data quality", "the model", "zzz_missing"]:
        a = bm25_topk_indexed(d_inc, q, k=10).to_pandas()
        b = bm25_topk_indexed(d_full, q, k=10).to_pandas()
        pd.testing.assert_frame_equal(a, b), q
    # and both agree with the scan path over the union
    ref = bm25_topk(full, "data quality", k=10).to_pandas()
    got = bm25_topk_indexed(d_inc, "data quality", k=10).to_pandas()
    pd.testing.assert_frame_equal(got, ref)


def test_append_guard(ray_session, tmp_path):
    import json

    from cerberus_ray.pipelines.text_index import append_text_index

    bad = tmp_path / "bad2"
    bad.mkdir()
    (bad / "manifest.json").write_text(json.dumps({"tokenizer": "v0"}))
    with pytest.raises(ValueError):
        append_text_index(rd.from_pandas(
            pd.DataFrame({"doc_id": ["a"], "text": ["x"]})), str(bad))
