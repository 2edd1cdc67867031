"""Reciprocal-rank fusion + hybrid search: closed-form RRF math, DuckDB
window-function parity, weight semantics, and an sf0.001 end-to-end
determinism pin for the BM25 + ANN hybrid."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data as rd

from cerberus_ray.pipelines.retrieval import hybrid_search, rrf_fuse

SF = "/root/testdata/sf0.001"


def t(ids):
    return pa.Table.from_pydict({"doc_id": pa.array(ids, pa.string())})


def test_rrf_hand_reference():
    fused = rrf_fuse({"a": t(["d1", "d2", "d3"]), "b": t(["d2", "d3", "d4"])},
                     k_rrf=60)
    got = {r["doc_id"]: r["rrf_score"] for r in fused.to_pylist()}
    exp = {"d1": 1 / 61, "d2": 1 / 61 + 1 / 62, "d3": 1 / 62 + 1 / 63,
           "d4": 1 / 63}
    assert got == {k: round(v, 6) for k, v in exp.items()}
    # both-system docs outrank single-system docs at these depths
    order = fused["doc_id"].to_pylist()
    assert order[:2] == ["d2", "d3"]
    ranks = fused.to_pylist()
    byid = {r["doc_id"]: r for r in ranks}
    assert byid["d1"]["rank_a"] == 1 and byid["d1"]["rank_b"] is None
    assert byid["d3"]["n_systems"] == 2


def test_rrf_duckdb_parity():
    rng = np.random.default_rng(7)
    universe = [f"doc{i}" for i in range(40)]
    lists = {s: [universe[i] for i in rng.permutation(40)[:25]]
             for s in ("lex", "vec", "aux")}
    fused = rrf_fuse({s: t(v) for s, v in lists.items()}, k_rrf=10)
    con = duckdb.connect()
    long = pd.concat([pd.DataFrame({"doc_id": v, "system": s,
                                    "rank": np.arange(1, len(v) + 1)})
                      for s, v in lists.items()], ignore_index=True)
    con.register("ranked", long)
    want = con.execute("""
        SELECT doc_id, ROUND(SUM(1.0/(10+rank)), 6) AS rrf_score,
               COUNT(*) AS n_systems
        FROM ranked GROUP BY doc_id
        ORDER BY rrf_score DESC, doc_id ASC""").fetch_df()
    got = fused.to_pandas()[["doc_id", "rrf_score", "n_systems"]]
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_rrf_weights_and_guards():
    fused = rrf_fuse({"a": t(["x"]), "b": t(["y"])},
                     k_rrf=60, weights={"a": 2.0})
    byid = {r["doc_id"]: r["rrf_score"] for r in fused.to_pylist()}
    assert byid["x"] == round(2.0 / 61, 6)
    assert byid["y"] == round(1.0 / 61, 6)
    with pytest.raises(ValueError, match="unknown systems"):
        rrf_fuse({"a": t(["x"])}, weights={"nope": 1.0})
    with pytest.raises(ValueError, match="twice"):
        rrf_fuse({"a": t(["x", "x"])})
    with pytest.raises(ValueError, match="k_rrf"):
        rrf_fuse({"a": t(["x"])}, k_rrf=0)


def test_rrf_empty_and_topk():
    out = rrf_fuse({"a": t([]), "b": t([])})
    assert out.num_rows == 0
    assert set(out.column_names) == {"doc_id", "rrf_score", "n_systems",
                                     "rank_a", "rank_b"}
    fused = rrf_fuse({"a": t(["d1", "d2", "d3"])}, top_k=2)
    assert fused.num_rows == 2


def test_hybrid_search_sf0001_deterministic():
    docs = rd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "text"])
    emb = rd.read_parquet(f"{SF}/embeddings.parquet",
                          columns=["vec_id", "embedding"])
    qvec = np.asarray(pq.read_table(
        f"{SF}/embeddings.parquet", columns=["embedding"],
        filters=[("vec_id", "=", 0)])["embedding"].to_pylist()[0])
    runs = []
    for _ in range(2):
        docs2 = rd.read_parquet(f"{SF}/documents.parquet",
                                columns=["doc_id", "text"])
        runs.append(hybrid_search(docs2, emb, "hash join table scan",
                                  qvec, k=100).to_pandas())
    pd.testing.assert_frame_equal(runs[0], runs[1])
    r = runs[0]
    assert 50 <= len(r) <= 100  # two 50-deep lists, overlap allowed
    assert r["rrf_score"].is_monotonic_decreasing
    # the probe vector's own id must be the ANN rank-1 hit
    byid = dict(zip(r["doc_id"], r["rank_ann"]))
    assert byid.get("0") == 1
    assert docs is not None
