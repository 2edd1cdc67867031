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


# ---------------------------------------------------------------- MMR

def _emb_ds(vecs, ids=None):
    ids = list(range(len(vecs))) if ids is None else ids
    return rd.from_pandas(pd.DataFrame({
        "vec_id": np.asarray(ids, dtype=np.int64),
        "embedding": [list(map(float, v)) for v in vecs]}))


def _mmr_reference(vecs, ids, qv, k, lam, rel_digits=4, digits=6):
    """O(c²) naive MMR over ALL rows (candidates=len) for parity."""
    v = np.asarray(vecs, float)
    v = v / np.linalg.norm(v, axis=1, keepdims=True)
    q = np.asarray(qv, float); q = q / np.linalg.norm(q)
    rel = np.round(v @ q, rel_digits)
    pair = np.round(v @ v.T, digits)
    order = np.argsort(ids)
    v, rel, pair, ids = (v[order], rel[order],
                         pair[np.ix_(order, order)], np.asarray(ids)[order])
    sel, chosen = [], np.zeros(len(ids), bool)
    for _ in range(min(k, len(ids))):
        red = np.max(pair[:, sel], axis=1) if sel else np.zeros(len(ids))
        sc = np.round(lam * rel - (1 - lam) * red, digits)
        sc[chosen] = -np.inf
        best = int(np.min(np.flatnonzero(sc == sc.max())))
        sel.append(best); chosen[best] = True
    return [int(ids[i]) for i in sel]


def test_mmr_hand_case(ray_session):
    from cerberus_ray.pipelines.retrieval import mmr_rerank
    # d0 most relevant, d1 a near-duplicate of d0, d2 less relevant but
    # diverse; the query must NOT be parallel to d0 or relevance and
    # redundancy stay proportional and no lam can reorder anything
    vecs = [[1.0, 0.1], [1.0, 0.12], [1.0, -0.5]]
    out = mmr_rerank(_emb_ds(vecs), np.array([1.0, 0.0]),
                     k=3, candidates=3, lam=0.5).to_pylist()
    # pure relevance would give 0,1,2; MMR demotes the near-dup d1
    assert [r["vec_id"] for r in out] == [0, 2, 1]
    assert out[0]["rank"] == 1 and out[0]["redundancy"] == 0.0
    assert out[1]["redundancy"] < out[2]["redundancy"]


def test_mmr_lam1_equals_brute_force(ray_session):
    from cerberus_ray.pipelines.retrieval import mmr_rerank
    from cerberus_ray.pipelines.similarity import brute_force_topk
    rng = np.random.default_rng(11)
    vecs = rng.normal(size=(60, 8))
    ds = _emb_ds(vecs)
    qv = rng.normal(size=8)
    got = mmr_rerank(ds, qv, k=10, candidates=25, lam=1.0)
    bf = brute_force_topk(ds, np.atleast_2d(qv), k=10)
    assert got["vec_id"].to_pylist() == bf["vec_id"].to_pylist()
    assert got["relevance"].to_pylist() == bf["sim"].to_pylist()


def test_mmr_reference_parity(ray_session):
    from cerberus_ray.pipelines.retrieval import mmr_rerank
    rng = np.random.default_rng(23)
    n = 40
    vecs = rng.normal(size=(n, 6))
    ids = rng.permutation(n * 3)[:n]  # sparse, shuffled id space
    for lam in (0.0, 0.3, 0.7):
        got = mmr_rerank(_emb_ds(vecs, ids), rng.normal(size=6) * 0 +
                         vecs[0], k=8, candidates=n, lam=lam)
        exp = _mmr_reference(vecs, ids, vecs[0], 8, lam)
        assert got["vec_id"].to_pylist() == exp, f"lam={lam}"


def test_mmr_sf0001_determinism(ray_session):
    from cerberus_ray.pipelines.retrieval import mmr_rerank
    from cerberus_ray.sources.io import read_table
    qv = np.asarray(pq.read_table(
        f"{SF}/embeddings.parquet", columns=["embedding"],
        filters=[("vec_id", "=", 0)])["embedding"].to_pylist()[0])
    def run():
        ds = read_table(f"{SF}/embeddings.parquet",
                        columns=["vec_id", "embedding"])
        return mmr_rerank(ds, qv, k=10, candidates=40, lam=0.7)
    a, b = run(), run()
    assert a.equals(b)
    assert a.num_rows == 10 and len(set(a["vec_id"].to_pylist())) == 10
    # rank 1 is the query vector itself (self-similarity 1.0)
    assert a["vec_id"][0].as_py() == 0
    # scores are monotone non-increasing in rank
    sc = a["mmr_score"].to_pylist()
    assert all(x >= y for x, y in zip(sc, sc[1:]))


def test_mmr_validates_lam(ray_session):
    from cerberus_ray.pipelines.retrieval import mmr_rerank
    with pytest.raises(ValueError):
        mmr_rerank(_emb_ds([[1.0, 0.0]]), np.array([1.0, 0.0]), lam=1.5)
