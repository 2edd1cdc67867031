"""Similarity search on synthetic clustered embeddings: brute force is the
exact baseline; LSH variants are measured for recall against it."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from cerberus_ray.pipelines import similarity as SIM


def clustered_embeddings(n_clusters=10, per_cluster=50, dim=32, noise=0.15):
    rng = np.random.default_rng(42)
    centers = rng.normal(size=(n_clusters, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    rows = []
    vid = 0
    for c in range(n_clusters):
        for _ in range(per_cluster):
            v = centers[c] + rng.normal(scale=noise, size=dim)
            rows.append({"vec_id": vid, "embedding": v.astype(np.float32).tolist(),
                         "label": c})
            vid += 1
    return pd.DataFrame(rows), centers


@pytest.fixture(scope="module")
def data(ray_session):
    df, centers = clustered_embeddings()
    return rd.from_pandas(df), df, centers


def test_brute_force_topk_exact(data):
    ds, df, centers = data
    out = SIM.brute_force_topk(ds, centers[0], k=10).to_pandas()
    assert len(out) == 10
    # all neighbours of center 0 must belong to cluster 0
    labels = df.set_index("vec_id")["label"]
    assert (labels.loc[out["vec_id"]] == 0).all()
    # matches a numpy reference computation
    E = np.stack(df["embedding"].to_numpy()).astype(np.float64)
    En = E / np.linalg.norm(E, axis=1, keepdims=True)
    q = centers[0] / np.linalg.norm(centers[0])
    sims = np.round(En @ q, 4)
    order = np.lexsort((df["vec_id"].to_numpy(), -sims))
    expect = set(df["vec_id"].to_numpy()[order[:10]])
    assert set(out["vec_id"]) == expect


def test_brute_force_multi_query(data):
    ds, df, centers = data
    out = SIM.brute_force_topk(ds, centers[:3], k=5).to_pandas()
    assert len(out) == 15
    labels = df.set_index("vec_id")["label"]
    for qi in range(3):
        sub = out[out["query_id"] == qi]
        assert (labels.loc[sub["vec_id"]] == qi).all()


def test_lsh_topk_recall(data):
    ds, df, centers = data
    exact = SIM.brute_force_topk(ds, centers[:5], k=10).to_pandas()
    approx = SIM.lsh_topk(ds, centers[:5], k=10, n_bits=8, probes=2).to_pandas()
    recalls = []
    for qi in range(5):
        e = set(exact[exact.query_id == qi]["vec_id"])
        a = set(approx[approx.query_id == qi]["vec_id"])
        recalls.append(len(e & a) / len(e))
    assert np.mean(recalls) >= 0.6, recalls


def test_embedding_near_dup_finds_injected_dups(ray_session):
    """Inject 20 true near-dup pairs (cos ≈ 0.997); LSH multi-table must
    recover ≥ 90% of them with zero false positives."""
    rng = np.random.default_rng(7)
    base = rng.normal(size=(200, 32))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    rows = [{"vec_id": i, "embedding": base[i].astype(np.float32).tolist()}
            for i in range(200)]
    true_pairs = set()
    for j in range(20):  # vec 1000+j duplicates vec j with tiny noise
        v = base[j] + rng.normal(scale=0.01, size=32)
        rows.append({"vec_id": 1000 + j,
                     "embedding": v.astype(np.float32).tolist()})
        true_pairs.add((j, 1000 + j))
    ds = rd.from_pandas(pd.DataFrame(rows))
    pairs = SIM.embedding_near_dup_pairs(ds, threshold=0.95, n_bits=8,
                                         dim=32, n_tables=3).to_pandas()
    got = set(map(tuple, pairs[["id_a", "id_b"]].values))
    assert len(got & true_pairs) >= 18          # >= 90% recall
    assert got <= true_pairs                    # no false positives
    assert (pairs["sim"] >= 0.95).all()


def test_ivf_topk_recall(data):
    ds, df, centers = data
    exact = SIM.brute_force_topk(ds, centers[:5], k=10).to_pandas()
    approx = SIM.ivf_topk(ds, centers[:5], k=10, n_lists=12,
                          n_probe=4).to_pandas()
    recalls = []
    for qi in range(5):
        e = set(exact[exact.query_id == qi]["vec_id"])
        a = set(approx[approx.query_id == qi]["vec_id"])
        recalls.append(len(e & a) / len(e))
    import numpy as np
    assert np.mean(recalls) >= 0.8, recalls


def test_explode_spans(ray_session):
    import ray.data as rd

    from cerberus_ray.datagen import GenConfig, gen_docs_batch
    from cerberus_ray.rules.row_rules import explode_spans

    cfg = GenConfig(n_docs=200)
    t = gen_docs_batch(np.arange(cfg.n_docs), cfg)
    flat = explode_spans(rd.from_arrow(t)).to_pandas()
    import pyarrow.compute as pc
    n_spans = int(pc.sum(pc.list_value_length(t["spans"])).as_py())
    assert len(flat) == n_spans
    assert list(flat.columns) == ["doc_id", "span_idx", "kind", "text",
                                  "media_ref", "offset"]
    # span_idx restarts at 0 per doc
    assert (flat.groupby("doc_id")["span_idx"].min() == 0).all()


def test_embedding_near_dup_hot_bucket_bounded(ray_session):
    """Thousands of identical vectors collapse into ONE LSH bucket in
    every table; the hot-bucket guard must sub-bucket/chunk instead of an
    O(n²) matmul, stay fast, and still find near-dups locally."""
    import time

    import numpy as np
    import pandas as pd
    import ray.data as rd

    from cerberus_ray.pipelines.similarity import embedding_near_dup_pairs

    n = 4000
    v = np.ones(16) / 4.0
    df = pd.DataFrame({"vec_id": np.arange(n),
                       "embedding": [v.tolist() for _ in range(n)]})
    t0 = time.time()
    out = embedding_near_dup_pairs(rd.from_pandas(df), threshold=0.9,
                                   n_bits=8, n_tables=2,
                                   max_bucket=256).to_pandas()
    took = time.time() - t0
    assert took < 60, f"hot bucket not bounded: {took:.1f}s"
    # pairs inside each chunk are found at sim 1.0
    assert len(out) > 0
    assert (out["sim"] == 1.0).all()


def test_exact_cosine_threshold_pairs_bruteforce(ray_session):
    """Blocked-matmul exact join must equal the all-pairs reference and
    agree across driver/broadcast modes."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from cerberus_ray.determinism import round_away
    from cerberus_ray.pipelines.similarity import (
        exact_cosine_threshold_pairs,
    )

    rng = np.random.default_rng(5)
    n, d = 120, 16
    V = rng.normal(size=(n, d))
    V[7] = V[3] + 0.01 * rng.normal(size=d)   # planted near-dup
    ids = np.arange(n, dtype=np.int64)
    import pyarrow as pa

    tbl = pa.table({
        "vec_id": pa.array(ids),
        "embedding": pa.array([v.astype("float32") for v in V],
                              pa.list_(pa.float32()))})
    ds = rd.from_arrow(tbl).repartition(4)
    thr = 0.6
    drv = exact_cosine_threshold_pairs(ds, threshold=thr,
                                       mode="driver").to_pandas()
    bc = exact_cosine_threshold_pairs(ds, threshold=thr,
                                      mode="broadcast").to_pandas()
    pd.testing.assert_frame_equal(drv, bc)
    # all-pairs reference on the same float32-rounded inputs
    Vf = np.stack([v.astype("float32").astype("float64") for v in V])
    ng = np.linalg.norm(Vf, axis=1)
    S = Vf @ Vf.T
    S /= ng[:, None]
    S /= ng[None, :]
    iu = np.triu_indices(n, 1)
    hit = S[iu] >= thr
    ref = pd.DataFrame({"id_a": iu[0][hit], "id_b": iu[1][hit],
                        "sim": round_away(S[iu][hit], 4)})
    ref = ref.sort_values(["id_a", "id_b"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(drv, ref)
    assert ((drv["id_a"] == 3) & (drv["id_b"] == 7)).any()
