"""Embedding centroid cohesion / outlier detection: numpy ground-truth
parity for centroids and scores, planted-outlier recall with zero false
positives on tight clusters, and partitioning invariance."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from cerberus_ray.pipelines.emb_quality import (embedding_outliers,
                                                group_centroids,
                                                score_centroid_cosine)

DIM = 16


def clustered(n_per=120, seed=11):
    """Three tight clusters on distinct axes + 2 planted bad vectors per
    label (drawn from ANOTHER label's cluster)."""
    rng = np.random.default_rng(seed)
    rows = []
    centers = np.zeros((3, DIM))
    for k in range(3):
        centers[k, 4 * k] = 1.0
    vid = 0
    bad_ids = []
    for k in range(3):
        for _ in range(n_per):
            v = centers[k] + rng.normal(0, 0.02, DIM)
            rows.append({"vec_id": vid,
                         "embedding": list(v.astype(np.float32)),
                         "label": k})
            vid += 1
        for _ in range(2):  # planted: labeled k, drawn from cluster (k+1)%3
            v = centers[(k + 1) % 3] + rng.normal(0, 0.02, DIM)
            rows.append({"vec_id": vid,
                         "embedding": list(v.astype(np.float32)),
                         "label": k})
            bad_ids.append(vid)
            vid += 1
    return pd.DataFrame(rows), set(bad_ids)


def test_centroids_match_numpy(ray_session):
    df, _ = clustered()
    ds = rd.from_pandas(df).repartition(5).materialize()
    cent = group_centroids(ds).set_index("label")
    for k in range(3):
        m = np.stack([np.asarray(v) for v in
                      df[df["label"] == k]["embedding"]]).astype(np.float64)
        c = m.mean(axis=0)
        c = c / np.linalg.norm(c)
        assert np.allclose(cent.loc[k, "centroid"], c, atol=1e-9)
        assert cent.loc[k, "n"] == len(m)


def test_scores_match_numpy(ray_session):
    df, _ = clustered(n_per=40)
    ds = rd.from_pandas(df).repartition(3).materialize()
    cent = group_centroids(ds)
    got = (score_centroid_cosine(ds, cent).to_pandas()
           .set_index("vec_id")["centroid_cos"])
    cmap = {r["label"]: r["centroid"] for _, r in cent.iterrows()}
    for _, r in df.iterrows():
        v = np.asarray(r["embedding"], dtype=np.float64)
        v = v / np.linalg.norm(v)
        assert abs(got[r["vec_id"]] - float(v @ cmap[r["label"]])) < 1e-9


def test_planted_outliers_flagged_exactly(ray_session):
    df, bad = clustered()
    ds = rd.from_pandas(df).repartition(4).materialize()
    out, stats = embedding_outliers(ds, k_sigma=3.0)
    flagged = set(out.to_pandas()["vec_id"])
    assert flagged == bad  # full recall, no false positives
    s = stats.set_index("label")
    for k in range(3):
        assert s.loc[k, "n"] == 122
        assert s.loc[k, "n_outliers"] == 2


def test_report_pin_sf0001(ray_session):
    """Driver-surface pin: per-label counts and outlier totals on the
    sf0.001 embeddings table are deterministic."""
    from cerberus_ray.pipelines.training_queries import q_emb_outlier_report

    t = q_emb_outlier_report("/root/testdata/sf0.001").to_pydict()
    assert t["label"] == list(range(10))
    assert t["n"] == [56, 47, 54, 43, 48, 51, 42, 50, 46, 63]
    assert t["n_outliers"] == [0, 0, 0, 0, 0, 1, 0, 0, 0, 0]
    assert t["mean_cos"][0] == 0.1425 and t["std_cos"][0] == 0.1098


def test_partitioning_invariance(ray_session):
    df, _ = clustered(n_per=60)
    a = embedding_outliers(
        rd.from_pandas(df).repartition(2).materialize())[1]
    b = embedding_outliers(
        rd.from_pandas(df).repartition(9).materialize())[1]
    assert list(a["label"]) == list(b["label"])
    assert np.allclose(a["mean"], b["mean"], atol=1e-12)
    assert np.allclose(a["std"], b["std"], atol=1e-12)
    assert list(a["n_outliers"]) == list(b["n_outliers"])
