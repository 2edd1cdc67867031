"""Greedy k-center coreset: exact numpy-reference agreement, radius
monotonicity, cluster-coverage property, partition invariance."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from cerberus_ray.pipelines.coreset import k_center_select


def _emb_frame(n=200, dim=16, n_clusters=4, seed=7):
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(n_clusters, dim)) * 5
    x = centers[np.arange(n) % n_clusters] + rng.normal(size=(n, dim))
    return pd.DataFrame({
        "vec_id": np.arange(n, dtype=np.int64),
        "embedding": [v.astype(np.float32).tolist() for v in x]})


def _reference(df, k):
    x = np.stack([np.asarray(v, dtype=np.float64)
                  for v in df["embedding"]])
    x = x / np.linalg.norm(x, axis=1, keepdims=True)
    ids = df["vec_id"].to_numpy()
    order = np.argsort(ids)
    x, ids = x[order], ids[order]
    picks = [0]
    mind = np.full(len(x), np.inf)
    for _ in range(1, k):
        mind = np.minimum(mind, 1.0 - x @ x[picks[-1]])
        nxt = np.lexsort((ids, -mind))[0]
        picks.append(int(nxt))
    return [int(ids[p]) for p in picks]


def test_matches_numpy_reference(ray_session):
    df = _emb_frame()
    got = k_center_select(rd.from_pandas(df, override_num_blocks=5), k=8)
    assert got["id"].tolist() == _reference(df, 8)


def test_radius_monotone_and_cluster_coverage(ray_session):
    df = _emb_frame(n_clusters=4)
    got = k_center_select(rd.from_pandas(df, override_num_blocks=3), k=4)
    r = got["radius"].to_numpy()[1:]
    assert (np.diff(r) <= 1e-12).all()       # non-increasing
    # the first 4 picks land in 4 DIFFERENT planted clusters (farthest-
    # point always jumps to an uncovered cluster when clusters are far)
    clusters = {int(i) % 4 for i in got["id"]}
    assert len(clusters) == 4


def test_partition_invariance(ray_session):
    df = _emb_frame(seed=11)
    outs = [k_center_select(rd.from_pandas(df, override_num_blocks=b),
                            k=6)
            for b in (1, 7)]
    pd.testing.assert_frame_equal(outs[0], outs[1])


def test_k_exceeds_n_and_guard(ray_session):
    df = _emb_frame(n=3, n_clusters=3)
    got = k_center_select(rd.from_pandas(df), k=10)
    assert len(got) == 3
    with pytest.raises(ValueError):
        k_center_select(rd.from_pandas(df), k=0)
