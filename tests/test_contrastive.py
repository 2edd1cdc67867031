"""Contrastive pair construction: hard negatives vs a numpy
brute-force reference, label exclusion, seeded random negatives
(exclusion, determinism, layout invariance, try exhaustion)."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from cerberus_ray.pipelines.contrastive import (hard_negatives,
                                                random_negatives)


def _emb_frame(n=200, d=8, n_labels=4, seed=3):
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(n_labels, d))
    labels = rng.integers(0, n_labels, n)
    v = centers[labels] + 0.2 * rng.normal(size=(n, d))
    return pd.DataFrame({
        "vec_id": np.arange(n, dtype=np.int64),
        "embedding": [row.astype(np.float32).tolist() for row in v],
        "label": labels.astype(np.int32)})


def test_hard_negatives_reference(ray_session):
    df = _emb_frame()
    ds = rd.from_pandas(df, override_num_blocks=4)
    anchors = np.array([0, 7, 42], dtype=np.int64)
    got = hard_negatives(ds, anchors, k=5).to_pandas()
    # numpy reference
    V = np.stack([np.asarray(r, dtype=np.float64)
                  for r in df["embedding"]])
    V = V / np.linalg.norm(V, axis=1, keepdims=True)
    labs = df["label"].to_numpy()
    for a in anchors:
        sims = np.round(V @ V[a], 4)
        sims[labs == labs[a]] = -np.inf
        order = np.lexsort((np.arange(len(sims)), -sims))[:5]
        sub = got[got["anchor_id"] == a]
        assert list(sub["vec_id"]) == list(order)
        # every negative has a different label
        assert (sub["neg_label"] != sub["anchor_label"]).all()
        np.testing.assert_allclose(sub["sim"], sims[order], atol=1e-9)


def test_hard_negatives_missing_anchor_raises(ray_session):
    ds = rd.from_pandas(_emb_frame(50))
    with pytest.raises(KeyError):
        hard_negatives(ds, np.array([999]))


def test_random_negatives_exclusion_and_determinism(ray_session):
    rng = np.random.default_rng(9)
    anchors = rng.integers(0, 50, 300)
    positives = (anchors + 1 + rng.integers(0, 5, 300)) % 60
    pairs = pd.DataFrame({"anchor": anchors, "positive": positives})
    uni = np.arange(60, dtype=np.int64)
    pos_set = set(zip(pairs["anchor"], pairs["positive"]))

    a = random_negatives(rd.from_pandas(pairs, override_num_blocks=1),
                         uni, k=3, seed=7).to_pandas()
    b = random_negatives(rd.from_pandas(pairs, override_num_blocks=6),
                         uni, k=3, seed=7).to_pandas()
    key = ["anchor", "positive", "slot"]
    pd.testing.assert_frame_equal(
        a.sort_values(key).reset_index(drop=True),
        b.sort_values(key).reset_index(drop=True))
    for r in a.itertuples():
        assert r.negative != r.anchor
        assert r.negative != r.positive
        # never ANY positive of that anchor, not just this row's
        assert (r.anchor, r.negative) not in pos_set
    # different seed → different sample
    c = random_negatives(rd.from_pandas(pairs), uni, k=3,
                         seed=8).to_pandas()
    assert not a.sort_values(key)["negative"].reset_index(
        drop=True).equals(c.sort_values(key)["negative"].reset_index(
            drop=True))


def test_random_negatives_exhaustion(ray_session):
    # universe of 3 where everything is banned → zero rows, no hang
    pairs = pd.DataFrame({"anchor": [1, 1], "positive": [2, 3]})
    out = random_negatives(rd.from_pandas(pairs),
                           np.array([1, 2, 3]), k=2,
                           seed=1).to_pandas()
    assert len(out) == 0
    with pytest.raises(ValueError):
        random_negatives(rd.from_pandas(pairs),
                         np.array([1 << 32]), k=1)
