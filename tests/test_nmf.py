"""NMF topics: numpy reference parity, monotone loss, planted-topic
recovery via topic_top_words, layout invariance, guards."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from cerberus_ray.pipelines.doc_cluster import _doc_vectors
from cerberus_ray.pipelines.nmf import (_solve_w, fit_nmf,
                                        topic_top_words)

SPORTS = ["football", "goal", "match", "league", "coach"]
COOKING = ["recipe", "oven", "butter", "flour", "saucepan"]


def _corpus(n=300, seed=14):
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        vocab = SPORTS if i % 2 == 0 else COOKING
        words = list(rng.choice(vocab, 10)) + ["the", "and"]
        rows.append((i, " ".join(words)))
    return pd.DataFrame(rows, columns=["doc_id", "text"])


def _reference(df, k, B, n_iters, inner, seed):
    rng = np.random.default_rng(seed)
    H = np.abs(rng.standard_normal((k, B))) + 0.1
    V = _doc_vectors(df["text"].to_numpy(), B)
    losses = []
    for _ in range(n_iters):
        W = _solve_w(V, H, inner)
        losses.append(round(float(((V - W @ H) ** 2).sum()) / len(V),
                            10))
        H = H * (W.T @ V) / np.maximum((W.T @ W) @ H, 1e-9)
    return H, losses


def test_matches_reference(ray_session):
    df = _corpus(n=120)
    m = fit_nmf(rd.from_pandas(df, override_num_blocks=4), k=3,
                n_features=256, n_iters=4, inner_iters=4, seed=5)
    H, losses = _reference(df, 3, 256, 4, 4, 5)
    np.testing.assert_allclose(m.H, H, rtol=1e-7, atol=1e-10)
    np.testing.assert_allclose(m.losses, losses, atol=1e-8)


def test_monotone_loss_and_topic_recovery(ray_session):
    df = _corpus(n=400)
    m = fit_nmf(rd.from_pandas(df, override_num_blocks=5), k=2,
                n_features=512, n_iters=8)
    assert all(b <= a + 1e-9 for a, b in zip(m.losses, m.losses[1:]))
    top = topic_top_words(m, SPORTS + COOKING + ["the", "and"],
                          top_n=4)
    by_topic = {t: set(g["word"]) for t, g in top.groupby("topic")}
    # each planted vocabulary dominates exactly one topic
    s_hits = [len(ws & set(SPORTS)) for ws in by_topic.values()]
    c_hits = [len(ws & set(COOKING)) for ws in by_topic.values()]
    assert max(s_hits) >= 3 and max(c_hits) >= 3
    assert np.argmax(s_hits) != np.argmax(c_hits)


def test_layout_invariance(ray_session):
    df = _corpus(n=200, seed=3)
    a = fit_nmf(rd.from_pandas(df, override_num_blocks=2), k=2,
                n_features=128, n_iters=3)
    b = fit_nmf(rd.from_pandas(df, override_num_blocks=9), k=2,
                n_features=128, n_iters=3)
    np.testing.assert_allclose(a.H, b.H, rtol=1e-7, atol=1e-10)
    np.testing.assert_allclose(a.losses, b.losses, atol=1e-9)


def test_guards(ray_session):
    df = _corpus(n=20)
    with pytest.raises(ValueError):
        fit_nmf(rd.from_pandas(df), k=0)
    with pytest.raises(ValueError):
        fit_nmf(rd.from_pandas(df), k=64, n_features=32)
    m = fit_nmf(rd.from_pandas(df), k=2, n_features=64, n_iters=1)
    with pytest.raises(ValueError):
        topic_top_words(m, [])
