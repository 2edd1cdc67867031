"""Softmax classifier: exact numpy GD parity, 3-class separable
accuracy, monotone loss, layout determinism, guards."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from cerberus_ray.pipelines.doc_cluster import _doc_vectors
from cerberus_ray.pipelines.softmax import (_probs, fit_softmax,
                                            score_softmax)

VOCAB = {"sports": ["goal", "match", "league", "coach"],
         "cooking": ["oven", "flour", "butter", "recipe"],
         "finance": ["stock", "bond", "yield", "market"]}


def _frame(n=600, seed=18):
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        lab = list(VOCAB)[i % 3]
        words = list(rng.choice(VOCAB[lab], 8)) + ["the", "a"]
        rows.append((i, " ".join(words), lab))
    return pd.DataFrame(rows, columns=["doc_id", "text", "label"])


def _reference(df, B, iters, reg, lr, momentum=0.0):
    classes = sorted(df["label"].unique())
    X = _doc_vectors(df["text"].to_numpy(), B)
    y = df["label"].map({c: i for i, c in enumerate(classes)}
                       ).to_numpy(np.int64)
    W = np.zeros((B + 1, len(classes)))
    V = np.zeros_like(W)
    losses = []
    for _ in range(iters):
        Wc = W + momentum * V
        P = _probs(X, Wc)
        losses.append(round(float(-np.log(np.clip(
            P[np.arange(len(y)), y], 1e-12, 1)).mean()), 10))
        D = P.copy()
        D[np.arange(len(y)), y] -= 1.0
        G = np.vstack([X.T @ D, D.sum(axis=0)[None, :]]) / len(y)
        G[:-1] += reg * Wc[:-1]
        V = momentum * V - (lr / (0.5 + reg)) * G
        W = W + V
    return classes, W, losses


def test_matches_reference(ray_session):
    df = _frame(n=300)
    m = fit_softmax(rd.from_pandas(df, override_num_blocks=4),
                    n_features=256, iters=10, reg=1e-3)
    classes, W, losses = _reference(df, 256, 10, 1e-3, 1.0)
    assert m.classes == classes
    np.testing.assert_allclose(m.W, W, atol=1e-9)
    np.testing.assert_allclose(m.losses, losses, atol=1e-9)


def test_matches_reference_with_momentum(ray_session):
    df = _frame(n=240, seed=7)
    m = fit_softmax(rd.from_pandas(df, override_num_blocks=3),
                    n_features=128, iters=8, momentum=0.9)
    classes, W, losses = _reference(df, 128, 8, 1e-3, 1.0,
                                    momentum=0.9)
    np.testing.assert_allclose(m.W, W, atol=1e-9)
    np.testing.assert_allclose(m.losses, losses, atol=1e-9)
    # final_loss is evaluated at the RETURNED W (not a lookahead point)
    X = _doc_vectors(df["text"].to_numpy(), 128)
    y = df["label"].map({c: i for i, c in enumerate(classes)}
                       ).to_numpy(np.int64)
    P = _probs(X, W)
    want = float(-np.log(np.clip(P[np.arange(len(y)), y],
                                 1e-12, 1)).mean())
    np.testing.assert_allclose(m.final_loss, want, atol=1e-9)


def test_accuracy_and_monotone_loss(ray_session):
    df = _frame()
    ds = rd.from_pandas(df, override_num_blocks=5)
    m = fit_softmax(ds, n_features=256, iters=25)
    assert all(b <= a + 1e-9 for a, b in zip(m.losses, m.losses[1:]))
    out = score_softmax(ds, m).to_pandas()
    assert (out["pred"] == out["label"]).mean() > 0.97
    assert ((out["p_max"] > 1 / 3) & (out["p_max"] <= 1)).all()


def test_layout_determinism_and_guards(ray_session):
    df = _frame(n=240, seed=3)
    a = fit_softmax(rd.from_pandas(df, override_num_blocks=2),
                    n_features=128, iters=5)
    b = fit_softmax(rd.from_pandas(df, override_num_blocks=9),
                    n_features=128, iters=5)
    np.testing.assert_allclose(a.W, b.W, atol=1e-10)
    one = df.assign(label="only")
    with pytest.raises(ValueError, match=">= 2"):
        fit_softmax(rd.from_pandas(one))
