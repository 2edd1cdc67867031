"""Distributed logistic regression: exact numpy full-batch-GD parity,
separable-data accuracy, partition invariance, determinism."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from cerberus_ray.pipelines.doc_cluster import _doc_vectors
from cerberus_ray.pipelines.logreg import fit_logreg, score_logreg


def _frame(n=300, seed=5):
    """Separable-ish corpus: label-1 docs use 'good' vocabulary."""
    rng = np.random.default_rng(seed)
    pos_words = ["clear", "helpful", "accurate", "concise"]
    neg_words = ["spam", "junk", "noise", "clickbait"]
    rows = []
    for i in range(n):
        y = int(rng.random() < 0.5)
        vocab = pos_words if y else neg_words
        words = list(rng.choice(vocab, 8)) + list(
            rng.choice(["the", "a", "of"], 4))
        rows.append((i, " ".join(words), y))
    return pd.DataFrame(rows, columns=["doc_id", "text", "label"])


def _reference(df, n_features, iters, reg, lr):
    X = _doc_vectors(df["text"].to_numpy(), n_features)
    y = df["label"].to_numpy().astype(np.float64)
    w = np.zeros(n_features + 1)
    for _ in range(iters):
        z = X @ w[:-1] + w[-1]
        p = 1.0 / (1.0 + np.exp(-z))
        g = np.append(X.T @ (p - y), (p - y).sum()) / len(y)
        g[:-1] += reg * w[:-1]
        w = w - (lr / (0.5 + reg)) * g   # bias-inclusive Lipschitz bound
    return w


def test_matches_numpy_reference(ray_session):
    df = _frame()
    m = fit_logreg(rd.from_pandas(df, override_num_blocks=5),
                   n_features=256, iters=20, reg=1e-3, method="gd")
    w = _reference(df, 256, 20, 1e-3, 1.0)
    np.testing.assert_allclose(m.weights, w[:-1], atol=1e-10)
    assert abs(m.bias - w[-1]) < 1e-10


def test_separable_accuracy_and_scores(ray_session):
    df = _frame(n=400)
    ds = rd.from_pandas(df, override_num_blocks=4)
    m = fit_logreg(ds, n_features=256, iters=8)   # IRLS: few iters
    scored = score_logreg(ds, m, carry_cols=["label"]).to_pandas()
    pred = (scored["p"] > 0.5).astype(int)
    acc = (pred == scored["label"]).mean()
    assert acc > 0.95, acc
    assert scored["p"].between(0, 1).all()


def test_partition_invariance_and_determinism(ray_session):
    df = _frame(seed=9)
    # same layout, rerun → bitwise identical (sorted partial merge)
    a, b = (fit_logreg(rd.from_pandas(df, override_num_blocks=7),
                       n_features=128, iters=4) for _ in range(2))
    np.testing.assert_array_equal(a.weights, b.weights)
    assert a.bias == b.bias
    # different block layouts → identical to float-summation residue
    c = fit_logreg(rd.from_pandas(df, override_num_blocks=1),
                   n_features=128, iters=4)
    np.testing.assert_allclose(a.weights, c.weights, atol=1e-9)
    assert abs(a.bias - c.bias) < 1e-9


def test_irls_matches_numpy_reference(ray_session):
    from cerberus_ray.pipelines.doc_cluster import _doc_vectors

    df = _frame(n=200, seed=13)
    m = fit_logreg(rd.from_pandas(df, override_num_blocks=4),
                   n_features=128, iters=6, reg=1e-2, method="irls")
    X = _doc_vectors(df["text"].to_numpy(), 128)
    Xa = np.hstack([X, np.ones((len(X), 1))])
    y = df["label"].to_numpy().astype(np.float64)
    w = np.zeros(129)
    for _ in range(6):
        p = 1.0 / (1.0 + np.exp(-(Xa @ w)))
        g = Xa.T @ (p - y) / len(y)
        g[:-1] += 1e-2 * w[:-1]
        H = (Xa * (p * (1 - p))[:, None]).T @ Xa / len(y)
        H[np.arange(128), np.arange(128)] += 1e-2
        H[np.arange(129), np.arange(129)] += 1e-9
        w = w - np.linalg.solve(H, g)
        if float(np.abs(g).max()) < 1e-10:
            break
    np.testing.assert_allclose(m.weights, w[:-1], atol=1e-8)
    assert abs(m.bias - w[-1]) < 1e-8


def test_empty_and_bad_method(ray_session):
    df = pd.DataFrame({"doc_id": [], "text": [], "label": []})
    with pytest.raises(ValueError):
        fit_logreg(rd.from_pandas(df))
    ok = pd.DataFrame({"doc_id": [1], "text": ["a"], "label": [1]})
    with pytest.raises(ValueError):
        fit_logreg(rd.from_pandas(ok), method="sgd")


def test_calibration_curve(ray_session):
    from cerberus_ray.pipelines.logreg import calibration_curve

    # perfectly calibrated synthetic scores: y ~ Bernoulli(p)
    rng = np.random.default_rng(7)
    p = rng.uniform(0, 1, 20_000)
    y = (rng.uniform(0, 1, len(p)) < p).astype(np.int64)
    ds = rd.from_pandas(pd.DataFrame({"p": p, "label": y}),
                        override_num_blocks=5)
    curve = calibration_curve(ds, n_bins=10)
    assert len(curve) == 10
    assert curve["n"].sum() == 20_000
    # calibrated: per-bin empirical rate tracks mean predicted p
    np.testing.assert_allclose(curve["frac_pos"], curve["mean_p"],
                               atol=0.03)
    import pytest

    with pytest.raises(ValueError):
        calibration_curve(ds, n_bins=1)
