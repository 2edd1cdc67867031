"""Classifier two-sample test: AUC ≈ 0.5 under the null (same
distribution), AUC high under a real shift, determinism."""

import numpy as np
import pandas as pd
import ray.data as rd

from cerberus_ray.pipelines.c2st import c2st_report


def _texts(n, vocab, seed, min_len=20, max_len=30):
    rng = np.random.default_rng(seed)
    lens = rng.integers(min_len, max_len, n)
    return [" ".join(rng.choice(vocab, ln)) for ln in lens]


def test_null_no_shift(ray_session):
    vocab = np.array([f"w{i}" for i in range(100)])
    a = pd.DataFrame({"doc_id": np.arange(400, dtype=np.int64),
                      "text": _texts(400, vocab, 1)})
    b = pd.DataFrame({"doc_id": np.arange(400, 800, dtype=np.int64),
                      "text": _texts(400, vocab, 2)})
    out = c2st_report(rd.from_pandas(a, override_num_blocks=2),
                      rd.from_pandas(b, override_num_blocks=2),
                      iters=8).iloc[0]
    # same generator → indistinguishable: AUC close to chance
    assert 0.35 <= out["auc"] <= 0.65
    assert not bool(out["separable"]) or out["auc"] < 0.66
    assert out["n_a"] == 400 and out["n_b"] == 400
    assert out["n_train"] + out["n_test"] == 800


def test_alternative_detects_shift(ray_session):
    vocab_a = np.array([f"w{i}" for i in range(100)])
    vocab_b = np.array([f"v{i}" for i in range(100)])  # disjoint vocab
    a = pd.DataFrame({"doc_id": np.arange(300, dtype=np.int64),
                      "text": _texts(300, vocab_a, 3)})
    b = pd.DataFrame({"doc_id": np.arange(300, 600, dtype=np.int64),
                      "text": _texts(300, vocab_b, 4)})
    out = c2st_report(rd.from_pandas(a), rd.from_pandas(b),
                      iters=8).iloc[0]
    assert out["auc"] >= 0.95
    assert bool(out["separable"])


def test_deterministic(ray_session):
    vocab = np.array([f"w{i}" for i in range(50)])
    a = pd.DataFrame({"doc_id": np.arange(200, dtype=np.int64),
                      "text": _texts(200, vocab, 5)})
    b = pd.DataFrame({"doc_id": np.arange(200, 400, dtype=np.int64),
                      "text": _texts(200, vocab, 6, 10, 15)})
    r1 = c2st_report(rd.from_pandas(a, override_num_blocks=1),
                     rd.from_pandas(b, override_num_blocks=1), iters=6)
    r2 = c2st_report(rd.from_pandas(a, override_num_blocks=5),
                     rd.from_pandas(b, override_num_blocks=3), iters=6)
    pd.testing.assert_frame_equal(r1, r2)
