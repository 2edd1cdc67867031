"""Learning curve: nested leak-free splits, accuracy improves with
data on a noisy task, determinism, guards."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from cerberus_ray.pipelines.learning_curve import _u, learning_curve


def _corpus(n=4000, noise=0.25, seed=22):
    """Separable vocab + label noise: small subsets underfit, larger
    ones approach the 1−noise ceiling."""
    rng = np.random.default_rng(seed)
    pos = ["clear", "helpful", "accurate"]
    neg = ["spam", "junk", "noise"]
    rows = []
    for i in range(n):
        y = int(rng.random() < 0.5)
        vocab = pos if y else neg
        words = list(rng.choice(vocab, 3)) + list(
            rng.choice(pos + neg + ["the", "a"], 6))
        y_obs = y if rng.random() > noise else 1 - y
        rows.append((i, " ".join(words), y_obs))
    return pd.DataFrame(rows, columns=["doc_id", "text", "label"])


def test_curve_improves_and_is_deterministic(ray_session):
    df = _corpus()
    ds = rd.from_pandas(df, override_num_blocks=5)
    a = learning_curve(ds, fractions=(0.05, 0.3, 1.0), iters=10,
                       n_features=256)
    assert list(a["fraction"]) == [0.05, 0.3, 1.0]
    assert a["n_train"].is_monotonic_increasing
    # more data must not hurt materially, and full beats tiny clearly
    assert a["holdout_acc"].iloc[-1] >= a["holdout_acc"].iloc[0]
    assert a["holdout_acc"].iloc[-1] > 0.65
    b = learning_curve(rd.from_pandas(df, override_num_blocks=11),
                       fractions=(0.05, 0.3, 1.0), iters=10,
                       n_features=256)
    pd.testing.assert_frame_equal(a, b)


def test_split_discipline(ray_session):
    import pyarrow as pa

    df = _corpus(n=500)
    tb = pa.Table.from_pandas(df)
    u = _u(tb, "doc_id", 42)
    hold = set(df["doc_id"][u < 0.2])
    small = set(df["doc_id"][(u >= 0.2) & (u < 0.2 + 0.1 * 0.8)])
    big = set(df["doc_id"][(u >= 0.2) & (u < 0.2 + 0.5 * 0.8)])
    assert small <= big                 # nested
    assert not (hold & big)             # leak-free
    assert len(small) > 0


def test_guards(ray_session):
    df = _corpus(n=100)
    ds = rd.from_pandas(df)
    with pytest.raises(ValueError):
        learning_curve(ds, fractions=(0.0, 1.0))
    with pytest.raises(ValueError):
        learning_curve(ds, holdout_frac=1.5)
