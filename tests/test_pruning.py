"""Quantile pruning: threshold accuracy vs exact quantiles, kept-fraction
accuracy on both tails, null handling, and argument validation."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from cerberus_ray.pipelines.pruning import (prune_by_quantile,
                                            quantile_threshold)


def scores(n=50_000, seed=13):
    rng = np.random.default_rng(seed)
    return pd.DataFrame({"doc_id": [f"d{i}" for i in range(n)],
                         "score": rng.normal(loc=5.0, scale=2.0, size=n)})


def test_threshold_matches_exact_quantile(ray_session):
    df = scores()
    ds = rd.from_pandas(df).repartition(8).materialize()
    for q in (0.1, 0.5, 0.9):
        approx = quantile_threshold(ds, "score", q)
        exact = float(np.quantile(df["score"], q))
        # rank error, not value error: the fraction below the approx
        # threshold must be within 1% of q
        rank = (df["score"] < approx).mean()
        assert abs(rank - q) < 0.01, (q, approx, exact, rank)


def test_upper_and_lower_pruning_fractions(ray_session):
    df = scores(seed=29)
    ds = rd.from_pandas(df).repartition(6).materialize()
    kept_hi, thr_hi = prune_by_quantile(ds, "score", 0.3, side="upper")
    hi = kept_hi.to_pandas()
    assert abs(len(hi) / len(df) - 0.3) < 0.02
    assert hi["score"].min() >= thr_hi
    kept_lo, thr_lo = prune_by_quantile(ds, "score", 0.25, side="lower")
    lo = kept_lo.to_pandas()
    assert abs(len(lo) / len(df) - 0.25) < 0.02
    assert lo["score"].max() <= thr_lo
    # determinism: sketches and threshold are pure functions of the data
    _, thr_hi2 = prune_by_quantile(ds, "score", 0.3, side="upper")
    assert thr_hi == thr_hi2


def test_nulls_dropped_and_keep_all(ray_session):
    df = pd.DataFrame({"doc_id": list("abcdef"),
                       "score": [1.0, None, 3.0, None, 5.0, 7.0]})
    ds = rd.from_pandas(df).materialize()
    kept, _ = prune_by_quantile(ds, "score", 0.5, side="upper")
    out = kept.to_pandas()
    assert out["score"].notna().all()          # null scores never kept
    all_ds, thr = prune_by_quantile(ds, "score", 1.0)
    assert thr == float("-inf")
    assert len(all_ds.to_pandas()) == len(df)  # keep_frac=1 is a no-op


def test_pruning_argument_errors(ray_session):
    ds = rd.from_pandas(scores(n=10))
    with pytest.raises(ValueError):
        quantile_threshold(ds, "score", 1.5)
    with pytest.raises(ValueError):
        prune_by_quantile(ds, "score", 0.0)
    with pytest.raises(ValueError):
        prune_by_quantile(ds, "score", 0.5, side="middle")
