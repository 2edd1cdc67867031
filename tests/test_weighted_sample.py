"""Weighted exact-k sampling (A-ES): exact parity with a pandas
reference sharing the same deterministic draw, exact size, partition
invariance, weight monotonicity across seeds, and zero/null-weight
exclusion."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from cerberus_ray.determinism import uniform01
from cerberus_ray.pipelines.budget import sample_exact_k_weighted


def frame(n=200, seed=1) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    return pd.DataFrame({
        "doc_id": np.arange(n, dtype=np.int64),
        "w": rng.uniform(0.1, 5.0, n).round(3)})


def reference_sample(pdf: pd.DataFrame, k: int, seed: int) -> set:
    """A-ES with the engine's own draw: top-k by log(u)/w desc, ties by
    doc_id asc (the budget-cut total order)."""
    u = uniform01(pdf["doc_id"].to_numpy().astype(np.uint64),
                  seed ^ 0x5EED, salt=0xA5)
    w = pdf["w"].to_numpy()
    with np.errstate(divide="ignore"):
        es = np.where(w > 0, np.log(u) / w, -np.inf)
    order = np.lexsort((pdf["doc_id"].to_numpy(), -es))
    return set(pdf["doc_id"].to_numpy()[order[:k]].tolist())


def test_matches_reference_and_exact_size(ray_session):
    pdf = frame()
    ds = rd.from_pandas(pdf, override_num_blocks=3).materialize()
    got = sample_exact_k_weighted(ds, 40, weight_col="w", seed=9)
    ids = set(got.to_pandas()["doc_id"].tolist())
    assert len(ids) == 40
    assert ids == reference_sample(pdf, 40, 9)


def test_partition_invariance(ray_session):
    pdf = frame(seed=2)
    a = set(sample_exact_k_weighted(
        rd.from_pandas(pdf, override_num_blocks=1).materialize(),
        25, weight_col="w", seed=4).to_pandas()["doc_id"])
    b = set(sample_exact_k_weighted(
        rd.from_pandas(pdf.sample(frac=1, random_state=7),
                       override_num_blocks=8).materialize(),
        25, weight_col="w", seed=4).to_pandas()["doc_id"])
    assert a == b


def test_weight_monotonicity_across_seeds(ray_session):
    """Rows with weight 50 vs 0.5: across seeds the heavy rows are
    sampled far more often (A-ES inclusion grows with weight)."""
    n = 100
    pdf = pd.DataFrame({
        "doc_id": np.arange(n, dtype=np.int64),
        "w": np.where(np.arange(n) < 20, 50.0, 0.5)})
    ds = rd.from_pandas(pdf, override_num_blocks=2).materialize()
    heavy_hits = light_hits = 0
    for s in range(12):
        ids = set(sample_exact_k_weighted(
            ds, 20, weight_col="w", seed=s).to_pandas()["doc_id"])
        heavy_hits += len([i for i in ids if i < 20])
        light_hits += len([i for i in ids if i >= 20])
    # heavy rows (20% of pop, 98% of weight) dominate the sample
    assert heavy_hits > 3 * light_hits


def test_nonpositive_weights_excluded(ray_session):
    pdf = frame(n=60, seed=3)
    pdf.loc[pdf["doc_id"] < 30, "w"] = 0.0
    pdf.loc[pdf["doc_id"] < 10, "w"] = None
    ds = rd.from_pandas(pdf, override_num_blocks=2).materialize()
    ids = set(sample_exact_k_weighted(
        ds, 20, weight_col="w", seed=1).to_pandas()["doc_id"])
    assert len(ids) == 20
    assert all(i >= 30 for i in ids)
