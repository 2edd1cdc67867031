"""Deterministic split assignment + per-group HLL distinct estimates."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from cerberus_ray.pipelines.mixing import assign_splits
from cerberus_ray.stages.uniqueness import approx_distinct_by_group


def frame(n=6000) -> pd.DataFrame:
    return pd.DataFrame({"doc_id": [f"d{i}" for i in range(n)],
                         "payload": np.arange(n)})


def test_split_proportions_determinism_partition_invariance(ray_session):
    df = frame()
    ratios = {"train": 0.8, "val": 0.1, "test": 0.1}
    a = (assign_splits(rd.from_pandas(df, override_num_blocks=4), ratios)
         .to_pandas().set_index("doc_id")["split"])
    # proportions hold to binomial tolerance
    vc = a.value_counts(normalize=True)
    assert abs(vc["train"] - 0.8) < 0.02
    assert abs(vc["val"] - 0.1) < 0.02
    assert abs(vc["test"] - 0.1) < 0.02
    # partition invariance: identical assignment under a different layout
    b = (assign_splits(rd.from_pandas(df, override_num_blocks=13), ratios)
         .to_pandas().set_index("doc_id")["split"])
    assert a.sort_index().equals(b.sort_index())
    # seed sensitivity: a different seed moves documents
    c = (assign_splits(rd.from_pandas(df, override_num_blocks=4), ratios,
                       seed=7).to_pandas().set_index("doc_id")["split"])
    assert not a.sort_index().equals(c.sort_index())
    # dict insertion order must not matter (cut points sorted by name)
    d = (assign_splits(rd.from_pandas(df, override_num_blocks=4),
                       {"test": 0.1, "train": 0.8, "val": 0.1})
         .to_pandas().set_index("doc_id")["split"])
    assert a.sort_index().equals(d.sort_index())


def test_split_validation_errors(ray_session):
    ds = rd.from_pandas(frame(10))
    with pytest.raises(ValueError):
        assign_splits(ds, {"a": 0.5, "b": 0.4})
    with pytest.raises(ValueError):
        assign_splits(ds, {"a": 1.5, "b": -0.5})


def test_sf0001_split_report_pin(ray_session):
    from cerberus_ray.pipelines.training_queries import q_split_report
    t = q_split_report("/root/testdata/sf0.001").to_pydict()
    assert t == {"split": ["test", "train", "val"],
                 "n_docs": [58, 387, 55]}


def test_grouped_hll_vs_exact(ray_session):
    rng = np.random.default_rng(17)
    n = 30_000
    df = pd.DataFrame({
        "grp": rng.choice(["x", "y", "z"], n, p=[0.6, 0.3, 0.1]),
        "user": [f"u{v}" for v in rng.integers(0, 4000, n)]})
    ds = rd.from_pandas(df, override_num_blocks=6)
    est = approx_distinct_by_group(ds, "grp", "user").set_index("grp")
    exact = df.groupby("grp")["user"].nunique()
    for g in ("x", "y", "z"):
        assert abs(est.loc[g, "approx"] - exact[g]) / exact[g] < 0.05
    # mergeability: a different block layout gives the SAME estimates
    est2 = (approx_distinct_by_group(
        rd.from_pandas(df, override_num_blocks=17), "grp", "user")
        .set_index("grp"))
    assert np.allclose(est["approx"], est2["approx"])
