"""Salted-key aggregation correctness under heavy skew + near-dup
connected components / keep-first pipeline."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from cerberus_ray.pipelines.dedup import (
    connected_components,
    dedup_near_keep_first,
)
from cerberus_ray.stages.skew import salted_grouped_sum


def test_salted_sum_matches_plain_under_skew(ray_session):
    rng = np.random.default_rng(42)
    n = 200_000
    # 80% of rows hit one hot key
    keys = np.where(rng.random(n) < 0.8, "HOT",
                    rng.choice([f"k{i}" for i in range(100)], size=n))
    vals = rng.random(n)
    df = pd.DataFrame({"k": keys, "v": vals})
    out = salted_grouped_sum(rd.from_pandas(df), "k", "v",
                             n_salts=16).to_pandas()
    expect = df.groupby("k")["v"].sum()
    got = dict(zip(out["k"], out["total"]))
    for k, v in expect.items():
        assert abs(got[k] - round(v, 6)) < 1e-4, k
    assert out.set_index("k")["n"].to_dict() == df["k"].value_counts().to_dict()


def test_connected_components():
    pairs = pa.Table.from_pydict({
        "doc_id_a": ["a", "b", "x", "p"],
        "doc_id_b": ["b", "c", "y", "q"],
    })
    out = connected_components(pairs).to_pandas()
    lbl = dict(zip(out["doc_id"], out["cluster_id"]))
    assert lbl["a"] == lbl["b"] == lbl["c"] == "a"
    assert lbl["x"] == lbl["y"] == "x"
    assert lbl["p"] == lbl["q"] == "p"


def test_connected_components_chain():
    # long chain must converge to the global min label
    ids = [f"n{i:03d}" for i in range(30)]
    pairs = pa.Table.from_pydict({
        "doc_id_a": ids[:-1], "doc_id_b": ids[1:]})
    out = connected_components(pairs).to_pandas()
    assert (out["cluster_id"] == "n000").all()


def test_dedup_near_keep_first(ray_session):
    base = ("the quick brown fox jumps over the lazy dog while rain "
            "falls gently on the quiet village roofs this evening")
    df = pd.DataFrame({
        "doc_id": ["a1", "a2", "a3", "b1", "c1"],
        "text": [base, base, base.replace("quiet", "noisy"),
                 "completely different text about shipping containers and cranes",
                 "another unrelated document mentioning gardens and flowers"],
    })
    # bands=32 (r=4): candidate probability for j≈0.7 is ~0.9998 vs ~0.6
    # at the default r=8 — recall/precision is a banding choice
    kept, clusters = dedup_near_keep_first(rd.from_pandas(df), threshold=0.5,
                                           bands=32)
    kept_ids = sorted(kept.to_pandas()["doc_id"])
    assert kept_ids == ["a1", "b1", "c1"]  # a2/a3 clustered under a1
    lbl = dict(zip(clusters.to_pandas()["doc_id"],
                   clusters.to_pandas()["cluster_id"]))
    assert lbl["a2"] == "a1" and lbl["a3"] == "a1"


def test_connected_components_shuffle_agrees(ray_session):
    """The distributed keyed-groupby label propagation must produce the
    same clustering as the driver rounds, including chain components
    (label must travel the full diameter)."""
    import pyarrow as pa

    from cerberus_ray.pipelines.dedup import (
        connected_components,
        connected_components_shuffle,
    )

    pairs = pa.Table.from_pydict({
        "doc_id_a": ["a", "b", "c", "x", "m", "n"],
        "doc_id_b": ["b", "c", "d", "y", "n", "o"],
    })  # components: {a,b,c,d} chain, {x,y}, {m,n,o}
    drv = connected_components(pairs).to_pandas()
    shf = connected_components_shuffle(pairs).to_pandas()
    assert drv.equals(shf)
    assert set(shf[shf["doc_id"] == "d"]["cluster_id"]) == {"a"}


def test_connected_components_shuffle_partition_invariance(ray_session):
    """The clustering must not depend on the exchange partition count
    (num_partitions is a parallelism knob, defaulting ∝ edge count)."""
    import pyarrow as pa

    from cerberus_ray.pipelines.dedup import connected_components_shuffle

    pairs = pa.Table.from_pydict({
        "doc_id_a": ["a", "b", "c", "x", "m", "n"],
        "doc_id_b": ["b", "c", "d", "y", "n", "o"]})
    base = connected_components_shuffle(pairs).to_pandas()
    for np_ in (3, 16):
        got = connected_components_shuffle(
            pairs, num_partitions=np_).to_pandas()
        assert base.equals(got), np_


def test_connected_components_shuffle_raises_on_nonconvergence(ray_session):
    """A component deeper than max_rounds must raise, not silently return
    partially-propagated (wrong) labels."""
    import pyarrow as pa
    import pytest

    from cerberus_ray.pipelines.dedup import connected_components_shuffle

    # a path graph a0-a1-...-a9 has diameter 9: 1 round cannot converge
    pairs = pa.Table.from_pydict({
        "doc_id_a": [f"a{i}" for i in range(9)],
        "doc_id_b": [f"a{i+1}" for i in range(9)]})
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components_shuffle(pairs, max_rounds=1)
