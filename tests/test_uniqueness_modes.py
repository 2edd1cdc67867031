"""All duplicate_key_counts execution modes must agree exactly — the
planner's mode choice is a performance decision, never a semantic one."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from cerberus_ray.stages.uniqueness import duplicate_key_counts


def corpus(n=20_000, dup_frac=0.01, seed=7):
    rng = np.random.default_rng(seed)
    keys = [f"k{i:07d}" for i in range(n)]
    dups = rng.choice(n, size=int(n * dup_frac), replace=False)
    extra = [f"k{i:07d}" for i in dups]          # one extra copy each
    tripled = [f"k{dups[0]:07d}"]                # one key with count 3
    return pd.DataFrame({"key": keys + extra + tripled})


@pytest.mark.parametrize("mode", ["driver", "hash", "hash2", "cms", "shuffle"])
def test_modes_agree(ray_session, mode):
    df = corpus()
    ds = rd.from_pandas(df)
    out = duplicate_key_counts(ds, ["key"], mode=mode).to_pandas()
    expect = df["key"].value_counts()
    expect = expect[expect > 1].sort_index()
    assert out["key"].tolist() == expect.index.tolist(), mode
    assert out["n"].tolist() == expect.values.tolist(), mode


def test_composite_keys_with_nulls(ray_session):
    df = pd.DataFrame({
        "a": ["x", "x", "y", None, None, "z"],
        "b": [1, 1, 2, 3, 3, None],
    })
    out = duplicate_key_counts(rd.from_pandas(df), ["a", "b"],
                               mode="driver").to_pandas()
    # (x,1) twice and (None,3) twice — null keys must group, not vanish
    assert len(out) == 2
    assert out["n"].tolist() == [2, 2]
