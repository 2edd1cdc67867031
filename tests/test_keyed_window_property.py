"""Property tests: keyed_apply (hash-bucketed vectorized keyed kernels)
must agree with a direct single-process pandas reference on random keyed
event data — buckets are an execution detail, never a semantics change."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd
from hypothesis import given, settings
from hypothesis import strategies as st

from cerberus_ray.stages.keyed_window import group_boundary_mask, keyed_apply


def events_frame(draw_ids, draw_ts):
    return pd.DataFrame({
        "user_id": np.array(draw_ids, dtype="int64"),
        "ts": pd.to_datetime(np.array(draw_ts, dtype="int64"), unit="s"),
    })


@st.composite
def keyed_events(draw):
    n = draw(st.integers(min_value=1, max_value=60))
    ids = draw(st.lists(st.integers(min_value=0, max_value=7),
                        min_size=n, max_size=n))
    ts = draw(st.lists(st.integers(min_value=0, max_value=10_000),
                       min_size=n, max_size=n))
    return events_frame(ids, ts)


@settings(max_examples=20, deadline=None, derandomize=True)
@given(keyed_events())
def test_keyed_sessions_match_pandas_reference(ray_session, df):
    gap = 1800

    def kernel(d: pd.DataFrame) -> pd.DataFrame:
        d = d.sort_values(["user_id", "ts"], kind="stable")
        gaps = d["ts"].diff().dt.total_seconds().to_numpy()
        first = group_boundary_mask(d["user_id"])
        starts = (gaps > gap) & ~first
        res = (d.assign(_s=starts).groupby("user_id", sort=False)["_s"]
                .agg(n_events="size", n_starts="sum").reset_index())
        res["n_sessions"] = res["n_starts"] + 1
        return res[["user_id", "n_events", "n_sessions"]]

    got = (keyed_apply(rd.from_pandas(df), "user_id", kernel, n_buckets=3)
           .to_pandas().sort_values("user_id").reset_index(drop=True))

    def ref_one(g):
        ts = g["ts"].sort_values()
        return pd.Series({
            "n_events": len(g),
            "n_sessions": int((ts.diff().dt.total_seconds() > gap).sum()) + 1})

    ref = (df.groupby("user_id").apply(ref_one, include_groups=False)
             .reset_index().sort_values("user_id").reset_index(drop=True))
    assert got["user_id"].tolist() == ref["user_id"].tolist()
    assert got["n_events"].tolist() == ref["n_events"].tolist()
    assert got["n_sessions"].tolist() == ref["n_sessions"].tolist()


@settings(max_examples=10, deadline=None, derandomize=True)
@given(keyed_events())
def test_keyed_apply_sees_whole_groups_once(ray_session, df):
    """Every key lands in exactly one bucket and every row arrives:
    emitting (key, group_size) per kernel call must reproduce global
    per-key counts with no key split across calls."""

    def kernel(d: pd.DataFrame) -> pd.DataFrame:
        g = d.groupby("user_id", sort=False).size().reset_index(name="n")
        return g

    got = (keyed_apply(rd.from_pandas(df), "user_id", kernel, n_buckets=4)
           .to_pandas())
    # one output row per key TOTAL means no key was split across buckets
    assert not got["user_id"].duplicated().any()
    ref = df.groupby("user_id").size()
    assert dict(zip(got["user_id"], got["n"])) == ref.to_dict()


def test_auto_buckets_scales_with_input():
    from cerberus_ray.stages.keyed_window import (
        _MAX_BUCKETS,
        _MIN_BUCKETS,
        auto_buckets,
    )

    assert auto_buckets(0) == _MIN_BUCKETS
    assert auto_buckets(10_000) == _MIN_BUCKETS
    # linear growth past the floor
    assert auto_buckets(200_000 * 100) == 100
    assert auto_buckets(200_000 * 1000) == 1000
    # capped (shuffle partition fixed cost dominates beyond)
    assert auto_buckets(10**12) == _MAX_BUCKETS
    # monotone non-decreasing in n
    prev = 0
    for n in [0, 1, 10**5, 10**6, 10**7, 10**9, 10**12]:
        b = auto_buckets(n)
        assert b >= prev
        prev = b


def test_keyed_apply_auto_sizing_semantics(ray_session):
    """n_buckets=None (auto) and an explicit count must agree — bucket
    count is an execution detail; the hint skips the count() pass."""
    rng = np.random.default_rng(0)
    df = pd.DataFrame({"user_id": rng.integers(0, 50, 500),
                       "v": rng.normal(size=500)})

    def kern(d: pd.DataFrame) -> pd.DataFrame:
        return (d.groupby("user_id", as_index=False)["v"].sum())

    auto = (keyed_apply(rd.from_pandas(df), "user_id", kern)
            .to_pandas().sort_values("user_id").reset_index(drop=True))
    hinted = (keyed_apply(rd.from_pandas(df), "user_id", kern,
                          n_rows_hint=10**9)  # forces max buckets
              .to_pandas().sort_values("user_id").reset_index(drop=True))
    explicit = (keyed_apply(rd.from_pandas(df), "user_id", kern,
                            n_buckets=7)
                .to_pandas().sort_values("user_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(auto, explicit)
    pd.testing.assert_frame_equal(auto, hinted)
