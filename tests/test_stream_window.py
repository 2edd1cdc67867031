"""Streaming tumbling windows: batch-aggregate agreement (in-order and
within-lateness disorder), late-row flagging, eviction bound,
snapshot/restore resume identity."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from cerberus_ray.stages.stream_window import (
    StreamingWindowAggregator,
    window_stream,
)

W = 60  # one-minute windows


def _events(n=600, seed=3, keys=("a", "b", "c")):
    rng = np.random.default_rng(seed)
    ts = np.sort(rng.integers(0, 1800, size=n))
    return pd.DataFrame({
        "ts": ts,
        "key": rng.choice(keys, size=n),
        "value": rng.normal(5, 2, size=n).round(3)})


def _batch_ref(df):
    g = df.assign(window_start=(df["ts"] // W) * W).groupby(
        ["window_start", "key"], as_index=False)["value"].agg(
        ["count", "sum", "min", "max"]).reset_index(drop=True)
    return g.rename(columns={"count": "n"}).sort_values(
        ["window_start", "key"], kind="mergesort").reset_index(drop=True)


def _assert_matches_batch(fin, df):
    ref = _batch_ref(df)
    got = fin.sort_values(["window_start", "key"],
                          kind="mergesort").reset_index(drop=True)
    assert list(got["window_start"]) == list(ref["window_start"])
    assert list(got["key"]) == list(ref["key"])
    np.testing.assert_array_equal(got["n"].to_numpy(),
                                  ref["n"].to_numpy())
    for c in ("sum", "min", "max"):
        np.testing.assert_allclose(got[c].to_numpy(),
                                   ref[c].to_numpy(), atol=1e-9)


def _run(df, **kw):
    agg = StreamingWindowAggregator(window=W, key_col="key", **kw)
    fin, late = [], []
    try:
        for i in range(0, len(df), 100):
            f, l = agg.feed(df.iloc[i:i + 100])
            fin.append(f)
            late.append(l)
        fin.append(agg.finalize())
        return (pd.concat(fin, ignore_index=True),
                pd.concat([x for x in late if len(x)],
                          ignore_index=True) if any(len(x) for x in late)
                else pd.DataFrame())
    finally:
        agg.shutdown()


def test_in_order_stream_matches_batch(ray_session):
    df = _events()
    fin, late = _run(df, allowed_lateness=0, n_shards=3)
    assert not len(late)  # sorted feed: nothing late
    _assert_matches_batch(fin, df)


def test_disorder_within_lateness_matches_batch(ray_session):
    df = _events()
    rng = np.random.default_rng(9)
    # jitter arrival order by up to ~90s while lateness allows 120s
    disordered = (df.assign(_o=df["ts"] + rng.integers(0, 90, len(df)))
                  .sort_values("_o").drop(columns="_o")
                  .reset_index(drop=True))
    fin, late = _run(disordered, allowed_lateness=120, n_shards=3)
    assert not len(late)
    _assert_matches_batch(fin, df)


def test_late_rows_flagged_not_merged(ray_session):
    early = pd.DataFrame({"ts": [0, 30, 59], "key": ["a"] * 3,
                          "value": [1.0, 2.0, 3.0]})
    mover = pd.DataFrame({"ts": [300], "key": ["a"], "value": [9.0]})
    straggler = pd.DataFrame({"ts": [10], "key": ["a"], "value": [100.0]})
    agg = StreamingWindowAggregator(window=W, key_col="key",
                                    allowed_lateness=0, n_shards=2)
    try:
        f0, l0 = agg.feed(early)
        assert not len(f0) and not len(l0)
        f1, l1 = agg.feed(mover)  # watermark → 300: window [0,60) closes
        assert list(f1["n"]) == [3] and not len(l1)
        f2, l2 = agg.feed(straggler)  # ts=10 → closed window: LATE
        assert not len(f2) and len(l2) == 1
        assert float(l2["lateness"][0]) == 300 - 60
        fin = agg.finalize()
        # the straggler's 100.0 never contaminated window [300, 360)
        assert list(fin["sum"]) == [9.0]
        assert agg.n_late == 1
    finally:
        agg.shutdown()


def test_eviction_bounds_open_state(ray_session):
    df = _events(n=500)
    agg = StreamingWindowAggregator(window=W, key_col="key",
                                    allowed_lateness=60, n_shards=2)
    try:
        for i in range(0, len(df), 50):
            agg.feed(df.iloc[i:i + 50])
            # open ≤ keys × (1 + (lateness + window) / window) windows
            assert agg.n_open_windows() <= 3 * 3
    finally:
        agg.shutdown()


def test_snapshot_restore_resume_identity(ray_session):
    df = _events()
    whole, _ = _run(df, allowed_lateness=30, n_shards=2)

    agg1 = StreamingWindowAggregator(window=W, key_col="key",
                                     allowed_lateness=30, n_shards=2)
    parts = []
    try:
        for i in range(0, 300, 100):
            f, _ = agg1.feed(df.iloc[i:i + 100])
            parts.append(f)
        snap = agg1.snapshot()
    finally:
        agg1.shutdown()

    agg2 = StreamingWindowAggregator(window=W, key_col="key",
                                     allowed_lateness=30, n_shards=2)
    try:
        agg2.restore(snap)
        for i in range(300, len(df), 100):
            f, _ = agg2.feed(df.iloc[i:i + 100])
            parts.append(f)
        parts.append(agg2.finalize())
    finally:
        agg2.shutdown()
    resumed = pd.concat(parts, ignore_index=True).sort_values(
        ["window_start", "key"], kind="mergesort").reset_index(drop=True)
    target = whole.sort_values(["window_start", "key"],
                               kind="mergesort").reset_index(drop=True)
    pd.testing.assert_frame_equal(resumed, target)


def test_window_stream_over_dataset(ray_session):
    df = _events(n=400)
    ds = rd.from_pandas(df, override_num_blocks=1)  # block order = feed order
    fin, late = window_stream(ds, window=W, key_col="key",
                              allowed_lateness=60)
    _assert_matches_batch(fin.to_pandas(), df)
    assert late.num_rows == 0


def test_bad_args(ray_session):
    with pytest.raises(ValueError):
        StreamingWindowAggregator(window=0)
    with pytest.raises(ValueError):
        StreamingWindowAggregator(window=10, allowed_lateness=-1)
