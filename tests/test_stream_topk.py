"""Streaming Space-Saving heavy hitters: exact mode equals true
counts, guaranteed-presence property under eviction, overcount bound,
snapshot/restore, batch-op agreement."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from cerberus_ray.stages.stream_topk import StreamingTopK


def _stream(seed=3, n=5000):
    """Zipf-ish key stream: a few heavy keys + a long tail."""
    rng = np.random.default_rng(seed)
    heavy = np.repeat([f"hot{i}" for i in range(5)],
                      [1200, 800, 500, 300, 200])
    tail = np.array([f"t{i}" for i in rng.integers(0, 2000, n)],
                    dtype=object)
    allk = np.concatenate([heavy, tail])
    rng.shuffle(allk)
    return allk


def test_exact_mode_matches_true_counts(ray_session):
    keys = _stream()
    st = StreamingTopK(n_shards=3, capacity=10_000)  # never evicts
    for chunk in np.array_split(keys, 7):
        st.feed(chunk)
    got = st.topk(10)
    true = pd.Series(keys).value_counts()
    assert (got["count_err"] == 0).all()
    for _, r in got.iterrows():
        assert r["count_est"] == true[r["key"]]
    assert got["key"].iloc[0] == "hot0"


def test_eviction_keeps_heavy_keys_with_bounded_error(ray_session):
    keys = _stream(seed=9, n=8000)
    st = StreamingTopK(n_shards=2, capacity=64)      # heavy eviction
    for chunk in np.array_split(keys, 10):
        st.feed(chunk)
    got = st.topk(5).set_index("key")
    true = pd.Series(keys).value_counts()
    # every true heavy hitter above the per-shard n/m bound survives
    for h in ("hot0", "hot1", "hot2"):
        assert h in got.index, h
        est, err = got.loc[h, "count_est"], got.loc[h, "count_err"]
        # Space-Saving invariant: true ≤ est ≤ true + err
        assert true[h] <= est <= true[h] + err


def test_snapshot_restore(ray_session):
    keys = _stream(seed=5, n=2000)
    a = StreamingTopK(n_shards=2, capacity=256)
    half = len(keys) // 2
    a.feed(keys[:half])
    snap = a.snapshot()
    b = StreamingTopK(n_shards=2, capacity=256)
    b.restore(snap)
    a.feed(keys[half:])
    b.feed(keys[half:])
    pd.testing.assert_frame_equal(a.topk(20), b.topk(20))


def test_agreement_with_batch_heavy_hitters(ray_session):
    from cerberus_ray.pipelines.vocab import token_top_k

    docs = pd.DataFrame({
        "doc_id": np.arange(200, dtype=np.int64),
        "text": [" ".join(_stream(seed=i, n=20)[:25]) for i in range(200)]})
    batch = token_top_k(rd.from_pandas(docs), k=10)
    st = StreamingTopK(n_shards=3, capacity=50_000)  # exact mode
    for t in docs["text"]:
        st.feed(t.split())
    stream = st.topk(10)
    assert stream["key"].tolist() == batch["token"].to_pylist()
    assert stream["count_est"].tolist() == batch["n"].to_pylist()


def test_guard(ray_session):
    with pytest.raises(ValueError):
        StreamingTopK(capacity=0)


def test_null_keys_dropped_not_crash(ray_session):
    from cerberus_ray.stages.stream_topk import StreamingTopK

    t = StreamingTopK(n_shards=2, capacity=16)
    try:
        t.feed(["a", None, "b", "a", None, float("nan")])
        out = t.topk(5)
        assert dict(zip(out["key"], out["count_est"])) == {"a": 2, "b": 1}
    finally:
        t.shutdown()


def test_shutdown_releases_actors(ray_session):
    from cerberus_ray.stages.stream_topk import StreamingTopK

    t = StreamingTopK(n_shards=2, capacity=8)
    t.feed(["x"])
    t.shutdown()
    assert t.shards == []


def test_heap_eviction_matches_space_saving_semantics(ray_session):
    """High-churn stream at capacity: estimates keep the Space-Saving
    guarantee est >= true and err bounds the overcount."""
    import numpy as np

    from cerberus_ray.stages.stream_topk import StreamingTopK

    rng = np.random.default_rng(0)
    t = StreamingTopK(n_shards=2, capacity=32)
    try:
        true = {}
        for _ in range(30):
            keys = [f"k{int(i)}" for i in
                    rng.zipf(1.5, size=400) % 200]
            for k in keys:
                true[k] = true.get(k, 0) + 1
            t.feed(keys)
        out = t.topk(10)
        for k, est, err in out.itertuples(index=False):
            assert est >= true.get(k, 0)          # never undercounts
            assert est - err <= true.get(k, 0)    # err bounds overcount
    finally:
        t.shutdown()


def test_heap_stays_bounded_under_hot_key_increments(ray_session):
    """A stream dominated by resident-key increments (no evictions)
    must not grow the lazy heap with total updates — the rebuild keeps
    it O(capacity). Exercises the shard class directly (driver-local)
    so the heap length is observable."""
    from cerberus_ray.stages.stream_topk import TopKShard

    shard = TopKShard.__ray_metadata__.modified_class(capacity=16)
    keys = [f"k{i}" for i in range(16)]
    shard.update(keys, [1] * 16)
    for _ in range(500):
        shard.update(keys, [1] * 16)   # 8000 hot-key increments
    assert len(shard._heap) <= 4 * 16 + 16
    # counts stay exact in no-eviction mode
    assert all(shard.counts[k] == 501 for k in keys)
    assert shard.summary()[0][2] == 0  # err 0, never evicted
