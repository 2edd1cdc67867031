"""Streaming near-dup: planted near-duplicates dropped across batch
boundaries, distinct docs survive, first-occurrence-wins, dropped docs
never poison the filter, snapshot/restore resume identity."""

import numpy as np
import pandas as pd
import ray.data as rd

from cerberus_ray.stages.stream_neardup import (StreamingNearDeduper,
                                                near_dedup_stream)


def _docs(seed=3, n=60):
    rng = np.random.default_rng(seed)
    vocab = [f"w{i}" for i in range(400)]
    return [" ".join(rng.choice(vocab, 40)) for _ in range(n)]


def test_near_dups_dropped_across_batches(ray_session):
    texts = _docs()
    near = [t.replace(t.split()[5], "CHANGED", 1) for t in texts[:10]]
    d = StreamingNearDeduper(n_shards=3, bands=32)
    try:
        k1 = d.feed(pd.DataFrame({"text": texts}))
        assert len(k1) == len(texts)           # all distinct → kept
        k2 = d.feed(pd.DataFrame({"text": near + _docs(seed=5, n=10)}))
        # the 10 near-copies collide on some band; the 10 fresh survive
        assert len(k2) == 10
        assert not any(t in set(near) for t in k2["text"])
    finally:
        d.shutdown()


def test_first_occurrence_within_batch_and_no_poison(ray_session):
    texts = _docs(seed=7, n=5)
    batch = pd.DataFrame({"text": [texts[0], texts[0], texts[1]]})
    d = StreamingNearDeduper(n_shards=2)
    try:
        kept = d.feed(batch)
        assert list(kept["text"]) == [texts[0], texts[1]]
        # a DROPPED duplicate must not have registered anything: a doc
        # near texts[2] (never kept, never seen) passes
        k2 = d.feed(pd.DataFrame({"text": [texts[2]]}))
        assert len(k2) == 1
    finally:
        d.shutdown()


def test_snapshot_restore_resume_identity(ray_session):
    texts = _docs(seed=9, n=30)
    d1 = StreamingNearDeduper(n_shards=2, seed=1)
    try:
        d1.feed(pd.DataFrame({"text": texts[:15]}))
        snap = d1.snapshot()
        a = d1.feed(pd.DataFrame({"text": texts}))  # replay everything
    finally:
        d1.shutdown()
    d2 = StreamingNearDeduper(n_shards=2, seed=1)
    try:
        d2.restore(snap)
        b = d2.feed(pd.DataFrame({"text": texts}))
    finally:
        d2.shutdown()
    pd.testing.assert_frame_equal(a, b)
    assert list(a["text"]) == texts[15:]       # first 15 already seen


def test_dataset_stream_wrapper(ray_session):
    texts = _docs(seed=11, n=40)
    df = pd.DataFrame({"doc_id": range(40), "text": texts + []})
    df = pd.concat([df, df.iloc[:8]], ignore_index=True)  # exact dups
    out = near_dedup_stream(
        rd.from_pandas(df, override_num_blocks=1), batch_size=16,
        n_shards=3).to_pandas()
    assert len(out) == 40                      # the 8 replays dropped
    assert sorted(out["doc_id"]) == list(range(40))
