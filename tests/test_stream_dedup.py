"""Streaming online dedup: incremental actor-held seen-sets must drop
exactly the non-first occurrences across batch boundaries, match the
batch dedup on the same feed order, and survive snapshot/restore."""

import pandas as pd
import pytest
import ray.data as rd

from cerberus_ray.stages.stream_dedup import StreamingDeduper, dedup_stream


def corpus():
    rows = []
    for i in range(50):
        rows.append({"doc_id": i, "text": f"unique document number {i}"})
    # duplicates of doc 3 and 7 scattered later in the feed
    rows.insert(20, {"doc_id": 100, "text": "unique document number 3"})
    rows.insert(40, {"doc_id": 101, "text": "unique document number 7"})
    rows.append({"doc_id": 102, "text": "unique document number 3"})
    return pd.DataFrame(rows)


def test_stream_dedup_keeps_first_occurrence(ray_session):
    out = dedup_stream(rd.from_pandas(corpus()), n_shards=3,
                       batch_size=8).to_pandas()
    assert len(out) == 50
    kept = set(out["doc_id"])
    assert {100, 101, 102}.isdisjoint(kept)  # later copies dropped
    assert {3, 7} <= kept                    # first occurrences kept


def test_stream_dedup_duplicates_within_one_batch(ray_session):
    d = StreamingDeduper(n_shards=2)
    try:
        b = pd.DataFrame({"doc_id": [1, 2, 3],
                          "text": ["same", "same", "other"]})
        kept = d.feed(b)
        assert kept["doc_id"].tolist() == [1, 3]
        assert d.n_seen() == 2
    finally:
        d.shutdown()


def test_stream_dedup_matches_batch_dedup_on_feed_order(ray_session):
    """Same kept SET as batch exact dedup when feed order == min-key
    order (doc ids ascending along the stream for originals)."""
    from cerberus_ray.pipelines.dedup import exact_dedup_keep_first

    df = corpus()
    stream_kept = set(dedup_stream(rd.from_pandas(df), n_shards=2,
                                   batch_size=8).to_pandas()["text"])
    batch_kept = set(exact_dedup_keep_first(
        rd.from_pandas(df)).to_pandas()["text"])
    assert stream_kept == batch_kept


def test_stream_dedup_snapshot_restore(ray_session):
    d = StreamingDeduper(n_shards=2)
    try:
        d.feed(pd.DataFrame({"doc_id": [1], "text": ["alpha"]}))
        snaps = d.snapshot()
    finally:
        d.shutdown()

    d2 = StreamingDeduper(n_shards=2)
    try:
        d2.restore(snaps)
        kept = d2.feed(pd.DataFrame({"doc_id": [2, 3],
                                     "text": ["alpha", "beta"]}))
        assert kept["doc_id"].tolist() == [3]  # pre-snapshot doc still seen
    finally:
        d2.shutdown()
