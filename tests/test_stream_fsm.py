"""Streaming FSM validation: incremental actor-held state must agree with
the batch replay, survive batch splits, and snapshot/restore."""

import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from cerberus_ray.crm.fixtures import (
    BASE,
    BOOKING_EDGES,
    CHARGE_EDGES,
    INVOICE_EDGES,
    make_crm_tables,
)
from cerberus_ray.stages.stream_fsm import StreamingFSMValidator, validate_stream

EDGES = {"booking": BOOKING_EDGES, "charge": CHARGE_EDGES,
         "invoice": INVOICE_EDGES}


def rows(t: pa.Table):
    return sorted(zip(t["doc_id"].to_pylist(), t["rule"].to_pylist()))


def test_stream_matches_batch_replay(ray_session):
    tables, _ = make_crm_tables()
    log_ds = rd.from_arrow(tables["state_log"])
    stream_v = validate_stream(log_ds, EDGES, n_shards=3, batch_size=2)

    from cerberus_ray.crm.rules import fsm_log_validity

    batch_v = fsm_log_validity(rd.from_arrow(tables["state_log"]))
    assert rows(stream_v) == rows(batch_v)


def test_state_persists_across_batches(ray_session):
    """The broken chain spans two separate fed batches — only held actor
    state can catch it."""
    v = StreamingFSMValidator(EDGES, n_shards=2)
    try:
        b1 = pd.DataFrame([("invoice", 7, BASE, "draft", "unpaid")],
                          columns=["entity", "entity_id", "ts", "source",
                                   "target"])
        b2 = pd.DataFrame([("invoice", 7, BASE + pd.Timedelta(hours=1),
                            "draft", "void")],
                          columns=["entity", "entity_id", "ts", "source",
                                   "target"])
        v.feed(b1)
        v.feed(b2)
        out = v.collect()
        assert rows(out) == [("invoice|7", "fsm-broken-chain")]
    finally:
        v.shutdown()


def test_snapshot_restore(ray_session):
    v = StreamingFSMValidator(EDGES, n_shards=2)
    try:
        v.feed(pd.DataFrame([("charge", 3, BASE, "unpaid", "paid")],
                            columns=["entity", "entity_id", "ts", "source",
                                     "target"]))
        v.collect()
        snaps = v.snapshot()
        assert any(s["state"].get("charge|3") == "paid" for s in snaps)
        assert any("charge|3" in s["last_ts"] for s in snaps)
    finally:
        v.shutdown()

    # a fresh validator restored from the snapshot continues the stream
    v2 = StreamingFSMValidator(EDGES, n_shards=2)
    try:
        v2.restore(snaps)
        # illegal continuation: paid → unpaid (not an edge, and chain holds)
        v2.feed(pd.DataFrame(
            [("charge", 3, BASE + pd.Timedelta(hours=1), "unpaid", "void")],
            columns=["entity", "entity_id", "ts", "source", "target"]))
        out = v2.collect()
        assert ("charge|3", "fsm-broken-chain") in rows(out)
    finally:
        v2.shutdown()


def test_out_of_order_feed_flagged(ray_session):
    v = StreamingFSMValidator(EDGES, n_shards=1)
    try:
        later = pd.DataFrame(
            [("invoice", 9, BASE + pd.Timedelta(hours=2), "draft", "unpaid")],
            columns=["entity", "entity_id", "ts", "source", "target"])
        earlier = pd.DataFrame(
            [("invoice", 9, BASE, "unpaid", "paid")],
            columns=["entity", "entity_id", "ts", "source", "target"])
        v.feed(later)
        v.feed(earlier)  # violates the ts-ordered contract
        out = v.collect()
        assert ("invoice|9", "fsm-out-of-order-feed") in rows(out)
    finally:
        v.shutdown()


def test_out_of_order_detection_survives_restore(ray_session):
    """last_ts is part of the snapshot: an event older than the
    last-processed ts BEFORE the snapshot is still flagged after a fresh
    validator restores from it."""
    v = StreamingFSMValidator(EDGES, n_shards=1)
    try:
        v.feed(pd.DataFrame(
            [("invoice", 11, BASE + pd.Timedelta(hours=5), "draft", "unpaid")],
            columns=["entity", "entity_id", "ts", "source", "target"]))
        v.collect()
        snaps = v.snapshot()
    finally:
        v.shutdown()

    v2 = StreamingFSMValidator(EDGES, n_shards=1)
    try:
        v2.restore(snaps)
        v2.feed(pd.DataFrame(
            [("invoice", 11, BASE, "unpaid", "paid")],  # older than pre-snap ts
            columns=["entity", "entity_id", "ts", "source", "target"]))
        assert ("invoice|11", "fsm-out-of-order-feed") in rows(v2.collect())
    finally:
        v2.shutdown()


def test_equal_ts_ties_replay_in_feed_order(ray_session):
    """Stable in-batch sort: two transitions with the SAME ts must apply
    in feed order every run (mergesort), keeping the chain legal."""
    for _ in range(3):
        v = StreamingFSMValidator(EDGES, n_shards=1)
        try:
            b = pd.DataFrame(
                [("invoice", 13, BASE, "draft", "unpaid"),
                 ("invoice", 13, BASE, "unpaid", "paid")],  # same ts
                columns=["entity", "entity_id", "ts", "source", "target"])
            v.feed(b)
            assert rows(v.collect()) == []  # in-order: no broken chain
        finally:
            v.shutdown()


def test_out_of_order_event_is_flagged_and_dropped(ray_session):
    """A stale event must flag fsm-out-of-order-feed and be DROPPED —
    applying it to newer held state would cascade spurious broken-chain
    violations the batch replay (global sort) never reports."""
    import pandas as pd

    from cerberus_ray.crm.fixtures import BOOKING_EDGES
    from cerberus_ray.stages.stream_fsm import StreamingFSMValidator

    v = StreamingFSMValidator({"booking": BOOKING_EDGES}, n_shards=2)
    try:
        t = pd.Timestamp
        v.feed(pd.DataFrame({
            "entity": ["booking"] * 2, "entity_id": [1, 1],
            "source": ["enquiry", "preliminary"],
            "target": ["preliminary", "confirmed"],
            "ts": [t("2024-01-01"), t("2024-01-02")]}))
        # stale event arrives late: must not rewind held state
        v.feed(pd.DataFrame({
            "entity": ["booking"], "entity_id": [1],
            "source": ["enquiry"], "target": ["preliminary"],
            "ts": [t("2024-01-01T06:00")]}))
        # next legitimate event continues from 'confirmed' cleanly
        v.feed(pd.DataFrame({
            "entity": ["booking"], "entity_id": [1],
            "source": ["confirmed"], "target": ["completed"],
            "ts": [t("2024-01-03")]}))
        out = v.collect().to_pandas()
        assert list(out["rule"]) == ["fsm-out-of-order-feed"]
    finally:
        v.shutdown()


def test_string_entity_ids_supported(ray_session):
    import pandas as pd

    from cerberus_ray.crm.fixtures import BOOKING_EDGES
    from cerberus_ray.stages.stream_fsm import StreamingFSMValidator

    v = StreamingFSMValidator({"booking": BOOKING_EDGES}, n_shards=2)
    try:
        v.feed(pd.DataFrame({
            "entity": ["booking"], "entity_id": ["b7f3-uuid"],
            "source": ["enquiry"], "target": ["preliminary"],
            "ts": [pd.Timestamp("2024-01-01")]}))
        assert v.collect().num_rows == 0
    finally:
        v.shutdown()


def test_restore_rejects_shard_count_mismatch(ray_session):
    from cerberus_ray.crm.fixtures import BOOKING_EDGES
    from cerberus_ray.stages.stream_fsm import StreamingFSMValidator

    a = StreamingFSMValidator({"booking": BOOKING_EDGES}, n_shards=2)
    b = StreamingFSMValidator({"booking": BOOKING_EDGES}, n_shards=4)
    try:
        with pytest.raises(ValueError, match="shards"):
            b.restore(a.snapshot())
    finally:
        a.shutdown()
        b.shutdown()
