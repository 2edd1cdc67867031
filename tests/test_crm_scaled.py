"""CRM constraint pack at scale: 20k bookings with injected violation
fractions — per-rule counts must match the generator's exact expectations,
and clean rules must stay silent."""

import time

import pytest
import ray.data as rd

from cerberus_ray.crm.datagen import CrmGenConfig, make_scaled_crm
from cerberus_ray.crm.rules import (
    booking_pets_belong,
    booking_row_ruleset,
    booking_unique_customer_slot,
    charge_row_ruleset,
    payment_row_ruleset,
    run_rowpack,
    slot_capacity,
    slot_overlap,
    slot_row_ruleset,
)


@pytest.fixture(scope="module")
def scaled(ray_session):
    cfg = CrmGenConfig(n_bookings=20_000)
    tables, expected = make_scaled_crm(cfg)
    ds = {k: rd.from_arrow(v) for k, v in tables.items()}
    return ds, expected


def counts(t):
    import collections

    return collections.Counter(t["rule"].to_pylist())


def test_scaled_booking_rules(scaled):
    ds, exp = scaled
    c = counts(run_rowpack(ds["bookings"], booking_row_ruleset()))
    assert c["booking-start-before-end"] == exp["booking-start-before-end"]
    assert c["has-booking-slot"] == exp["has-booking-slot"]
    assert c["enum-state"] == exp["enum-state"]
    for rule in exp:
        assert exp[rule] > 0, rule  # every fraction actually injected


def test_scaled_pets_and_unique(scaled):
    ds, exp = scaled
    v = booking_pets_belong(ds["bookings"], ds["pets"])
    assert v.num_rows == exp["pets-belong-to-customer"]
    assert booking_unique_customer_slot(ds["bookings"]).num_rows == 0


def test_pets_belong_null_and_unknown_edges(ray_session):
    """Null customer_id and unknown pet ids must yield violations (or
    silence when both sides are null), never a crash — the exchange
    carries ids as strings, so huge keys can't alias either."""
    import pyarrow as pa

    bookings = pa.table({
        "booking_id": [1, 2, 3],
        "customer_id": pa.array([None, 7, 2**60 + 1], pa.int64()),
        "pet_ids": pa.array([[10], [11], [12]],
                            pa.list_(pa.int64()))})
    pets = pa.table({
        "pet_id": [10, 11, 12],
        "customer_id": pa.array([5, 7, 2**60 + 2], pa.int64())})
    v = booking_pets_belong(rd.from_arrow(bookings), rd.from_arrow(pets))
    got = dict(zip(v["doc_id"].to_pylist(), v["detail"].to_pylist()))
    assert set(got) == {"1", "3"}  # booking 2 is clean
    assert "belongs to customer 5, booking is for None" in got["1"]
    # 2^60-scale ids compare exactly (float64 would have aliased them)
    assert str(2**60 + 2) in got["3"] and str(2**60 + 1) in got["3"]


def test_scaled_slot_overlap(scaled):
    ds, exp = scaled
    t0 = time.time()
    v = slot_overlap(ds["slots"])
    took = time.time() - t0
    assert v.num_rows == exp["slot-overlap"]
    assert counts(run_rowpack(ds["slots"], slot_row_ruleset())) == {}
    assert took < 120, f"day-bucket sweep too slow: {took:.1f}s"


def test_scaled_charges_payments_capacity(scaled):
    ds, exp = scaled
    c = counts(run_rowpack(ds["charges"], charge_row_ruleset()))
    assert c["paid-on-consistency"] == exp["paid-on-consistency"]
    assert c.get("maxlen-name", 0) == 0
    p = counts(run_rowpack(ds["payments"], payment_row_ruleset()))
    assert p["range-amount"] == exp["range-amount"]
    assert slot_capacity(ds["bookings"], ds["services"]).num_rows == 0


def test_scaled_fsm_side_effects(scaled):
    """pay()-cascade and complete()-creates-charge post-state invariants
    at 20k bookings — exact injected counts; the correct-control
    completions (linked charge == cost) stay silent."""
    from cerberus_ray.crm.rules import (
        booking_completed_charges,
        invoice_paid_charges,
    )

    ds, exp = scaled
    v = counts(booking_completed_charges(ds["bookings"], ds["charges"]))
    assert v["completed-no-charge"] == exp["completed-no-charge"]
    assert v["completed-charge-amount"] == exp["completed-charge-amount"]
    p = counts(invoice_paid_charges(ds["invoices"], ds["charges"]))
    assert p["paid-charges-unpaid"] == exp["paid-charges-unpaid"]


def test_scaled_completed_guard(scaled):
    """can_complete guard at 20k bookings: only the injected completions
    whose end was pushed past the as-of time fire."""
    from cerberus_ray.crm.datagen import scaled_today
    from cerberus_ray.crm.rules import booking_completed_guard

    ds, exp = scaled
    today = scaled_today(CrmGenConfig(n_bookings=20_000))
    v = counts(booking_completed_guard(ds["bookings"], today=today))
    assert v["completed-before-end"] == exp["completed-before-end"]
    assert exp["completed-before-end"] > 0
