"""CRM-shaped deterministic fixtures (FIXTURES.md §3).

Small relational tables named and typed after the reference models, with
violations injected at KNOWN keys so constraint-parity tests can assert
exact (key, rule) outputs — the reference's violating-object test style
(cerberus/tests/test_bookings.py:48-56,108-117,215-248;
test_charges.py:45-88; test_invoices.py:55-104).

All money kept as float64 cents-exact values here (decimal128 semantics
are validated separately; DuckDB oracles use the same doubles).
"""

from __future__ import annotations

from datetime import datetime, timedelta

import pandas as pd
import pyarrow as pa

BASE = datetime(2024, 3, 4, 9, 0)
TODAY = BASE.date() + timedelta(days=30)

#: FSM edge sets (reference: booking.py:429-457; charge.py:85-93;
#: invoice.py:153-241; tests test_bookings.py:252-266, test_charges.py:24-34,
#: test_invoices.py:114-117)
BOOKING_EDGES = {
    ("enquiry", "preliminary"), ("preliminary", "confirmed"),
    ("enquiry", "canceled"), ("preliminary", "canceled"),
    ("confirmed", "canceled"), ("canceled", "enquiry"),
    ("confirmed", "completed"),
}
CHARGE_EDGES = {("unpaid", "paid"), ("unpaid", "void")}
INVOICE_EDGES = {("draft", "unpaid"), ("unpaid", "paid"),
                 ("draft", "void"), ("unpaid", "void")}

BOOKING_STATES = ["enquiry", "preliminary", "confirmed", "canceled", "completed"]
CHARGE_STATES = ["unpaid", "paid", "void", "refund"]
INVOICE_STATES = ["draft", "unpaid", "paid", "void"]


def make_crm_tables() -> tuple[dict, list]:
    """→ ({table_name: pa.Table}, expected [(key, rule), ...])."""
    expected: list[tuple[str, str]] = []

    customers = pd.DataFrame([
        # cid, first, last, invoice_email, active
        (1, "Ada", "Lovelace", "ada@example.com", True),
        (2, "Alan", "Turing", "alan@example.com", True),
        (3, "Grace", "Hopper", "", True),                    # no invoice email
        (4, "Tom", "Smith & Jones", "tj@example.com", True),  # suspicious last name
        (5, "Eva", "Green", "eva@example.com", False),
    ], columns=["customer_id", "first_name", "last_name", "invoice_email",
                "active"])
    customers["name"] = customers["first_name"] + " " + customers["last_name"]
    expected += [("3", "no-invoice-email"), ("4", "suspicious-last-name")]

    pets = pd.DataFrame([
        (1, "Rex", 1), (2, "Fido", 1), (3, "Spot", 2), (4, "Bella", 2),
        (5, "Milo", 3), (6, "Luna", 4), (7, "Max", 5), (8, "Daisy", 5),
    ], columns=["pet_id", "name", "customer_id"])

    services = pd.DataFrame([
        (1, "Walk", 30.0, 2, 2),     # max_pet=2, max_customer=2
        (2, "Daycare", 55.0, 4, 3),
    ], columns=["service_id", "name", "cost", "max_pet", "max_customer"])

    h = timedelta(hours=1)
    slots = pd.DataFrame([
        # slot_id, service_id, start, end
        (1, 1, BASE, BASE + h),
        (2, 1, BASE + 2 * h, BASE + 3 * h),
        (3, 2, BASE + 4 * h, BASE + 6 * h),
        (4, 1, BASE + 2.5 * h, BASE + 3.5 * h),   # overlaps slot 2
        (5, 2, BASE + 26 * h, BASE + 28 * h),     # next day — no overlap
        (6, 1, BASE + 8 * h, BASE + 7 * h),       # end < start
        # distinct far-out days for the completed-booking fixtures
        (7, 1, BASE + 50 * h, BASE + 51 * h),
        (8, 1, BASE + 74 * h, BASE + 75 * h),
        (9, 1, BASE + 98 * h, BASE + 99 * h),
        (10, 1, BASE + 35 * 24 * h, BASE + 35 * 24 * h + h),  # after TODAY
    ], columns=["slot_id", "service_id", "start", "end"])
    expected += [("2|4", "slot-overlap"), ("6", "slot-start-before-end")]

    bookings = pd.DataFrame([
        # bid, cust, service, slot, state, start, end, cost, pet_ids
        (1, 1, 1, 1, "confirmed", BASE, BASE + h, 30.0, [1, 2]),
        (2, 2, 1, 2, "confirmed", BASE + 2 * h, BASE + 3 * h, 30.0, [3]),
        (3, 3, 2, 3, "enquiry", BASE + 4 * h, BASE + 6 * h, 55.0, [5]),
        (4, 4, 2, 3, "confirmed", BASE + 4 * h, BASE + 6 * h, 55.0, [6]),
        (5, 5, 2, 3, "confirmed", BASE + 4 * h, BASE + 6 * h, 55.0, [7, 8]),
        # canceled but still holding a slot (has_booking_slot violation)
        (6, 1, 1, 2, "canceled", BASE + 2 * h, BASE + 3 * h, 30.0, [1]),
        # active with NO slot (other side of the conditional)
        (7, 2, 1, None, "confirmed", BASE + 5 * h, BASE + 6 * h, 30.0, [3]),
        # start >= end
        (8, 2, 1, 5, "confirmed", BASE + 28 * h, BASE + 26 * h, 30.0, [4]),
        # duplicate (customer, slot) with booking 1
        (9, 1, 1, 1, "preliminary", BASE, BASE + h, 30.0, [2]),
        # pet 3 belongs to customer 2, booked by customer 1
        (10, 1, 1, 2, "confirmed", BASE + 2 * h, BASE + 3 * h, 30.0, [3]),
        # bogus state
        (11, 2, 1, 5, "lost", BASE + 26 * h, BASE + 28 * h, 30.0, [4]),
        # completed WITH a matching booking charge (clean)
        (12, 3, 1, 7, "completed", BASE + 50 * h, BASE + 51 * h, 30.0, [5]),
        # completed with NO booking charge (complete() must create one)
        (13, 4, 1, 8, "completed", BASE + 74 * h, BASE + 75 * h, 30.0, [6]),
        # completed whose booking charge amount != cost
        (14, 5, 1, 9, "completed", BASE + 98 * h, BASE + 99 * h, 30.0, [7]),
        # completed although end is after TODAY (can_complete guard)
        (15, 3, 1, 10, "completed", BASE + 35 * 24 * h,
         BASE + 35 * 24 * h + h, 30.0, [5]),
    ], columns=["booking_id", "customer_id", "service_id", "slot_id", "state",
                "start", "end", "cost", "pet_ids"])
    expected += [
        ("6", "has-booking-slot"), ("7", "has-booking-slot"),
        ("8", "booking-start-before-end"),
        ("1|1", "unique-customer-slot"),   # bookings 1 and 9
        ("1|2", "unique-customer-slot"),   # bookings 6 and 10
        ("2|5", "unique-customer-slot"),   # bookings 8 and 11
        ("10", "pets-belong-to-customer"),
        ("11", "enum-state"),
        ("13", "completed-no-charge"),
        ("14", "completed-charge-amount"),
        ("15", "completed-before-end"),
        ("2", "sent-with-customer-issues"),  # invoice 2 → customer 3 (issues)
    ]
    # slot 3 capacity: service 2 allows max_pet=4 — bookings 3,4,5 carry
    # 1+1+2 = 4 pets (OK) but distinct customers 3 > max_customer=3? == 3 OK.
    # slot 1: bookings 1 and 9 → pets 2+1=3 > max_pet=2 AND within service 1.
    expected += [("1", "slot-max-pets")]

    charges = pd.DataFrame([
        # charge_id, name, line, qty, state, paid_on, parent, cust, invoice
        (1, "Walk x2", 30.0, 2, "paid", BASE + 40 * h, None, 1, 1),
        (2, "Daycare", 55.0, 1, "unpaid", None, None, 3, 2),
        (3, "Walk", 30.0, 1, "paid", None, None, 2, 3),   # paid w/o paid_on
        (4, "Walk - Refund", -30.0, 1, "refund", None, 1, 1, None),
        (5, "Walk - Refund", -40.0, 1, "refund", None, 1, 1, None),  # over-refund (70 > 60)
        (6, "x" * 300, 10.0, 1, "unpaid", None, None, 2, None),      # name too long
        (7, "Stray", 15.0, 1, "unpaid", BASE, None, 2, None),        # unpaid with paid_on
        # booking charges (Booking.complete() side-effect rows)
        (8, "Walk", 30.0, 1, "unpaid", None, None, 3, None),    # booking 12, matches cost
        (9, "Walk", 10.0, 1, "unpaid", None, None, 5, None),    # booking 14, wrong amount
        # a PAID invoice (5) still carrying an unpaid charge (pay() must cascade)
        (10, "Groom", 20.0, 1, "unpaid", None, None, 5, 5),
        (11, "Walk", 30.0, 1, "unpaid", None, None, 3, None),  # booking 15
    ], columns=["charge_id", "name", "line", "quantity", "state", "paid_on",
                "parent_charge_id", "customer_id", "invoice_id"])
    charges["booking_id"] = pd.array(
        [None, None, None, None, None, None, None, 12, 14, None, 15],
        dtype="Int64")
    expected += [("3", "paid-on-consistency"), ("7", "paid-on-consistency"),
                 ("1", "refund-exceeds-charge"), ("6", "maxlen-name")]

    invoices = pd.DataFrame([
        # invoice_id, customer_id, state, due, adjustment, total, overdue(stored)
        (1, 1, "paid", TODAY - timedelta(days=10), 0.0, 60.0, False),
        (2, 3, "unpaid", TODAY - timedelta(days=1), 5.0, 60.0, True),
        (3, 2, "unpaid", TODAY + timedelta(days=5), 0.0, 99.0, True),
        (4, 4, "draft", None, 0.0, 0.0, False),
        # paid, payments cover total, but charge 10 is still unpaid
        (5, 5, "paid", TODAY - timedelta(days=2), 0.0, 20.0, False),
    ], columns=["invoice_id", "customer_id", "state", "due", "adjustment",
                "total", "overdue"])
    # invoice 3: stored total 99 != recomputed 30 (charge 3)  → A3 violation
    # invoice 3: stored overdue=True but due in future → M22 parity violation
    expected += [("3", "invoice-total-consistency"), ("3", "overdue-parity"),
                 ("5", "paid-charges-unpaid")]

    payments = pd.DataFrame([
        (1, 1, 1, 60.0),
        (2, 2, 3, 30.0),
        (3, 2, 3, -5.0),    # negative amount
        (4, 5, 5, 20.0),    # invoice 5 fully paid (isolates the cascade rule)
    ], columns=["payment_id", "invoice_id", "customer_id", "amount"])
    expected += [("3", "range-amount")]
    # invoice 1 is paid and Σ payments == 60 == total → OK

    # frozen-field snapshot (M23): invoice 2 changed adjustment post-draft
    invoices_snapshot = invoices.copy()
    invoices_snapshot.loc[invoices_snapshot.invoice_id == 2, "adjustment"] = 2.0
    expected += [("2", "frozen-adjustment")]

    state_log = pd.DataFrame([
        # entity, entity_id, ts, source, target
        ("booking", 1, BASE, "enquiry", "preliminary"),
        ("booking", 1, BASE + h, "preliminary", "confirmed"),
        ("booking", 2, BASE, "enquiry", "confirmed"),         # illegal edge
        ("charge", 1, BASE, "unpaid", "paid"),
        ("charge", 2, BASE, "paid", "unpaid"),                # illegal edge
        ("invoice", 1, BASE, "draft", "unpaid"),
        ("invoice", 1, BASE + h, "unpaid", "paid"),
        ("invoice", 2, BASE, "draft", "unpaid"),
        ("invoice", 2, BASE + 2 * h, "draft", "void"),        # broken chain
    ], columns=["entity", "entity_id", "ts", "source", "target"])
    expected += [("booking|2", "fsm-illegal-edge"),
                 ("charge|2", "fsm-illegal-edge"),
                 ("invoice|2", "fsm-broken-chain")]

    contacts = pd.DataFrame([
        (1, 1, "Home", "+441234567890"),
        (2, 1, "Email", "ada@example.com"),
        (3, 2, "Mobile", "07234567890"),      # customer 2: no email contact
        (4, 3, "Email", "grace@example.com"),
        (5, 4, "Email", "tj@example.com"),
        (6, 5, "Email", "eva@example.com"),
        (7, 5, "Email2", "eva2@example.com"),
    ], columns=["contact_id", "customer_id", "name", "details"])
    expected += [("2", "no-email-contact")]

    tables = {
        "customers": customers, "pets": pets, "services": services,
        "slots": slots, "bookings": bookings, "charges": charges,
        "invoices": invoices, "invoices_snapshot": invoices_snapshot,
        "payments": payments, "state_log": state_log, "contacts": contacts,
    }
    return ({k: pa.Table.from_pandas(v, preserve_index=False)
             for k, v in tables.items()}, sorted(set(expected)))


def expected_crm_violations() -> pa.Table:
    """The full EXPECTED violation table for the fixture corpus —
    hand-derived row by row from the injections documented in
    :func:`make_crm_tables`, never by running the validator (the
    reference's golden-fixture style, cerberus/tests/
    test_invoices.py:107-131 applied to the whole rule pack). This is
    the oracle side of the ``crm_violations`` driver query: DuckDB
    serves it from golden parquet while the engine recomputes the same
    rows from the raw tables, so the two paths stay independent.

    Derivations (fixture line → expected row):
    - charge 1 totals 30×2 = 60; refunds 4+5 total 30+40 = 70 > 60.
    - slot 1 holds bookings 1 (+9): 2+1 = 3 pets > service-1 max_pet 2.
    - booking 10 books pet 3 (owner: customer 2) for customer 1.
    - booking 11 carries state 'lost' ∉ BOOKING_STATES.
    - bookings 13/14: completed without / with-wrong-amount charge.
    - booking 15 completed although end (BASE+35d+1h) ≥ TODAY's asof.
    - (customer, slot) pairs 1|1, 1|2, 2|5 each appear twice.
    - invoice 2's snapshot adjustment 2.0 → current 5.0 (frozen field);
      its customer 3 has issues (no invoice email) although it was sent.
    - customer 2 has no Email contact; slots 2 and 4 overlap.
    - invoice 3: stored total 99 ≠ recomputed 30 (charge 3), stored
      overdue=True although due is in the future.
    - charges 3 (paid, no paid_on) and 7 (unpaid, paid_on set).
    - payment 3 amount −5 < 0; customer 4's last name has '&';
      invoice 5 paid while charge 10 stays unpaid.
    - booking 6 canceled-with-slot / 7 active-without; charge 6 name is
      300 chars; slot 6 ends before it starts; booking 8 too.
    - state_log: booking 2 enquiry→confirmed (illegal edge), charge 2
      paid→unpaid (illegal edge), invoice 2 unpaid → log restarts at
      draft (broken chain).
    """
    asof = datetime(TODAY.year, TODAY.month, TODAY.day)
    end15 = BASE + timedelta(hours=35 * 24 + 1)
    states = sorted(BOOKING_STATES)
    rows = [
        ("1", "refund-exceeds-charge", "line",
         "refunded 70.00 > charge 60.00"),
        ("1", "slot-max-pets", "pet_ids", "3 pets > max 2 for service 1"),
        ("10", "pets-belong-to-customer", "pet_ids",
         "pet 3 belongs to customer 2, booking is for 1"),
        ("11", "enum-state", "state", f"value lost not in {states}"),
        ("13", "completed-no-charge", "charges",
         "completed booking has no booking charge"),
        ("14", "completed-charge-amount", "charges",
         "no booking charge matches cost 30.00 (got [10.0])"),
        ("15", "completed-before-end", "end",
         f"completed booking ends {end15} — not before {asof}"),
        ("1|1", "unique-customer-slot", "customer_id,slot_id", "count=2"),
        ("1|2", "unique-customer-slot", "customer_id,slot_id", "count=2"),
        ("2", "frozen-adjustment", "adjustment",
         "frozen field changed from 2.0 to 5.0"),
        ("2", "no-email-contact", "contacts",
         "customer has no email contact"),
        ("2", "sent-with-customer-issues", "customer_id",
         "invoice was sent but customer 3 has issues"),
        ("2|4", "slot-overlap", "start,end", "slots 2 and 4 overlap"),
        ("2|5", "unique-customer-slot", "customer_id,slot_id", "count=2"),
        ("3", "invoice-total-consistency", "total",
         "stored 99.00 != recomputed 30.00"),
        ("3", "no-invoice-email", "invoice_email", "no invoice email set"),
        ("3", "overdue-parity", "overdue",
         "stored overdue=True disagrees with recomputation"),
        ("3", "paid-on-consistency", "paid_on",
         "paid_on must be set iff the charge has been paid"),
        ("3", "range-amount", "amount", "value -5.0 outside [0, None]"),
        ("4", "suspicious-last-name", "last_name",
         "last name doesn't look right"),
        ("5", "paid-charges-unpaid", "charges",
         "1 charge(s) not paid on a paid invoice"),
        ("6", "has-booking-slot", "slot_id",
         "canceled bookings must have no slot; "
         "active bookings must have one"),
        ("6", "maxlen-name", "name", "length 300 > max 255"),
        ("6", "slot-start-before-end", "start",
         "slot start must be before end"),
        ("7", "has-booking-slot", "slot_id",
         "canceled bookings must have no slot; "
         "active bookings must have one"),
        ("7", "paid-on-consistency", "paid_on",
         "paid_on must be set iff the charge has been paid"),
        ("8", "booking-start-before-end", "start",
         "start must be before end"),
        ("booking|2", "fsm-illegal-edge", "state",
         "enquiry→confirmed not allowed"),
        ("charge|2", "fsm-illegal-edge", "state",
         "paid→unpaid not allowed"),
        ("invoice|2", "fsm-broken-chain", "state",
         "log jumps from unpaid to draft"),
    ]
    cols = list(zip(*sorted(rows)))
    return pa.Table.from_arrays(
        [pa.array(list(c), type=pa.string()) for c in cols],
        names=["doc_id", "rule", "path", "detail"])
