"""Batch repair/normalize/GC jobs (reference management commands §3.3)."""

import pandas as pd
import pyarrow as pa
import ray.data as rd

from cerberus_ray.crm.commands import anonymise, clean_slots, fix_customers
from cerberus_ray.crm.fixtures import make_crm_tables


def test_fix_customers_backfills_single_email(ray_session):
    tables, _ = make_crm_tables()
    out = fix_customers(rd.from_arrow(tables["customers"]),
                        rd.from_arrow(tables["contacts"])).to_pandas()
    out = out.set_index("customer_id")
    # customer 3 had empty invoice_email and exactly one email contact
    assert out.loc[3, "invoice_email"] == "grace@example.com"
    # customer 5 has TWO email contacts → ambiguous, left empty? — it had
    # a non-empty email already; untouched
    assert out.loc[5, "invoice_email"] == "eva@example.com"
    # existing values untouched
    assert out.loc[1, "invoice_email"] == "ada@example.com"


def test_fix_customers_idempotent(ray_session):
    tables, _ = make_crm_tables()
    once = fix_customers(rd.from_arrow(tables["customers"]),
                         rd.from_arrow(tables["contacts"])).to_pandas()
    twice = fix_customers(rd.from_pandas(once),
                          rd.from_arrow(tables["contacts"])).to_pandas()
    pd.testing.assert_frame_equal(once.reset_index(drop=True),
                                  twice.reset_index(drop=True))


def test_anonymise_deterministic_and_strips_pii(ray_session):
    tables, _ = make_crm_tables()
    a = anonymise(rd.from_arrow(tables["customers"])).to_pandas()
    b = anonymise(rd.from_arrow(tables["customers"])).to_pandas()
    pd.testing.assert_frame_equal(a, b)  # seeded → reproducible
    orig = tables["customers"].to_pandas()
    assert not set(a["last_name"]) & set(orig["last_name"])  # PII gone
    assert (a["name"] == a["first_name"] + " " + a["last_name"]).all()


def test_clean_slots_gc(ray_session):
    tables, _ = make_crm_tables()
    kept = clean_slots(rd.from_arrow(tables["slots"]),
                       rd.from_arrow(tables["bookings"])).to_pandas()
    kept_ids = set(kept["slot_id"])
    # slot 4 has no bookings at all; slot 6 (bad interval) also unreferenced
    assert 4 not in kept_ids and 6 not in kept_ids
    # slots 1,2,3,5 are referenced by active bookings
    assert {1, 2, 3, 5} <= kept_ids
