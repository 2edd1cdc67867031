"""CRM constraint-parity: the full rule pack over the fixture tables must
produce EXACTLY the injected (key, rule) set — rule-for-rule parity with
the reference's constraint tests (SURVEY.md §5 styles 1-3)."""

import pyarrow as pa
import pytest

from cerberus_ray.crm.fixtures import TODAY, make_crm_tables
from cerberus_ray.crm.rules import run_crm_pack


@pytest.fixture(scope="module")
def result(ray_session):
    tables, expected = make_crm_tables()
    out = run_crm_pack(tables, today=TODAY)
    return out, expected


def test_exact_violation_set(result):
    out, expected = result
    got = sorted(set(zip(out["doc_id"].to_pylist(), out["rule"].to_pylist())))
    assert got == expected, (
        f"missing={sorted(set(expected) - set(got))} "
        f"extra={sorted(set(got) - set(expected))}")


def test_golden_table_matches_pack(result):
    """Full-table golden parity: the validator's output equals the
    hand-derived expected table from fixture bookkeeping ROW FOR ROW
    (doc_id, rule, path, detail) — the dual-path gate behind the
    crm_violations DuckDB oracle."""
    from cerberus_ray.crm.fixtures import expected_crm_violations

    out, _ = result
    got = out.sort_by([("doc_id", "ascending"), ("rule", "ascending"),
                       ("path", "ascending"), ("detail", "ascending")])
    golden = expected_crm_violations()
    assert got.num_rows == golden.num_rows
    for col in ("doc_id", "rule", "path", "detail"):
        assert got[col].to_pylist() == golden[col].to_pylist(), col


def test_golden_table_consistent_with_key_rule_list(result):
    """The golden table and make_crm_tables' (key, rule) bookkeeping
    must describe the same injection set."""
    from cerberus_ray.crm.fixtures import expected_crm_violations

    _, expected = result
    golden = expected_crm_violations()
    got = sorted(set(zip(golden["doc_id"].to_pylist(),
                         golden["rule"].to_pylist())))
    assert got == expected


def test_details_are_informative(result):
    out, _ = result
    details = out["detail"].to_pylist()
    assert all(d for d in details)
    by_rule = dict(zip(out["rule"].to_pylist(), details))
    assert "pets" in by_rule["slot-max-pets"]
    assert "→" in by_rule["fsm-illegal-edge"]
    assert "refunded" in by_rule["refund-exceeds-charge"]


def test_clean_subset_passes(ray_session):
    """Dropping the injected rows leaves a violation-free corpus for the
    row-local packs (sanity that rules don't overfire)."""
    import ray.data as rd

    from cerberus_ray.crm.rules import (
        booking_row_ruleset,
        charge_row_ruleset,
        run_rowpack,
    )

    tables, _ = make_crm_tables()
    bookings = tables["bookings"].to_pandas()
    clean = bookings[~bookings["booking_id"].isin([6, 7, 8, 11])]
    out = run_rowpack(rd.from_pandas(clean), booking_row_ruleset())
    assert out.num_rows == 0

    charges = tables["charges"].to_pandas()
    cleanc = charges[~charges["charge_id"].isin([3, 6, 7])]
    out = run_rowpack(rd.from_pandas(cleanc), charge_row_ruleset())
    assert out.num_rows == 0


def test_fsm_legal_chains_pass(ray_session):
    import pandas as pd
    import ray.data as rd

    from cerberus_ray.crm.fixtures import BASE
    from cerberus_ray.crm.rules import fsm_log_validity

    log = pd.DataFrame([
        ("booking", 9, BASE, "enquiry", "preliminary"),
        ("booking", 9, BASE + pd.Timedelta(hours=1), "preliminary", "confirmed"),
        ("booking", 9, BASE + pd.Timedelta(hours=2), "confirmed", "canceled"),
        ("booking", 9, BASE + pd.Timedelta(hours=3), "canceled", "enquiry"),
    ], columns=["entity", "entity_id", "ts", "source", "target"])
    assert fsm_log_validity(rd.from_pandas(log)).num_rows == 0


def test_slot_overlap_across_midnight(ray_session):
    """Intervals crossing the day boundary are duplicated into both day
    buckets, so an overlap spanning midnight is still detected exactly
    once (SURVEY.md §7 hard part c)."""
    import pandas as pd
    import ray.data as rd

    from cerberus_ray.crm.rules import slot_overlap

    slots = pd.DataFrame([
        (1, 1, pd.Timestamp("2024-03-04 23:00"), pd.Timestamp("2024-03-05 01:00")),
        (2, 1, pd.Timestamp("2024-03-05 00:30"), pd.Timestamp("2024-03-05 02:00")),
        (3, 1, pd.Timestamp("2024-03-05 03:00"), pd.Timestamp("2024-03-05 04:00")),
    ], columns=["slot_id", "service_id", "start", "end"])
    out = slot_overlap(rd.from_pandas(slots)).to_pandas()
    assert out["doc_id"].tolist() == ["1|2"]  # detected once, deduped
