"""Decimal money semantics (SURVEY.md §7 hard part e): rules over
decimal128 columns must not round-trip through float — pyarrow decimal
kernels keep ORM-Decimal exactness (reference: MoneyField max_digits=14,
cerberus/models/charge.py:124-126 amount = line * quantity)."""

from decimal import Decimal

import pyarrow as pa
import pyarrow.compute as pc

from cerberus_ray.rules.core import range_rule


def dec(v):
    return Decimal(v)


def test_range_rule_on_decimal_column():
    t = pa.Table.from_arrays(
        [pa.array([1, 2, 3], type=pa.int64()),
         pa.array([dec("10.00"), dec("-0.01"), dec("0.00")],
                  type=pa.decimal128(14, 2))],
        names=["payment_id", "amount"])
    rule = range_rule("payment_id", "amount", lo=0)
    out = rule(t)
    assert out["doc_id"].to_pylist() == ["2"]
    assert "-0.01" in out["detail"][0].as_py()


def test_decimal_amount_arithmetic_is_exact():
    """line × quantity in decimal128 stays exact where float64 drifts."""
    line = pa.array([dec("0.10")] * 3, type=pa.decimal128(14, 2))
    qty = pa.array([3, 7, 9], type=pa.int32())
    amount = pc.multiply(line, pc.cast(qty, pa.decimal128(14, 0)))
    assert [a.as_py() for a in amount] == [dec("0.30"), dec("0.70"),
                                           dec("0.90")]
    # and a grouped decimal sum is exact
    t = pa.Table.from_arrays(
        [pa.array([1, 1, 1], type=pa.int64()), amount], names=["k", "v"])
    g = t.group_by("k").aggregate([("v", "sum")])
    assert g["v_sum"][0].as_py() == dec("1.90")


def test_decimal_totals_consistency_exact():
    """A3 dual-path check in pure decimal: stored == adjustment + Σ line×qty
    with EXACT equality (no float tolerance)."""
    charges = pa.Table.from_arrays(
        [pa.array([1, 1, 2], type=pa.int64()),
         pa.array([dec("19.99"), dec("0.01"), dec("5.00")],
                  type=pa.decimal128(14, 2)),
         pa.array([3, 1, 2], type=pa.int32())],
        names=["invoice_id", "line", "quantity"])
    v = pc.multiply(charges["line"],
                    pc.cast(charges["quantity"], pa.decimal128(14, 0)))
    t = pa.Table.from_arrays([charges["invoice_id"], v], names=["k", "v"])
    sums = dict(zip(*[c.to_pylist() for c in
                      t.group_by("k").aggregate([("v", "sum")]).columns]))
    assert sums[1] == dec("59.98")   # 19.99*3 + 0.01 — float64 would give 59.980000000000004
    assert sums[2] == dec("10.00")


def test_invoice_total_consistency_decimal_exact(ray_session):
    """The CRM A3 check goes decimal-exact when money columns are
    decimal128: a 0.001 drift (inside the float tolerance) is caught."""
    import ray.data as rd

    from cerberus_ray.crm.rules import invoice_total_consistency

    charges = pa.Table.from_arrays(
        [pa.array([1, 2], type=pa.int64()),
         pa.array([dec("19.99"), dec("5.00")], type=pa.decimal128(14, 2)),
         pa.array([3, 2], type=pa.int32()),
         pa.array(["unpaid", "unpaid"], type=pa.string())],
        names=["invoice_id", "line", "quantity", "state"])
    invoices = pa.Table.from_arrays(
        [pa.array([1, 2], type=pa.int64()),
         pa.array([dec("0.00"), dec("0.01")], type=pa.decimal128(14, 2)),
         # invoice 1 exact (59.97); invoice 2 stored off by exactly 0.01
         pa.array([dec("59.97"), dec("10.00")], type=pa.decimal128(14, 2))],
        names=["invoice_id", "adjustment", "total"])
    out = invoice_total_consistency(rd.from_arrow(invoices),
                                    rd.from_arrow(charges)).to_pandas()
    assert out["doc_id"].tolist() == ["2"]
    assert "10.00" in out["detail"].iloc[0] and "10.01" in out["detail"].iloc[0]
