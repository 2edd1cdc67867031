"""CRM constraint rule pack — rule-for-rule parity with the reference's
constraint surface (SURVEY.md §2 tables are the contract).

Every function takes Ray Datasets (or Arrow tables via ray.data.from_arrow)
and returns violation rows (schema.VIOLATIONS). Dimension-sized side
tables are broadcast (ray.put once); keyed aggregates use map-side partial
combine; the interval overlap uses day-bucket grouping with boundary
duplication (SURVEY.md §4 partitioning notes).

Reference citations per rule:
- booking-start-before-end   CheckConstraint start<end (booking.py:268)
- has-booking-slot           conditional CheckConstraint (booking.py:269-273)
- enum-state                 valid_state constraint (booking.py:274)
- unique-customer-slot       unique_together (booking.py:266)
- pets-belong-to-customer    Booking.check_valid (booking.py:298-300)
- slot-max-pets/-customers   MaxPetsError/MaxCustomersError
                             (booking.py:85-96,165-176; service.py:23-24)
- slot-overlap               BookingSlot.get_overlapping (booking.py:72-83)
- slot-start-before-end      slot CheckConstraint (booking.py:51)
- maxlen-name                name[:255] truncation contract (booking.py:340)
- paid-on-consistency        MonitorField paid_on (charge.py:47)
- refund-exceeds-charge      Charge.refund guard (charge.py:95-110)
- invoice-total-consistency  Invoice total dual-path (invoice.py:37-47,283-297)
- paid-le-total / paid-total-mismatch  (invoice.py:211-217)
- range-amount               Payment amount>=0 (invoice.py:360-363)
- overdue-parity             overdue annotation vs property (invoice.py:45,130-132)
- frozen-*                   can_edit frozen fields (invoice.py:92-108)
- no-invoice-email / suspicious-last-name  Customer.issues (customer.py:130-140)
- no-email-contact           fixcustomers census (fixcustomers.py:18-27)
- fsm-illegal-edge / fsm-broken-chain  transition edges + StateLog order
                             (booking.py:429-457, invoice.py:138-151)
- paid-charges-unpaid        pay() cascades charge.pay() (invoice.py:226-231;
                             test_invoices.py:97-104)
- completed-no-charge / completed-charge-amount  complete() creates a charge
                             with amount == cost (booking.py:450-457;
                             test_bookings.py:269-286)
"""

from __future__ import annotations

from typing import Dict, Iterable, List, Set, Tuple

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray

from ..rules.core import RuleSet, enum_domain, expr_rule, max_len, range_rule
from ..schema import VIOLATIONS
from ..stages.uniqueness import duplicate_key_counts
from .fixtures import BOOKING_EDGES, BOOKING_STATES, CHARGE_EDGES, INVOICE_EDGES


def _v(rows: List[Tuple[str, str, str, str]]) -> pa.Table:
    if not rows:
        return VIOLATIONS.empty_table()
    cols = list(zip(*rows))
    return pa.Table.from_arrays([pa.array(list(c), type=pa.string())
                                 for c in cols], schema=VIOLATIONS)


# ---------------------------------------------------------------------------
# row-local rule sets
# ---------------------------------------------------------------------------

def booking_row_ruleset() -> RuleSet:
    k = "booking_id"
    rs = RuleSet(name="booking-row")
    rs.add(expr_rule(k, "booking-start-before-end", "start",
                     "start must be before end",
                     lambda b: pc.greater_equal(b["start"], b["end"])))
    rs.add(expr_rule(
        k, "has-booking-slot", "slot_id",
        "canceled bookings must have no slot; active bookings must have one",
        lambda b: pc.xor(pc.equal(b["state"], "canceled"),
                         pc.is_null(b["slot_id"]))))
    st = enum_domain(k, "state", BOOKING_STATES)
    # reference rule id is 'valid_state'; keep engine-wide 'enum-state' name
    st.name = "enum-state"
    orig_fn = st.fn

    def renamed(batch):
        t = orig_fn(batch)
        if t.num_rows:
            t = t.set_column(1, "rule", pa.array(["enum-state"] * t.num_rows))
        return t

    st.fn = renamed
    rs.add(st)
    return rs


def charge_row_ruleset() -> RuleSet:
    k = "charge_id"
    rs = RuleSet(name="charge-row")
    rs.add(max_len(k, "name", 255))

    def paid_on_bad(b: pa.Table):
        paid_wo = pc.and_(pc.equal(b["state"], "paid"), pc.is_null(b["paid_on"]))
        unpaid_w = pc.and_(pc.equal(b["state"], "unpaid"),
                           pc.is_valid(b["paid_on"]))
        return pc.or_(paid_wo, unpaid_w)

    rs.add(expr_rule(k, "paid-on-consistency", "paid_on",
                     "paid_on must be set iff the charge has been paid",
                     paid_on_bad))
    return rs


def payment_row_ruleset() -> RuleSet:
    return RuleSet([range_rule("payment_id", "amount", lo=0)], name="payment-row")


def customer_issue_ruleset() -> RuleSet:
    k = "customer_id"
    rs = RuleSet(name="customer-issues")
    rs.add(expr_rule(k, "no-invoice-email", "invoice_email",
                     "no invoice email set",
                     lambda b: pc.equal(pc.fill_null(b["invoice_email"], ""), "")))
    rs.add(expr_rule(k, "suspicious-last-name", "last_name",
                     "last name doesn't look right",
                     lambda b: pc.match_substring(
                         pc.fill_null(b["last_name"], ""), "&")))
    return rs


def slot_row_ruleset() -> RuleSet:
    return RuleSet([
        expr_rule("slot_id", "slot-start-before-end", "start",
                  "slot start must be before end",
                  lambda b: pc.greater_equal(b["start"], b["end"]))],
        name="slot-row")


def run_rowpack(ds, ruleset: RuleSet) -> pa.Table:
    out = ds.map_batches(ruleset.evaluate, batch_format="pyarrow").to_pandas()
    if not len(out):
        return VIOLATIONS.empty_table()
    return pa.Table.from_pandas(out, preserve_index=False, schema=VIOLATIONS)


# ---------------------------------------------------------------------------
# keyed / grouped / cross-table rules
# ---------------------------------------------------------------------------

def booking_unique_customer_slot(bookings_ds) -> pa.Table:
    """unique_together (customer, _booking_slot), slot NULLs excluded."""
    nn = bookings_ds.map_batches(
        lambda b: b.filter(pc.is_valid(b["slot_id"])), batch_format="pyarrow")
    # mode='auto': the planner picks driver/cms/shuffle by input size;
    # the raw count (metadata) upper-bounds the filtered lineage so the
    # planner never executes the filter just to size itself
    dup = duplicate_key_counts(nn, ["customer_id", "slot_id"],
                               n_rows_hint=bookings_ds.count())
    rows = []
    for r in dup.to_pylist():
        key = f"{int(r['customer_id'])}|{int(r['slot_id'])}"
        rows.append((key, "unique-customer-slot", "customer_id,slot_id",
                     f"count={int(r['n'])}"))
    return _v(rows)


def booking_pets_belong(bookings_ds, pets_ds) -> pa.Table:
    """All pets on a booking must belong to the booking's customer
    (cross-entity rule, booking.py:298-300).

    Streamed shape: the M2M list explodes VECTORIZED (list_flatten +
    list_parent_indices — no per-row Python) into (pet, booking,
    customer) rows, which meet the pets table on the keyed_compare
    exchange hash-bucketed by pet id; ownership is compared once per
    bucket with a vectorized pandas kernel. Pets is fact-sized at
    target scale — nothing is collected to the driver or broadcast."""
    from ..stages.aggcheck import keyed_compare

    # the customer id rides the exchange as a STRING: exact at any key
    # width (float64 would alias ids past 2^53) and null-safe (a null
    # customer renders as None, like the pre-vectorized rule did)
    def child(b: pa.Table) -> pa.Table:
        pets = b["pet_ids"]
        if isinstance(pets, pa.ChunkedArray):
            pets = pets.combine_chunks()
        flat = pc.list_flatten(pets)
        parent = pc.list_parent_indices(pets)
        bids = pc.cast(b["booking_id"], pa.string()).take(parent)
        custs = pc.cast(b["customer_id"], pa.string()).take(parent)
        return pa.Table.from_arrays(
            [pc.cast(flat, pa.string()), custs,
             pa.array(["c"] * len(flat), type=pa.string()),
             pc.cast(bids, pa.string())],
            names=["k", "v", "src", "extra"])

    def parent(b: pa.Table) -> pa.Table:
        n = b.num_rows
        return pa.Table.from_arrays(
            [pc.cast(b["pet_id"], pa.string()),
             pc.cast(b["customer_id"], pa.string()),
             pa.array(["p"] * n, type=pa.string()),
             pa.array([""] * n, type=pa.string())],
            names=["k", "v", "src", "extra"])

    def compare(d: pd.DataFrame) -> pd.DataFrame:
        ch = d.loc[d["src"] == "c"]
        if not len(ch):
            return pd.DataFrame()
        owner_of = (d.loc[d["src"] == "p"].drop_duplicates("k")
                    .set_index("k")["v"])
        ow = ch["k"].map(owner_of)                    # str, or NaN
        cu = ch["v"]                                  # str, or null
        # exact string compare, null-safe: ok iff equal, or both null
        # (matches the pre-vectorized dict semantics: None == None)
        ok = (ow == cu) | (ow.isna() & cu.isna())
        bad = np.flatnonzero(~ok.to_numpy())
        if not len(bad):
            return pd.DataFrame()
        pets_ = ch["k"].to_numpy()[bad]
        bids = ch["extra"].to_numpy()[bad]
        # NaN → None so details render like the dict-based rule did
        ow_o = ow.astype(object).where(ow.notna(), None).to_numpy()[bad]
        cu_o = cu.astype(object).where(cu.notna(), None).to_numpy()[bad]
        return pd.DataFrame(
            [{"doc_id": bids[i], "rule": "pets-belong-to-customer",
              "path": "pet_ids",
              "detail": f"pet {pets_[i]} belongs to customer {ow_o[i]}, "
                        f"booking is for {cu_o[i]}"}
             for i in range(len(bad))])

    out = keyed_compare(bookings_ds, pets_ds, child_side=child,
                        parent_side=parent, compare=compare).to_pandas()
    if not len(out):
        return VIOLATIONS.empty_table()
    return pa.Table.from_pandas(out, preserve_index=False, schema=VIOLATIONS)


def slot_capacity(bookings_ds, services_ds) -> pa.Table:
    """Per-slot capacity: Σ pets ≤ service.max_pet, distinct customers ≤
    service.max_customer; canceled bookings excluded (ActiveBookingManager
    baseline filter, booking.py:212-214; limits from booking.py:165-176 +
    service.py:23-24).

    Streamed shape: bookings project to (slot, service, n_pets, customer)
    per block and hash-bucket on slot_id (keyed_apply) — the per-slot
    Σpets / distinct-customer aggregate and the threshold compare run as
    ONE vectorized pandas kernel per bucket. Only the services table (a
    true dimension) is collected and broadcast (ray.put once); no
    O(#bookings) driver structure."""
    from ..stages.keyed_window import keyed_apply

    limits = {r["service_id"]: (r["max_pet"], r["max_customer"])
              for r in services_ds.take_all()}
    lref = ray.put(limits)

    def partial(b: pa.Table) -> pa.Table:
        t = b.filter(pc.and_(pc.invert(pc.equal(b["state"], "canceled")),
                             pc.is_valid(b["slot_id"])))
        n_pets = pc.list_value_length(t["pet_ids"])
        return pa.Table.from_arrays(
            [pc.cast(t["slot_id"], pa.int64()), t["service_id"],
             pc.cast(pc.fill_null(n_pets, 0), pa.int64()),
             t["customer_id"]],
            names=["slot_id", "service_id", "n_pets", "customer_id"])

    def check(g: pd.DataFrame) -> pd.DataFrame:
        lim = ray.get(lref)
        agg = (g.groupby("slot_id", as_index=False)
               .agg(svc=("service_id", "first"),
                    tot=("n_pets", "sum"),
                    ncust=("customer_id", "nunique")))
        mp = agg["svc"].map(lambda s: lim.get(s, (10**9, 10**9))[0])
        mcst = agg["svc"].map(lambda s: lim.get(s, (10**9, 10**9))[1])
        rows = []
        for i in np.flatnonzero(agg["tot"].to_numpy() > mp.to_numpy()):
            rows.append({"doc_id": str(int(agg["slot_id"][i])),
                         "rule": "slot-max-pets", "path": "pet_ids",
                         "detail": f"{int(agg['tot'][i])} pets > max "
                                   f"{mp[i]} for service {agg['svc'][i]}"})
        for i in np.flatnonzero(agg["ncust"].to_numpy() > mcst.to_numpy()):
            rows.append({"doc_id": str(int(agg["slot_id"][i])),
                         "rule": "slot-max-customers",
                         "path": "customer_id",
                         "detail": f"{int(agg['ncust'][i])} customers > "
                                   f"max {mcst[i]}"})
        return pd.DataFrame(rows)

    pr = bookings_ds.map_batches(partial, batch_format="pyarrow",
                                 zero_copy_batch=True)
    # hint from the raw input (metadata count) — counting pr would
    # execute the projection once just to size buckets
    out = keyed_apply(pr, "slot_id", check,
                      n_rows_hint=bookings_ds.count()).to_pandas()
    if not len(out):
        return VIOLATIONS.empty_table()
    return pa.Table.from_pandas(out, preserve_index=False,
                                schema=VIOLATIONS)


def slot_overlap(slots_ds) -> pa.Table:
    """Interval self-overlap (strict intersection or exact equality),
    excluding self — J5. Day-bucket grouping with boundary duplication:
    each slot lands in every day it touches, pairs are checked within a
    bucket, and duplicate pair findings are deduped (SURVEY.md §4)."""

    def bucket(b: pd.DataFrame) -> pd.DataFrame:
        # vectorized day explode: repeat each slot once per day it
        # touches (no per-row Python)
        if not len(b):
            return pd.DataFrame({"day": pd.Series(dtype="datetime64[ns]"),
                                 "slot_id": pd.Series(dtype="int64"),
                                 "start": pd.Series(dtype="datetime64[ns]"),
                                 "end": pd.Series(dtype="datetime64[ns]")})
        d0 = b["start"].dt.normalize().to_numpy()
        nd = ((b["end"].dt.normalize().to_numpy() - d0)
              .astype("timedelta64[D]").astype(np.int64) + 1)
        idx = np.repeat(np.arange(len(b)), nd)
        cs = np.cumsum(nd)
        offs = np.arange(int(cs[-1])) - np.repeat(cs - nd, nd)
        return pd.DataFrame({
            "day": d0[idx] + offs.astype("timedelta64[D]"),
            "slot_id": b["slot_id"].to_numpy()[idx],
            "start": b["start"].to_numpy()[idx],
            "end": b["end"].to_numpy()[idx]})

    def sweep(g: pd.DataFrame) -> pd.DataFrame:
        # start-sorted intervals: for j > i, s_i ≤ s_j and e_j > s_j ≥ s_i
        # ⇒ strict overlap (and exact equality) is exactly s_j < e_i —
        # enumerate candidate pairs with one triangular mask, no loop
        g = g.sort_values(["start", "slot_id"]).reset_index(drop=True)
        n = len(g)
        if n < 2:
            return pd.DataFrame(columns=["doc_id", "rule", "path", "detail"])
        s = g["start"].to_numpy()
        e = g["end"].to_numpy()
        ids = g["slot_id"].to_numpy().astype(np.int64)
        ii, jj = np.triu_indices(n, 1)
        hit = s[jj] < e[ii]
        ii, jj = ii[hit], jj[hit]
        a = np.minimum(ids[ii], ids[jj])
        b_ = np.maximum(ids[ii], ids[jj])
        keep = a != b_
        out = [{"doc_id": f"{x}|{y}", "rule": "slot-overlap",
                "path": "start,end", "detail": f"slots {x} and {y} overlap"}
               for x, y in zip(a[keep], b_[keep])]
        return pd.DataFrame(out, columns=["doc_id", "rule", "path", "detail"])

    pdf = (slots_ds.map_batches(
                lambda b: b.filter(pc.less(b["start"], b["end"])),
                batch_format="pyarrow")
           .map_batches(bucket, batch_format="pandas")
           .groupby("day").map_groups(sweep, batch_format="pandas")
           .to_pandas())
    if not len(pdf):
        return VIOLATIONS.empty_table()
    pdf = pdf.drop_duplicates(["doc_id"]).sort_values("doc_id")
    return pa.Table.from_pandas(pdf.reset_index(drop=True),
                                preserve_index=False, schema=VIOLATIONS)


def refund_exceeds(charges_ds) -> pa.Table:
    """Σ refund amounts must not exceed the parent charge amount (A9).
    Streamed keyed_compare self-join on the charge stream: refund-sum
    partials (child) vs parent charge amounts — no driver table."""
    from ..stages.aggcheck import keyed_compare, side_row

    def child(b: pa.Table) -> pa.Table:
        t = b.filter(pc.and_(pc.equal(b["state"], "refund"),
                             pc.is_valid(b["parent_charge_id"])))
        v = pc.multiply(pc.cast(t["line"], pa.float64()),
                        pc.cast(t["quantity"], pa.float64()))
        g = (pa.Table.from_arrays(
                [pc.cast(t["parent_charge_id"], pa.int64()), v],
                names=["k", "v"])
             .group_by("k").aggregate([("v", "sum")]))
        return side_row((g["k"], pc.multiply(g["v_sum"], -1.0)), src="c")

    def parent(b: pa.Table) -> pa.Table:
        v = pc.multiply(pc.cast(b["line"], pa.float64()),
                        pc.cast(b["quantity"], pa.float64()))
        return side_row((b["charge_id"], v), src="p")

    def compare(d: pd.DataFrame) -> pd.DataFrame:
        sums = d.loc[d["src"] == "c"].groupby("k")["v"].sum()
        par = d.loc[d["src"] == "p"].drop_duplicates("k")
        if not len(par) or not len(sums):
            return pd.DataFrame()
        refunded = sums.reindex(par["k"]).fillna(0.0).to_numpy()
        amount = par["v"].to_numpy()
        keys = par["k"].to_numpy()
        return pd.DataFrame(
            [{"doc_id": keys[i], "rule": "refund-exceeds-charge",
              "path": "line",
              "detail": f"refunded {refunded[i]:.2f} > "
                        f"charge {amount[i]:.2f}"}
             for i in np.flatnonzero(refunded > amount + 1e-9)])

    out = keyed_compare(charges_ds, charges_ds, child_side=child,
                        parent_side=parent, compare=compare).to_pandas()
    if not len(out):
        return VIOLATIONS.empty_table()
    return pa.Table.from_pandas(out, preserve_index=False, schema=VIOLATIONS)


def invoice_total_consistency(invoices_ds, charges_ds, *, tol=0.01) -> pa.Table:
    """total == adjustment + Σ(line×qty) of the invoice's non-void charges
    (A3 dual-path parity).

    Decimal-exact path: when the money columns are decimal128 (the ORM
    Decimal semantics, charge.py:124-126), sums use pyarrow decimal
    kernels and the comparison is EXACT equality — no float tolerance
    (SURVEY.md §7 hard part e). Float columns keep the ``tol`` compare.
    """
    from decimal import Decimal

    line_type = charges_ds.schema().base_schema.field("line").type
    is_decimal = pa.types.is_decimal(line_type)

    def partial(b: pa.Table) -> pa.Table:
        t = b.filter(pc.and_(pc.is_valid(b["invoice_id"]),
                             pc.invert(pc.equal(b["state"], "void"))))
        if is_decimal:
            qty = pc.cast(t["quantity"], pa.decimal128(14, 0))
            v = pc.cast(pc.multiply(t["line"], qty), pa.decimal128(28, 2))
        else:
            v = pc.multiply(t["line"], pc.cast(t["quantity"], pa.float64()))
        g = pa.Table.from_arrays([t["invoice_id"], v], names=["k", "v"]) \
            .group_by("k").aggregate([("v", "sum")])
        return g

    # streamed keyed exchange (no take_all/driver loop): child partials
    # union the parent (total, adjustment) stream, hash-bucketed on the
    # invoice key, one compare call per bucket. The decimal path keeps
    # exact Decimal arithmetic end-to-end (arrow decimal128 → pandas
    # object Decimals — elementwise by nature); floats vectorize.
    from ..stages.keyed_window import keyed_apply

    vtype = pa.decimal128(28, 2) if is_decimal else pa.float64()

    def child(b: pa.Table) -> pa.Table:
        g = partial(b)
        n = g.num_rows
        return pa.Table.from_arrays(
            [pc.cast(g["k"], pa.string()), pc.cast(g["v_sum"], vtype),
             pa.nulls(n, vtype),
             pa.array(["c"] * n, type=pa.string())],
            names=["k", "v", "adj", "src"])

    def parent(b: pa.Table) -> pa.Table:
        n = b.num_rows
        return pa.Table.from_arrays(
            [pc.cast(b["invoice_id"], pa.string()),
             pc.cast(b["total"], vtype), pc.cast(b["adjustment"], vtype),
             pa.array(["p"] * n, type=pa.string())],
            names=["k", "v", "adj", "src"])

    def compare(d: pd.DataFrame) -> pd.DataFrame:
        sums = d.loc[d["src"] == "c"].groupby("k")["v"].sum()
        par = d.loc[d["src"] == "p"].drop_duplicates("k")
        if not len(par):
            return pd.DataFrame()
        got = sums.reindex(par["k"])
        out = []
        if is_decimal:
            zero = Decimal("0")
            for k, s, stored, adj in zip(par["k"], got, par["v"], par["adj"]):
                recomputed = (zero if pd.isna(s) else s) + adj
                if recomputed != stored:
                    out.append({
                        "doc_id": k, "rule": "invoice-total-consistency",
                        "path": "total",
                        "detail": f"stored {stored:.2f} != "
                                  f"recomputed {recomputed:.2f}"})
        else:
            rec = (got.fillna(0.0).to_numpy(dtype="float64")
                   + par["adj"].to_numpy(dtype="float64"))
            stored = par["v"].to_numpy(dtype="float64")
            keys = par["k"].to_numpy()
            for i in np.flatnonzero(np.abs(rec - stored) > tol):
                out.append({
                    "doc_id": keys[i], "rule": "invoice-total-consistency",
                    "path": "total",
                    "detail": f"stored {stored[i]:.2f} != "
                              f"recomputed {rec[i]:.2f}"})
        return pd.DataFrame(out)

    c = charges_ds.map_batches(child, batch_format="pyarrow",
                               zero_copy_batch=True)
    p = invoices_ds.map_batches(parent, batch_format="pyarrow",
                                zero_copy_batch=True)
    out = keyed_apply(
        c.union(p), "k", compare,
        n_rows_hint=charges_ds.count() + invoices_ds.count()).to_pandas()
    if not len(out):
        return VIOLATIONS.empty_table()
    return pa.Table.from_pandas(out, preserve_index=False, schema=VIOLATIONS)


def invoice_paid_consistency(invoices_ds, payments_ds, *, tol=0.01) -> pa.Table:
    """Σ payments ≤ total always; == total when state is paid (A4).

    Streamed via the keyed_compare exchange (stages/aggcheck.py): payment
    sums partial-combine per block, invoices ship (id, total, state), one
    vectorized compare per hash bucket — no ``take_all``/``to_pandas``
    driver loop (the A4 analogue of invoice.py:211-231)."""
    from ..stages.aggcheck import keyed_compare, side_row

    def child(b: pa.Table) -> pa.Table:
        t = pa.Table.from_arrays(
            [pc.cast(b["invoice_id"], pa.string()),
             pc.cast(b["amount"], pa.float64())], names=["k", "v"])
        agg = t.group_by("k").aggregate([("v", "sum")])
        return side_row((agg["k"], agg["v_sum"]), src="c")

    def parent(b: pa.Table) -> pa.Table:
        return side_row((b["invoice_id"], b["total"]), src="p",
                        extra=pc.cast(b["state"], pa.string()))

    def compare(d: pd.DataFrame) -> pd.DataFrame:
        sums = d.loc[d["src"] == "c"].groupby("k")["v"].sum()
        par = d.loc[d["src"] == "p"].drop_duplicates("k")
        if not len(par):
            return pd.DataFrame()
        paid = sums.reindex(par["k"]).fillna(0.0).to_numpy()
        total = par["v"].to_numpy()
        state = par["extra"].to_numpy()
        keys = par["k"].to_numpy()
        out = []
        for i in np.flatnonzero(paid > total + tol):
            out.append({"doc_id": keys[i], "rule": "paid-le-total",
                        "path": "total",
                        "detail": f"payments {paid[i]:.2f} > "
                                  f"total {total[i]:.2f}"})
        bad_paid = (state == "paid") & (np.abs(paid - total) > tol)
        for i in np.flatnonzero(bad_paid):
            out.append({"doc_id": keys[i], "rule": "paid-total-mismatch",
                        "path": "total",
                        "detail": f"paid state but payments {paid[i]:.2f} "
                                  f"!= total {total[i]:.2f}"})
        return pd.DataFrame(out)

    out = keyed_compare(payments_ds, invoices_ds, child_side=child,
                        parent_side=parent, compare=compare).to_pandas()
    if not len(out):
        return VIOLATIONS.empty_table()
    return pa.Table.from_pandas(out, preserve_index=False, schema=VIOLATIONS)


def invoice_paid_charges(invoices_ds, charges_ds) -> pa.Table:
    """FSM side-effect consistency: Invoice.pay() cascades charge.pay()
    (invoice.py:226-231; test_invoices.py:97-104 asserts every charge of
    a paid invoice is paid) — so a PAID invoice with any non-void,
    non-paid charge is an illegal post-state. Streamed keyed_compare:
    map-side partial counts of offending charges join the paid-invoice
    stream in a hash-bucketed exchange — no driver-held per-key map."""

    from ..stages.aggcheck import keyed_compare, side_row

    def child(b: pa.Table) -> pa.Table:
        bad_state = pc.invert(pc.is_in(
            b["state"], value_set=pa.array(["paid", "void"])))
        t = b.filter(pc.and_(pc.is_valid(b["invoice_id"]), bad_state))
        agg = (t.select(["invoice_id"]).group_by("invoice_id")
                .aggregate([([], "count_all")]))
        return side_row((agg["invoice_id"], agg["count_all"]), src="c")

    def parent(b: pa.Table) -> pa.Table:
        t = b.filter(pc.equal(b["state"], "paid"))
        return side_row((t["invoice_id"],
                         pa.array([0.0] * t.num_rows, pa.float64())), src="p")

    def compare(d: pd.DataFrame) -> pd.DataFrame:
        sums = d.loc[d["src"] == "c"].groupby("k")["v"].sum()
        par = d.loc[d["src"] == "p"].drop_duplicates("k")
        if not len(par):
            return pd.DataFrame()
        n = sums.reindex(par["k"]).fillna(0.0).to_numpy()
        keys = par["k"].to_numpy()
        return pd.DataFrame(
            [{"doc_id": keys[i], "rule": "paid-charges-unpaid",
              "path": "charges",
              "detail": f"{int(n[i])} charge(s) not paid on a paid invoice"}
             for i in np.flatnonzero(n >= 1)])

    out = keyed_compare(charges_ds, invoices_ds, child_side=child,
                        parent_side=parent, compare=compare).to_pandas()
    if not len(out):
        return VIOLATIONS.empty_table()
    return pa.Table.from_pandas(out, preserve_index=False, schema=VIOLATIONS)


def booking_completed_charges(bookings_ds, charges_ds, *, tol=0.01) -> pa.Table:
    """FSM side-effect consistency: Booking.complete() creates a charge
    with amount == booking.cost (booking.py:450-457 create_charges;
    test_bookings.py:269-286 asserts count+1, charge.booking == booking
    and charge.amount == booking.cost). Post-state invariants:

    - ``completed-no-charge``: a completed booking with NO booking charge
    - ``completed-charge-amount``: charges exist but none matches cost
    """

    from ..stages.aggcheck import keyed_compare, side_row

    def child(b: pa.Table) -> pa.Table:
        t = b.filter(pc.is_valid(b["booking_id"]))
        amount = pc.multiply(t["line"], pc.cast(t["quantity"], pa.float64()))
        return side_row((t["booking_id"], amount), src="c")

    def parent(b: pa.Table) -> pa.Table:
        t = b.filter(pc.equal(b["state"], "completed"))
        return side_row((t["booking_id"], t["cost"]), src="p")

    def compare(d: pd.DataFrame) -> pd.DataFrame:
        ch = d.loc[d["src"] == "c"]
        par = d.loc[d["src"] == "p"].drop_duplicates("k")
        if not len(par):
            return pd.DataFrame()
        merged = ch.merge(par[["k", "v"]], on="k", suffixes=("", "_cost"))
        merged["ok"] = (merged["v"] - merged["v_cost"]).abs() <= tol
        any_ok = merged.groupby("k")["ok"].any()
        child_keys = set(ch["k"])
        out = []
        for k, cost in zip(par["k"], par["v"]):
            if k not in child_keys:
                out.append({"doc_id": k, "rule": "completed-no-charge",
                            "path": "charges",
                            "detail": "completed booking has no booking "
                                      "charge"})
        bad = any_ok.index[~any_ok]
        if len(bad):
            amts = (ch[ch["k"].isin(bad)].groupby("k")["v"].agg(list))
            cost_by_k = par.set_index("k")["v"]
            for k in bad:
                out.append({"doc_id": k, "rule": "completed-charge-amount",
                            "path": "charges",
                            "detail": f"no booking charge matches cost "
                                      f"{cost_by_k[k]:.2f} "
                                      f"(got {sorted(amts[k])})"})
        return pd.DataFrame(out)

    out = keyed_compare(charges_ds, bookings_ds, child_side=child,
                        parent_side=parent, compare=compare).to_pandas()
    if not len(out):
        return VIOLATIONS.empty_table()
    return pa.Table.from_pandas(out, preserve_index=False, schema=VIOLATIONS)


def booking_completed_guard(bookings_ds, *, today) -> pa.Table:
    """can_complete guard (booking.py:389-390): complete() is legal only
    once end < now — a COMPLETED booking whose end is at-or-after the
    as-of time is an illegal post-state (the transition could never have
    fired legally)."""
    from datetime import date, datetime

    asof = (datetime(today.year, today.month, today.day)
            if isinstance(today, date) and not isinstance(today, datetime)
            else today)

    def check(b: pa.Table) -> pa.Table:
        bad = pc.fill_null(
            pc.and_(pc.equal(b["state"], "completed"),
                    pc.greater_equal(b["end"], pa.scalar(asof))), False)
        # detail values materialize lazily for VIOLATING rows only —
        # the predicate stays vectorized, Python boxing is O(violations)
        idx = np.flatnonzero(bad.to_numpy(zero_copy_only=False))
        if not len(idx):
            return _v([])
        t = b.take(idx)
        return _v([(str(int(bid)), "completed-before-end", "end",
                    f"completed booking ends {end} — not before {asof}")
                   for bid, end in zip(t["booking_id"].to_pylist(),
                                       t["end"].to_pylist())])

    out = bookings_ds.map_batches(check, batch_format="pyarrow").to_pandas()
    if not len(out):
        return VIOLATIONS.empty_table()
    return pa.Table.from_pandas(out, preserve_index=False, schema=VIOLATIONS)


def invoice_send_guard(invoices_ds, customers_ds) -> pa.Table:
    """can_send guard (invoice.py:116-117): sending requires the customer
    to have ZERO issues (customer.py:130-140 — missing invoice email /
    suspicious last name). An invoice past draft (unpaid/paid — it was
    necessarily sent) whose customer has issues is an illegal
    post-state. Customer issue ids are broadcast (dimension-sized)."""

    def issue_ids(b: pa.Table) -> pa.Table:
        bad = pc.or_(
            pc.equal(pc.fill_null(b["invoice_email"], ""), ""),
            pc.match_substring(pc.fill_null(b["last_name"], ""), "&"))
        return pa.Table.from_arrays(
            [b["customer_id"].filter(bad)], names=["customer_id"])

    issue_pdf = customers_ds.map_batches(
        issue_ids, batch_format="pyarrow").to_pandas()
    issues = (np.unique(issue_pdf["customer_id"].to_numpy())
              if "customer_id" in issue_pdf.columns and len(issue_pdf)
              else np.array([], dtype=np.int64))
    ref = ray.put(issues)

    def check(b: pa.Table) -> pa.Table:
        bad_custs = ray.get(ref)
        if not len(bad_custs):
            return _v([])
        sent = pc.is_in(b["state"], value_set=pa.array(["unpaid", "paid"]))
        inbad = pc.is_in(b["customer_id"], value_set=pa.array(bad_custs))
        bad = pc.and_(sent, pc.fill_null(inbad, False))
        # box only violating rows (vectorized predicate above)
        idx = np.flatnonzero(
            pc.fill_null(bad, False).to_numpy(zero_copy_only=False))
        if not len(idx):
            return _v([])
        t = b.take(idx)
        return _v([(str(int(iid)), "sent-with-customer-issues",
                    "customer_id",
                    f"invoice was sent but customer {int(cid)} has issues")
                   for iid, cid in zip(t["invoice_id"].to_pylist(),
                                       t["customer_id"].to_pylist())])

    out = invoices_ds.map_batches(check, batch_format="pyarrow").to_pandas()
    if not len(out):
        return VIOLATIONS.empty_table()
    return pa.Table.from_pandas(out, preserve_index=False, schema=VIOLATIONS)


def overdue_parity(invoices_ds, *, today) -> pa.Table:
    """Stored overdue flag vs recomputed (state==unpaid ∧ due < today) —
    the M22 dual-path conformance pattern."""

    def check(b: pa.Table) -> pa.Table:
        due = b["due"]
        computed = pc.and_(pc.equal(b["state"], "unpaid"),
                           pc.and_(pc.is_valid(due),
                                   pc.less(due, pa.scalar(today))))
        bad = pc.xor(pc.fill_null(computed, False),
                     pc.fill_null(b["overdue"], False))
        # box only violating rows (vectorized predicate above)
        idx = np.flatnonzero(bad.to_numpy(zero_copy_only=False))
        if not len(idx):
            return _v([])
        t = b.take(idx)
        return _v([(str(int(iid)), "overdue-parity", "overdue",
                    f"stored overdue={stored} disagrees with recomputation")
                   for iid, stored in zip(t["invoice_id"].to_pylist(),
                                          t["overdue"].to_pylist())])

    out = invoices_ds.map_batches(check, batch_format="pyarrow").to_pandas()
    if not len(out):
        return VIOLATIONS.empty_table()
    return pa.Table.from_pandas(out, preserve_index=False, schema=VIOLATIONS)


def frozen_fields(current_ds, snapshot_ds, *, frozen=("adjustment",),
                  key="invoice_id", state_col="state",
                  editable_states=("draft",)) -> pa.Table:
    """Non-draft invoices must not drift from their snapshot on frozen
    columns (M23). Streamed: current and snapshot union into a keyed
    exchange, one vectorized merge-and-compare per hash bucket — neither
    side is collected on the driver."""
    from ..stages.keyed_window import keyed_apply

    frozen = list(frozen)

    def cur_side(b: pa.Table) -> pa.Table:
        n = b.num_rows
        return pa.Table.from_arrays(
            [pc.cast(b[key], pa.string()), pc.cast(b[state_col], pa.string())]
            + [b[c] for c in frozen]
            + [pa.array(["cur"] * n, type=pa.string())],
            names=["k", "_state"] + frozen + ["src"])

    def snap_side(b: pa.Table) -> pa.Table:
        n = b.num_rows
        return pa.Table.from_arrays(
            [pc.cast(b[key], pa.string()), pa.nulls(n, pa.string())]
            + [b[c] for c in frozen]
            + [pa.array(["snap"] * n, type=pa.string())],
            names=["k", "_state"] + frozen + ["src"])

    def compare(d: pd.DataFrame) -> pd.DataFrame:
        cur = d.loc[d["src"] == "cur"]
        cur = cur[~cur["_state"].isin(editable_states)]
        snap = d.loc[d["src"] == "snap"].drop_duplicates("k")
        if not len(cur) or not len(snap):
            return pd.DataFrame()
        m = cur.merge(snap[["k"] + frozen], on="k", suffixes=("", "_snap"))
        out = []
        for col in frozen:
            a, s = m[col], m[f"{col}_snap"]
            bad = ~(a.eq(s) | (a.isna() & s.isna()))
            for k_, sv, rv in zip(m["k"][bad], s[bad], a[bad]):
                out.append({"doc_id": k_, "rule": f"frozen-{col}",
                            "path": col,
                            "detail": f"frozen field changed from {sv} "
                                      f"to {rv}"})
        return pd.DataFrame(out)

    c = current_ds.map_batches(cur_side, batch_format="pyarrow",
                               zero_copy_batch=True)
    s = snapshot_ds.map_batches(snap_side, batch_format="pyarrow",
                                zero_copy_batch=True)
    out = keyed_apply(
        c.union(s), "k", compare,
        n_rows_hint=current_ds.count() + snapshot_ds.count()).to_pandas()
    if not len(out):
        return VIOLATIONS.empty_table()
    return pa.Table.from_pandas(out, preserve_index=False, schema=VIOLATIONS)


def fsm_log_validity(state_log_ds,
                     edges: Dict[str, Set[Tuple[str, str]]] = None) -> pa.Table:
    """Every logged transition must be a legal FSM edge; consecutive log
    rows per entity must chain (prev.target == next.source)."""
    edges = edges or {"booking": BOOKING_EDGES, "charge": CHARGE_EDGES,
                      "invoice": INVOICE_EDGES}

    # vectorized keyed-window sweep (no per-entity Python, no iterrows):
    # hash-bucket the composite key, sort the bucket by (key, ts), check
    # edge legality with one merge against the legal-edge table and chain
    # continuity with a shift + group-boundary mask
    from ..stages.keyed_window import keyed_apply

    legal = pd.DataFrame(
        [(ent, s, t) for ent, es in edges.items() for (s, t) in es],
        columns=["entity", "source", "target"])
    legal["_ok"] = True

    def add_key(b: pa.Table) -> pa.Table:
        k = pc.binary_join_element_wise(
            pc.cast(b["entity"], pa.string()),
            pc.cast(b["entity_id"], pa.string()), "|")
        return b.append_column("_fsm_key", k)

    def kernel(d: pd.DataFrame) -> pd.DataFrame:
        d = (d.sort_values(["_fsm_key", "ts"], kind="stable")
              .reset_index(drop=True))
        first = d["_fsm_key"].ne(d["_fsm_key"].shift()).to_numpy()
        m = d.merge(legal, on=["entity", "source", "target"], how="left")
        bad_edge = m["_ok"].isna().to_numpy()
        prev_target = d["target"].shift()
        bad_chain = ~first & d["source"].ne(prev_target).to_numpy()
        out = []
        for i in np.flatnonzero(bad_edge):
            out.append({"doc_id": d["_fsm_key"].iloc[i],
                        "rule": "fsm-illegal-edge", "path": "state",
                        "detail": f"{d['source'].iloc[i]}→"
                                  f"{d['target'].iloc[i]} not allowed"})
        for i in np.flatnonzero(bad_chain):
            out.append({"doc_id": d["_fsm_key"].iloc[i],
                        "rule": "fsm-broken-chain", "path": "state",
                        "detail": f"log jumps from {prev_target.iloc[i]} "
                                  f"to {d['source'].iloc[i]}"})
        return pd.DataFrame(out, columns=["doc_id", "rule", "path", "detail"])

    keyed = state_log_ds.map_batches(add_key, batch_format="pyarrow",
                                     zero_copy_batch=True)
    pdf = keyed_apply(keyed, "_fsm_key", kernel,
                      n_rows_hint=state_log_ds.count()).to_pandas()
    if not len(pdf):
        return VIOLATIONS.empty_table()
    return pa.Table.from_pandas(
        pdf.sort_values(["doc_id", "rule"]).reset_index(drop=True),
        preserve_index=False, schema=VIOLATIONS)


def contact_email_census(contacts_ds, customers_ds) -> pa.Table:
    """Every active customer should have ≥1 email-classified contact
    (fixcustomers census, A10 + M5 classifier). Streamed keyed_compare:
    per-block email-contact counts vs the customer stream — no driver
    key set or row loop."""
    from ..functions.strings import classify_contact
    from ..stages.aggcheck import keyed_compare, side_row

    def child(b: pa.Table) -> pa.Table:
        kinds = classify_contact(b["details"])
        has_email = pc.cast(pc.equal(kinds, "email"), pa.int64())
        t = pa.Table.from_arrays([b["customer_id"], has_email],
                                 names=["k", "e"])
        g = t.group_by("k").aggregate([("e", "sum")])
        return side_row((g["k"], g["e_sum"]), src="c")

    def parent(b: pa.Table) -> pa.Table:
        return side_row((b["customer_id"],
                         pa.array([0.0] * b.num_rows, pa.float64())), src="p")

    def compare(d: pd.DataFrame) -> pd.DataFrame:
        sums = d.loc[d["src"] == "c"].groupby("k")["v"].sum()
        par = d.loc[d["src"] == "p"].drop_duplicates("k")
        if not len(par):
            return pd.DataFrame()
        n = sums.reindex(par["k"]).fillna(0.0).to_numpy()
        keys = par["k"].to_numpy()
        return pd.DataFrame(
            [{"doc_id": keys[i], "rule": "no-email-contact",
              "path": "contacts",
              "detail": "customer has no email contact"}
             for i in np.flatnonzero(n < 1)])

    out = keyed_compare(contacts_ds, customers_ds, child_side=child,
                        parent_side=parent, compare=compare).to_pandas()
    if not len(out):
        return VIOLATIONS.empty_table()
    return pa.Table.from_pandas(out, preserve_index=False, schema=VIOLATIONS)


# ---------------------------------------------------------------------------
# full pack
# ---------------------------------------------------------------------------

def run_crm_pack(tables: Dict[str, pa.Table], *, today,
                 max_workers: int = 6) -> pa.Table:
    """Run every CRM rule over the given tables → one violations table.

    The 20 rules are INDEPENDENT pipelines, each paying Ray's fixed
    per-execution cost (~80-90 ms measured) — run them on a small
    thread pool (the flagship-bench concurrency pattern) so the fixed
    costs overlap instead of serializing; inputs are ``from_arrow``
    datasets, so there is no lazy read-plan import race. Results are
    collected in declaration order → deterministic output."""
    from concurrent.futures import ThreadPoolExecutor

    import ray.data as rd

    ds = {k: rd.from_arrow(v) for k, v in tables.items()}
    thunks = [
        lambda: run_rowpack(ds["bookings"], booking_row_ruleset()),
        lambda: run_rowpack(ds["charges"], charge_row_ruleset()),
        lambda: run_rowpack(ds["payments"], payment_row_ruleset()),
        lambda: run_rowpack(ds["customers"], customer_issue_ruleset()),
        lambda: run_rowpack(ds["slots"], slot_row_ruleset()),
        lambda: booking_unique_customer_slot(ds["bookings"]),
        lambda: booking_pets_belong(ds["bookings"], ds["pets"]),
        lambda: slot_capacity(ds["bookings"], ds["services"]),
        lambda: slot_overlap(ds["slots"]),
        lambda: refund_exceeds(ds["charges"]),
        lambda: invoice_total_consistency(ds["invoices"], ds["charges"]),
        lambda: invoice_paid_consistency(ds["invoices"], ds["payments"]),
        lambda: invoice_paid_charges(ds["invoices"], ds["charges"]),
        lambda: booking_completed_charges(ds["bookings"], ds["charges"]),
        lambda: booking_completed_guard(ds["bookings"], today=today),
        lambda: invoice_send_guard(ds["invoices"], ds["customers"]),
        lambda: overdue_parity(ds["invoices"], today=today),
        lambda: frozen_fields(ds["invoices"], ds["invoices_snapshot"]),
        lambda: fsm_log_validity(ds["state_log"]),
        lambda: contact_email_census(ds["contacts"], ds["customers"]),
    ]
    def call(f):
        # Ray's streaming executor sanitizes operator metadata at
        # execution start by iterating dicts another thread's plan
        # build may mutate ("dictionary changed size during iteration",
        # ray metadata_exporter.sanitize_for_struct) — an internal Ray
        # race, not a data race: every rule is a pure computation over
        # immutable in-memory tables, so a retry is safe and the result
        # identical. Anything else propagates.
        for attempt in range(3):
            try:
                return f()
            except RuntimeError as e:
                if ("dictionary changed size" not in str(e)
                        or attempt == 2):
                    raise
        raise AssertionError("unreachable")

    if max_workers > 1:
        with ThreadPoolExecutor(max_workers=max_workers) as ex:
            parts: Iterable[pa.Table] = list(ex.map(call, thunks))
    else:
        parts = [call(f) for f in thunks]
    out = pa.concat_tables([p for p in parts if p.num_rows]) \
        if any(p.num_rows for p in parts) else VIOLATIONS.empty_table()
    return out.sort_by([("doc_id", "ascending"), ("rule", "ascending")])
