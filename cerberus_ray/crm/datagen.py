"""Scaled CRM fixture generator — the dummydata command at engine scale.

Deterministic (counter-hashed like cerberus_ray.datagen) relational CRM
tables at parameterized size with violation FRACTIONS injected at known
entities, so the constraint pack (crm/rules.py) can be validated — and
benchmarked — far beyond the hand-written fixtures. Injections use
disjoint hash streams with at most one rule per entity, so expected
per-rule counts are exact (count-level golden; spot keys in tests).

Slots are laid on a non-overlapping daily grid by construction; the
overlap injection shifts a slot's end over its neighbour's start, which
creates exactly one overlapping pair per injected slot.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from datetime import datetime, timedelta
from typing import Dict, Tuple

import numpy as np
import pandas as pd
import pyarrow as pa

from ..determinism import randint, uniform01

BASE = datetime(2024, 1, 1, 8, 0)

BOOKING_FRACTIONS: Dict[str, float] = {
    "booking-start-before-end": 0.004,
    "has-booking-slot": 0.004,
    "enum-state": 0.004,
    "pets-belong-to-customer": 0.004,
    "completed-no-charge": 0.004,
    "completed-charge-amount": 0.004,
    "completed-before-end": 0.004,
}
SLOT_FRACTIONS: Dict[str, float] = {"slot-overlap": 0.004}
CHARGE_FRACTIONS: Dict[str, float] = {"paid-on-consistency": 0.006}
PAYMENT_FRACTIONS: Dict[str, float] = {"range-amount": 0.006}
INVOICE_FRACTIONS: Dict[str, float] = {"paid-charges-unpaid": 0.01}
#: fraction of bookings completed WITH a correct charge (silent control)
COMPLETED_OK_FRACTION = 0.004


@dataclass(frozen=True)
class CrmGenConfig:
    n_bookings: int = 20_000
    slots_per_day: int = 20
    seed: int = 42
    booking_fractions: Dict[str, float] = field(
        default_factory=lambda: dict(BOOKING_FRACTIONS))
    slot_fractions: Dict[str, float] = field(
        default_factory=lambda: dict(SLOT_FRACTIONS))
    charge_fractions: Dict[str, float] = field(
        default_factory=lambda: dict(CHARGE_FRACTIONS))
    payment_fractions: Dict[str, float] = field(
        default_factory=lambda: dict(PAYMENT_FRACTIONS))
    invoice_fractions: Dict[str, float] = field(
        default_factory=lambda: dict(INVOICE_FRACTIONS))

    @property
    def n_slots(self) -> int:
        return self.n_bookings  # one booking per slot keeps uniqueness clean

    @property
    def n_invoices(self) -> int:
        return max(50, self.n_bookings // 20)

    @property
    def n_customers(self) -> int:
        return max(100, self.n_bookings // 10)

    @property
    def n_pets(self) -> int:
        return self.n_customers * 2


def scaled_today(cfg: "CrmGenConfig") -> datetime:
    """As-of time for guard rules: strictly after every grid slot's end,
    so only the completed-before-end injections land past it."""
    return BASE + timedelta(days=cfg.n_bookings // cfg.slots_per_day + 2)


def _pick(fractions: Dict[str, float], idx: np.ndarray, seed: int,
          salt: int) -> Tuple[np.ndarray, list]:
    u = uniform01(idx, seed, salt)
    rules = sorted(fractions)
    code = np.full(len(idx), -1, dtype=np.int64)
    acc = 0.0
    for i, r in enumerate(rules):
        f = fractions[r]
        code[(u >= acc) & (u < acc + f)] = i
        acc += f
    assert acc < 1.0
    return code, rules


def make_scaled_crm(cfg: CrmGenConfig):
    """→ ({name: pa.Table}, {rule: exact expected violation count})."""
    seed = cfg.seed
    expected: Dict[str, int] = {}

    n = cfg.n_bookings
    idx = np.arange(n, dtype=np.int64)

    # pets: pet_id i belongs to customer (i % n_customers)
    pet_owner = np.arange(cfg.n_pets, dtype=np.int64) % cfg.n_customers
    pets = pd.DataFrame({"pet_id": np.arange(cfg.n_pets),
                         "name": [f"pet{i}" for i in range(cfg.n_pets)],
                         "customer_id": pet_owner})

    # slots on a daily grid: day = i // slots_per_day, hour slot within day.
    # 30-minute slots with 30-minute gaps → no overlap by construction.
    day = idx // cfg.slots_per_day
    pos = idx % cfg.slots_per_day
    start = np.array([BASE + timedelta(days=int(d), minutes=int(p) * 60)
                      for d, p in zip(day, pos)])
    end = start + timedelta(minutes=30)

    scode, srules = _pick(cfg.slot_fractions, idx, seed, 0xC1)
    k = srules.index("slot-overlap") if "slot-overlap" in srules else -2
    # overlap: extend end past the NEXT slot's start (same day only)
    ov = (scode == k) & (pos < cfg.slots_per_day - 1)
    end = end.copy()
    end[ov] = start[ov] + timedelta(minutes=75)  # crosses next slot's start
    expected["slot-overlap"] = int(ov.sum())

    slots = pd.DataFrame({"slot_id": idx, "service_id": 1,
                          "start": start, "end": end})

    # bookings: booking i on slot i, customer hash, one pet of that customer
    cust = randint(idx, seed, 0xB1, 0, cfg.n_customers)
    pet = cust  # pet_id == customer_id → owner(pet)=pet % n_customers == cust ✓
    bcode, brules = _pick(cfg.booking_fractions, idx, seed, 0xB2)

    states = np.full(n, "confirmed", dtype=object)
    slot_col = idx.astype(object)
    bstart, bend = start.copy(), end.copy()
    pet_ids = [[int(p)] for p in pet]

    def hit(rule):
        return bcode == brules.index(rule) if rule in brules else \
            np.zeros(n, dtype=bool)

    m = hit("booking-start-before-end")
    bend[m] = bstart[m] - timedelta(minutes=5)
    expected["booking-start-before-end"] = int(m.sum())

    m = hit("has-booking-slot")
    for i in np.flatnonzero(m):
        slot_col[i] = None  # confirmed booking with no slot
    expected["has-booking-slot"] = int(m.sum())

    m = hit("enum-state")
    states[m] = "lost"
    expected["enum-state"] = int(m.sum())

    m = hit("pets-belong-to-customer")
    for i in np.flatnonzero(m):
        pet_ids[i] = [int((cust[i] + 1) % cfg.n_customers)]  # wrong owner
    expected["pets-belong-to-customer"] = int(m.sum())

    # FSM side-effect injections: complete() must leave a booking charge
    # with amount == cost (rules.booking_completed_charges)
    m_nc = hit("completed-no-charge")     # completed, charge never linked
    states[m_nc] = "completed"
    expected["completed-no-charge"] = int(m_nc.sum())
    m_ca = hit("completed-charge-amount")  # completed, linked charge ≠ cost
    states[m_ca] = "completed"
    expected["completed-charge-amount"] = int(m_ca.sum())
    # completed although end is past the as-of time (can_complete guard);
    # linked with a correct charge so the charge rules stay silent for it
    m_cbe = hit("completed-before-end")
    states[m_cbe] = "completed"
    bend[m_cbe] = scaled_today(cfg) + timedelta(hours=1)
    expected["completed-before-end"] = int(m_cbe.sum())

    # silent control: completed bookings whose linked charge is correct
    m_ok = (uniform01(idx, seed, 0xB9) < COMPLETED_OK_FRACTION) & (bcode == -1)
    states[m_ok] = "completed"

    bookings = pd.DataFrame({
        "booking_id": idx, "customer_id": cust, "service_id": 1,
        "slot_id": slot_col, "state": states, "start": bstart, "end": bend,
        "cost": 30.0, "pet_ids": pet_ids})

    # invoices: ~20 charges each (charge i → invoice i % n_inv); charge
    # state is COHERENT with its invoice (paid invoice ⇒ paid charges),
    # so only the injection below breaks the pay() cascade invariant
    n_inv = cfg.n_invoices
    inv_idx = np.arange(n_inv, dtype=np.int64)
    inv_of_charge = idx % n_inv
    icode, irules = _pick(cfg.invoice_fractions, inv_idx, seed, 0xE1)
    inv_paid = uniform01(inv_idx, seed, 0xE2) < 0.5
    inv_inj = (icode == irules.index("paid-charges-unpaid")
               if "paid-charges-unpaid" in irules else np.zeros(n_inv, bool))
    inv_paid[inv_inj] = True  # injected invoices are forced paid

    # charges: one per booking; state follows the owning invoice
    ccode, crules = _pick(cfg.charge_fractions, idx, seed, 0xC2)
    paid = inv_paid[inv_of_charge]
    paid_on = pd.Series(pd.NaT, index=range(n), dtype="datetime64[ns]")
    paid_on[paid] = pd.Timestamp(BASE)
    state_c = np.where(paid, "paid", "unpaid").astype(object)
    m = ccode == crules.index("paid-on-consistency") \
        if "paid-on-consistency" in crules else np.zeros(n, bool)
    # flip the monitor field only → inconsistency either way
    paid_on[m & paid] = pd.NaT
    paid_on[m & ~paid] = pd.Timestamp(BASE)
    expected["paid-on-consistency"] = int(m.sum())

    # pay()-cascade injection: un-pay the FIRST charge (charge j) of each
    # injected paid invoice j — skipping charges already carrying the
    # paid-on injection keeps both counts exact
    flip = inv_inj & (ccode[inv_idx] == -1)
    flip_rows = inv_idx[flip]
    state_c[flip_rows] = "unpaid"
    paid_on.iloc[flip_rows] = pd.NaT
    expected["paid-charges-unpaid"] = int(flip.sum())

    # booking-charge links: wrong-amount and correct-control completions
    booking_link = np.full(n, None, dtype=object)
    booking_link[m_ca] = idx[m_ca]
    booking_link[m_ok] = idx[m_ok]
    booking_link[m_cbe] = idx[m_cbe]
    line = np.full(n, 30.0)
    line[m_ca] = 10.0  # != cost

    invoices = pd.DataFrame({
        "invoice_id": inv_idx,
        "customer_id": inv_idx % cfg.n_customers,
        "state": np.where(inv_paid, "paid", "unpaid").astype(object),
        "total": np.bincount(inv_of_charge, weights=line, minlength=n_inv)})

    charges = pd.DataFrame({
        "charge_id": idx, "name": [f"charge {i}" for i in idx],
        "line": line, "quantity": 1, "state": state_c,
        "paid_on": paid_on.to_numpy(),
        "parent_charge_id": pd.array([None] * n, dtype="Int64"),
        "customer_id": cust,
        "invoice_id": pd.array(inv_of_charge, dtype="Int64"),
        "booking_id": pd.array(booking_link, dtype="Int64")})

    # payments keyed to a small invoice set; negatives injected
    npay = max(100, n // 20)
    pidx = np.arange(npay, dtype=np.int64)
    pcode, prules = _pick(cfg.payment_fractions, pidx, seed, 0xD1)
    amounts = np.full(npay, 25.0)
    m = pcode == prules.index("range-amount") if "range-amount" in prules \
        else np.zeros(npay, bool)
    amounts[m] = -5.0
    expected["range-amount"] = int(m.sum())
    payments = pd.DataFrame({"payment_id": pidx,
                             "invoice_id": pidx % 50,
                             "customer_id": pidx % cfg.n_customers,
                             "amount": amounts})

    services = pd.DataFrame({"service_id": [1], "name": ["Walk"],
                             "cost": [30.0], "max_pet": [10**6],
                             "max_customer": [10**6]})

    tables = {k: pa.Table.from_pandas(v, preserve_index=False)
              for k, v in [("pets", pets), ("slots", slots),
                           ("bookings", bookings), ("charges", charges),
                           ("payments", payments), ("services", services),
                           ("invoices", invoices)]}
    return tables, expected
