"""Batch repair / normalize / GC jobs — the reference's management
commands re-expressed as Ray Data pipelines (SURVEY.md §3.3: the
"pipeline job" path: read → classify → grouped census → conditional
normalize → write).

- fix_customers   ≙ fixcustomers.Command.handle (cerberus/management/
                    commands/fixcustomers.py:15-27): customers with an
                    empty invoice_email and EXACTLY one email-classified
                    contact get that contact's address backfilled
                    (contact.set_as_invoice, cerberus/models/contact.py:63-68)
- anonymise       ≙ anonymise.Command.handle (anonymise.py:19-31):
                    deterministic name replacement via the title-strip +
                    first/other/last split (seeded word bank, no Faker)
- clean_slots     ≙ clean_slots.Command.handle (clean_slots.py:12-21):
                    delete slots with no ACTIVE bookings (canceled ones
                    don't hold a slot alive), PROTECT-style suppression =
                    anti-join instead of per-row delete attempts

All three are idempotent (rerunning on their own output is a no-op),
matching the reference's restart-by-rerun semantics (SURVEY.md §3.3).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray

from ..determinism import hash_idx
from ..functions.strings import classify_contact

_FIRST = np.array("olive ruby arthur henry freya isla noah oscar poppy "
                  "alfie willow eliza hugo clara rory nell".split())
_LAST = np.array("walker hill woods brook stone field marsh lane fox "
                 "burn dale ford".split())


def fix_customers(customers_ds, contacts_ds):
    """→ customers Dataset with invoice_email backfilled where a customer
    has an empty one and exactly ONE email contact."""

    def classified(b: pa.Table) -> pa.Table:
        kinds = classify_contact(b["details"])
        return pa.Table.from_arrays([b["customer_id"], kinds, b["details"]],
                                    names=["customer_id", "kind", "details"])

    pdf = contacts_ds.map_batches(classified, batch_format="pyarrow").to_pandas()
    emails = pdf[pdf["kind"] == "email"]
    census = emails.groupby("customer_id")["details"].agg(["count", "first"])
    fixes = {int(cid): row["first"] for cid, row in census.iterrows()
             if row["count"] == 1}
    ref = ray.put(fixes)

    def fix(b: pa.Table) -> pa.Table:
        fx = ray.get(ref)
        cur = b["invoice_email"].to_pylist()
        cids = b["customer_id"].to_pylist()
        out = [fx.get(int(c), v) if (v is None or v == "") else v
               for c, v in zip(cids, cur)]
        idx = b.schema.get_field_index("invoice_email")
        return b.set_column(idx, "invoice_email",
                            pa.array(out, type=pa.string()))

    return customers_ds.map_batches(fix, batch_format="pyarrow")


def anonymise(customers_ds, *, seed: int = 42):
    """→ customers Dataset with deterministic replacement names (first,
    last, regenerated full name)."""

    def anon(b: pa.Table) -> pa.Table:
        cid = np.asarray(b["customer_id"].to_pylist(), dtype=np.int64)
        first = _FIRST[(hash_idx(cid, seed, 1) % np.uint64(len(_FIRST))).astype(int)]
        last = _LAST[(hash_idx(cid, seed, 2) % np.uint64(len(_LAST))).astype(int)]
        name = np.char.add(np.char.add(first, " "), last)
        t = b
        for col, vals in [("first_name", first), ("last_name", last),
                          ("name", name)]:
            idx = t.schema.get_field_index(col)
            t = t.set_column(idx, col,
                            pa.array(vals.astype(object), type=pa.string()))
        return t

    return customers_ds.map_batches(anon, batch_format="pyarrow")


def clean_slots(slots_ds, bookings_ds):
    """→ slots Dataset with empty slots removed (GC): a slot survives iff
    at least one non-canceled booking references it."""

    def active_slots(b: pa.Table) -> pa.Table:
        t = b.filter(pc.and_(pc.invert(pc.equal(b["state"], "canceled")),
                             pc.is_valid(b["slot_id"])))
        return pa.Table.from_arrays([pc.unique(pc.cast(t["slot_id"],
                                                       pa.int64()))],
                                    names=["slot_id"])

    used = bookings_ds.map_batches(active_slots,
                                   batch_format="pyarrow").to_pandas()
    keep = np.sort(used["slot_id"].unique()) if len(used) else np.array([],
                                                                        dtype=np.int64)
    ref = ray.put(keep)

    def gc(b: pa.Table) -> pa.Table:
        k = ray.get(ref)
        sid = b["slot_id"].to_numpy(zero_copy_only=False)
        if len(k):
            pos = np.clip(np.searchsorted(k, sid), 0, len(k) - 1)
            mask = k[pos] == sid
        else:
            mask = np.zeros(len(sid), dtype=bool)
        return b.filter(pa.array(mask))

    return slots_ds.map_batches(gc, batch_format="pyarrow")
