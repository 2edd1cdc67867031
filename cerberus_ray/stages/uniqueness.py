"""Uniqueness rules (exact + sketched).

Exact path re-creates what the reference delegates to DB unique indexes
(unique_together: cerberus/models/booking.py:50,266, contact.py:43,
service.py:29; duplicate insert → IntegrityError,
cerberus/tests/test_bookings.py:108-117):

    per-batch partial value_counts (pyarrow hash-aggregate)
      → groupby(key).sum over the partials  (shuffle of UNIQUE keys only,
        never of full rows — the map-side combine is the salted-key-safe
        version of the DB's global B-tree)
      → keys with total count > 1 become one violation row per key.

Sketch path (north_rule, 10^12-doc scale): per-batch HyperLogLog, merged
via a tiny reduce — gives an approximate distinct count whose disagreement
with the row count flags duplicate-heavy partitions without any shuffle.
"""

from __future__ import annotations

from typing import List, Sequence

import numpy as np
import pyarrow as pa

from ..rules import details as D
from ..schema import VIOLATIONS
from ..state.hll import HyperLogLog


def _partial_counts(batch: pa.Table, keys: Sequence[str]) -> pa.Table:
    t = batch.select(list(keys))
    return t.group_by(list(keys)).aggregate([([], "count_all")])


def duplicate_key_counts(ds, keys: Sequence[str]) -> pa.Table:
    """(key cols..., n) for every key tuple appearing more than once.

    Shuffle payload = unique keys per block (map-side combined), never full
    rows. Output is small by construction (only duplicated keys), sorted.
    """
    keys = list(keys)
    from ray.data.aggregate import Sum

    partials = ds.map_batches(
        lambda b: _partial_counts(b, keys), batch_format="pyarrow",
        zero_copy_batch=True,
    )
    total = partials.groupby(keys).aggregate(Sum("count_all", alias_name="n"))
    pdf = total.filter(expr="n > 1").to_pandas()
    if "n" not in pdf.columns:
        import pandas as pd

        pdf = pd.DataFrame({k: [] for k in keys} | {"n": []})
    pdf = pdf.sort_values(keys).reset_index(drop=True)
    return pa.Table.from_pandas(pdf[keys + ["n"]], preserve_index=False)


def unique_violations(ds, keys: Sequence[str], *, rule: str | None = None) -> pa.Table:
    """Exact duplicate detection → violations table (one row per dup key)."""
    keys = list(keys)
    rule = rule or f"unique-{'-'.join(keys)}"
    pdf = duplicate_key_counts(ds, keys).to_pandas()
    if len(pdf) == 0:
        return VIOLATIONS.empty_table()
    key_str = pdf[keys[0]].astype(str)
    for k in keys[1:]:
        key_str = key_str + "|" + pdf[k].astype(str)
    return pa.Table.from_arrays(
        [
            pa.array(key_str.tolist(), type=pa.string()),
            pa.array([rule] * len(pdf), type=pa.string()),
            pa.array([",".join(keys)] * len(pdf), type=pa.string()),
            pa.array([D.d_unique(int(n)) for n in pdf["n"]], type=pa.string()),
        ],
        schema=VIOLATIONS,
    )


def approx_distinct(ds, key: str, *, p: int = 14) -> float:
    """HLL-estimated distinct count of ``key`` — no shuffle; one sketch per
    block, merged on the driver (sketches are tiny and mergeable)."""

    def sketch(batch: pa.Table) -> pa.Table:
        h = HyperLogLog(p=p)
        h.update_strings(batch[key])
        return pa.Table.from_pydict({"sketch": [h.to_bytes()]})

    rows: List[bytes] = [
        r["sketch"] for r in ds.map_batches(
            sketch, batch_format="pyarrow", zero_copy_batch=True
        ).take_all()
    ]
    acc = HyperLogLog(p=p)
    for b in rows:
        acc.merge_bytes(b)
    return acc.estimate()
