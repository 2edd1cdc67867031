"""SCD Type-2 dimension build: collapse a keyed change log into
validity intervals.

The classic warehouse shape (Kimball type-2 slowly-changing dimension):
from an append-only attribute log ``(key, ts, attr)`` produce one row
per ATTRIBUTE RUN — ``(key, attr, valid_from, valid_to, version,
is_current)`` with half-open ``[valid_from, valid_to)`` intervals and a
NULL ``valid_to`` on each key's current run. Consecutive identical
attribute values collapse into one interval; a re-appearing value opens
a NEW interval (type-2 semantics, not distinct-value).

Execution: :func:`cerberus_ray.stages.keyed_window.keyed_apply` — hash-
bucket the key and run ONE vectorized pandas kernel per bucket (sort by
``(key, ts, tiebreak)``, boundary masks, cumcount versions); no per-key
Python, so the plan holds at corpus-scale key counts. The SQL
equivalent is LAG-based change filtering + LEAD validity — the DuckDB
oracle in tests/test_scd.py.

Reference shape: the send-time snapshot / frozen-field guards version
attribute state over time (cerberus/models/invoice.py:143-168,
cerberus/models/booking.py:72-83 order-by-time-within-key); this is the
table-valued generalization of that per-row history.
"""

from __future__ import annotations

from typing import Optional

import pandas as pd

from .keyed_window import keyed_apply


def scd2_build(ds, key_col: str, attr_col: str, ts_col: str, *,
               tiebreak_col: Optional[str] = None, n_buckets: int = 32):
    """→ Dataset ``(key_col, attr_col, valid_from, valid_to, version,
    is_current)``, one row per attribute run, versions numbered from 1
    in time order per key.

    ``tiebreak_col`` orders rows whose ``ts`` ties within a key (required
    for deterministic output when a key changes twice in one tick — same
    contract as SQL ``ORDER BY ts, tiebreak``). ``attr_col`` must be
    non-null: NULL has no well-defined equality for run detection (SQL
    ``<>`` returns NULL), so both engines would need an agreed sentinel.
    """
    order = [key_col, ts_col] + ([tiebreak_col] if tiebreak_col else [])

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        d = g.sort_values(order, kind="mergesort").reset_index(drop=True)
        new_key = d[key_col].ne(d[key_col].shift())
        change = new_key | d[attr_col].ne(d[attr_col].shift())
        c = d.loc[change, [key_col, attr_col, ts_col]].reset_index(drop=True)
        last_of_key = c[key_col].ne(c[key_col].shift(-1))
        c["valid_from"] = c[ts_col]
        c["valid_to"] = c[ts_col].shift(-1).where(~last_of_key)
        c["version"] = (c.groupby(key_col).cumcount() + 1).astype("int64")
        c["is_current"] = last_of_key
        return c[[key_col, attr_col, "valid_from", "valid_to",
                  "version", "is_current"]]

    return keyed_apply(ds, key_col, kernel, n_buckets=n_buckets)


def scd2_as_of(scd_ds, ts, *, ts_col_from: str = "valid_from",
               ts_col_to: str = "valid_to"):
    """Point-in-time slice of a built SCD-2 table: the rows whose
    half-open validity interval contains ``ts`` (one per key that
    existed then). A plain streamed filter — no shuffle."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def keep(b: pa.Table) -> pa.Table:
        frm = b[ts_col_from]
        to = b[ts_col_to]
        lo = pc.less_equal(frm, pa.scalar(ts, frm.type))
        hi = pc.or_kleene(pc.is_null(to),
                          pc.greater(to, pa.scalar(ts, frm.type)))
        return b.filter(pc.and_kleene(lo, hi))

    return scd_ds.map_batches(keep, batch_format="pyarrow",
                              zero_copy_batch=True)
