"""Schema-profiling discovery — the "where do the constraints COME
from" side of the validation engine. `stages/uniqueness.py` and
`stages/referential.py` CHECK declared unique / FK constraints
(cerberus/models/pet.py:68-72, booking.py:50); these two profilers
DISCOVER them from data, the classic unary inclusion-dependency and
candidate-key mining primitives of data profiling.

Both reuse the engine's existing distributed set machinery so the scale
story is inherited, not re-derived:

- ``inclusion_profile`` — containment of distinct(A) in distinct(B) per
  candidate pair, via `setops.except_distinct` (block-local distinct
  partials; bucketed shuffle mode beyond the driver band) plus a
  distinct-count pass. Traffic ∝ distinct values, never rows.
- ``candidate_key_profile`` — per column-combo uniqueness from
  `uniqueness.duplicate_key_counts` (driver/hash/cms/shuffle planner);
  the distinct count falls out of the duplicate multiset without a
  second pass: distinct = rows − Σ(n−1).

DuckDB parity in tests/test_profile.py.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import pandas as pd
import pyarrow as pa

from .setops import except_distinct
from .uniqueness import duplicate_key_counts

__all__ = ["inclusion_profile", "candidate_key_profile"]


def _as_key(ds, col: str):
    """One-column view named 'k' (setops needs matching column names)."""
    def proj(b: pa.Table) -> pa.Table:
        return pa.Table.from_arrays([b[col]], names=["k"])
    return ds.map_batches(proj, batch_format="pyarrow",
                          zero_copy_batch=True)


def _distinct_count(ds, col: str) -> int:
    def part(b: pa.Table) -> pa.Table:
        return b.select([col]).group_by([col]).aggregate([])
    pdf = ds.map_batches(part, batch_format="pyarrow",
                         zero_copy_batch=True).to_pandas()
    return int(pdf[col].nunique(dropna=False))


def inclusion_profile(pairs: Sequence[Tuple[str, object, str, object, str]],
                      *, mode: str = "auto",
                      round_digits: int = 6) -> pd.DataFrame:
    """FK discovery. ``pairs`` is a sequence of
    ``(name, ds_a, col_a, ds_b, col_b)`` candidates; for each, reports
    how much of distinct(``col_a``) is contained in distinct(``col_b``)
    — containment 1.0 ⇒ a valid inclusion dependency (FK candidate).

    → frame (pair, n_distinct_a, n_missing, containment, is_subset),
    one row per candidate, input order preserved. NULLs in A count as
    distinct values (a NULL never matches, so a nullable FK column
    profiles as containment < 1 — surface it, don't hide it)."""
    rows = []
    for name, ds_a, col_a, ds_b, col_b in pairs:
        a = _as_key(ds_a, col_a)
        missing = except_distinct(a, _as_key(ds_b, col_b), ["k"],
                                  mode=mode)
        n_a = _distinct_count(ds_a, col_a)
        n_miss = int(len(missing))
        rows.append({
            "pair": name,
            "n_distinct_a": n_a,
            "n_missing": n_miss,
            "containment": round(1.0 - n_miss / n_a, round_digits)
                           if n_a else float("nan"),
            "is_subset": n_miss == 0})
    return pd.DataFrame(rows,
                        columns=["pair", "n_distinct_a", "n_missing",
                                 "containment", "is_subset"])


def candidate_key_profile(ds, combos: Sequence[Sequence[str]], *,
                          mode: str = "auto",
                          round_digits: int = 6) -> pd.DataFrame:
    """Candidate-key mining. For each column combo, reports how close
    it comes to uniquely identifying rows.

    → frame (key, n_rows, n_distinct, n_dup_keys, uniqueness, is_key),
    one row per combo, input order preserved; ``key`` is the
    '+'-joined column list, ``n_dup_keys`` the number of key tuples
    occurring more than once."""
    n_rows = ds.count()
    rows = []
    for combo in combos:
        combo = list(combo)
        dups = duplicate_key_counts(ds, combo, mode=mode,
                                    n_rows_hint=n_rows)
        extra = int(pa.compute.sum(
            pa.compute.subtract(dups["n"], 1)).as_py() or 0)
        n_distinct = n_rows - extra
        rows.append({
            "key": "+".join(combo),
            "n_rows": n_rows,
            "n_distinct": n_distinct,
            "n_dup_keys": dups.num_rows,
            "uniqueness": round(n_distinct / n_rows, round_digits)
                          if n_rows else float("nan"),
            "is_key": dups.num_rows == 0})
    return pd.DataFrame(rows,
                        columns=["key", "n_rows", "n_distinct",
                                 "n_dup_keys", "uniqueness", "is_key"])
