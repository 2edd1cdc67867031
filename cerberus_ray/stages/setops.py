"""SQL set operations over Datasets: INTERSECT / EXCEPT / UNION with
DISTINCT semantics (SQL's set-op convention: output rows are distinct,
NULL compares equal to NULL).

Execution planner, mirroring ``uniqueness.duplicate_key_counts``:

- ``driver``: each side streams per-block DISTINCT partials (pyarrow
  hash-aggregate with no measures — one row per distinct tuple per
  block) to the driver, which runs the set logic with one indicator
  merge. Driver holds O(#distinct rows of both sides).
- ``shuffle``: both sides are tagged and unioned, then one
  ``keyed_apply`` hash exchange on the encoded row key co-locates every
  copy of a tuple; a vectorized pandas kernel per bucket computes
  presence flags and emits the op's surviving rows. No driver state —
  the beyond-driver-memory path.

Both modes return a pandas DataFrame of the distinct result rows sorted
by the key columns (set-op outputs are bounded by the smaller side for
intersect/except; a genuinely huge union-distinct should instead write
through ``shuffle``'s pre-collect stream — documented seam).
"""

from __future__ import annotations

from typing import List, Sequence

import numpy as np
import pandas as pd
import pyarrow as pa

__all__ = ["intersect_distinct", "except_distinct", "union_distinct"]

_SIDE = "__setop_side"
_KEY = "__setop_key"
# NUL-free sentinel: pandas' string hashtable (groupby/drop_duplicates)
# hashes C strings and TRUNCATES at an embedded "\x00", silently merging
# distinct keys — \x1e (record separator) is safe and just as unlikely
# in real values
_NULL = "\x1eNULL\x1e"


def _distinct_partials(ds, cols: List[str]) -> pd.DataFrame:
    return ds.map_batches(
        lambda b: b.select(cols).group_by(cols).aggregate([]),
        batch_format="pyarrow", zero_copy_batch=True).to_pandas()


def _driver(a, b, cols: List[str], op: str) -> pd.DataFrame:
    da = _distinct_partials(a, cols).drop_duplicates()
    db = _distinct_partials(b, cols).drop_duplicates()
    m = da.merge(db, on=cols, how="outer", indicator=True)
    if op == "intersect":
        keep = m["_merge"] == "both"
    elif op == "except":
        keep = m["_merge"] == "left_only"
    else:  # union
        keep = np.ones(len(m), dtype=bool)
    return m.loc[keep, cols]


def _encode_key(t: pa.Table, cols: List[str]) -> pa.Table:
    import pyarrow.compute as pc

    parts = []
    for c in cols:
        s = pc.cast(t[c], pa.string())
        # escape before joining: a value containing the field separator
        # (or equal to the null sentinel) must not collide with a
        # different tuple — escaping is injective, so tuple identity is
        # preserved ("\x1e"->"\x1e\x1e" first, then "\x1f"->"\x1eF")
        s = pc.replace_substring(s, pattern="\x1e",
                                 replacement="\x1e\x1e")
        s = pc.replace_substring(s, pattern="\x1f",
                                 replacement="\x1eF")
        parts.append(pc.coalesce(s, _NULL))
    key = parts[0] if len(parts) == 1 else pc.binary_join_element_wise(
        *parts, "\x1f")
    return t.append_column(_KEY, key)


def _shuffle(a, b, cols: List[str], op: str, n_buckets: int) -> pd.DataFrame:
    from .keyed_window import keyed_apply

    def tag(side: int):
        def fn(t: pa.Table) -> pa.Table:
            d = t.select(cols).group_by(cols).aggregate([])
            d = d.append_column(_SIDE, pa.array(
                np.full(d.num_rows, side, dtype=np.int8)))
            return _encode_key(d, cols)
        return fn

    u = a.map_batches(tag(0), batch_format="pyarrow",
                      zero_copy_batch=True).union(
        b.map_batches(tag(1), batch_format="pyarrow", zero_copy_batch=True))

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        gb = g.groupby(_KEY, sort=False)[_SIDE]
        in_a = gb.min().eq(0)   # any side-0 row
        in_b = gb.max().eq(1)   # any side-1 row
        if op == "intersect":
            keep = in_a & in_b
        elif op == "except":
            keep = in_a & ~in_b
        else:
            keep = in_a | in_b
        first = g.drop_duplicates(_KEY).set_index(_KEY)
        return (first.loc[keep[keep].index, cols].reset_index(drop=True))

    out = keyed_apply(u, _KEY, kernel, n_buckets=n_buckets).to_pandas()
    return out if len(out) else pd.DataFrame({c: [] for c in cols})


def _setop(a, b, cols: Sequence[str], op: str, mode: str,
           n_buckets: int) -> pd.DataFrame:
    cols = list(cols)
    if mode == "auto":
        mode = ("driver" if a.count() + b.count() <= 5_000_000
                else "shuffle")
    if mode == "driver":
        out = _driver(a, b, cols, op)
    elif mode == "shuffle":
        out = _shuffle(a, b, cols, op, n_buckets)
    else:
        raise ValueError(f"unknown mode {mode!r}")
    return (out.sort_values(cols, na_position="last")
            .reset_index(drop=True))


def intersect_distinct(a, b, cols: Sequence[str], *, mode: str = "auto",
                       n_buckets: int = 32) -> pd.DataFrame:
    """SQL ``A INTERSECT B`` over the given columns."""
    return _setop(a, b, cols, "intersect", mode, n_buckets)


def except_distinct(a, b, cols: Sequence[str], *, mode: str = "auto",
                    n_buckets: int = 32) -> pd.DataFrame:
    """SQL ``A EXCEPT B`` over the given columns."""
    return _setop(a, b, cols, "except", mode, n_buckets)


def union_distinct(a, b, cols: Sequence[str], *, mode: str = "auto",
                   n_buckets: int = 32) -> pd.DataFrame:
    """SQL ``A UNION B`` (distinct) over the given columns."""
    return _setop(a, b, cols, "union", mode, n_buckets)
