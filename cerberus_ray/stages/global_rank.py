"""Global (un-partitioned) ranking: SQL ``ROW_NUMBER / RANK /
DENSE_RANK / PERCENT_RANK () OVER (ORDER BY ...)`` as a distributed
operator.

The per-key window functions live in ``stages/window_fns`` (partitioned
by a key, vectorized per bucket); a GLOBAL order has no partition key to
hash on, so it needs one of two plans:

- ``sort`` mode (the scale path): Ray's range-partition sort makes
  block key-ranges disjoint, so with a TOTAL ordering (no duplicate key
  tuples — add a tiebreak column) each block's rank offset is just the
  number of rows in blocks with smaller keys. Pass 1 emits per-block
  ``(min_key, n_rows)`` summaries (tiny); the driver prefix-sums them in
  key order; pass 2 re-finds each block's offset BY ITS OWN MIN KEY and
  adds a local arange. No O(rows) driver structure, one exchange (the
  sort). Under a total order row_number = rank = dense_rank, so one
  column serves all.
- ``map`` mode (bounded-key path): ranks depend only on each row's KEY,
  so a grouped count per distinct key + a cumulative walk over the
  sorted distinct keys gives rank (count strictly smaller + 1),
  dense_rank (distinct index + 1) and percent_rank exactly — with
  proper SQL tie semantics — broadcast as a lookup and applied in one
  streamed pass. Driver holds O(#distinct keys): the right plan for
  enum/date/bucketed keys, wrong for near-unique keys (use sort mode).

Both modes are DuckDB-parity- and agreement-tested
(tests/test_global_rank.py).
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np
import pandas as pd
import pyarrow as pa

#: auto planner: above this many distinct key tuples, map mode's
#: broadcast lookup stops being "bounded" and sort mode takes over
MAP_DISTINCT_LIMIT = 2_000_000


def _flip(v: np.ndarray, col: str) -> np.ndarray:
    if v.dtype.kind not in "iuf":
        raise ValueError(
            f"descending on non-numeric key {col!r} not supported")
    return -v


def _key_tuple_arrays(b: pa.Table, keys: Sequence[str],
                      desc: Sequence[bool]):
    cols = []
    for c, d in zip(keys, desc):
        v = b[c].to_numpy(zero_copy_only=False)
        cols.append(_flip(v, c) if d else v)
    return cols


def global_row_number(ds, keys: Sequence[str], *,
                      descending: Sequence[bool] | bool = False,
                      out_col: str = "row_number"):
    """→ Dataset with ``out_col`` = 1-based global position under the
    TOTAL ordering ``keys`` (duplicate key tuples would make the
    assignment within ties arbitrary — include a tiebreak column; the
    total order also means rank/dense_rank coincide with this value).

    Sort-mode plan (see module docstring): one Ray sort, per-block
    min-key offset lookup, no O(rows) driver state."""
    keys = list(keys)
    desc = ([descending] * len(keys) if isinstance(descending, bool)
            else list(descending))
    if any(desc):
        sch = ds.schema()
        types = dict(zip(sch.names, sch.types))
        for c, d in zip(keys, desc):
            if not d:
                continue
            t = types[c]
            # Ray schemas mix pyarrow DataTypes and plain Python/numpy
            # type objects depending on the block format
            num = (isinstance(t, pa.DataType)
                   and (pa.types.is_integer(t) or pa.types.is_floating(t))
                   ) or (isinstance(t, type)
                         and issubclass(t, (int, float, np.integer,
                                            np.floating)))
            if not num:
                raise ValueError(
                    f"descending on non-numeric key {c!r} not supported")
    srt = ds.sort(keys, descending=desc).materialize()

    def _min_key_str(b: pa.Table) -> str:
        """Canonical id of a block = its minimum key tuple (blocks of a
        range-partition sort have disjoint key ranges, so this is
        unique per nonempty block under a total order)."""
        cols = _key_tuple_arrays(b, keys, desc)
        first = int(np.lexsort(cols[::-1])[0])
        return "\x1e".join(str(b[c][first].as_py()) for c in keys)

    def summary(b: pa.Table) -> pa.Table:
        if not b.num_rows:
            return b.select(keys).append_column(
                "__n", pa.array([], pa.int64()))
        cols = _key_tuple_arrays(b, keys, desc)
        first = int(np.lexsort(cols[::-1])[0])
        return b.select(keys).take([first]).append_column(
            "__n", pa.array([b.num_rows], pa.int64()))

    # pass 1: one tiny (min-key, n_rows) row per block; the driver
    # restores block order by sorting those rows by key — O(#blocks)
    sm = srt.map_batches(summary, batch_format="pyarrow",
                         zero_copy_batch=True).to_pandas()
    sort_cols = []
    for c, d in zip(keys, desc):
        v = sm[c].to_numpy()
        sort_cols.append(_flip(v, c) if d else v)
    order = (np.lexsort(sort_cols[::-1]) if len(sm)
             else np.zeros(0, np.int64))
    ns = sm["__n"].to_numpy()[order]
    # per-row itertuples keeps each column's dtype (a frame-level
    # to_numpy() would upcast int keys next to float keys → "1187.0"
    # never matches the worker's str(1187))
    ordered = sm.iloc[order]
    mks = ["\x1e".join(str(v.item() if hasattr(v, "item") else v)
                       for v in t)
           for t in ordered[keys].itertuples(index=False, name=None)]
    offsets = dict(zip(mks, np.cumsum(ns) - ns))

    def add_rank(b: pa.Table) -> pa.Table:
        if not b.num_rows:
            return b.append_column(out_col, pa.array([], pa.int64()))
        cols = _key_tuple_arrays(b, keys, desc)
        local = np.lexsort(cols[::-1])
        rn = np.empty(b.num_rows, dtype=np.int64)
        rn[local] = np.arange(b.num_rows) + offsets[_min_key_str(b)] + 1
        return b.append_column(out_col, pa.array(rn, pa.int64()))

    return srt.map_batches(add_rank, batch_format="pyarrow",
                           zero_copy_batch=True)


def global_ranks_by_key(ds, keys: Sequence[str], *,
                        descending: Sequence[bool] | bool = False):
    """→ Dataset + columns ``rank``, ``dense_rank``, ``percent_rank``
    with exact SQL tie semantics (all three depend only on the row's
    key tuple, never on arbitrary tie order). Map-mode plan: grouped
    counts per distinct key (pyarrow partials + driver merge) → ranks by
    cumulative walk → broadcast lookup, one streamed pass; driver memory
    O(#distinct keys) — for near-unique keys use
    :func:`global_row_number` (sort mode) instead."""
    import ray

    keys = list(keys)
    desc = ([descending] * len(keys) if isinstance(descending, bool)
            else list(descending))

    def partial(b: pa.Table) -> pa.Table:
        return b.group_by(keys).aggregate([([], "count_all")])

    pdf = ds.map_batches(partial, batch_format="pyarrow",
                         zero_copy_batch=True).to_pandas()
    g = pdf.groupby(keys, as_index=False)["count_all"].sum()
    if len(g) > MAP_DISTINCT_LIMIT:
        raise ValueError(
            f"{len(g)} distinct keys exceed map-mode bound "
            f"{MAP_DISTINCT_LIMIT}; use global_row_number (sort mode)")
    sort_cols = []
    for c, d in zip(keys, desc):
        v = g[c].to_numpy()
        sort_cols.append(_flip(v, c) if d else v)
    order = np.lexsort(sort_cols[::-1])
    cnt = g["count_all"].to_numpy()[order].astype(np.int64)
    n = int(cnt.sum())
    rank = np.cumsum(cnt) - cnt + 1                 # SQL RANK
    dense = np.arange(1, len(cnt) + 1, dtype=np.int64)
    pct = ((rank - 1) / (n - 1)) if n > 1 else np.zeros(len(cnt))
    lut = pd.DataFrame({c: g[c].to_numpy()[order] for c in keys})
    lut["rank"], lut["dense_rank"], lut["percent_rank"] = rank, dense, pct
    lut = lut.set_index(keys)
    ref = ray.put(lut)

    def attach(b: pa.Table) -> pa.Table:
        m = ray.get(ref)
        df = b.select(keys).to_pandas()
        idx = pd.MultiIndex.from_frame(df) if len(keys) > 1 else \
            pd.Index(df[keys[0]])
        got = m.loc[idx]
        out = b
        out = out.append_column("rank",
                                pa.array(got["rank"].to_numpy(), pa.int64()))
        out = out.append_column(
            "dense_rank", pa.array(got["dense_rank"].to_numpy(), pa.int64()))
        out = out.append_column(
            "percent_rank",
            pa.array(got["percent_rank"].to_numpy(), pa.float64()))
        return out

    return ds.map_batches(attach, batch_format="pyarrow",
                          zero_copy_batch=True)
