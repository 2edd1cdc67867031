"""Z-order (Morton) data layout for multi-column scan pruning.

Parquet readers prune row groups whose column statistics cannot match
the scan predicate. A sort on ONE column gives tight min/max stats on
that column only; a Z-ORDER sort interleaves the bits of several
columns' equi-depth ranks so that rows close in the multi-dimensional
key space land in the same row groups — every interleaved column gets
usefully tight statistics, and a conjunctive range predicate over any
subset of them skips most of the file footprint. This is the layout
maintenance step behind `OPTIMIZE ... ZORDER BY` in lakehouse engines
(Delta/Iceberg) and the reason a 100 TB table can serve selective
multi-column scans without a secondary index.

Ray-Data-first shape:
- boundary fit: each block contributes a fixed-size per-column order-
  statistic grid (a ``map_batches`` partial, ~``grid`` floats per column
  per block); the driver pools the grids and takes equi-depth cut points
  — the same sample-then-cut scheme Spark's RangePartitioner uses for
  ``sort``. The pooled grid is a multiset, so the boundaries are
  block-arrival-order independent.
- key assignment: stateless vectorized ``searchsorted`` + bit interleave
  per batch (no Python per row).
- the sort itself is Ray's distributed range-partition sort — the one
  unavoidable exchange, and the entire point of the operator (it IS the
  data movement that creates locality).
- pruning measurement reads FOOTERS only (`rowgroups_overlapping`) —
  exactly what a scan planner does; no data pages are touched.

Reference anchor: the reference engine's admin list views rely on the
ORM's ordered table scans (cerberus/models/booking.py ordering Meta);
this module is the storage-layout counterpart that makes such ordered/
filtered scans cheap at scale rather than a new query semantic.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
import pyarrow as pa

__all__ = [
    "fit_zorder_boundaries",
    "zorder_codes",
    "interleave_bits",
    "zorder_sort",
    "rowgroups_overlapping",
    "range_count",
]


def _numeric(col: "pa.ChunkedArray | pa.Array") -> np.ndarray:
    """Column → float64 numpy with nulls as NaN (rank space is float)."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    return np.asarray(arr.cast(pa.float64()).to_numpy(zero_copy_only=False),
                      dtype=np.float64)


def fit_zorder_boundaries(ds, cols: Sequence[str], *, bits: int,
                          grid: int = 256) -> Dict[str, np.ndarray]:
    """Equi-depth cut points per column: ``2**bits - 1`` boundaries each.

    Per-block partial = the block's ``grid``-point order-statistic grid
    per column (sorted values at evenly spaced ranks) — a fixed-size
    sketch, so the driver pool is O(#blocks × grid), never O(rows).
    """
    names = list(cols)

    def partial(b: pa.Table) -> pa.Table:
        out = {}
        for c in names:
            v = _numeric(b[c])
            v = np.sort(v[~np.isnan(v)])
            if len(v) == 0:
                out[c] = np.zeros(0, dtype=np.float64)
            elif len(v) <= grid:
                out[c] = v
            else:
                idx = ((np.arange(grid, dtype=np.float64) + 0.5)
                       * len(v) / grid).astype(np.int64)
                out[c] = v[idx]
        n = max((len(v) for v in out.values()), default=0)
        return pa.Table.from_pydict(
            {c: pa.array(np.pad(out[c], (0, n - len(out[c])),
                                constant_values=np.nan))
             for c in names})

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True).to_pandas()
    n_cuts = (1 << bits) - 1
    qs = (np.arange(n_cuts, dtype=np.float64) + 1.0) / (1 << bits)
    bounds: Dict[str, np.ndarray] = {}
    for c in names:
        pool = np.sort(parts[c].to_numpy(dtype=np.float64))
        pool = pool[~np.isnan(pool)]
        if len(pool) == 0:
            bounds[c] = np.zeros(n_cuts, dtype=np.float64)
        else:
            bounds[c] = np.quantile(pool, qs)
    return bounds


def interleave_bits(codes: List[np.ndarray], bits: int) -> np.ndarray:
    """Morton-interleave d code arrays (each in [0, 2**bits)) → uint64.

    Bit b of column j lands at output bit ``b*d + (d-1-j)`` so column 0
    owns the most significant bit of each round — ties broken by the
    leading column, matching the intuition of ``ZORDER BY (a, b)``.
    """
    d = len(codes)
    if d * bits > 63:
        raise ValueError(f"{d} columns x {bits} bits exceeds 63 z-bits")
    z = np.zeros(len(codes[0]), dtype=np.uint64)
    for j, cj in enumerate(codes):
        c = cj.astype(np.uint64)
        for b in range(bits):
            z |= ((c >> np.uint64(b)) & np.uint64(1)) << np.uint64(
                b * d + (d - 1 - j))
    return z


def zorder_codes(b: pa.Table, cols: Sequence[str],
                 bounds: Dict[str, np.ndarray], bits: int) -> np.ndarray:
    """Vectorized z-value per row of a batch. Nulls/NaN rank highest
    (searchsorted puts NaN after every boundary), i.e. they cluster at
    the top of the layout rather than scattering."""
    codes = []
    for c in cols:
        v = _numeric(b[c])
        codes.append(np.clip(np.searchsorted(bounds[c], v, side="right"),
                             0, (1 << bits) - 1))
    return interleave_bits(codes, bits)


def zorder_sort(ds, cols: Sequence[str], *, bits: Optional[int] = None,
                grid: int = 256):
    """Sort a Dataset by the Morton code of ``cols`` (equi-depth ranks).

    Output holds exactly the input rows, ordered by (z, *cols). The
    column tiebreak makes the order total GIVEN the fitted boundaries,
    so a rerun over the same input blocks is bit-identical; a different
    input block layout can shift boundary estimates slightly and move
    rows near bucket edges (the same property as Spark's sampled
    RangePartitioner — the row SET and scan results never change, only
    the physical placement). Write the result with bounded rows per
    file/row group and multi-column range scans prune
    (see `rowgroups_overlapping`).
    """
    names = list(cols)
    if not names:
        raise ValueError("zorder_sort needs at least one column")
    if bits is None:
        bits = min(16, 63 // len(names))
    bounds = fit_zorder_boundaries(ds, names, bits=bits, grid=grid)

    def add_z(b: pa.Table) -> pa.Table:
        return b.append_column(
            "__z", pa.array(zorder_codes(b, names, bounds, bits),
                            pa.uint64()))

    def drop_z(b: pa.Table) -> pa.Table:
        return b.drop_columns(["__z"])

    out = (ds.map_batches(add_z, batch_format="pyarrow",
                          zero_copy_batch=True)
             .sort(["__z", *names])
             .map_batches(drop_z, batch_format="pyarrow",
                          zero_copy_batch=True))
    return out


def _parquet_files(path: str) -> List[str]:
    if os.path.isfile(path):
        return [path]
    found = []
    for root, _, files in os.walk(path):
        for f in sorted(files):
            if f.endswith(".parquet"):
                found.append(os.path.join(root, f))
    return sorted(found)


def rowgroups_overlapping(path: str,
                          preds: Dict[str, Tuple[float, float]]
                          ) -> Tuple[int, int]:
    """(total row groups, row groups a range scan must read) — a
    footer-only pass over every parquet file under ``path``, counting
    row groups whose [min, max] statistics intersect EVERY
    ``col: (lo, hi)`` band (closed intervals). This is the scan
    planner's pruning decision, measured instead of guessed."""
    import pyarrow.parquet as pq

    total = hit = 0
    for f in _parquet_files(path):
        md = pq.ParquetFile(f).metadata
        name_to_idx = {md.schema.column(i).path: i
                       for i in range(md.num_columns)}
        for rg in range(md.num_row_groups):
            total += 1
            g = md.row_group(rg)
            keep = True
            for c, (lo, hi) in preds.items():
                st = g.column(name_to_idx[c]).statistics
                if st is None or st.min is None:  # no stats → must read
                    continue
                if st.max < lo or st.min > hi:
                    keep = False
                    break
            hit += keep
    return total, hit


def range_count(path: str, preds: Dict[str, Tuple[float, float]],
                **read_kwargs) -> int:
    """Count rows matching conjunctive closed-interval predicates via a
    pruned parquet read (filter pushdown skips non-overlapping row
    groups — the layout's payoff at scan time)."""
    import pyarrow.dataset as pads

    from ..sources.io import read_table

    expr = None
    for c, (lo, hi) in preds.items():
        e = (pads.field(c) >= lo) & (pads.field(c) <= hi)
        expr = e if expr is None else expr & e
    return read_table(path, columns=list(preds), filter=expr).count()
