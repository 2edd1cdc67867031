"""Schema-evolution reader: UNION BY NAME over heterogeneous parquet.

A long-lived data lake accumulates files written under different schema
versions — columns added, dropped, or widened (int32→int64,
float32→float64). A plain ``read_parquet`` over such a directory fails
or silently mis-aligns; this reader resolves ONE unified schema from
the file footers (footer-only planning, no data pages — same discovery
contract as ``stages/catalog.py``) and streams every file through a
vectorized per-batch alignment: missing columns materialize as typed
nulls, narrower numerics cast up, column order normalizes. The DuckDB
analogue is ``read_parquet([...], union_by_name=true)``
(tests/test_union_by_name.py asserts parity).

Type unification is deliberately conservative: numeric widths unify to
the widest member (int⊎int → widest int, any float present → widest
float); identical types pass through; anything else (e.g. int vs
string) raises — silent coercion is how lakes rot.
"""

from __future__ import annotations

import os
from typing import Dict, List

import pyarrow as pa


def _unify(a: pa.DataType, b: pa.DataType, col: str) -> pa.DataType:
    if a.equals(b):
        return a
    num = {pa.int8(): 8, pa.int16(): 16, pa.int32(): 32, pa.int64(): 64}
    flt = {pa.float32(): 32, pa.float64(): 64}
    if a in num and b in num:
        return a if num[a] >= num[b] else b
    if (a in flt or a in num) and (b in flt or b in num) and (
            a in flt or b in flt):
        # any float member ⇒ float, at the widest BIT width present
        # (int64 ⊎ float32 → float64: don't squeeze 64-bit ints into a
        # 24-bit mantissa)
        w = max(flt.get(a) or num[a], flt.get(b) or num[b])
        return pa.float64() if w == 64 else pa.float32()
    raise TypeError(
        f"column {col!r} has irreconcilable types across files: "
        f"{a} vs {b} (only numeric widenings unify)")


def _parquet_files(path: str) -> List[str]:
    if os.path.isfile(path):
        return [path]
    out: List[str] = []
    for root, _dirs, files in os.walk(path):
        out.extend(os.path.join(root, f) for f in sorted(files)
                   if f.endswith(".parquet"))
    return sorted(out)


def unified_schema(path: str) -> pa.Schema:
    """Resolve the union-by-name schema of every parquet file under
    ``path`` from footers only. Column order = first appearance across
    files (DuckDB's union_by_name convention)."""
    import pyarrow.parquet as pq

    fields: Dict[str, pa.DataType] = {}
    order: List[str] = []
    for f in _parquet_files(path):
        sch = pq.read_schema(f)
        for name, typ in zip(sch.names, sch.types):
            if name in fields:
                fields[name] = _unify(fields[name], typ, name)
            else:
                fields[name] = typ
                order.append(name)
    if not order:
        raise FileNotFoundError(f"no parquet files under {path!r}")
    return pa.schema([(c, fields[c]) for c in order])


def schema_diff(path_a: str, path_b: str) -> "pd.DataFrame":
    """Footer-only schema diff between two parquet table paths → frame
    (column, status ∈ {added, removed, changed, unchanged}, type_a,
    type_b) — the migration-review companion of the union reader: zero
    data pages, O(#files) footers."""
    import pandas as pd

    sa = unified_schema(path_a)
    sb = unified_schema(path_b)
    ta = {f.name: str(f.type) for f in sa}
    tb = {f.name: str(f.type) for f in sb}
    rows = []
    for c in sorted(set(ta) | set(tb)):
        if c not in tb:
            st = "removed"
        elif c not in ta:
            st = "added"
        elif ta[c] != tb[c]:
            st = "changed"
        else:
            st = "unchanged"
        rows.append({"column": c, "status": st,
                     "type_a": ta.get(c), "type_b": tb.get(c)})
    return pd.DataFrame(rows)


def read_union_by_name(path: str, *, columns: List[str] | None = None):
    """→ Dataset over every parquet file under ``path`` with the
    unified schema: missing columns are typed nulls, narrower numerics
    cast up, columns ordered per :func:`unified_schema`. One streamed
    read per file (no mid-pipeline materialization); ``columns`` prunes
    the unified schema (files still read only their own columns)."""
    target = unified_schema(path)
    if columns is not None:
        target = pa.schema([(c, target.field(c).type) for c in columns])
    names = list(target.names)

    def align(b: pa.Table) -> pa.Table:
        cols = []
        for c in names:
            typ = target.field(c).type
            if c in b.column_names:
                col = b[c]
                cols.append(col if col.type.equals(typ)
                            else col.cast(typ))
            else:
                cols.append(pa.nulls(b.num_rows, typ))
        return pa.Table.from_arrays(cols, names=names)

    from .io import read_table

    parts = []
    for f in _parquet_files(path):
        import pyarrow.parquet as pq

        have = [c for c in names if c in set(pq.read_schema(f).names)]
        # read_table sizes blocks by bytes — Ray's default CPU-count
        # parallelism over-splits small generation files (measured 5.2 s
        # vs 0.6 s for three 50k-row files at 32 CPUs)
        parts.append(
            read_table(f, columns=have or None)
            .map_batches(align, batch_format="pyarrow",
                         zero_copy_batch=True))
    ds = parts[0]
    for p in parts[1:]:
        ds = ds.union(p)
    return ds
