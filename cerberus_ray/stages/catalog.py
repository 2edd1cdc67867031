"""Dataset catalog — footer-only discovery over a directory of tables.

A data root at scale holds many logical tables (one directory or file
each, possibly hive-partitioned). Operators and humans both need the
``SHOW TABLES`` view — name, rows, bytes, file count, partition keys,
schema — WITHOUT scanning data. Parquet footers carry all of it, so the
catalog is a metadata walk: O(#files) footer reads, zero data pages,
no Ray execution at all (the catalog is what you consult BEFORE building
a pipeline; e.g. the broadcast-vs-shuffle join planners key on exactly
these row counts).
"""

from __future__ import annotations

import os
import re
from typing import Dict, List, Optional

import pyarrow as pa

__all__ = ["catalog_report", "table_profile"]

_PART_RE = re.compile(r"^[^=/]+=[^=/]*$")


def _leaf_tables(root: str) -> Dict[str, List[str]]:
    """→ {table name: parquet files}. A table is a top-level *.parquet
    file or a top-level directory (its parquet files found recursively,
    hive key=value levels folded in)."""
    tables: Dict[str, List[str]] = {}
    for entry in sorted(os.listdir(root)):
        full = os.path.join(root, entry)
        if os.path.isfile(full) and entry.endswith(".parquet"):
            tables[entry[:-len(".parquet")]] = [full]
        elif os.path.isdir(full):
            files = []
            for dirpath, _, names in os.walk(full):
                files += [os.path.join(dirpath, f) for f in sorted(names)
                          if f.endswith(".parquet")]
            if files:
                tables[entry] = sorted(files)
    return tables


def _partition_keys(table_dir_files: List[str], root: str) -> List[str]:
    keys = set()
    for f in table_dir_files:
        for seg in os.path.relpath(f, root).split(os.sep)[:-1]:
            if _PART_RE.match(seg):
                keys.add(seg.split("=", 1)[0])
    return sorted(keys)


def table_profile(files: List[str]) -> dict:
    """Footer roll-up for one table: rows, serialized bytes, row groups,
    schema signature."""
    import pyarrow.parquet as pq

    rows = n_bytes = n_rg = 0
    schema = None
    for f in files:
        md = pq.ParquetFile(f).metadata
        rows += md.num_rows
        n_rg += md.num_row_groups
        n_bytes += os.path.getsize(f)
        if schema is None:
            schema = pq.read_schema(f)
    cols = ([f"{n}:{t}" for n, t in zip(schema.names,
                                        map(str, schema.types))]
            if schema is not None else [])
    return {"rows": rows, "bytes": n_bytes, "files": len(files),
            "row_groups": n_rg, "n_columns": len(cols),
            "schema": ", ".join(cols)}


def catalog_report(root: str) -> pa.Table:
    """→ (table, rows, bytes, files, row_groups, n_columns,
    partition_keys, schema) — one row per logical table under ``root``,
    sorted by table name."""
    out = {"table": [], "rows": [], "bytes": [], "files": [],
           "row_groups": [], "n_columns": [], "partition_keys": [],
           "schema": []}
    for name, files in _leaf_tables(root).items():
        prof = table_profile(files)
        base = os.path.join(root, name)
        parts = (_partition_keys(files, base)
                 if os.path.isdir(base) else [])
        out["table"].append(name)
        out["rows"].append(prof["rows"])
        out["bytes"].append(prof["bytes"])
        out["files"].append(prof["files"])
        out["row_groups"].append(prof["row_groups"])
        out["n_columns"].append(prof["n_columns"])
        out["partition_keys"].append(",".join(parts))
        out["schema"].append(prof["schema"])
    return pa.Table.from_pydict({
        "table": pa.array(out["table"], pa.string()),
        "rows": pa.array(out["rows"], pa.int64()),
        "bytes": pa.array(out["bytes"], pa.int64()),
        "files": pa.array(out["files"], pa.int64()),
        "row_groups": pa.array(out["row_groups"], pa.int64()),
        "n_columns": pa.array(out["n_columns"], pa.int64()),
        "partition_keys": pa.array(out["partition_keys"], pa.string()),
        "schema": pa.array(out["schema"], pa.string()),
    })
