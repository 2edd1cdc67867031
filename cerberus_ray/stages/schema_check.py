"""Table-schema conformance validation — catch schema drift BEFORE any
data pass.

The reference pins its schema as Django model fields and migrations
(SURVEY.md §1.2; reference: cerberus/migrations/0001_initial.py): an
input whose columns moved is rejected structurally, not row-by-row. The
Ray-native analogue validates every parquet FRAGMENT's footer schema
against the declared ``pyarrow.Schema`` — a dataset written over months
can contain fragments from different writer versions, and
``read_parquet`` would silently unify or fail mid-stream; this stage
surfaces the drift as normal violation rows up front.

Scale shape: one Ray task per parquet file reading ONLY the footer
(`pyarrow.parquet.read_schema` — KBs of metadata, no row groups), via
``from_items(paths).map_batches``. 10^6 fragments = 10^6 tiny metadata
reads, embarrassingly parallel; no data moves. Violations stream out in
the engine's VIOLATIONS schema with ``path`` = dotted field path (nested
structs compared recursively, so the interleaved ``spans`` element
struct is covered field-for-field).
"""

from __future__ import annotations

import os
from typing import List

import pyarrow as pa

from ..schema import VIOLATIONS


def _type_violations(path: str, exp: pa.DataType, act: pa.DataType,
                     out: List[dict], ctx: str) -> None:
    """Recursive structural compare; emits one row per mismatched leaf."""
    if exp.equals(act):
        return
    if pa.types.is_struct(exp) and pa.types.is_struct(act):
        exp_names = {f.name: f for f in exp}
        act_names = {f.name: f for f in act}
        for name, f in exp_names.items():
            if name not in act_names:
                out.append({"doc_id": ctx, "rule": "schema-missing-field",
                            "path": f"{path}.{name}", "detail": str(f.type)})
            else:
                _type_violations(f"{path}.{name}", f.type,
                                 act_names[name].type, out, ctx)
        for name in act_names:
            if name not in exp_names:
                out.append({"doc_id": ctx, "rule": "schema-extra-field",
                            "path": f"{path}.{name}",
                            "detail": str(act_names[name].type)})
        return
    if (pa.types.is_list(exp) or pa.types.is_large_list(exp)) and \
            (pa.types.is_list(act) or pa.types.is_large_list(act)):
        _type_violations(f"{path}[]", exp.value_type, act.value_type,
                         out, ctx)
        return
    out.append({"doc_id": ctx, "rule": "schema-type-mismatch", "path": path,
                "detail": f"expected {exp}, got {act}"})


def schema_violations(actual: pa.Schema, expected: pa.Schema, *,
                      source: str = "") -> pa.Table:
    """→ VIOLATIONS-schema table comparing one actual schema against the
    declared one (``doc_id`` carries the fragment/source id; column
    ORDER is not a violation — the engine projects by name)."""
    out: List[dict] = []
    act = {f.name: f for f in actual}
    for f in expected:
        if f.name not in act:
            out.append({"doc_id": source, "rule": "schema-missing-column",
                        "path": f.name, "detail": str(f.type)})
        else:
            _type_violations(f.name, f.type, act[f.name].type, out, source)
    for name in act:
        if expected.get_field_index(name) < 0:
            out.append({"doc_id": source, "rule": "schema-extra-column",
                        "path": name, "detail": str(act[name].type)})
    if not out:
        return VIOLATIONS.empty_table()
    return pa.Table.from_pylist(out, schema=VIOLATIONS)


def check_parquet_fragments(path: str, expected: pa.Schema):
    """→ Dataset of schema violations across every parquet fragment
    under ``path`` (a file or a directory tree). One footer-only read
    per file, distributed — no row data is touched."""
    import ray.data as rd

    if os.path.isdir(path):
        files = sorted(
            os.path.join(r, f)
            for r, _, fs in os.walk(path) for f in fs
            if f.endswith(".parquet"))
    elif os.path.isfile(path):
        files = [path]
    else:
        files = []
    if not files:
        raise FileNotFoundError(f"no parquet fragments under {path!r}")

    exp_ref = expected  # schemas are tiny; closure capture is fine

    def check(batch: pa.Table) -> pa.Table:
        import pyarrow.parquet as pq

        tables = []
        for p in batch["item"].to_pylist():
            tables.append(schema_violations(pq.read_schema(p), exp_ref,
                                            source=os.path.basename(p)))
        return pa.concat_tables(tables) if tables \
            else VIOLATIONS.empty_table()

    return rd.from_items(files).map_batches(check, batch_format="pyarrow")
