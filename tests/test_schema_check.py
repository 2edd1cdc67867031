"""Table-schema conformance: exact rule/path rows for every drift class
(missing/extra column, type change, nested struct and list-element
mismatches), per-fragment footer scanning, and a clean pass on the
declared interleaved schema."""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from cerberus_ray.schema import DOCUMENTS_INTERLEAVED, SPAN_STRUCT
from cerberus_ray.stages.schema_check import (check_parquet_fragments,
                                              schema_violations)

EXPECTED = pa.schema([("doc_id", pa.int64()), ("text", pa.string()),
                      ("n_chars", pa.int64())])


def rows(t):
    return sorted((r["rule"], r["path"]) for r in t.to_pylist())


def test_conforming_schema_no_rows():
    assert schema_violations(EXPECTED, EXPECTED).num_rows == 0
    # column order is not drift
    reordered = pa.schema([("text", pa.string()), ("n_chars", pa.int64()),
                           ("doc_id", pa.int64())])
    assert schema_violations(reordered, EXPECTED).num_rows == 0


def test_flat_drift_classes():
    actual = pa.schema([("doc_id", pa.int32()),      # type change
                        ("text", pa.string()),
                        ("extra", pa.bool_())])      # extra; n_chars missing
    got = rows(schema_violations(actual, EXPECTED, source="f1"))
    assert got == [("schema-extra-column", "extra"),
                   ("schema-missing-column", "n_chars"),
                   ("schema-type-mismatch", "doc_id")]


def test_nested_struct_and_list_drift():
    bad_span = pa.struct([("kind", pa.string()),
                          ("text", pa.large_string()),   # leaf type change
                          ("offset", pa.int32())])       # media_ref missing
    actual = pa.schema([("doc_id", pa.string()),
                        ("spans", pa.list_(bad_span))])
    got = rows(schema_violations(actual, DOCUMENTS_INTERLEAVED))
    assert ("schema-missing-field", "spans[].media_ref") in got
    assert ("schema-type-mismatch", "spans[].text") in got
    # conforming interleaved schema is silent
    ok = pa.schema([("doc_id", pa.string()),
                    ("spans", pa.list_(SPAN_STRUCT))])
    assert schema_violations(ok, DOCUMENTS_INTERLEAVED).num_rows == 0


def test_fragment_scan_per_file(ray_session, tmp_path):
    good = pa.table({"doc_id": pa.array([1], pa.int64()),
                     "text": pa.array(["x"]),
                     "n_chars": pa.array([1], pa.int64())})
    missing = good.drop_columns(["n_chars"])
    retyped = good.set_column(0, "doc_id",
                              pa.array([1.0], pa.float64()))
    pq.write_table(good, tmp_path / "part-0.parquet")
    pq.write_table(missing, tmp_path / "part-1.parquet")
    pq.write_table(retyped, tmp_path / "part-2.parquet")
    v = check_parquet_fragments(str(tmp_path), EXPECTED).to_pandas()
    assert sorted(zip(v["doc_id"], v["rule"], v["path"])) == [
        ("part-1.parquet", "schema-missing-column", "n_chars"),
        ("part-2.parquet", "schema-type-mismatch", "doc_id")]
    with pytest.raises(FileNotFoundError):
        check_parquet_fragments(str(tmp_path / "nope"), EXPECTED)


def test_testdata_documents_conform(ray_session):
    p = "/root/testdata/sf0.001/documents.parquet"
    declared = pq.read_schema(p)  # self-consistency: file vs itself
    assert check_parquet_fragments(p, declared).count() == 0
