"""PII redaction: byte-exact DuckDB regexp_replace parity (both sides
RE2), synthetic detection vectors, and the sf0.001 rollup pin."""

import duckdb
import pandas as pd
import pytest
import ray.data as rd

from cerberus_ray.pipelines.text import (PII_EMAIL_RE, PII_PHONE_RE,
                                         redact_pii)


def duck_redact(df: pd.DataFrame) -> pd.Series:
    con = duckdb.connect()
    con.register("docs", df)
    out = con.execute(
        "SELECT doc_id, regexp_replace(regexp_replace(COALESCE(text, ''),"
        f" '{PII_EMAIL_RE}', '<EMAIL>', 'g'),"
        f" '{PII_PHONE_RE}', '<PHONE>', 'g') AS text"
        " FROM docs").fetchdf()
    return out.set_index("doc_id")["text"]


def test_vectors_and_duckdb_parity(ray_session):
    df = pd.DataFrame({
        "doc_id": [f"d{i}" for i in range(7)],
        "text": [
            "contact bob@example.com for details",
            "two mails a@b.co and c@d.org here",
            "call 07123456789 now",
            "intl +447911123456 works too",
            "mixed: x@y.net then 07999888777 end",
            "no pii at all in this text",
            None,
        ]})
    got = (redact_pii(rd.from_pandas(df)).to_pandas()
           .set_index("doc_id")["text"])
    exp = duck_redact(df)
    for d in exp.index:
        assert got[d] == exp[d], d
    assert got["d0"] == "contact <EMAIL> for details"
    assert got["d2"] == "call <PHONE> now"
    assert got["d4"] == "mixed: <EMAIL> then <PHONE> end"
    assert got["d6"] == ""          # null → empty, not null


def test_duckdb_parity_on_sf0001_documents(ray_session):
    import pyarrow.parquet as pq
    df = (pq.read_table("/root/testdata/sf0.001/documents.parquet",
                        columns=["doc_id", "text"]).to_pandas())
    ds = rd.from_pandas(df, override_num_blocks=3)
    got = redact_pii(ds).to_pandas().set_index("doc_id")["text"]
    exp = duck_redact(df)
    mism = [d for d in exp.index if got[d] != exp[d]]
    assert mism == []


def test_sf0001_rollup_pin(ray_session):
    from cerberus_ray.pipelines.training_queries import q_doc_pii_redact
    t = q_doc_pii_redact("/root/testdata/sf0.001").to_pandas()
    assert int(t["n_docs"].sum()) == 500
    assert int(t["chars_before"].sum()) == 153156
    # the synthetic documents table contains no PII-shaped substrings:
    # redaction is a byte-exact no-op there (the vectors test covers hits)
    assert t["chars_after"].equals(t["chars_before"])
