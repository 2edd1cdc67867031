"""Unicode NFC normalization: byte-exact DuckDB nfc_normalize parity
(planted NFD/mixed forms), null/ASCII fast-path, and the dedup
motivation — composed and decomposed spellings hash identically after
normalization."""

import hashlib
import unicodedata

import duckdb
import pandas as pd
import pyarrow as pa

from cerberus_ray.functions.strings import nfc_normalize

CASES = [
    "plain ascii",
    "école",                                   # already composed
    unicodedata.normalize("NFD", "école"),      # decomposed e + U+0301
    unicodedata.normalize("NFD", "Müller-Straße çà"),
    "mixed " + unicodedata.normalize("NFD", "café") + " tail",
    "한국어 " + unicodedata.normalize("NFD", "한국어"),
    "",
    None,
    "Å",                             # A + ring → Å
]


def test_duckdb_parity():
    got = nfc_normalize(pa.array(CASES, pa.string())).to_pylist()
    con = duckdb.connect()
    con.register("t", pa.table({"s": pa.array(CASES, pa.string())}))
    want = [r[0] for r in
            con.execute("SELECT nfc_normalize(s) FROM t").fetchall()]
    assert got == want
    # the decomposed forms really changed (the test has teeth)
    assert got[2] == "école" and CASES[2] != "école"
    assert got[8] == "Å"


def test_ascii_fast_path_is_zero_copy():
    arr = pa.array(["only", "ascii", "rows", None])
    out = nfc_normalize(arr)
    assert out is arr  # untouched, not rebuilt


def test_dedup_motivation(ray_session):
    """After NFC normalization, composed and decomposed spellings of the
    same text produce identical md5 keys — the exact-dedup prerequisite."""
    import ray.data as rd

    composed = "résumé café naïve"
    decomposed = unicodedata.normalize("NFD", composed)
    assert composed != decomposed
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": pa.array([composed, decomposed], pa.string())}))

    def norm(b: pa.Table) -> pa.Table:
        i = b.schema.get_field_index("text")
        return b.set_column(i, "text", nfc_normalize(b["text"]))

    pdf = ds.map_batches(norm, batch_format="pyarrow",
                         zero_copy_batch=True).to_pandas()
    keys = pdf["text"].map(
        lambda s: hashlib.md5(s.encode()).hexdigest()).unique()
    assert len(keys) == 1
