"""JSONL / CSV ingestion adapters: format-independent logical schema —
the same table read from parquet, jsonl and csv yields identical rows,
and a downstream pipeline result is byte-identical across formats."""

import os

import pyarrow as pa
import pyarrow.parquet as pq

from cerberus_ray.sources.io import read_csv, read_jsonl, read_table

SF = "/root/testdata/sf0.001"

SCHEMA = pa.schema([("doc_id", pa.int64()), ("text", pa.string()),
                    ("lang", pa.string()), ("source", pa.string()),
                    ("n_chars", pa.int64())])


def _export(tmpdir: str) -> tuple[str, str]:
    """Write the sf0.001 documents table as .jsonl and .csv once."""
    t = pq.read_table(f"{SF}/documents.parquet")
    pdf = t.to_pandas()
    # newlines inside text break one-record-per-line JSONL/CSV exports;
    # encode them (the exchange-format producer's job, not the reader's)
    pdf["text"] = pdf["text"].str.replace("\n", "\\n", regex=False)
    jl = os.path.join(tmpdir, "documents.jsonl")
    cs = os.path.join(tmpdir, "documents.csv")
    pdf.to_json(jl, orient="records", lines=True, force_ascii=False)
    pdf.to_csv(cs, index=False)
    return jl, cs


def _sorted_pdf(ds, columns):
    pdf = ds.to_pandas()[list(columns)]
    return pdf.sort_values("doc_id").reset_index(drop=True)


def test_jsonl_equals_parquet(ray_session, tmp_path):
    jl, _ = _export(str(tmp_path))
    want = _sorted_pdf(read_table(f"{SF}/documents.parquet"), SCHEMA.names)
    want["text"] = want["text"].str.replace("\n", "\\n", regex=False)
    got = _sorted_pdf(read_jsonl(jl, schema=SCHEMA), SCHEMA.names)
    assert got.equals(want)


def test_csv_equals_parquet(ray_session, tmp_path):
    _, cs = _export(str(tmp_path))
    want = _sorted_pdf(read_table(f"{SF}/documents.parquet"), SCHEMA.names)
    want["text"] = want["text"].str.replace("\n", "\\n", regex=False)
    got = _sorted_pdf(read_csv(cs, schema=SCHEMA), SCHEMA.names)
    assert got.equals(want)


def test_projection_and_cast(ray_session, tmp_path):
    jl, cs = _export(str(tmp_path))
    sub = pa.schema([("doc_id", pa.int64()), ("n_chars", pa.int32())])
    for reader, path in ((read_jsonl, jl), (read_csv, cs)):
        ds = reader(path, columns=["doc_id", "n_chars"], schema=sub)
        assert ds.schema().names == ["doc_id", "n_chars"]
        tbl = pa.Table.from_pandas(ds.to_pandas(), schema=sub)
        assert tbl.schema.field("n_chars").type == pa.int32()


def test_pipeline_result_format_independent(ray_session, tmp_path):
    """A real downstream operator (per-lang token stats) produces the
    SAME result from the jsonl read as from the parquet read."""
    from cerberus_ray.pipelines.text import token_stats_by_lang

    jl, _ = _export(str(tmp_path))

    def undo(ds):
        import pyarrow.compute as pc

        def fix(b: pa.Table) -> pa.Table:
            i = b.schema.get_field_index("text")
            return b.set_column(i, "text", pc.replace_substring(
                b["text"], "\\n", "\n"))
        return ds.map_batches(fix, batch_format="pyarrow",
                              zero_copy_batch=True)

    a = token_stats_by_lang(
        undo(read_jsonl(jl, columns=["doc_id", "text", "lang"],
                        schema=pa.schema([("doc_id", pa.int64()),
                                          ("text", pa.string()),
                                          ("lang", pa.string())])))).to_pandas()
    b = token_stats_by_lang(
        read_table(f"{SF}/documents.parquet",
                   columns=["doc_id", "text", "lang"])).to_pandas()
    assert a.equals(b)
