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


def test_write_partitioned_layout_and_pruned_read(ray_session, tmp_path):
    """Hive layout on disk, partition values recoverable on read, and a
    partition filter prunes to the right subset."""
    import os

    import pandas as pd
    import ray.data as rd

    from cerberus_ray.sources.io import read_table, write_partitioned

    df = pd.DataFrame({
        "doc_id": [f"d{i}" for i in range(60)],
        "lang": ["en", "de", "fr"] * 20,
        "x": range(60)})
    out = str(tmp_path / "part")
    write_partitioned(rd.from_pandas(df, override_num_blocks=3), out,
                      "lang")
    assert sorted(p for p in os.listdir(out) if p.startswith("lang=")) \
        == ["lang=de", "lang=en", "lang=fr"]
    back = read_table(out).to_pandas()
    assert len(back) == 60 and set(back["lang"]) == {"en", "de", "fr"}
    # partition-pruned read: the de directory only (path-level pruning —
    # row filters bind against the FILE schema, which hive layout strips
    # the partition column from, so pruning must happen on the path)
    from ray.data.datasource.partitioning import PathPartitionFilter

    de = read_table(out, partition_filter=PathPartitionFilter.of(
        lambda kv: kv["lang"] == "de", style="hive")).to_pandas()
    assert len(de) == 20 and set(de["lang"]) == {"de"}
    assert sorted(de["x"])[:3] == [1, 4, 7]
