"""Footer-only catalog: row counts match DuckDB, partition keys
detected, bytes/files accounted, and no data pages are read (metadata
walk only — asserted by profiling a directory whose data would fail to
decode if scanned is out of scope; instead we assert counts on known
tables)."""

import duckdb
import pandas as pd
import pytest

from cerberus_ray.stages.catalog import catalog_report

SF_DIR = "/root/testdata/sf0.001"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def test_catalog_lists_all_tables_with_exact_rows():
    cat = catalog_report(SF_DIR).to_pandas().set_index("table")
    assert sorted(cat.index) == sorted(TABLES)
    con = duckdb.connect()
    for t in TABLES:
        n = con.execute(f"SELECT count(*) FROM read_parquet("
                        f"'{SF_DIR}/{t}.parquet')").fetchone()[0]
        assert cat.loc[t, "rows"] == n, t
        assert cat.loc[t, "files"] == 1
        assert cat.loc[t, "bytes"] > 0
        assert cat.loc[t, "partition_keys"] == ""


def test_catalog_detects_hive_partitions(ray_session, tmp_path):
    import ray.data as rd

    df = pd.DataFrame({"k": range(300),
                       "lang": [["en", "de"][i % 2] for i in range(300)],
                       "v": range(300)})
    rd.from_pandas(df).repartition(4).write_parquet(
        str(tmp_path / "docs_part"), partition_cols=["lang"])
    cat = catalog_report(str(tmp_path)).to_pandas().set_index("table")
    assert cat.loc["docs_part", "rows"] == 300
    assert cat.loc["docs_part", "partition_keys"] == "lang"
    assert cat.loc["docs_part", "files"] >= 2


def test_schema_signature_names_and_types():
    cat = catalog_report(SF_DIR).to_pandas().set_index("table")
    assert "doc_id:int64" in cat.loc["documents", "schema"]
    assert "text:string" in cat.loc["documents", "schema"]
    assert cat.loc["documents", "n_columns"] == 5
