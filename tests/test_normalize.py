"""Normalize stage: span-text normalization preserving the driver
invariant (span-sequence equality of kind/media_ref/order), plus M24
backfill-from-parent."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from cerberus_ray.datagen import GenConfig, gen_docs_batch
from cerberus_ray.schema import DOCUMENTS_INTERLEAVED
from cerberus_ray.stages.normalize import (
    backfill_from_parent,
    normalize_spans,
    normalize_spans_batch,
    span_sequence_equal,
)


def test_normalize_minimizes_span_text():
    t = pa.Table.from_pylist([{
        "doc_id": "d1",
        "spans": [
            {"kind": "text", "text": "  hello\nworld  ", "media_ref": None,
             "offset": 0},
            {"kind": "image", "text": None, "media_ref": "m1", "offset": 5},
        ]}], schema=DOCUMENTS_INTERLEAVED)
    out = normalize_spans_batch(t)
    spans = out["spans"].to_pylist()[0]
    assert spans[0]["text"] == "helloworld"
    assert spans[1]["text"] is None          # null preserved
    assert span_sequence_equal(t, out)


def test_invariant_detects_mutation():
    t = pa.Table.from_pylist([{
        "doc_id": "d1",
        "spans": [{"kind": "text", "text": "a", "media_ref": None, "offset": 0}]}],
        schema=DOCUMENTS_INTERLEAVED)
    bad = pa.Table.from_pylist([{
        "doc_id": "d1",
        "spans": [{"kind": "image", "text": "a", "media_ref": None, "offset": 0}]}],
        schema=DOCUMENTS_INTERLEAVED)
    assert not span_sequence_equal(t, bad)


def test_normalize_on_generated_corpus(ray_session):
    cfg = GenConfig(n_docs=500)
    t = gen_docs_batch(np.arange(cfg.n_docs), cfg)
    ds = rd.from_arrow(t)
    out = normalize_spans(ds).to_pandas()
    out_t = pa.Table.from_pandas(out, preserve_index=False)
    # kind/media_ref/offset sequences unchanged for every row
    assert span_sequence_equal(t, out_t)


def test_backfill_from_parent(ray_session):
    charges = rd.from_pandas(pd.DataFrame({
        "charge_id": [1, 2, 3, 4],
        "invoice_id": [10, 10, 11, None],
        "customer_id": pd.array([None, 7, None, None], dtype="Int64"),
    }))
    invoices = rd.from_pandas(pd.DataFrame({
        "invoice_id": [10, 11],
        "customer_id": [5, 6],
    }))
    out = backfill_from_parent(
        charges, invoices, child_fk="invoice_id", parent_key="invoice_id",
        copy_cols={"customer_id": "customer_id"}).to_pandas()
    out = out.sort_values("charge_id")
    # null customer filled from invoice; existing value kept; no parent → stays null
    assert out["customer_id"].tolist()[0] == 5
    assert out["customer_id"].tolist()[1] == 7
    assert out["customer_id"].tolist()[2] == 6
    assert pd.isna(out["customer_id"].tolist()[3])


def test_impute_by_group_duckdb_parity(ray_session):
    import duckdb
    import ray.data as rd

    from cerberus_ray.stages.normalize import impute_by_group

    rng = np.random.default_rng(9)
    n = 500
    df = pd.DataFrame({
        "rid": np.arange(n),
        "g": rng.choice(list("abc"), n),
        "v": np.round(rng.normal(10, 3, n), 3),
        "w": np.round(rng.normal(-5, 2, n), 3)})
    df.loc[df["rid"] % 7 == 0, "v"] = np.nan
    df.loc[df["rid"] % 11 == 0, "w"] = np.nan
    got = (impute_by_group(rd.from_pandas(df, override_num_blocks=4),
                           "g", ["v", "w"], strategy="mean")
           .to_pandas().sort_values("rid", ignore_index=True))
    con = duckdb.connect()
    con.register("t0", df)
    want = con.execute("""
        SELECT rid, g,
               COALESCE(v, AVG(v) OVER (PARTITION BY g)) AS v,
               COALESCE(w, AVG(w) OVER (PARTITION BY g)) AS w
        FROM t0 ORDER BY rid""").df()
    np.testing.assert_allclose(got["v"], want["v"], atol=1e-9)
    np.testing.assert_allclose(got["w"], want["w"], atol=1e-9)
    assert got["v"].notna().all() and got["w"].notna().all()

    # median strategy vs DuckDB MEDIAN window
    got_m = (impute_by_group(rd.from_pandas(df, override_num_blocks=4),
                             "g", ["v"], strategy="median")
             .to_pandas().sort_values("rid", ignore_index=True))
    want_m = con.execute("""
        SELECT rid, COALESCE(v, MEDIAN(v) OVER (PARTITION BY g)) AS v
        FROM t0 ORDER BY rid""").df()
    np.testing.assert_allclose(got_m["v"], want_m["v"], atol=1e-9)
    con.close()


def test_impute_all_null_group_and_layout(ray_session):
    import pytest as _pytest
    import ray.data as rd

    from cerberus_ray.stages.normalize import impute_by_group

    df = pd.DataFrame({"g": ["a", "a", "b", "b"],
                       "v": [1.0, np.nan, np.nan, np.nan]})
    got = (impute_by_group(rd.from_pandas(df), "g", ["v"])
           .to_pandas().sort_values(["g", "v"], ignore_index=True))
    # group a filled with its mean; group b stays null (never invented)
    assert list(got["v"][:2]) == [1.0, 1.0]
    assert got["v"][2:].isna().all()

    with _pytest.raises(ValueError):
        impute_by_group(rd.from_pandas(df), "g", ["v"],
                        strategy="mode").to_pandas()

    rng = np.random.default_rng(2)
    big = pd.DataFrame({"g": rng.choice(list("xyz"), 300),
                        "v": rng.normal(size=300)})
    big.loc[::5, "v"] = np.nan
    a = (impute_by_group(rd.from_pandas(big, override_num_blocks=1),
                         "g", ["v"]).to_pandas())
    b = (impute_by_group(rd.from_pandas(big, override_num_blocks=6),
                         "g", ["v"]).to_pandas())
    pd.testing.assert_frame_equal(a, b)
