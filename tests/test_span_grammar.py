"""Span-kind sequence grammar validation: exact DuckDB RE2 parity over
the generated interleaved table, planted sequences for both modes, and
layout invariance."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from cerberus_ray.datagen import GenConfig, docs_dataset
from cerberus_ray.rules.row_rules import (SEQ_KIND_CHARS,
                                          span_sequence_violations)

_CASE = ("CASE s.kind "
         + " ".join(f"WHEN '{k}' THEN '{c}'"
                    for k, c in SEQ_KIND_CHARS.items())
         + " ELSE '?' END")


def _docs(n=1500):
    return docs_dataset(GenConfig(n_docs=n, n_media=200),
                        fragment_size=300).materialize()


def _duck_flags(tbl: pa.Table, regex: str, anchored: bool):
    con = duckdb.connect()
    con.register("docs", tbl)
    rx = f"^(?:{regex})$" if anchored else regex
    return con.execute(f"""
        SELECT doc_id FROM (
          SELECT doc_id, array_to_string(
                   list_transform(spans, s -> {_CASE}), '') AS seq
          FROM docs)
        WHERE regexp_matches(seq, '{rx}') {'= false' if anchored else ''}
        ORDER BY doc_id""").df()


def test_forbid_mode_matches_duckdb(ray_session):
    ds = _docs()
    tbl = pa.Table.from_pandas(ds.to_pandas())
    v = span_sequence_violations(ds, "ii|aa|bb", mode="forbid"
                                 ).to_pandas()
    exp = _duck_flags(tbl, "ii|aa|bb", anchored=False)
    assert len(v) > 0
    assert sorted(v["doc_id"]) == sorted(exp["doc_id"])
    assert (v["rule"] == "span-seq-forbid").all()


def test_require_mode_matches_duckdb(ray_session):
    ds = _docs()
    tbl = pa.Table.from_pandas(ds.to_pandas())
    # grammar: must start with a text span
    v = span_sequence_violations(ds, "t[tiab?v]*", mode="require"
                                 ).to_pandas()
    exp = _duck_flags(tbl, "t[tiab?v]*", anchored=True)
    assert len(v) > 0
    assert sorted(v["doc_id"]) == sorted(exp["doc_id"])


def test_planted_sequences_and_guard(ray_session):
    def mk(doc_id, kinds):
        return {"doc_id": doc_id,
                "spans": [{"kind": k, "text": "x", "media_ref": None,
                           "offset": i} for i, k in enumerate(kinds)]}

    rows = [mk("d1", ["text", "image", "text"]),          # clean
            mk("d2", ["text", "image", "image"]),         # adjacent ii
            mk("d3", ["audio", "text"]),                  # starts media
            mk("d4", ["text"] * 60)]                      # long, clean
    ds = rd.from_items(rows).materialize()
    forbid = span_sequence_violations(ds, "ii|aa|bb", mode="forbid"
                                      ).to_pandas()
    assert sorted(forbid["doc_id"]) == ["d2"]
    req = span_sequence_violations(ds, "t.*", mode="require"
                                   ).to_pandas()
    assert sorted(req["doc_id"]) == ["d3"]
    # long sequences truncate in the detail, never in the match
    req2 = span_sequence_violations(ds, "t{1,5}", mode="require",
                                    max_detail_chars=8).to_pandas()
    assert "d4" in set(req2["doc_id"])
    d4 = req2[req2["doc_id"] == "d4"]["detail"].iloc[0]
    assert "…" in d4
    with pytest.raises(ValueError):
        span_sequence_violations(ds, "t", mode="bogus")


def test_layout_invariance(ray_session):
    cfg = GenConfig(n_docs=800, n_media=100)
    a = span_sequence_violations(
        docs_dataset(cfg, fragment_size=800).materialize(),
        "ii|aa|bb", mode="forbid").to_pandas()
    b = span_sequence_violations(
        docs_dataset(cfg, fragment_size=97).materialize(),
        "ii|aa|bb", mode="forbid").to_pandas()
    pd.testing.assert_frame_equal(
        a.sort_values("doc_id").reset_index(drop=True),
        b.sort_values("doc_id").reset_index(drop=True))
