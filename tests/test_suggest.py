"""Constraint suggestion: the suggestion invariant (profiled data
validates clean under its own suggested rules), expected rule shapes on
a real table, planted-dirty-row detection, and layout invariance."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from cerberus_ray.sources.io import read_table
from cerberus_ray.stages.suggest import apply_suggested_rules, suggest_rules

SF = "/root/testdata/sf0.001"


def test_suggests_expected_shapes_on_orders(ray_session):
    ds = read_table(f"{SF}/orders.parquet")
    sug = suggest_rules(ds)
    by = {(r["column"], r["rule"]): r["params"]
          for _, r in sug.iterrows()}
    assert ("o_orderkey", "unique") in by
    assert ("o_totalprice", "range") in by
    assert ("o_orderstatus", "enum") in by
    assert ("o_orderpriority", "enum") in by
    assert ("o_orderkey", "not-null") in by
    # enum domains are the exact observed value sets
    import json
    assert set(json.loads(by[("o_orderstatus", "enum")])["values"]) \
        == {"F", "O", "P"}
    # custkey repeats → never suggested unique
    assert ("o_custkey", "unique") not in by


def test_suggestion_invariant_clean_on_own_data(ray_session):
    ds = read_table(f"{SF}/orders.parquet").materialize()
    sug = suggest_rules(ds)
    v = apply_suggested_rules(ds, sug, key_col="o_orderkey")
    assert v.count() == 0


def test_planted_dirty_rows_caught(ray_session):
    clean = pd.DataFrame({
        "doc_id": [f"d{i}" for i in range(200)],
        "status": np.where(np.arange(200) % 2 == 0, "ok", "warn"),
        "score": np.linspace(1.0, 9.0, 200),
        "note": ["short"] * 200})
    ds = rd.from_pandas(clean, override_num_blocks=4).materialize()
    sug = suggest_rules(ds)
    dirty = pd.concat([clean, pd.DataFrame({
        "doc_id": ["bad1", "bad2", "bad3", "bad4"],
        "status": ["ok", "BOGUS", "ok", None],
        "score": [99.0, 5.0, 5.0, 5.0],
        "note": ["short", "short", "x" * 40, "short"]})],
        ignore_index=True)
    dds = rd.from_pandas(dirty, override_num_blocks=3).materialize()
    v = apply_suggested_rules(dds, sug).to_pandas()
    got = {(r.doc_id, r.rule) for r in v.itertuples()}
    assert ("bad1", "suggested-range-score") in got
    assert ("bad2", "suggested-enum-status") in got
    assert ("bad3", "suggested-maxlen-note") in got
    assert ("bad4", "suggested-not-null-status") in got
    # the clean rows never flag
    assert not any(d.startswith("d") for d, _ in got)


def test_suggestions_layout_invariant(ray_session):
    ds1 = read_table(f"{SF}/customer.parquet")
    a = suggest_rules(ds1)
    df = ds1.to_pandas().sample(frac=1.0, random_state=2)
    b = suggest_rules(rd.from_pandas(df, override_num_blocks=9
                                     ).materialize())
    pd.testing.assert_frame_equal(a, b)


def test_suggest_diff_classifies_contract_drift(ray_session):
    from cerberus_ray.stages.suggest import suggest_diff

    clean = pd.DataFrame({
        "doc_id": [f"d{i}" for i in range(100)],
        "status": ["ok"] * 100,
        "score": np.linspace(1.0, 5.0, 100)})
    drifted = clean.copy()
    drifted.loc[5, "status"] = None          # nulls arrived
    drifted.loc[7, "score"] = 50.0           # new extreme
    a = suggest_rules(rd.from_pandas(clean).materialize())
    b = suggest_rules(rd.from_pandas(drifted).materialize())
    d = suggest_diff(a, b)
    ch = {(r.column, r.rule, r.change) for r in d.itertuples()}
    assert ("status", "not-null", "removed") in ch
    assert ("score", "range", "changed") in ch
    # unchanged table diffs empty
    assert len(suggest_diff(a, a)) == 0
