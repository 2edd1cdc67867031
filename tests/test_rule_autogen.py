"""Rule autogeneration: suggested rules validate the profiled snapshot
with zero violations, catch planted drift in a future snapshot, skip
enums on high-cardinality columns, stay layout-invariant, and round-trip
through the config exporter hash-identically."""

import pandas as pd
import pyarrow as pa
import ray.data as rd

from cerberus_ray.rules.config import ruleset_from_config
from cerberus_ray.rules.core import ruleset_hash
from cerberus_ray.rules.suggest import (profile_columns, ruleset_to_config,
                                        suggest_rules)
from cerberus_ray.sources.io import read_table
from cerberus_ray.stages.validate import validate

SF = "/root/testdata/sf0.001"


def docs_ds(ray_session, blocks=3):
    return read_table(f"{SF}/documents.parquet").repartition(
        blocks).materialize()


def test_suggested_rules_are_clean_on_profiled_snapshot(ray_session):
    ds = docs_ds(ray_session)
    rs = suggest_rules(ds, "doc_id")
    assert len(rs.rules) > 0
    v = validate(ds, rs)
    assert v.count() == 0


def test_suggestions_catch_future_drift(ray_session):
    ds = docs_ds(ray_session)
    rs = suggest_rules(ds, "doc_id")
    future = pd.DataFrame({
        "doc_id": [9_000_001, 9_000_002, 9_000_003],
        "text": ["ok text", None, "fine"],          # null text
        "lang": ["xx", "en", "en"],                 # new enum value
        "source": ["web", "web", "web"],
        "n_chars": [7, 4, -5]})                     # below observed min
    got = validate(rd.from_pandas(future), rs).to_pandas()
    rules = set(got["rule"])
    assert "enum-lang" in rules
    assert "not-null-text" in rules
    assert "range-n_chars" in rules


def test_high_cardinality_gets_maxlen_not_enum(ray_session):
    ds = docs_ds(ray_session)
    prof = profile_columns(ds)
    assert prof["text"].get("overflow")  # free text overflows the enum cap
    rs = suggest_rules(ds, "doc_id")
    names = {r.name for r in rs.rules}
    assert "maxlen-text" in names and "enum-text" not in names
    # bounded-domain columns DO get enums
    assert "enum-lang" in names and "enum-source" in names


def test_layout_invariance_and_config_roundtrip(ray_session):
    a = suggest_rules(docs_ds(ray_session, blocks=1), "doc_id")
    b = suggest_rules(docs_ds(ray_session, blocks=7), "doc_id")
    assert ruleset_hash(a) == ruleset_hash(b)
    cfg = ruleset_to_config(a, "doc_id")
    assert ruleset_hash(ruleset_from_config(cfg)) == ruleset_hash(a)


def test_suggest_diff_classifies_contract_drift(ray_session):
    """Rule-level drift between two suggestion snapshots: nulls arriving
    remove a not_null, a new extreme changes the range, a new category
    changes the enum; the self-diff is empty."""
    from cerberus_ray.rules.suggest import suggest_diff

    clean = pd.DataFrame({
        "doc_id": list(range(100)),
        "status": ["ok"] * 50 + ["warn"] * 50,
        "score": [float(i % 10) for i in range(100)]})
    drifted = clean.copy()
    drifted.loc[5, "status"] = None          # nulls arrived
    drifted.loc[7, "score"] = 50.0           # new extreme
    drifted.loc[9, "status"] = "BOGUS"       # new category
    from cerberus_ray.rules.suggest import (ruleset_to_config,
                                            suggest_rules)

    a = ruleset_to_config(suggest_rules(
        rd.from_pandas(clean).materialize(), "doc_id"), "doc_id")
    b = ruleset_to_config(suggest_rules(
        rd.from_pandas(drifted).materialize(), "doc_id"), "doc_id")
    d = suggest_diff(a, b)
    ch = {(x["col"], x["type"], x["change"]) for x in d}
    assert ("status", "not_null", "removed") in ch
    assert ("score", "range", "changed") in ch
    assert ("status", "enum", "changed") in ch
    assert suggest_diff(a, a) == []
