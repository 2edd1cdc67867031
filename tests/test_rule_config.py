"""Declarative rule config: config-built RuleSet ≡ factory-built
(violations AND rule-set hash), fail-fast on malformed configs, JSON
entry point."""

import pandas as pd
import pytest
import ray.data as rd

from cerberus_ray.rules.config import (RuleConfigError, ruleset_from_config,
                                       ruleset_from_json)
from cerberus_ray.rules.core import (RuleSet, enum_domain, max_len,
                                     not_null, range_rule, regex_rule,
                                     ruleset_hash)
from cerberus_ray.stages.validate import validate

CFG = {
    "name": "orders-v1",
    "key": "id",
    "rules": [
        {"type": "not_null", "col": "cust"},
        {"type": "enum", "col": "status", "allowed": ["O", "F", "P"]},
        {"type": "range", "col": "price", "lo": 0},
        {"type": "max_len", "col": "comment", "n": 10},
        {"type": "regex", "col": "clerk", "pattern": "^Clerk#",
         "rule_name": "clerk-format"},
    ],
}


def frame() -> pd.DataFrame:
    return pd.DataFrame({
        "id": ["r1", "r2", "r3", "r4", "r5"],
        "cust": ["a", None, "c", "d", "e"],
        "status": ["O", "F", "X", "P", "O"],
        "price": [10.0, -3.0, 5.0, 0.0, 2.0],
        "comment": ["ok", "ok", "this one is far too long", "ok", "ok"],
        "clerk": ["Clerk#1", "Clerk#2", "Clerk#3", "nope", "Clerk#5"],
    })


def factory_rs() -> RuleSet:
    rs = RuleSet(name="orders-v1")
    rs.add(not_null("id", "cust"))
    rs.add(enum_domain("id", "status", ["O", "F", "P"]))
    rs.add(range_rule("id", "price", lo=0))
    rs.add(max_len("id", "comment", 10))
    rs.add(regex_rule("id", "clerk", "^Clerk#", "clerk-format"))
    return rs


def test_config_equals_factory(ray_session):
    ds = rd.from_pandas(frame(), override_num_blocks=2).materialize()
    a = (validate(ds, ruleset_from_config(CFG)).to_pandas()
         .sort_values(["doc_id", "rule"]).reset_index(drop=True))
    b = (validate(ds, factory_rs()).to_pandas()
         .sort_values(["doc_id", "rule"]).reset_index(drop=True))
    assert a.equals(b)
    # each planted defect caught exactly once
    assert set(zip(a["doc_id"], a["rule"])) == {
        ("r2", "not-null-cust"), ("r2", "range-price"),
        ("r3", "enum-status"), ("r3", "maxlen-comment"),
        ("r4", "clerk-format")}


def test_hash_identity_for_checkpoint_invalidation():
    assert (ruleset_hash(ruleset_from_config(CFG))
            == ruleset_hash(factory_rs()))
    # changing a parameter changes the hash
    import copy
    cfg2 = copy.deepcopy(CFG)
    cfg2["rules"][3]["n"] = 11
    assert (ruleset_hash(ruleset_from_config(cfg2))
            != ruleset_hash(factory_rs()))


def test_fail_fast_on_bad_configs():
    with pytest.raises(RuleConfigError):
        ruleset_from_config({"rules": []})                 # no key
    with pytest.raises(RuleConfigError):
        ruleset_from_config({"key": "k", "rules": [{"type": "nope"}]})
    with pytest.raises(RuleConfigError):
        ruleset_from_config({"key": "k",
                             "rules": [{"type": "enum", "col": "c"}]})
    with pytest.raises(RuleConfigError):
        ruleset_from_config({"key": "k",
                             "rules": [{"type": "range", "col": "c"}]})
    with pytest.raises(RuleConfigError):
        ruleset_from_json("{not json")


def test_json_roundtrip(ray_session):
    import json
    rs = ruleset_from_json(json.dumps(CFG))
    assert ruleset_hash(rs) == ruleset_hash(factory_rs())


def test_regex_full_match_survives_config_round_trip():
    """full_match must round-trip: dropping it silently weakened a
    full-match rule to substring match and changed the rule-set hash."""
    from cerberus_ray.rules.config import ruleset_from_config
    from cerberus_ray.rules.core import RuleSet, regex_rule
    from cerberus_ray.rules.suggest import ruleset_to_config

    rs = RuleSet([regex_rule("k", "status", "O|F|P", "status-domain",
                             full_match=True)], name="t")
    cfg = ruleset_to_config(rs, key="k")
    assert cfg["rules"][0]["full_match"] is True
    back = ruleset_from_config(cfg)
    assert back.hash == rs.hash
    import pyarrow as pa

    batch = pa.table({"k": ["1"], "status": ["FOO"]})
    assert back.evaluate(batch).num_rows == 1  # substring match missed it


def test_custom_rule_body_change_invalidates_hash():
    from cerberus_ray.rules.core import RuleSet

    a, b = RuleSet(name="x"), RuleSet(name="x")

    @a.rule("my-check")
    def f1(batch):
        return None

    @b.rule("my-check")
    def f2(batch):
        _ = 1 + 1
        return None

    assert a.hash != b.hash
