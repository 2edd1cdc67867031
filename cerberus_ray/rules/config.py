"""Declarative rule configuration — build a RuleSet from a plain dict
(JSON/YAML-shaped), the cerberus-style schema-as-data surface.

The reference declares constraints as data (model field options +
validator schemas); this loader closes the loop for this engine: a
checked-in JSON document produces exactly the same RuleSet the factory
calls would, including the same `RuleSet.hash()` inputs — so checkpoint
invalidation (rule-set-hash keyed, `state/checkpoint.py`) works for
config-defined rule sets too.

Shape::

    {"name": "orders-v1",
     "key": "o_orderkey",
     "rules": [
        {"type": "not_null",  "col": "o_custkey"},
        {"type": "enum",      "col": "o_orderstatus", "allowed": ["O","F","P"]},
        {"type": "range",     "col": "o_totalprice", "lo": 0},
        {"type": "max_len",   "col": "o_comment", "n": 100},
        {"type": "regex",     "col": "o_clerk", "pattern": "^Clerk#",
         "rule_name": "clerk-format"}]}

Unknown rule types and missing required params raise ``RuleConfigError``
at BUILD time (the fail-fast contract of the reference's system checks),
never inside a running pipeline.
"""

from __future__ import annotations

import json
from typing import Any, Dict, Mapping

from .core import RuleSet, enum_domain, max_len, not_null, range_rule, \
    regex_rule

__all__ = ["RuleConfigError", "ruleset_from_config", "ruleset_from_json"]


class RuleConfigError(ValueError):
    """Malformed rule configuration (unknown type / missing params)."""


def _need(spec: Mapping[str, Any], *fields: str) -> None:
    missing = [f for f in fields if f not in spec]
    if missing:
        raise RuleConfigError(
            f"rule {spec.get('type', '?')!r} missing {missing}")


def ruleset_from_config(cfg: Mapping[str, Any]) -> RuleSet:
    _need(cfg, "key", "rules")
    key = cfg["key"]
    rs = RuleSet(name=cfg.get("name", "config"))
    for spec in cfg["rules"]:
        _need(spec, "type")
        t = spec["type"]
        if t == "not_null":
            _need(spec, "col")
            rs.add(not_null(key, spec["col"],
                            empty_is_null=bool(spec.get("empty_is_null",
                                                        False))))
        elif t == "enum":
            _need(spec, "col", "allowed")
            rs.add(enum_domain(key, spec["col"], list(spec["allowed"])))
        elif t == "range":
            _need(spec, "col")
            if "lo" not in spec and "hi" not in spec:
                raise RuleConfigError(
                    f"range rule on {spec['col']!r} needs lo and/or hi")
            rs.add(range_rule(key, spec["col"], lo=spec.get("lo"),
                              hi=spec.get("hi")))
        elif t == "max_len":
            _need(spec, "col", "n")
            rs.add(max_len(key, spec["col"], int(spec["n"])))
        elif t == "regex":
            _need(spec, "col", "pattern", "rule_name")
            rs.add(regex_rule(key, spec["col"], spec["pattern"],
                              spec["rule_name"],
                              full_match=bool(spec.get("full_match",
                                                       False))))
        else:
            raise RuleConfigError(f"unknown rule type {t!r}")
    return rs


def ruleset_from_json(doc: str) -> RuleSet:
    try:
        cfg: Dict[str, Any] = json.loads(doc)
    except json.JSONDecodeError as e:
        raise RuleConfigError(f"invalid JSON: {e}") from e
    return ruleset_from_config(cfg)
