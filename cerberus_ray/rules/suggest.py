"""Rule autogeneration — profile a healthy snapshot, suggest a RuleSet.

The profiler closes the M21 reflection loop (SURVEY.md §2.2: schema-driven
rule autogen; reference fields reflection, templatetags/field_tags.py):
one streamed pass computes per-column evidence partials — null counts,
exact numeric min/max, string max length, capped distinct sets — the
driver merges the O(#blocks × #cols) tiny rows, and the suggestions are:

- ``not_null(col)``            when the column has zero nulls;
- ``range_rule(col, lo, hi)``  exact observed bounds for numerics;
- ``enum_domain(col, values)`` when a string column's distinct count
  stays under ``enum_max`` (an overflowed set suggests free text, which
  gets ``max_len`` of the observed maximum instead).

By construction the suggested set validates the profiled snapshot with
ZERO violations (tested); run it against FUTURE snapshots to turn "the
data changed shape" into standard violation rows — the
Great-Expectations-style profile-then-assert workflow expressed in this
engine's rule vocabulary.

``ruleset_to_config`` exports any factory-built rule set (including a
suggested one) to the ``rules/config.py`` JSON shape; the round trip
preserves ``RuleSet.hash``, so persisted suggestions participate in
checkpoint invalidation exactly like hand-written configs.
"""

from __future__ import annotations

import json
from typing import Dict, List, Optional, Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .core import RuleSet, enum_domain, max_len, not_null, range_rule

__all__ = ["profile_columns", "suggest_rules", "ruleset_to_config",
           "suggest_diff"]


def profile_columns(ds, *, columns: Optional[Sequence[str]] = None,
                    enum_max: int = 32) -> Dict[str, dict]:
    """→ {col: evidence dict}: one streamed pass, driver merge bounded
    by #blocks × #cols (distinct sets capped at enum_max + 1)."""
    schema = ds.schema()
    names = list(columns) if columns else list(schema.names)
    base = dict(zip(schema.names, schema.types))

    def partial(b: pa.Table) -> pa.Table:
        rows = []
        for c in names:
            a = b[c]
            ev: dict = {"n": len(a),
                        "nulls": int(pc.sum(pc.is_null(a)).as_py() or 0)}
            t = a.type
            if pa.types.is_integer(t) or pa.types.is_floating(t):
                v = a.drop_null()
                if len(v):
                    ev["min"] = float(pc.min(v).as_py())
                    ev["max"] = float(pc.max(v).as_py())
                ev["kind"] = "numeric"
            elif pa.types.is_string(t) or pa.types.is_large_string(t):
                v = a.drop_null()
                if len(v):
                    ev["max_len"] = int(pc.max(pc.utf8_length(v)).as_py())
                    d = pc.unique(v)
                    if len(d) <= enum_max:
                        ev["distinct"] = sorted(d.to_pylist())
                    else:
                        ev["overflow"] = True
                ev["kind"] = "string"
            else:
                ev["kind"] = "other"
            rows.append({"col": c, "payload": json.dumps(ev)})
        return pa.Table.from_pylist(rows)

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True).to_pandas()
    merged: Dict[str, dict] = {}
    for _, r in parts.iterrows():
        ev = json.loads(r["payload"])
        m = merged.setdefault(r["col"], {"n": 0, "nulls": 0,
                                         "kind": ev["kind"]})
        m["n"] += ev["n"]
        m["nulls"] += ev["nulls"]
        if "min" in ev:
            m["min"] = min(m.get("min", ev["min"]), ev["min"])
            m["max"] = max(m.get("max", ev["max"]), ev["max"])
        if "max_len" in ev:
            m["max_len"] = max(m.get("max_len", 0), ev["max_len"])
        if ev.get("overflow"):
            m["overflow"] = True
        elif "distinct" in ev:
            vals = set(m.get("distinct", [])) | set(ev["distinct"])
            if len(vals) > enum_max:
                m["overflow"] = True
                m.pop("distinct", None)
            else:
                m["distinct"] = sorted(vals)
    for m in merged.values():  # cross-block union may have overflowed
        if m.get("overflow"):
            m.pop("distinct", None)
    return merged


def suggest_rules(ds, key_col: str, *,
                  columns: Optional[Sequence[str]] = None,
                  enum_max: int = 32,
                  name: str = "suggested") -> RuleSet:
    """Profile ``ds`` and return the suggested RuleSet (never includes a
    rule on ``key_col`` itself — key uniqueness is the uniqueness
    stage's job, not a row rule)."""
    names = [c for c in (columns or ds.schema().names) if c != key_col]
    prof = profile_columns(ds, columns=names, enum_max=enum_max)
    rs = RuleSet(name=name)
    for c in sorted(prof):
        m = prof[c]
        if m["n"] and m["nulls"] == 0:
            rs.add(not_null(key_col, c))
        if m["kind"] == "numeric" and "min" in m:
            rs.add(range_rule(key_col, c, lo=m["min"], hi=m["max"]))
        elif m["kind"] == "string":
            if "distinct" in m and not m.get("overflow"):
                rs.add(enum_domain(key_col, c, m["distinct"]))
            elif "max_len" in m:
                rs.add(max_len(key_col, c, m["max_len"]))
    return rs


def ruleset_to_config(rs: RuleSet, key: str) -> dict:
    """Export a factory-built RuleSet to the ``rules/config.py`` dict
    shape. Round trip (``ruleset_from_config``) preserves the rule-set
    hash. Raises for rules outside the config vocabulary."""
    specs: List[dict] = []
    for r in rs.rules:
        p = dict(r.params)
        if r.name.startswith("not-null-"):
            specs.append({"type": "not_null", "col": p["col"],
                          "empty_is_null": p.get("empty_is_null", False)})
        elif r.name.startswith("enum-"):
            specs.append({"type": "enum", "col": p["col"],
                          "allowed": list(p["allowed"])})
        elif r.name.startswith("range-"):
            if p.get("lo_strict"):
                raise ValueError(
                    f"rule {r.name!r}: lo_strict is not config-expressible")
            specs.append({"type": "range", "col": p["col"],
                          "lo": p.get("lo"), "hi": p.get("hi")})
        elif r.name.startswith("maxlen-"):
            specs.append({"type": "max_len", "col": p["col"], "n": p["n"]})
        elif "pattern" in p:
            # full_match must survive the round trip — dropping it
            # silently weakened a full-match rule to substring match
            # AND changed the rule-set hash (checkpoint invalidation)
            specs.append({"type": "regex", "col": p["col"],
                          "pattern": p["pattern"], "rule_name": r.name,
                          "full_match": bool(p.get("full_match", False))})
        else:
            raise ValueError(f"rule {r.name!r} is not config-expressible")
    return {"name": rs.name, "key": key, "rules": specs}


def suggest_diff(old_cfg: dict, new_cfg: dict) -> List[dict]:
    """Contract drift between two suggestion snapshots (the
    ``ruleset_to_config`` dict shape): which suggested rules appeared,
    disappeared, or changed parameters — the RULE-level complement of
    schema (type) and value (distribution) drift. A vanished
    ``not_null`` means nulls arrived; a widened ``range`` means new
    extremes; a changed ``enum`` means new categories. → list of
    {col, type, change, old, new} sorted by (col, type);
    ``change`` ∈ {'added', 'removed', 'changed'}."""
    def index(cfg: dict) -> Dict[tuple, dict]:
        # rule_name disambiguates multiple regex rules on one column —
        # a (col, type) key alone shadowed all but the last one
        return {(s["col"], s["type"], s.get("rule_name", "")): s
                for s in cfg["rules"]}

    ko, kn = index(old_cfg), index(new_cfg)
    out = []
    for k in sorted(set(ko) | set(kn)):
        col, typ = k[0], k[1]
        if k not in kn:
            out.append({"col": col, "type": typ, "change": "removed",
                        "old": ko[k], "new": None})
        elif k not in ko:
            out.append({"col": col, "type": typ, "change": "added",
                        "old": None, "new": kn[k]})
        elif ko[k] != kn[k]:
            out.append({"col": col, "type": typ, "change": "changed",
                        "old": ko[k], "new": kn[k]})
    return out
