"""Unit tests for the declarative rule factories (rules/core.py) — each
factory gets passing values, violating values, and null handling."""

import pyarrow as pa

from cerberus_ray.rules.core import (
    RuleSet,
    enum_domain,
    expr_rule,
    max_len,
    not_null,
    range_rule,
    regex_rule,
)


def T(**cols):
    return pa.Table.from_pydict(cols)


def rows(t):
    return list(zip(t["doc_id"].to_pylist(), t["rule"].to_pylist()))


def test_not_null():
    t = T(id=[1, 2, 3], v=["a", None, ""])
    out = not_null("id", "v")(t)
    assert rows(out) == [("2", "not-null-v")]
    out2 = not_null("id", "v", empty_is_null=True)(t)
    assert rows(out2) == [("2", "not-null-v"), ("3", "not-null-v")]


def test_enum_domain():
    t = T(id=[1, 2, 3], v=["A", "X", None])
    out = enum_domain("id", "v", ["A", "B"])(t)
    assert rows(out) == [("2", "enum-v")]  # null is not a domain violation
    assert "not in ['A', 'B']" in out["detail"][0].as_py()


def test_range_rule_bounds():
    t = T(id=[1, 2, 3, 4, 5], v=[0.0, -1.0, 5.0, 11.0, None])
    out = range_rule("id", "v", lo=0, hi=10)(t)
    assert rows(out) == [("2", "range-v"), ("4", "range-v")]
    strict = range_rule("id", "v", lo=0, lo_strict=True)(t)
    assert ("1", "range-v") in rows(strict)  # 0.0 fails exclusive low


def test_max_len():
    t = T(id=[1, 2, 3], v=["ok", "x" * 20, None])
    out = max_len("id", "v", 10)(t)
    assert rows(out) == [("2", "maxlen-v")]
    assert "length 20 > max 10" == out["detail"][0].as_py()


def test_regex_rule():
    t = T(id=[1, 2, 3], v=["a@b.com", "nope", None])
    out = regex_rule("id", "v", r"[^@]+@[^@]+\.[^@]+", "email-format")(t)
    assert rows(out) == [("2", "email-format")]


def test_expr_rule_cross_column():
    t = T(id=[1, 2], start=[1, 5], end=[3, 2])
    import pyarrow.compute as pc

    out = expr_rule("id", "start-lt-end", "start", "start must be < end",
                    lambda b: pc.greater_equal(b["start"], b["end"]))(t)
    assert rows(out) == [("2", "start-lt-end")]


def test_ruleset_hash_changes_with_params():
    a = RuleSet([range_rule("id", "v", lo=0)])
    b = RuleSet([range_rule("id", "v", lo=1)])
    c = RuleSet([range_rule("id", "v", lo=0)])
    assert a.hash != b.hash
    assert a.hash == c.hash


def test_ruleset_decorator_and_evaluate():
    rs = RuleSet()

    @rs.rule("always-flag-id-1")
    def flag(batch):
        import numpy as np

        from cerberus_ray.rules.core import emit

        ids = batch["id"].to_numpy(zero_copy_only=False)
        return emit(ids.astype(str).astype(object), ids == 1,
                    "always-flag-id-1", "id", "flagged")

    out = rs.evaluate(T(id=[1, 2]))
    assert rows(out) == [("1", "always-flag-id-1")]
