"""Rule / RuleSet core.

A Rule is a named, parameterized, *vectorized* check: it takes an Arrow
batch and returns zero or more violation rows (schema.VIOLATIONS). This is
the engine's re-expression of the reference's per-record constraint surface
— CheckConstraints (cerberus/models/booking.py:267-275), field validators
(max_length / choices, cerberus/models/pet.py:50-63), and clean() guards
(cerberus/models/booking.py:298-300) — as batch transforms.

RuleSet is the registry + extension surface (SURVEY.md §2.9: the analogue
of CRUDViews subclassing / FilterSet defaults): rules can be registered by
decorator, and the set has a stable content hash recorded in checkpoints so
a changed rule-set invalidates prior partition checkpoints (north_rule).
"""

from __future__ import annotations

import hashlib
import json
from dataclasses import dataclass, field
from typing import Callable, Dict, List, Optional, Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..schema import VIOLATIONS, empty_violations


@dataclass
class Rule:
    name: str
    fn: Callable[[pa.Table], pa.Table]
    #: JSON-serializable parameters; part of the ruleset hash.
    params: Dict = field(default_factory=dict)
    #: 'row' rules run inside the stateless validate stage; 'unique' /
    #: 'referential' / 'aggregate' rules are executed by shuffle stages.
    kind: str = "row"

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = self.fn(batch)
        return out if out is not None else empty_violations()


class RuleSet:
    def __init__(self, rules: Optional[Sequence[Rule]] = None, name: str = "default"):
        self.name = name
        self.rules: List[Rule] = list(rules or [])

    def add(self, rule: Rule) -> "RuleSet":
        self.rules.append(rule)
        return self

    def rule(self, name: str, **params):
        """Decorator registering a custom batch-rule UDF (extension
        surface). The UDF's BYTECODE digest joins the rule params, so
        editing the function body changes the rule-set hash and
        invalidates prior partition checkpoints — without it, a bug fix
        in a custom rule would silently reuse stale checkpoints and the
        corrected rule would never re-run on completed partitions."""

        def deco(fn):
            p = dict(params)
            code = getattr(fn, "__code__", None)
            if code is not None:
                p["_code_sha"] = hashlib.sha256(
                    code.co_code
                    + repr(code.co_consts).encode()).hexdigest()[:16]
            self.add(Rule(name=name, fn=fn, params=p))
            return fn

        return deco

    def row_rules(self) -> List[Rule]:
        return [r for r in self.rules if r.kind == "row"]

    def evaluate(self, batch: pa.Table) -> pa.Table:
        """Run all row rules on one batch; concat violation rows."""
        outs = [r(batch) for r in self.row_rules()]
        outs = [o for o in outs if o.num_rows]
        if not outs:
            return empty_violations()
        return pa.concat_tables(outs)

    @property
    def hash(self) -> str:
        payload = json.dumps(
            [{"name": r.name, "kind": r.kind, "params": r.params} for r in self.rules],
            sort_keys=True,
        )
        return hashlib.sha256(payload.encode()).hexdigest()[:16]


def ruleset_hash(rs: RuleSet) -> str:
    return rs.hash


# ---------------------------------------------------------------------------
# Vectorized violation emission helpers
# ---------------------------------------------------------------------------

def emit(key_arr: np.ndarray, mask: np.ndarray, rule: str, path: str,
         details) -> pa.Table:
    """Build violations for rows where mask is True.

    ``details`` may be a constant string or an array aligned with key_arr.
    """
    idx = np.flatnonzero(mask)
    if len(idx) == 0:
        return empty_violations()
    keys = np.asarray(key_arr, dtype=object)[idx]
    if isinstance(details, str):
        det = np.full(len(idx), details, dtype=object)
    elif callable(details):
        det = np.asarray(details(idx), dtype=object)
    else:
        det = np.asarray(details, dtype=object)[idx]
    return pa.Table.from_arrays(
        [
            pa.array(keys, type=pa.string()),
            pa.array(np.full(len(idx), rule, dtype=object), type=pa.string()),
            pa.array(np.full(len(idx), path, dtype=object), type=pa.string()),
            pa.array(det, type=pa.string()),
        ],
        schema=VIOLATIONS,
    )


def _key_strings(batch: pa.Table, key_col: str) -> np.ndarray:
    k = batch[key_col]
    if not pa.types.is_string(k.type):
        k = pc.cast(k, pa.string())
    return k.to_numpy(zero_copy_only=False).astype(object)


# ---------------------------------------------------------------------------
# Relational rule factories (each over a single column, key_col identifies
# the row in violation output)
# ---------------------------------------------------------------------------

def not_null(key_col: str, col: str, *, empty_is_null: bool = False) -> Rule:
    """NOT NULL / blank=False (reference: required fields, pet.py:50-63;
    empty invoice_email issue, customer.py:130-140 when empty_is_null)."""

    def fn(batch: pa.Table) -> pa.Table:
        a = batch[col]
        mask = pc.is_null(a).to_numpy(zero_copy_only=False)
        if empty_is_null and (pa.types.is_string(a.type)
                              or pa.types.is_large_string(a.type)):
            empty = pc.fill_null(pc.equal(a, ""), False)
            mask = mask | empty.to_numpy(zero_copy_only=False)
        return emit(_key_strings(batch, key_col), mask, f"not-null-{col}", col,
                    "value is required")

    return Rule(name=f"not-null-{col}", fn=fn,
                params={"col": col, "empty_is_null": empty_is_null})


def enum_domain(key_col: str, col: str, allowed: Sequence[str]) -> Rule:
    """choices= domain rule (reference: TextChoices enums, booking.py:200-205)."""
    allowed = sorted(allowed)

    def fn(batch: pa.Table) -> pa.Table:
        a = batch[col]
        ok = pc.is_in(a, value_set=pa.array(allowed, type=a.type))
        mask = pc.and_not(pc.is_valid(a), ok).to_numpy(zero_copy_only=False)
        # '%%' escape: an allowed value containing '%' must not be read
        # as a format directive; the %s placeholder is added after
        tmpl = "value %s not in " + str(allowed).replace("%", "%%")

        def det(idx):  # lazy: materializes VIOLATING rows only
            v = (a.take(pa.array(idx)).to_numpy(zero_copy_only=False)
                 .astype(object))
            return np.char.mod(tmpl, v.astype(str))

        return emit(_key_strings(batch, key_col), mask, f"enum-{col}", col, det)

    return Rule(name=f"enum-{col}", fn=fn, params={"col": col, "allowed": allowed})


def range_rule(key_col: str, col: str, lo=None, hi=None,
               *, lo_strict: bool = False) -> Rule:
    """Numeric range rule (reference: CheckConstraint amount >= 0,
    invoice.py:360-363; service capacity params, service.py:23-24)."""

    def fn(batch: pa.Table) -> pa.Table:
        a = batch[col]
        valid = pc.is_valid(a)
        bad = pc.cast(pa.array(np.zeros(len(a), dtype=bool)), pa.bool_())
        if lo is not None:
            cmp = pc.less_equal(a, lo) if lo_strict else pc.less(a, lo)
            bad = pc.or_(bad, cmp)
        if hi is not None:
            bad = pc.or_(bad, pc.greater(a, hi))
        mask = pc.and_(valid, bad).to_numpy(zero_copy_only=False)
        tmpl = (f"value %s outside [{lo}, {hi}]"
                + (" (exclusive low)" if lo_strict else ""))

        def det(idx):  # lazy: materializes VIOLATING rows only
            v = (a.take(pa.array(idx)).to_numpy(zero_copy_only=False)
                 .astype(object))
            return np.char.mod(tmpl, v.astype(str))

        return emit(_key_strings(batch, key_col), mask, f"range-{col}", col, det)

    return Rule(name=f"range-{col}", fn=fn,
                params={"col": col, "lo": lo, "hi": hi, "lo_strict": lo_strict})


def max_len(key_col: str, col: str, n: int) -> Rule:
    """CharField(max_length=n) rule (reference: customer.py:72-74)."""

    def fn(batch: pa.Table) -> pa.Table:
        a = batch[col]
        ln = pc.utf8_length(a)
        mask = pc.greater(ln, n).to_numpy(zero_copy_only=False)
        mask = np.nan_to_num(mask.astype(float)).astype(bool)
        lens = np.nan_to_num(ln.to_numpy(zero_copy_only=False)).astype(np.int64)
        det = lambda idx: np.char.mod(  # noqa: E731 — lazy: only violating rows
            f"length %s > max {n}", lens[idx].astype(str))
        return emit(_key_strings(batch, key_col), mask, f"maxlen-{col}", col, det)

    return Rule(name=f"maxlen-{col}", fn=fn, params={"col": col, "n": n})


def regex_rule(key_col: str, col: str, pattern: str, rule_name: str,
               *, full_match: bool = False) -> Rule:
    """Regex validity rule (reference: EMAIL/MOBILE/PHONE regexes,
    contact.py:24-26; EmailField, customer.py:83)."""

    def fn(batch: pa.Table) -> pa.Table:
        a = batch[col]
        m = (pc.match_substring_regex(a, f"^(?:{pattern})$")
             if full_match else pc.match_substring_regex(a, pattern))
        mask = pc.and_not(pc.is_valid(a), m).to_numpy(zero_copy_only=False)
        return emit(_key_strings(batch, key_col), mask, rule_name, col,
                    f"value does not match /{pattern}/")

    return Rule(name=rule_name, fn=fn,
                params={"col": col, "pattern": pattern, "full_match": full_match})


def expr_rule(key_col: str, rule_name: str, path: str, detail: str,
              predicate: Callable[[pa.Table], "pa.BooleanArray"],
              params: Optional[Dict] = None) -> Rule:
    """Cross-column conditional rule (reference: conditional CheckConstraint
    has_booking_slot, booking.py:269-273; start<end, booking.py:268).

    ``predicate`` returns True where the row VIOLATES the rule.
    """

    def fn(batch: pa.Table) -> pa.Table:
        bad = predicate(batch)
        if isinstance(bad, (pa.Array, pa.ChunkedArray)):
            bad = bad.to_numpy(zero_copy_only=False)
        bad = np.nan_to_num(np.asarray(bad, dtype=float)).astype(bool)
        return emit(_key_strings(batch, key_col), bad, rule_name, path, detail)

    return Rule(name=rule_name, fn=fn, params=params or {"path": path})
