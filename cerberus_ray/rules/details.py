"""Canonical violation detail/path formatters.

Shared by the validator stages AND the synthetic-data generator so golden
expected outputs are byte-identical to engine outputs (FIXTURES.md §"golden").
The flattened `(doc_id, rule, path, detail)` row is the engine's analogue of
the reference's nested error documents {field: [messages]}
(reference: cerberus/serializers.py:59-65).
"""

from __future__ import annotations


def span_path(span_idx: int, field: str) -> str:
    return f"spans[{span_idx}].{field}"


def d_kind_domain(value, allowed) -> str:
    return f"kind {value!r} not in {sorted(allowed)}"


def d_text_required() -> str:
    return "text is required when kind='text'"


def d_text_maxlen(n: int, max_len: int) -> str:
    return f"text length {n} > max {max_len}"


def d_media_ref_for_text() -> str:
    return "media_ref must be null when kind='text'"


def d_media_ref_required(kind: str) -> str:
    return f"media_ref is required when kind={kind!r}"


def d_offset_negative(v: int) -> str:
    return f"offset {v} < 0"


def d_offset_order(v: int, prev: int) -> str:
    return f"offset {v} < previous {prev}"


def d_fk_missing(ref: str, parent: str = "media_catalog") -> str:
    return f"media_ref {ref!r} not found in {parent}"


def d_unique(n: int) -> str:
    return f"count={n}"
