"""Arrow schemas for the engine's logical tables.

The reference declares its schema as Django model fields (fixed, versioned
by migrations — see SURVEY.md §1.2). Here every logical table gets an
explicit ``pyarrow.Schema``; max-length / enum-domain / nullability are
*rules* (cerberus_ray.rules), not types, because Arrow types carry none of
those constraints.

Primary input shape (BASELINE.json ``input_hint``): a table of interleaved
text + media documents::

    doc_id: string
    spans:  list<struct<kind:string, text:string, media_ref:string, offset:int32>>

``kind`` mirrors the reference's polymorphic discriminator pattern
(reference: cerberus/models/charge.py:27 Charge polymorphy;
cerberus/models/contact.py:48-61 Contact.type classification).
``media_ref`` is a foreign key into ``media_catalog`` (PROTECT semantics,
reference: cerberus/models/pet.py:68-72).  ``offset`` ordering mirrors the
slot interval constraints (reference: cerberus/models/booking.py:51,72-83).
"""

from __future__ import annotations

import pyarrow as pa

SPAN_KINDS = ("text", "image", "audio", "table")
MEDIA_KINDS = ("image", "audio", "table")

#: Max codepoints allowed in a span's text (CharField(max_length=...) pattern,
#: reference: cerberus/models/customer.py:72-74).
SPAN_TEXT_MAX_LEN = 4096

SPAN_STRUCT = pa.struct(
    [
        pa.field("kind", pa.string()),
        pa.field("text", pa.string()),
        pa.field("media_ref", pa.string()),
        pa.field("offset", pa.int32()),
    ]
)

DOCUMENTS_INTERLEAVED = pa.schema(
    [
        pa.field("doc_id", pa.string()),
        pa.field("spans", pa.list_(SPAN_STRUCT)),
    ]
)

MEDIA_CATALOG = pa.schema(
    [
        pa.field("media_ref", pa.string()),
        pa.field("kind", pa.string()),
        pa.field("bytes", pa.int64()),
    ]
)

#: Normalized violation row — the engine's analogue of the reference's
#: nested DRF error dicts ``{field: [messages]}`` (cerberus/serializers.py:59-65)
#: and DB IntegrityError surface, flattened to one row per violation.
VIOLATIONS = pa.schema(
    [
        pa.field("doc_id", pa.string()),
        pa.field("rule", pa.string()),
        pa.field("path", pa.string()),
        pa.field("detail", pa.string()),
    ]
)

#: Per-partition verdict row (north_rule: per-partition pass/fail).
VERDICTS = pa.schema(
    [
        pa.field("fragment_id", pa.string()),
        pa.field("pass", pa.bool_()),
        pa.field("n_rows", pa.int64()),
        pa.field("n_violations", pa.int64()),
    ]
)


def empty_violations() -> pa.Table:
    return VIOLATIONS.empty_table()


def violations_table(doc_ids, rules, paths, details) -> pa.Table:
    """Build a violations table from four equal-length columns."""
    return pa.Table.from_arrays(
        [
            pa.array(doc_ids, type=pa.string()),
            pa.array(rules, type=pa.string()),
            pa.array(paths, type=pa.string()),
            pa.array(details, type=pa.string()),
        ],
        schema=VIOLATIONS,
    )
