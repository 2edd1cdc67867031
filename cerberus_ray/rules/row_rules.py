"""Row-local vectorized rules for the interleaved document table.

One composite "span pack" check: flattens the ``spans`` list<struct> column
ONCE per batch (zero-copy child arrays) and evaluates every span-level rule
over the flattened arrays with numpy — no per-row Python in the common
path; detail strings are built only for the (rare) violating spans.

Rule semantics ↔ reference parity:
- span-kind-domain       ≙ choices= enum domain (cerberus/models/pet.py:33-47,
                           polymorphic kind, charge.py:27)
- span-text-required     ≙ conditional requiredness (has_booking_slot
                           CheckConstraint pattern, booking.py:269-273)
- span-text-maxlen       ≙ CharField(max_length=N) (customer.py:72-74)
- span-media-ref-for-text / span-media-ref-required
                         ≙ null-iff conditional (MonitorField consistency,
                           charge.py:47)
- span-offset-negative   ≙ amount >= 0 CheckConstraint (invoice.py:360-363)
- span-offset-order      ≙ interval ordering start<end (booking.py:51,268)
- doc-id-required        ≙ primary-key presence
"""

from __future__ import annotations

from typing import List

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..schema import SPAN_KINDS, MEDIA_KINDS, SPAN_TEXT_MAX_LEN, empty_violations, VIOLATIONS
from . import details as D
from .core import Rule, RuleSet


def _flatten_spans(batch: pa.Table):
    """Return (doc_ids, flat struct fields as numpy, parent idx, span pos)."""
    spans = batch["spans"]
    doc_ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(object)
    parent = pc.list_parent_indices(spans).to_numpy(zero_copy_only=False)
    flat = pc.list_flatten(spans)
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    # span position within its doc (robust to sliced/chunked list arrays)
    counts = pc.list_value_length(spans).to_numpy(zero_copy_only=False)
    counts = np.nan_to_num(counts).astype(np.int64)
    starts = np.zeros(len(counts), dtype=np.int64)
    np.cumsum(counts[:-1], out=starts[1:])
    pos = np.arange(len(flat), dtype=np.int64) - np.repeat(starts, counts)
    return doc_ids, flat, parent, pos


def _viol(doc_ids, parent, pos, flat_idx, rule: str, field: str, details) -> pa.Table:
    """Build violation rows for flattened span indices ``flat_idx``."""
    if len(flat_idx) == 0:
        return empty_violations()
    keys = doc_ids[parent[flat_idx]]
    # null doc_id rows surface as "" (same key the doc-id-required rule uses)
    keys = np.array([k if k is not None else "" for k in keys], dtype=object)
    paths = np.char.mod(
        "spans[%d]." + field, pos[flat_idx].astype(np.int64)
    ).astype(object)
    det = details if not isinstance(details, str) else np.full(
        len(flat_idx), details, dtype=object
    )
    return pa.Table.from_arrays(
        [
            pa.array(keys, type=pa.string()),
            pa.array(np.full(len(flat_idx), rule, dtype=object), type=pa.string()),
            pa.array(paths, type=pa.string()),
            pa.array(np.asarray(det, dtype=object), type=pa.string()),
        ],
        schema=VIOLATIONS,
    )


def span_pack(batch: pa.Table, *, text_max_len: int = SPAN_TEXT_MAX_LEN) -> pa.Table:
    """Evaluate all span-level row rules on one Arrow batch → violations."""
    out: List[pa.Table] = []
    doc_ids, flat, parent, pos = _flatten_spans(batch)

    # doc-id presence
    id_null = pc.is_null(batch["doc_id"]).to_numpy(zero_copy_only=False)
    if id_null.any():
        nidx = np.flatnonzero(id_null)
        out.append(
            pa.Table.from_pydict(
                {
                    "doc_id": np.full(len(nidx), "", dtype=object),
                    "rule": np.full(len(nidx), "doc-id-required", dtype=object),
                    "path": np.full(len(nidx), "doc_id", dtype=object),
                    "detail": np.full(len(nidx), "doc_id is null", dtype=object),
                },
                schema=VIOLATIONS,
            )
        )

    if len(flat) == 0:
        return pa.concat_tables(out) if out else empty_violations()

    kind_arr = flat.field("kind")
    text_arr = flat.field("text")
    ref_arr = flat.field("media_ref")
    off_arr = flat.field("offset")

    kind_ok = pc.is_in(kind_arr, value_set=pa.array(SPAN_KINDS, type=pa.string()))
    kind_ok_np = kind_ok.to_numpy(zero_copy_only=False)
    kind_valid = pc.is_valid(kind_arr).to_numpy(zero_copy_only=False)
    kinds_np = None  # materialized lazily (only when some rule needs values)

    # 1. kind domain
    bad = np.flatnonzero(kind_valid & ~np.nan_to_num(kind_ok_np.astype(float)).astype(bool))
    if len(bad):
        kinds_np = kind_arr.to_numpy(zero_copy_only=False).astype(object)
        det = np.array([D.d_kind_domain(kinds_np[i], SPAN_KINDS) for i in bad], dtype=object)
        out.append(_viol(doc_ids, parent, pos, bad, "span-kind-domain", "kind", det))

    is_text = pc.equal(kind_arr, "text").to_numpy(zero_copy_only=False)
    is_text = np.nan_to_num(is_text.astype(float)).astype(bool)
    is_media_kind = pc.is_in(
        kind_arr, value_set=pa.array(MEDIA_KINDS, type=pa.string())
    ).to_numpy(zero_copy_only=False)
    is_media_kind = np.nan_to_num(is_media_kind.astype(float)).astype(bool)

    text_null = pc.is_null(text_arr).to_numpy(zero_copy_only=False)
    ref_null = pc.is_null(ref_arr).to_numpy(zero_copy_only=False)

    # 2. text required iff kind='text'
    bad = np.flatnonzero(is_text & text_null)
    if len(bad):
        out.append(_viol(doc_ids, parent, pos, bad, "span-text-required", "text",
                         D.d_text_required()))

    # 3. text max length
    tlen = pc.utf8_length(text_arr).to_numpy(zero_copy_only=False)
    tlen = np.nan_to_num(tlen).astype(np.int64)
    bad = np.flatnonzero(~text_null & (tlen > text_max_len))
    if len(bad):
        det = np.array(
            [D.d_text_maxlen(int(tlen[i]), text_max_len) for i in bad], dtype=object
        )
        out.append(_viol(doc_ids, parent, pos, bad, "span-text-maxlen", "text", det))

    # 4. media_ref must be null for text spans
    bad = np.flatnonzero(is_text & ~ref_null)
    if len(bad):
        out.append(_viol(doc_ids, parent, pos, bad, "span-media-ref-for-text",
                         "media_ref", D.d_media_ref_for_text()))

    # 5. media_ref required for media kinds
    bad = np.flatnonzero(is_media_kind & ref_null)
    if len(bad):
        if kinds_np is None:
            kinds_np = kind_arr.to_numpy(zero_copy_only=False).astype(object)
        det = np.array([D.d_media_ref_required(kinds_np[i]) for i in bad], dtype=object)
        out.append(_viol(doc_ids, parent, pos, bad, "span-media-ref-required",
                         "media_ref", det))

    # 6. offset >= 0
    off = off_arr.to_numpy(zero_copy_only=False)
    off_i = np.nan_to_num(off).astype(np.int64)
    off_valid = ~pc.is_null(off_arr).to_numpy(zero_copy_only=False)
    bad = np.flatnonzero(off_valid & (off_i < 0))
    if len(bad):
        det = np.array([D.d_offset_negative(int(off_i[i])) for i in bad], dtype=object)
        out.append(_viol(doc_ids, parent, pos, bad, "span-offset-negative",
                         "offset", det))

    # 7. offsets non-decreasing within each doc; comparisons skip null
    # offsets (each valid offset is checked against the LAST valid one
    # in the same doc — vectorized forward-fill of the last-valid index)
    if len(off_i) > 1:
        n = len(off_i)
        arr = np.where(off_valid, np.arange(n), -1)
        prev = np.concatenate(([-1], np.maximum.accumulate(arr)[:-1]))
        has_prev = prev >= 0
        safe_prev = np.where(has_prev, prev, 0)
        dec = (off_valid & has_prev
               & (parent[safe_prev] == parent)
               & (off_i < off_i[safe_prev]))
        bad = np.flatnonzero(dec)
        if len(bad):
            det = np.array(
                [D.d_offset_order(int(off_i[i]), int(off_i[prev[i]]))
                 for i in bad],
                dtype=object,
            )
            out.append(_viol(doc_ids, parent, pos, bad, "span-offset-order",
                             "offset", det))

    return pa.concat_tables(out) if out else empty_violations()


def explode_spans(ds):
    """flat_map-style explode: interleaved docs → span-level Dataset
    (doc_id, span_idx, kind, text, media_ref, offset). Use for span-level
    pipelines (per-span model scoring, media decode); doc-level rules stay
    on the nested column to avoid the blowup (SURVEY.md §7 hard part f)."""

    def explode(batch: pa.Table) -> pa.Table:
        doc_ids, flat, parent, pos = _flatten_spans(batch)
        keys = pa.array(doc_ids[parent], type=pa.string())
        return pa.Table.from_arrays(
            [keys, pa.array(pos, type=pa.int32()), flat.field("kind"),
             flat.field("text"), flat.field("media_ref"), flat.field("offset")],
            names=["doc_id", "span_idx", "kind", "text", "media_ref",
                   "offset"])

    return ds.map_batches(explode, batch_format="pyarrow",
                          zero_copy_batch=True)


def interleaved_ruleset(text_max_len: int = SPAN_TEXT_MAX_LEN) -> RuleSet:
    """The flagship row-local RuleSet for interleaved documents."""
    rs = RuleSet(name="interleaved-row")
    rs.add(Rule(
        name="span-pack",
        fn=lambda b: span_pack(b, text_max_len=text_max_len),
        params={"text_max_len": text_max_len,
                "rules": ["doc-id-required", "span-kind-domain",
                          "span-text-required", "span-text-maxlen",
                          "span-media-ref-for-text", "span-media-ref-required",
                          "span-offset-negative", "span-offset-order"]},
    ))
    # marker rules executed by shuffle stages (uniqueness / referential)
    rs.add(Rule(name="unique-doc-id", fn=lambda b: None,
                params={"key": ["doc_id"]}, kind="unique"))
    rs.add(Rule(name="fk-missing", fn=lambda b: None,
                params={"child_key": "spans.media_ref", "parent": "media_catalog",
                        "parent_key": "media_ref"}, kind="referential"))
    return rs


#: kind → sequence character for the span-grammar validator (one char
#: per catalog kind; unknown kinds map to '?'). Shared with the SQL
#: parity CASE in tests so the two sides cannot drift.
SEQ_KIND_CHARS = {"text": "t", "image": "i", "audio": "a",
                  "table": "b"}


def span_sequence_violations(ds, pattern: str, *, mode: str = "require",
                             rule: str | None = None,
                             max_detail_chars: int = 48):
    """Span-GRAMMAR validation: each document's span-KIND sequence,
    rendered as a one-char-per-span string (`SEQ_KIND_CHARS`), is
    checked against an RE2 ``pattern`` — ``mode='require'`` flags docs
    whose whole sequence does NOT match (the pattern is anchored), and
    ``mode='forbid'`` flags docs CONTAINING a match (e.g.
    ``'ii|aa|bb'`` = no two adjacent media spans of the same kind).
    The structural rule the per-span pack cannot express: it
    constrains the ORDER ACROSS spans, not any single span.

    Vectorized: kinds flatten zero-copy, map to bytes through a
    256-entry lookup table, each doc's sequence is one O(len) buffer
    slice, and the regex runs once per batch through pyarrow's RE2 —
    the same engine DuckDB uses, so SQL parity is exact
    (tests/test_span_grammar.py). → violations Dataset.

    Reference analogue: the FSM chain-validity rules
    (cerberus/models/booking.py) — a regular language over an ordered
    per-entity sequence, here over the span axis of one document.
    """
    if mode not in ("require", "forbid"):
        raise ValueError(f"unknown mode {mode!r}")
    rule = rule or f"span-seq-{mode}"
    rx = pattern if mode == "forbid" else f"^(?:{pattern})$"

    # kind string → single byte via a first-char+length discriminator
    # is fragile; build an explicit dictionary-encode per batch instead.
    def check(batch: pa.Table) -> pa.Table:
        doc_ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        spans = batch["spans"]
        # null spans rows: list_value_length is null → NaN; a raw int64
        # cast yields INT64_MIN and corrupts the cumsum slicing for
        # every LATER doc in the batch (same guard as _flatten_spans)
        counts = np.nan_to_num(pc.list_value_length(spans).to_numpy(
            zero_copy_only=False)).astype(np.int64)
        flat = pc.list_flatten(spans)
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        kinds = pc.fill_null(flat.field("kind"), "")  # null kind → '?'
        # dictionary-encode once, map the (tiny) dictionary to chars
        enc = pc.dictionary_encode(kinds)
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        dic = enc.dictionary.to_pylist()
        lut = np.array([ord(SEQ_KIND_CHARS.get(k, "?")) for k in dic],
                       dtype=np.uint8)
        codes = lut[enc.indices.to_numpy(zero_copy_only=False)] \
            if len(dic) else np.zeros(0, np.uint8)
        buf = codes.tobytes()
        ends = np.cumsum(counts)
        starts = ends - counts
        seqs = [buf[s:e].decode("ascii")
                for s, e in zip(starts, ends)]
        arr = pa.array(seqs, pa.string())
        hit = pc.match_substring_regex(arr, rx).to_numpy(
            zero_copy_only=False)
        bad = hit if mode == "forbid" else ~hit
        if not bad.any():
            return VIOLATIONS.empty_table()
        ids = doc_ids[bad]
        sq = [s if len(s) <= max_detail_chars
              else s[:max_detail_chars] + "…" for i, s in
              enumerate(seqs) if bad[i]]
        word = "matches forbidden" if mode == "forbid" \
            else "does not match required"
        return pa.Table.from_arrays([
            pa.array(ids.astype(object), pa.string()),
            pa.array(np.full(len(ids), rule, dtype=object), pa.string()),
            pa.array(np.full(len(ids), "spans", dtype=object),
                     pa.string()),
            pa.array([f"kind sequence '{s}' {word} /{pattern}/"
                      for s in sq], pa.string())], schema=VIOLATIONS)

    return ds.map_batches(check, batch_format="pyarrow",
                          zero_copy_batch=True)
