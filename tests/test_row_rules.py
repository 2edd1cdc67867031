"""Row-local span rules: handcrafted cases with exact expected
(doc_id, rule, path, detail) rows — the engine's analogue of the
reference's constraint unit tests (cerberus/tests/test_bookings.py:48-56,
300-315), plus golden parity against the generator."""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from cerberus_ray.datagen import GenConfig, expected_violations, gen_docs_batch
from cerberus_ray.rules.row_rules import span_pack
from cerberus_ray.schema import DOCUMENTS_INTERLEAVED


def make_doc(doc_id, spans):
    return pa.Table.from_pylist(
        [{"doc_id": doc_id, "spans": spans}], schema=DOCUMENTS_INTERLEAVED)


def span(kind="text", text="hello", media_ref=None, offset=0):
    return {"kind": kind, "text": text, "media_ref": media_ref, "offset": offset}


def viol_rows(t):
    return sorted(
        zip(t["doc_id"].to_pylist(), t["rule"].to_pylist(),
            t["path"].to_pylist(), t["detail"].to_pylist()))


def test_clean_doc_has_no_violations():
    t = make_doc("d1", [span(offset=0), span(kind="image", text=None,
                                             media_ref="m1", offset=5)])
    assert span_pack(t).num_rows == 0


def test_kind_domain():
    t = make_doc("d1", [span(kind="video", text=None, media_ref="m1")])
    rows = viol_rows(span_pack(t))
    assert rows == [("d1", "span-kind-domain", "spans[0].kind",
                     "kind 'video' not in ['audio', 'image', 'table', 'text']")]


def test_text_required_for_text_kind():
    t = make_doc("d1", [span(text=None)])
    rows = viol_rows(span_pack(t))
    assert ("d1", "span-text-required", "spans[0].text",
            "text is required when kind='text'") in rows


def test_text_maxlen():
    t = make_doc("d1", [span(text="x" * 300)])
    rows = viol_rows(span_pack(t, text_max_len=256))
    assert rows == [("d1", "span-text-maxlen", "spans[0].text",
                     "text length 300 > max 256")]
    assert span_pack(t, text_max_len=512).num_rows == 0


def test_media_ref_null_iff_text():
    t = make_doc("d1", [span(media_ref="m1"),  # text span with a ref
                        span(kind="audio", text=None, media_ref=None, offset=1)])
    rows = viol_rows(span_pack(t))
    assert ("d1", "span-media-ref-for-text", "spans[0].media_ref",
            "media_ref must be null when kind='text'") in rows
    assert ("d1", "span-media-ref-required", "spans[1].media_ref",
            "media_ref is required when kind='audio'") in rows


def test_offset_rules():
    t = make_doc("d1", [span(offset=-3), span(offset=10, text="b"),
                        span(offset=4, text="c")])
    rows = viol_rows(span_pack(t))
    assert ("d1", "span-offset-negative", "spans[0].offset", "offset -3 < 0") in rows
    assert ("d1", "span-offset-order", "spans[2].offset",
            "offset 4 < previous 10") in rows
    # equal offsets are allowed (non-decreasing)
    t2 = make_doc("d2", [span(offset=5), span(offset=5, text="b")])
    assert span_pack(t2).num_rows == 0


def test_offset_order_not_cross_doc():
    # last offset of d1 > first of d2 must NOT trip the rule
    t = pa.Table.from_pylist(
        [{"doc_id": "d1", "spans": [span(offset=100)]},
         {"doc_id": "d2", "spans": [span(offset=1)]}],
        schema=DOCUMENTS_INTERLEAVED)
    assert span_pack(t).num_rows == 0


def test_null_doc_id():
    t = pa.Table.from_pylist([{"doc_id": None, "spans": [span()]}],
                             schema=DOCUMENTS_INTERLEAVED)
    rows = viol_rows(span_pack(t))
    assert ("", "doc-id-required", "doc_id", "doc_id is null") in rows


def test_empty_spans_ok():
    t = pa.Table.from_pylist([{"doc_id": "d1", "spans": []}],
                             schema=DOCUMENTS_INTERLEAVED)
    assert span_pack(t).num_rows == 0


def test_golden_parity_full_generator():
    """Validator output == generator golden for all row-local rules."""
    cfg = GenConfig(n_docs=5000)
    t = gen_docs_batch(np.arange(cfg.n_docs), cfg)
    golden = expected_violations(cfg)
    shuffle_rules = pa.array(["unique-doc-id", "fk-missing"])
    g = golden.filter(pc.invert(pc.is_in(golden["rule"], value_set=shuffle_rules)))
    v = span_pack(t, text_max_len=cfg.text_max_len)
    assert viol_rows(v) == viol_rows(g)
