"""Property-based span rules: the vectorized span_pack must agree with a
straightforward per-row Python reference implementation on arbitrary
generated documents (FIXTURES.md §5 — hypothesis span generators)."""

import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from cerberus_ray.rules.row_rules import span_pack
from cerberus_ray.schema import DOCUMENTS_INTERLEAVED, MEDIA_KINDS, SPAN_KINDS

MAXLEN = 64

kinds = st.sampled_from(list(SPAN_KINDS) + ["video", "weird", None])
texts = st.one_of(st.none(), st.text(max_size=MAXLEN + 16))
refs = st.one_of(st.none(), st.text(min_size=1, max_size=8))
offsets = st.one_of(st.none(), st.integers(min_value=-5, max_value=500))

span_st = st.fixed_dictionaries(
    {"kind": kinds, "text": texts, "media_ref": refs, "offset": offsets})
doc_st = st.fixed_dictionaries(
    {"doc_id": st.one_of(st.none(), st.text(min_size=1, max_size=6)),
     "spans": st.lists(span_st, max_size=6)})


def reference_impl(docs):
    """Naive per-row implementation of the same rules."""
    out = set()
    for d in docs:
        did = d["doc_id"]
        if did is None:
            out.add(("", "doc-id-required", "doc_id"))
            did = ""
        prev_off = None
        for i, s in enumerate(d["spans"]):
            k, t, r, o = s["kind"], s["text"], s["media_ref"], s["offset"]
            if k is not None and k not in SPAN_KINDS:
                out.add((did, "span-kind-domain", f"spans[{i}].kind"))
            if k == "text" and t is None:
                out.add((did, "span-text-required", f"spans[{i}].text"))
            if t is not None and len(t) > MAXLEN:
                out.add((did, "span-text-maxlen", f"spans[{i}].text"))
            if k == "text" and r is not None:
                out.add((did, "span-media-ref-for-text", f"spans[{i}].media_ref"))
            if k in MEDIA_KINDS and r is None:
                out.add((did, "span-media-ref-required", f"spans[{i}].media_ref"))
            if o is not None and o < 0:
                out.add((did, "span-offset-negative", f"spans[{i}].offset"))
            if o is not None and prev_off is not None and o < prev_off:
                out.add((did, "span-offset-order", f"spans[{i}].offset"))
            if o is not None:
                prev_off = o
    return out


@settings(max_examples=150, deadline=None, derandomize=True)
@given(st.lists(doc_st, min_size=1, max_size=8))
def test_span_pack_matches_reference(docs):
    t = pa.Table.from_pylist(docs, schema=DOCUMENTS_INTERLEAVED)
    v = span_pack(t, text_max_len=MAXLEN)
    got = set(zip(v["doc_id"].to_pylist(), v["rule"].to_pylist(),
                  v["path"].to_pylist()))
    assert got == reference_impl(docs)
