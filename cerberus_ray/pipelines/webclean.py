"""Web-corpus cleaning — HTML markup stripping and domain-blocklist
filtering (the C4/RefinedWeb front-door hygiene stages).

Both operators are single streamed ``map_batches`` passes built on RE2
(`pyarrow.compute` string kernels) with NO per-row Python:

- ``strip_html``: remove script/style blocks, comments and tags, decode
  the six ubiquitous HTML entities, collapse whitespace. The ordered
  (pattern, replacement) sequence is exported as ``HTML_STRIP_STEPS`` so
  the DuckDB oracle can run the IDENTICAL regexp_replace chain —
  byte-exact parity is asserted in tests/test_webclean.py (same trick as
  ``text.redact_pii``). Entity decoding runs ``&amp;`` LAST so
  double-escaped text is not double-unescaped.
- ``domain_blocklist_scan`` / ``drop_blocklisted``: C4-style bad-domain
  filtering. The hit test is ONE vectorized RE2 alternation pass whose
  pattern size is O(blocklist), never O(corpus); per-domain counts are
  then taken over the HIT subset only (∝ violation rate). Domains match
  with any subdomain prefix and a left word boundary, so blocking
  ``spam.com`` hits ``ads.spam.com`` but not ``notspam.com``.

Reference semantics analogue: the contact-classifier regex cascade
(`cerberus/models/contact.py:48-61`) and the anonymise rewrite command
(`cerberus/management/commands/anonymise.py:19-31`) — pattern-driven
normalize/filter passes over text fields, here applied to web documents.
"""

from __future__ import annotations

import re
from typing import List, Sequence, Tuple

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

#: Ordered regexp_replace chain shared verbatim with the DuckDB oracle.
#: Every pattern is RE2-compatible (no backreferences); ``(?is)`` inline
#: flags give case-insensitive + dotall where needed.
HTML_STRIP_STEPS: Tuple[Tuple[str, str], ...] = (
    (r"(?is)<script\b.*?</script>", " "),
    (r"(?is)<style\b.*?</style>", " "),
    (r"(?s)<!--.*?-->", " "),
    (r"(?s)<[^>]*>", " "),
)

#: Literal entity decodes, applied after tag removal; ``&amp;`` last.
HTML_ENTITY_STEPS: Tuple[Tuple[str, str], ...] = (
    ("&nbsp;", " "),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&amp;", "&"),
)


def strip_html_array(arr: pa.ChunkedArray | pa.Array) -> pa.Array:
    """The full strip chain on one Arrow string array (RE2 end-to-end)."""
    s = pc.fill_null(arr, "")
    for pat, rep in HTML_STRIP_STEPS:
        s = pc.replace_substring_regex(s, pat, rep)
    for lit, rep in HTML_ENTITY_STEPS:
        s = pc.replace_substring(s, lit, rep)
    s = pc.replace_substring_regex(s, r"\s+", " ")
    return pc.utf8_trim_whitespace(s)


def strip_html(ds, *, text_col: str = "text", out_col: str | None = None):
    """→ Dataset with ``out_col`` (default: ``text_col`` replaced) holding
    the markup-stripped text. One streamed vectorized pass."""
    dest = out_col or text_col

    def run(b: pa.Table) -> pa.Table:
        cleaned = strip_html_array(b[text_col])
        if dest in b.column_names:
            i = b.column_names.index(dest)
            return b.set_column(i, dest, cleaned)
        return b.append_column(dest, cleaned)

    return ds.map_batches(run, batch_format="pyarrow", zero_copy_batch=True)


def domain_pattern(domain: str) -> str:
    """RE2 pattern matching ``domain`` (or any subdomain of it) with a
    left word boundary — shared with the DuckDB oracle."""
    return (r"(?i)(?:^|[^a-z0-9.-])(?:[a-z0-9-]+\.)*"
            + re.escape(domain.lower()))


def _hit_mask(arr, domains: Sequence[str]):
    pat = "|".join(f"(?:{domain_pattern(d)})" for d in domains)
    return pc.match_substring_regex(pc.fill_null(arr, ""), pat)


def domain_blocklist_scan(ds, domains: Sequence[str], *,
                          text_col: str = "text") -> pa.Table:
    """Per-domain census: how many documents mention each blocklisted
    domain. One alternation pass finds the hit rows; per-domain counts
    run over the hits only. → (domain, n_docs) sorted by domain, zeros
    included."""
    doms: List[str] = sorted({d.lower() for d in domains})
    if not doms:
        return pa.Table.from_pydict({"domain": pa.array([], pa.string()),
                                     "n_docs": pa.array([], pa.int64())})

    def partial(b: pa.Table) -> pa.Table:
        hits = b.filter(_hit_mask(b[text_col], doms))
        counts = np.zeros(len(doms), dtype=np.int64)
        if hits.num_rows:
            s = pc.fill_null(hits[text_col], "")
            for i, d in enumerate(doms):
                m = pc.match_substring_regex(s, domain_pattern(d))
                counts[i] = pc.sum(pc.cast(m, pa.int64())).as_py() or 0
        return pa.Table.from_pydict({
            "domain": pa.array(doms, pa.string()),
            "n_docs": pa.array(counts, pa.int64())})

    pdf = ds.map_batches(partial, batch_format="pyarrow",
                         zero_copy_batch=True).to_pandas()
    g = (pdf.groupby("domain", as_index=False)["n_docs"].sum()
         .sort_values("domain").reset_index(drop=True))
    g["n_docs"] = g["n_docs"].astype("int64")
    return pa.Table.from_pandas(g, preserve_index=False)


def drop_blocklisted(ds, domains: Sequence[str], *, text_col: str = "text"):
    """Filter out every document mentioning any blocklisted domain.
    Stateless streamed pass; the pattern is O(blocklist)."""
    doms = sorted({d.lower() for d in domains})
    if not doms:
        return ds

    def keep(b: pa.Table) -> pa.Table:
        return b.filter(pc.invert(_hit_mask(b[text_col], doms)))

    return ds.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True)


#: C4 line-retention rules (Raffel et al. 2020 §2.2), shared verbatim
#: with the DuckDB oracle (both engines evaluate RE2). A line survives
#: iff (trimmed) it ends in terminal punctuation, has ≥ C4_MIN_WORDS
#: words, and does not mention javascript; a PAGE survives iff it has
#: none of the drop phrases, no curly brace (code), and ≥
#: C4_MIN_SENTENCES terminal marks AFTER line cleaning.
C4_TRIM_RE = r"^\s+|\s+$"
C4_TERMINAL_PUNCT_RE = "[.!?\"']$"
C4_WORD_RE = r"\S+"
C4_LINE_DROP_RE = r"(?i)javascript"
C4_PAGE_DROP_RE = r"(?i)lorem ipsum"
C4_SENTENCE_MARK_RE = r"[.!?]"
C4_MIN_WORDS = 3
C4_MIN_SENTENCES = 5


def c4_line_clean_array(arr, *, min_words: int = C4_MIN_WORDS) -> pa.Array:
    """C4 line filter on one Arrow string array: split each document on
    newlines, keep the lines passing the retention rules, rejoin with
    newlines (a fully-dropped document becomes ""). Vectorized
    end-to-end: one split, flat RE2 predicates over every line of the
    batch at once, and an offsets rebuild — no per-row Python."""
    s = pc.fill_null(arr, "")
    if isinstance(s, pa.ChunkedArray):
        s = s.combine_chunks()
    lines = pc.split_pattern(s, "\n")
    flat = pc.list_flatten(lines)
    parent = pc.list_parent_indices(lines).to_numpy(zero_copy_only=False)
    trimmed = pc.replace_substring_regex(flat, C4_TRIM_RE, "")
    keep = pc.and_(
        pc.and_(pc.match_substring_regex(trimmed, C4_TERMINAL_PUNCT_RE),
                pc.greater_equal(
                    pc.count_substring_regex(trimmed, C4_WORD_RE),
                    min_words)),
        pc.invert(pc.match_substring_regex(flat, C4_LINE_DROP_RE)))
    keep_np = keep.to_numpy(zero_copy_only=False)
    kept_flat = flat.filter(keep)
    counts = np.bincount(parent[keep_np], minlength=len(s))
    offsets = np.zeros(len(s) + 1, dtype=np.int32)
    np.cumsum(counts, out=offsets[1:])
    rebuilt = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()),
                                       kept_flat)
    return pc.binary_join(rebuilt, "\n")


def c4_clean(ds, *, text_col: str = "text",
             min_words: int = C4_MIN_WORDS,
             min_sentences: int = C4_MIN_SENTENCES):
    """Full C4 cleanup: line filter + page gates. Replaces ``text_col``
    with the line-cleaned text and drops pages that mention a drop
    phrase, contain a curly brace, or retain fewer than
    ``min_sentences`` sentences. One stateless streamed pass."""

    def run(b: pa.Table) -> pa.Table:
        orig = pc.fill_null(b[text_col], "")
        cleaned = c4_line_clean_array(orig, min_words=min_words)
        keep = pc.and_(
            pc.and_(pc.invert(pc.match_substring_regex(orig,
                                                       C4_PAGE_DROP_RE)),
                    pc.invert(pc.match_substring(orig, "{"))),
            pc.greater_equal(
                pc.count_substring_regex(cleaned, C4_SENTENCE_MARK_RE),
                min_sentences))
        i = b.schema.get_field_index(text_col)
        return b.set_column(i, text_col, cleaned).filter(keep)

    return ds.map_batches(run, batch_format="pyarrow", zero_copy_batch=True)


def c4_clean_stats(ds, *, text_col: str = "text",
                   min_words: int = C4_MIN_WORDS,
                   min_sentences: int = C4_MIN_SENTENCES) -> pa.Table:
    """Cleanup census in one streamed pass: per-block partial sums of
    docs/lines in+kept and per-gate page drops, merged on the driver
    (O(#blocks) 7-int rows). Gates are counted independently (a page can
    trip several); docs_kept applies them all, matching
    :func:`c4_clean`."""

    def partial(b: pa.Table) -> pa.Table:
        orig = pc.fill_null(b[text_col], "")
        if isinstance(orig, pa.ChunkedArray):
            orig = orig.combine_chunks()
        lines = pc.split_pattern(orig, "\n")
        cleaned = c4_line_clean_array(orig, min_words=min_words)
        lorem = pc.match_substring_regex(orig, C4_PAGE_DROP_RE)
        brace = pc.match_substring(orig, "{")
        few = pc.less(pc.count_substring_regex(cleaned,
                                               C4_SENTENCE_MARK_RE),
                      min_sentences)
        kept = pc.and_(pc.and_(pc.invert(lorem), pc.invert(brace)),
                       pc.invert(few))
        def n(mask):
            return pc.sum(pc.cast(mask, pa.int64())).as_py() or 0
        return pa.Table.from_pydict({
            "docs_in": [b.num_rows],
            "docs_kept": [n(kept)],
            "lines_in": [pc.sum(pc.list_value_length(lines)).as_py() or 0],
            "lines_kept": [int(pc.sum(
                pc.count_substring(cleaned, "\n")).as_py() or 0)
                + n(pc.not_equal(cleaned, ""))],
            "drop_phrase": [n(lorem)],
            "drop_brace": [n(brace)],
            "drop_few_sentences": [n(few)]})

    pdf = ds.map_batches(partial, batch_format="pyarrow",
                         zero_copy_batch=True).to_pandas()
    return pa.Table.from_pydict(
        {c: [int(pdf[c].sum())] for c in pdf.columns})


#: Invisible / zero-width code points that survive naive text cleaning
#: and poison tokenizers (obfuscation, word-joining, watermark tricks):
#: removed outright. Exotic space separators normalize to ASCII space.
INVISIBLE_RE = ("[\u200b\u200c\u200d\u2060\ufeff\u00ad"
                "\u180e\u034f\u2061-\u2064]")
EXOTIC_SPACE_RE = "[\u00a0\u2000-\u200a\u202f\u205f\u3000\u1680]"


def strip_invisible_array(arr):
    """Remove zero-width/invisible code points and normalize exotic
    Unicode spaces to ASCII space (RE2 end-to-end; the DuckDB oracle
    runs the same two regexp_replace steps — byte-exact parity in
    tests/test_webclean.py)."""
    s = pc.fill_null(arr, "")
    s = pc.replace_substring_regex(s, INVISIBLE_RE, "")
    return pc.replace_substring_regex(s, EXOTIC_SPACE_RE, " ")


def strip_invisible(ds, *, text_col: str = "text"):
    """One streamed vectorized pass; schema unchanged."""

    def run(b: pa.Table) -> pa.Table:
        i = b.schema.get_field_index(text_col)
        return b.set_column(i, text_col, strip_invisible_array(b[text_col]))

    return ds.map_batches(run, batch_format="pyarrow", zero_copy_batch=True)


#: Query parameters that identify a click, not a resource — the standard
#: tracking families dropped by public crawl-dedup practice (two pages
#: differing only in utm_* ARE the same page). Matched as a full param
#: (name, optionally =value).
TRACKING_PARAM_RE = (r"^(utm_[^=&]*|fbclid|gclid|msclkid|mc_eid|igshid|"
                     r"ref|ref_src)(=.*)?$")

_URL_RE = (r"^(?P<scheme>[A-Za-z][A-Za-z0-9+.\-]*)://"
           r"(?P<host>[^/?#]*)(?P<path>[^?]*)(?P<q>\?.*)?$")


def canonicalize_url_array(arr) -> pa.Array:
    """Canonicalize absolute ``scheme://host`` URLs so that trivially
    distinct spellings of the same resource hash identically (the key
    normalization BEFORE any URL-level dedup):

    - trim surrounding whitespace; strip the ``#fragment``
    - lowercase scheme and host; strip a trailing host dot
    - strip the scheme's default port (http:80 / https:443)
    - empty path → ``/``
    - query: drop empty and tracking parameters
      (:data:`TRACKING_PARAM_RE`), byte-sort the survivors, rejoin;
      an emptied query drops its ``?``

    Strings that don't parse as absolute URLs (and nulls) pass through
    unchanged. Vectorized: one RE2 extract + string kernels; the only
    per-URL work is the param sort/rejoin, restricted to rows that HAVE
    a query."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    orig = arr
    s = pc.utf8_trim_whitespace(pc.fill_null(arr, ""))
    s = pc.replace_substring_regex(s, r"#.*$", "")
    ex = pc.extract_regex(s, _URL_RE)
    valid = ex.is_valid().to_numpy(zero_copy_only=False)
    scheme = pc.utf8_lower(pc.struct_field(ex, "scheme"))
    host = pc.utf8_lower(pc.struct_field(ex, "host"))
    host = pc.replace_substring_regex(host, r"\.$", "")
    host = pc.if_else(pc.equal(scheme, "http"),
                      pc.replace_substring_regex(host, r":80$", ""),
                      pc.if_else(pc.equal(scheme, "https"),
                                 pc.replace_substring_regex(host, r":443$", ""),
                                 host))
    path = pc.struct_field(ex, "path")
    path = pc.if_else(pc.equal(path, ""), "/", path)

    # query params: flatten → drop empty/tracking → byte-sort per URL
    rawq = pc.replace_substring_regex(
        pc.fill_null(pc.struct_field(ex, "q"), ""), r"^\?", "")
    qcanon = np.full(len(s), "", dtype=object)
    has_q = pc.not_equal(rawq, "").to_numpy(zero_copy_only=False) & valid
    if has_q.any():
        qi = np.flatnonzero(has_q)
        parts = pc.split_pattern(rawq.take(pa.array(qi)), "&")
        flat = pc.list_flatten(parts)
        parents = pc.list_parent_indices(parts).to_numpy(
            zero_copy_only=False)
        keep = pc.and_(pc.not_equal(flat, ""),
                       pc.invert(pc.match_substring_regex(
                           flat, TRACKING_PARAM_RE)))
        km = keep.to_numpy(zero_copy_only=False)
        vals = np.asarray(flat.to_numpy(zero_copy_only=False)[km],
                          dtype="U")
        par = parents[km]
        order = np.lexsort((vals, par))  # byte order within each URL
        joined = (pd.Series(vals[order])
                  .groupby(par[order]).agg("&".join))
        qcanon[qi[joined.index.to_numpy()]] = joined.to_numpy()
    qarr = pa.array(qcanon, pa.string())

    rest = pc.binary_join_element_wise(host, path, "")
    rest = pc.if_else(pc.equal(qarr, ""), rest,
                      pc.binary_join_element_wise(rest, qarr, "?"))
    canon = pc.binary_join_element_wise(scheme, rest, "://")
    return pc.if_else(pa.array(valid), canon, orig)


def canonicalize_urls(ds, *, url_col: str = "url",
                      out_col: str | None = None):
    """One streamed vectorized pass; appends ``out_col`` (default:
    rewrite ``url_col`` in place)."""

    def run(b: pa.Table) -> pa.Table:
        out = canonicalize_url_array(b[url_col])
        if out_col and out_col != url_col:
            return b.append_column(out_col, out)
        i = b.schema.get_field_index(url_col)
        return b.set_column(i, url_col, out)

    return ds.map_batches(run, batch_format="pyarrow", zero_copy_batch=True)


def canonical_url_dup_report(ds, *, url_col: str = "url",
                             mode: str = "auto") -> pa.Table:
    """(canonical_url, n) for every canonical URL appearing more than
    once — canonicalize (streamed) then the engine's standard
    duplicate-key planner (`stages/uniqueness.duplicate_key_counts`:
    driver/cms/shuffle modes, driver structures bounded by distinct
    keys). The URL-level exact-dedup front door of crawl pipelines."""
    from ..stages.uniqueness import duplicate_key_counts

    canon = canonicalize_urls(ds, url_col=url_col,
                              out_col="canonical_url")
    out = duplicate_key_counts(canon.select_columns(["canonical_url"]),
                               ["canonical_url"], mode=mode)
    return out


#: combining-mark block stripped by accent folding after NFKD
#: decomposition (the classic Latin diacritic fold: café→cafe, ü→u)
_COMBINING_RE = "[̀-ͯ]"


def normalize_unicode_array(arr, *, form: str = "NFKC",
                            strip_accents: bool = False,
                            casefold: bool = False) -> pa.Array:
    """Unicode-normalize a string array — the canonicalization step
    before exact/near dedup (two byte-distinct encodings of 'café' must
    hash identically). ``form`` ∈ NFC/NFKC/NFD/NFKD via pandas'
    C-backed ``str.normalize``; ``strip_accents`` folds Latin
    diacritics (NFKD + combining-mark removal, then recomposition to
    the requested form); ``casefold`` applies full Unicode casefolding
    (ß→ss — strictly stronger than lower())."""
    if form not in ("NFC", "NFKC", "NFD", "NFKD"):
        raise ValueError(f"unknown form {form!r}")
    import pandas as pd

    s = pd.Series(arr.to_pandas() if hasattr(arr, "to_pandas") else arr)
    nulls = s.isna()
    s = s.fillna("")
    if strip_accents:
        s = (s.str.normalize("NFKD")
             .str.replace(_COMBINING_RE, "", regex=True))
    s = s.str.normalize(form)
    if casefold:
        s = s.str.casefold()
    out = s.to_numpy(dtype=object)
    out[nulls.to_numpy()] = None
    return pa.array(out, pa.string())


def normalize_unicode(ds, *, text_col: str = "text",
                      out_col: str | None = None, form: str = "NFKC",
                      strip_accents: bool = False,
                      casefold: bool = False):
    """Streamed per-batch Unicode normalization (→ Dataset; in-place on
    ``text_col`` unless ``out_col`` names a new column)."""
    dest = out_col or text_col

    def fn(b: pa.Table) -> pa.Table:
        norm = normalize_unicode_array(
            b[text_col], form=form, strip_accents=strip_accents,
            casefold=casefold)
        if dest in b.schema.names:
            return b.set_column(b.schema.get_field_index(dest), dest,
                                norm)
        return b.append_column(dest, norm)

    return ds.map_batches(fn, batch_format="pyarrow",
                          zero_copy_batch=True)


#: Encoding-anomaly markers, RE2 patterns shared verbatim with the
#: DuckDB oracle (tests/test_webclean.py): stray C0 control characters
#: (minus \t \n \r — legitimate in text), the U+FFFD replacement
#: character a lossy decode leaves behind, and the two canonical
#: UTF-8-read-as-Latin-1/Win-1252 mojibake prefixes ("Ã" + a
#: Latin-1 continuation codepoint, and "â€" from curly
#: punctuation).
ENC_SCAN_PATTERNS = (
    ("control", "[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f]"),
    ("replacement_char", "�"),
    ("mojibake_latin1", "\u00c3[\u0080-\u00bf]"),
    ("mojibake_win1252", "â€"),
)


def encoding_anomaly_scan(ds, *, text_col: str = "text",
                          round_digits: int = 6):
    """Corpus-wide encoding health report: per anomaly kind, how many
    documents are affected and how many hits occur — the triage step
    before re-decoding or dropping a source. One streamed vectorized
    pass (RE2 count per pattern per block), driver merge of
    4-rows-per-block partials.

    → pandas frame (kind, n_docs, docs_affected, hits, doc_rate) in
    ENC_SCAN_PATTERNS order."""
    import numpy as np
    import pandas as pd

    def part(b: pa.Table) -> pa.Table:
        s = pc.fill_null(b[text_col], "")
        kinds, affected, hits = [], [], []
        for kind, pat in ENC_SCAN_PATTERNS:
            c = pc.count_substring_regex(s, pattern=pat)
            cn = c.to_numpy(zero_copy_only=False)
            kinds.append(kind)
            affected.append(int((cn > 0).sum()))
            hits.append(int(cn.sum()))
        return pa.Table.from_pydict({
            "kind": pa.array(kinds, pa.string()),
            "n_docs": pa.array([b.num_rows] * len(kinds), pa.int64()),
            "docs_affected": pa.array(affected, pa.int64()),
            "hits": pa.array(hits, pa.int64())})

    pdf = ds.map_batches(part, batch_format="pyarrow",
                         zero_copy_batch=True).to_pandas()
    g = (pdf.groupby("kind", sort=False, as_index=False)
         [["n_docs", "docs_affected", "hits"]].sum())
    order = {k: i for i, (k, _) in enumerate(ENC_SCAN_PATTERNS)}
    g = g.sort_values("kind", key=lambda s: s.map(order))
    g["doc_rate"] = (g["docs_affected"]
                     / g["n_docs"].replace(0, np.nan)).fillna(0.0)
    g["doc_rate"] = g["doc_rate"].round(round_digits)
    return g.reset_index(drop=True)
