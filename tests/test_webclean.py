"""Web-cleaning operators: HTML strip chain (hand vectors, byte-exact
DuckDB regexp_replace parity, idempotence) and domain-blocklist
scan/drop (boundary semantics, DuckDB parity, drop consistency)."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from cerberus_ray.pipelines.webclean import (HTML_ENTITY_STEPS,
                                             HTML_STRIP_STEPS,
                                             domain_blocklist_scan,
                                             domain_pattern,
                                             drop_blocklisted,
                                             strip_html, strip_html_array)


DIRTY = [
    "<html><body><p>hello world</p></body></html>",
    "before <script>var x = '<p>evil</p>';</script> after",
    "css <STYLE type='a'>p { color: red }</STYLE> gone",
    "keep <!-- secret comment --> text",
    "a &amp; b &lt;tag&gt; &quot;q&quot; &#39;s&#39; c&nbsp;d",
    "&amp;lt; stays escaped-once",
    "plain text, no markup at all",
    "spaces\t\tand\n\nnewlines   collapse",
    "",
    None,
    "unclosed <div attr='x' never ends",
    "math: a < b and c > d",
]


def test_hand_vectors():
    out = strip_html_array(pa.array(DIRTY, pa.string())).to_pylist()
    assert out[0] == "hello world"
    assert out[1] == "before after"
    assert out[2] == "css gone"
    assert out[3] == "keep text"
    assert out[4] == "a & b <tag> \"q\" 's' c d"
    # double-escaped input unescapes exactly once
    assert out[5] == "&lt; stays escaped-once"
    assert out[6] == "plain text, no markup at all"
    assert out[7] == "spaces and newlines collapse"
    assert out[8] == "" and out[9] == ""
    # regex limitation is the documented C4-style contract: an unclosed
    # tag (no '>') survives; a bare '<' with a later '>' eats the middle
    assert out[10] == "unclosed <div attr='x' never ends"
    assert out[11] == "math: a d"


def test_idempotent():
    once = strip_html_array(pa.array(DIRTY, pa.string()))
    twice = strip_html_array(once)
    # entity decoding is NOT idempotent by design ('&amp;lt;' -> '&lt;'
    # -> '<'), so compare only rows without residual entities
    for a, b in zip(once.to_pylist(), twice.to_pylist()):
        if "&" not in a:
            assert a == b


def test_duckdb_byte_exact_parity():
    """The SAME ordered replace chain interpolated into DuckDB must give
    byte-identical output (both engines are RE2)."""
    con = duckdb.connect()
    expr = "COALESCE(t, '')"
    for pat, rep in HTML_STRIP_STEPS:
        p = pat.replace("'", "''")
        expr = f"regexp_replace({expr}, '{p}', '{rep}', 'g')"
    for lit, rep in HTML_ENTITY_STEPS:
        l_, r_ = lit.replace("'", "''"), rep.replace("'", "''")
        expr = f"replace({expr}, '{l_}', '{r_}')"
    expr = f"trim(regexp_replace({expr}, '\\s+', ' ', 'g'))"
    con.register("d", pa.table({"t": pa.array(DIRTY, pa.string())}))
    orc = con.execute(f"SELECT {expr} AS s FROM d").fetch_df()["s"].tolist()
    mine = strip_html_array(pa.array(DIRTY, pa.string())).to_pylist()
    assert mine == orc


def test_strip_html_dataset(ray_session):
    df = pd.DataFrame({"doc_id": range(len(DIRTY)), "text": DIRTY})
    out = strip_html(rd.from_pandas(df, override_num_blocks=3)).to_pandas()
    assert out.loc[0, "text"] == "hello world"
    assert list(out.columns) == ["doc_id", "text"]
    out2 = strip_html(rd.from_pandas(df), out_col="clean").to_pandas()
    assert list(out2.columns) == ["doc_id", "text", "clean"]
    assert out2.loc[1, "clean"] == "before after"


BLOCK_DOCS = [
    "visit https://spam.com today",          # exact domain
    "cdn at static.ads.spam.com/path",       # subdomain
    "mail me at bob@spam.com",               # in an email
    "notspam.com is a different site",       # left-boundary: no hit
    "totally clean document",
    "SPAM.COM uppercase",                    # case-insensitive
    "tracker.io and spam.com both",          # two domains, one doc
    None,
]


def test_blocklist_scan_and_drop(ray_session):
    df = pd.DataFrame({"doc_id": range(len(BLOCK_DOCS)),
                       "text": BLOCK_DOCS})
    ds = rd.from_pandas(df, override_num_blocks=3)
    scan = domain_blocklist_scan(ds, ["spam.com", "tracker.io",
                                      "absent.example"]).to_pandas()
    got = dict(zip(scan["domain"], scan["n_docs"]))
    assert got == {"absent.example": 0, "spam.com": 5, "tracker.io": 1}
    kept = drop_blocklisted(ds, ["spam.com", "tracker.io"]).to_pandas()
    assert sorted(kept["doc_id"]) == [3, 4, 7]
    # empty blocklist keeps everything (and returns the same dataset)
    assert drop_blocklisted(ds, []).count() == len(df)


def test_blocklist_duckdb_parity():
    con = duckdb.connect()
    con.register("d", pa.table({"t": pa.array(BLOCK_DOCS, pa.string())}))
    for dom, want in (("spam.com", 5), ("tracker.io", 1)):
        p = domain_pattern(dom).replace("'", "''")
        n = con.execute(
            f"SELECT COUNT(*) FROM d WHERE "
            f"regexp_matches(COALESCE(t,''), '{p}')").fetchone()[0]
        assert n == want


def test_reports_sf0001(ray_session):
    from cerberus_ray.pipelines.training_queries import (
        q_domain_blocklist_report, q_html_strip_report)

    sf = "/root/testdata/sf0.001"
    h = q_html_strip_report(sf).to_pandas()
    assert int(h["n_roundtrip_exact"].iloc[0]) == int(h["n_wrapped"].iloc[0])
    assert int(h["n_changed_unwrapped"].iloc[0]) == 0
    assert int(h["n_wrapped"].iloc[0]) > 0

    b = q_domain_blocklist_report(sf).to_pandas()
    got = dict(zip(b["domain"], b["n_docs"]))
    assert got["never-seen.example"] == 0
    assert got["spam-a.example"] > 0 and got["tracker-b.example"] > 0
    # drop consistency: docs hit by ANY domain = n_input - n_kept; the
    # injection sets overlap at lcm(37,53) — recompute from doc ids
    import duckdb as dk
    con = dk.connect()
    ids = con.execute(
        f"SELECT doc_id FROM read_parquet('{sf}/documents.parquet')"
    ).fetch_df()["doc_id"]
    hit = ((ids % 37 == 0) | (ids % 53 == 0)).sum()
    assert int(b["n_input"].iloc[0] - b["n_kept"].iloc[0]) == int(hit)
    assert got["spam-a.example"] == int((ids % 37 == 0).sum())
    assert got["tracker-b.example"] == int((ids % 53 == 0).sum())
    # deterministic rerun
    pd.testing.assert_frame_equal(b, q_domain_blocklist_report(sf).to_pandas())


# ---- invisible-character hygiene -------------------------------------------


def test_strip_invisible_vectors():
    from cerberus_ray.pipelines.webclean import strip_invisible_array

    dirty = [
        "zero​width‌join‍",          # ZWSP/ZWNJ/ZWJ
        "﻿BOM prefix",
        "soft­hyphen",
        "nb space and em-space",
        "ideographic　space",
        "clean ascii stays",
        None,
    ]
    out = strip_invisible_array(pa.array(dirty, pa.string())).to_pylist()
    assert out[0] == "zerowidthjoin"
    assert out[1] == "BOM prefix"
    assert out[2] == "softhyphen"
    assert out[3] == "nb space and em-space"
    assert out[4] == "ideographic space"
    assert out[5] == "clean ascii stays"
    assert out[6] == ""


def test_strip_invisible_duckdb_parity():
    from cerberus_ray.pipelines.webclean import (EXOTIC_SPACE_RE,
                                                 INVISIBLE_RE,
                                                 strip_invisible_array)

    dirty = ["a​ b c", "﻿x y‍z", "plain", None,
             "⁠  　mix"]
    con = duckdb.connect()
    con.register("d", pa.table({"t": pa.array(dirty, pa.string())}))
    expr = (f"regexp_replace(regexp_replace(COALESCE(t,''), "
            f"'{INVISIBLE_RE}', '', 'g'), '{EXOTIC_SPACE_RE}', ' ', 'g')")
    orc = con.execute(f"SELECT {expr} AS s FROM d").fetch_df()["s"].tolist()
    mine = strip_invisible_array(pa.array(dirty, pa.string())).to_pylist()
    assert mine == orc


def test_strip_invisible_dataset(ray_session):
    from cerberus_ray.pipelines.webclean import strip_invisible

    df = pd.DataFrame({"doc_id": [1, 2],
                       "text": ["a​b", "plain"]})
    out = strip_invisible(rd.from_pandas(df)).to_pandas()
    assert out["text"].tolist() == ["ab", "plain"]
    assert list(out.columns) == ["doc_id", "text"]



# --- C4 line-level cleanup (Raffel et al. 2020 §2.2) ------------------

C4_DOCS = [
    # kept lines must end in terminal punct, have >=3 words, no js
    "This is a good sentence.\nshort line\nAnother fine sentence here!\n"
    "Enable javascript to continue.\nno terminal punctuation here\n"
    'He said "stop".',
    # page gates
    "Lorem Ipsum dolor sit amet. One. Two. Three. Four. Five sentences.",
    "function f() { return 1; } This page has code. A. B. C. D. E.",
    "Only two sentences survive here. Second one right here.",
    "A good doc. With plenty. Of sentences. To pass. The gate easily.",
    "",
    None,
    "   \t  \n  ",
]


def test_c4_line_clean_hand_vectors():
    from cerberus_ray.pipelines.webclean import c4_line_clean_array

    out = c4_line_clean_array(pa.array(C4_DOCS, pa.string())).to_pylist()
    assert out[0] == ("This is a good sentence.\n"
                      "Another fine sentence here!\n"
                      'He said "stop".')
    # trailing-whitespace lines still match terminal punct after trim
    assert c4_line_clean_array(
        pa.array(["Ends with punct.   "], pa.string())).to_pylist() == [
        "Ends with punct.   "]  # original line bytes preserved
    assert out[5] == "" and out[6] == "" and out[7] == ""


def test_c4_clean_page_gates(ray_session):
    from cerberus_ray.pipelines.webclean import c4_clean

    df = pd.DataFrame({"doc_id": [f"d{i}" for i in range(len(C4_DOCS))],
                       "text": C4_DOCS})
    kept = c4_clean(rd.from_pandas(df, override_num_blocks=3)).to_pandas()
    ids = set(kept["doc_id"])
    assert "d1" not in ids          # lorem ipsum
    assert "d2" not in ids          # curly brace
    assert "d3" not in ids          # < 5 sentences
    assert "d4" in ids              # passes everything
    assert "d0" not in ids          # only 3 sentences survive line filter
    # surviving text is the line-cleaned text
    assert kept[kept["doc_id"] == "d4"]["text"].iloc[0] == C4_DOCS[4]


def test_c4_duckdb_parity(ray_session):
    """Byte-exact line-filter parity: DuckDB list_filter runs the SAME
    RE2 predicates interpolated from the module constants."""
    from cerberus_ray.pipelines.webclean import (
        C4_LINE_DROP_RE, C4_MIN_WORDS, C4_TERMINAL_PUNCT_RE, C4_TRIM_RE,
        C4_WORD_RE, c4_line_clean_array)

    docs = pd.read_parquet("/root/testdata/sf0.001/documents.parquet",
                           columns=["doc_id", "text"])
    # synthesize line structure: break each doc into pseudo-lines
    docs["text"] = (docs["text"].str.replace(". ", ".\n", regex=False)
                    .str.replace(" the ", "\nthe ", regex=False))
    got = c4_line_clean_array(
        pa.array(docs["text"].tolist(), pa.string())).to_pylist()
    con = duckdb.connect()
    con.register("docs", docs)
    punct = C4_TERMINAL_PUNCT_RE.replace("'", "''")
    # COALESCE: DuckDB's array_to_string of an EMPTY list is NULL; the
    # engine contract for a fully-dropped document is ""
    sql = f"""
        SELECT COALESCE(array_to_string(list_filter(string_split(text, chr(10)),
            x -> regexp_matches(regexp_replace(x, '{C4_TRIM_RE}', '', 'g'),
                                '{punct}')
                 AND len(regexp_extract_all(
                        regexp_replace(x, '{C4_TRIM_RE}', '', 'g'),
                        '{C4_WORD_RE}')) >= {C4_MIN_WORDS}
                 AND NOT regexp_matches(x, '{C4_LINE_DROP_RE}')),
            chr(10)), '') AS clean
        FROM docs ORDER BY doc_id
    """
    want = [r[0] for r in
            con.execute(sql.replace("FROM docs ORDER BY doc_id",
                                    "FROM docs")).fetchall()]
    assert got == want


def test_c4_clean_stats(ray_session):
    from cerberus_ray.pipelines.webclean import c4_clean, c4_clean_stats

    df = pd.DataFrame({"doc_id": [f"d{i}" for i in range(len(C4_DOCS))],
                       "text": C4_DOCS})
    ds = rd.from_pandas(df, override_num_blocks=3)
    st = c4_clean_stats(ds).to_pandas().iloc[0]
    kept = c4_clean(ds).to_pandas()
    assert st["docs_in"] == len(C4_DOCS)
    assert st["docs_kept"] == len(kept)
    assert st["drop_phrase"] == 1 and st["drop_brace"] == 1
    # lines_kept equals the total line count of the cleaned texts
    from cerberus_ray.pipelines.webclean import c4_line_clean_array
    cl = c4_line_clean_array(pa.array(C4_DOCS, pa.string())).to_pylist()
    assert st["lines_kept"] == sum(len(c.split("\n")) if c else 0
                                   for c in cl)
    # partition invariance
    st1 = c4_clean_stats(rd.from_pandas(df, override_num_blocks=1)
                         ).to_pandas().iloc[0]
    assert (st1 == st).all()


def test_normalize_unicode_forms(ray_session):
    import pyarrow as pa

    from cerberus_ray.pipelines.webclean import normalize_unicode_array

    import unicodedata
    decomposed = "café"           # e + combining acute
    composed = "café"              # é precomposed
    ligature = "ﬁne"                    # U+FB01 ligature fi
    arr = pa.array([decomposed, composed, ligature, "STRASSE", "ß", None])
    nfc = normalize_unicode_array(arr, form="NFC").to_pylist()
    assert nfc[0] == nfc[1] == composed  # byte-identical after NFC
    assert nfc[2] == ligature            # NFC keeps compat ligature
    nfkc = normalize_unicode_array(arr, form="NFKC").to_pylist()
    assert nfkc[2] == "fine"             # NFKC folds it
    assert nfkc[5] is None
    # reference cross-check against unicodedata on every value
    for got, src in zip(nfkc[:5], arr.to_pylist()[:5]):
        assert got == unicodedata.normalize("NFKC", src)


def test_normalize_accent_fold_and_casefold(ray_session):
    import pyarrow as pa

    from cerberus_ray.pipelines.webclean import normalize_unicode_array

    arr = pa.array(["café", "naïve Über", "ß", "São_Paulo"])
    folded = normalize_unicode_array(arr, strip_accents=True,
                                     casefold=True).to_pylist()
    assert folded == ["cafe", "naive uber", "ss", "sao_paulo"]
    import pytest as _pt
    with _pt.raises(ValueError, match="unknown form"):
        normalize_unicode_array(arr, form="NFX")


def test_normalize_unicode_dataset_dedup_effect(ray_session):
    import pandas as pd
    import ray.data as rd

    from cerberus_ray.pipelines.dedup import exact_dup_stats
    from cerberus_ray.pipelines.webclean import normalize_unicode

    df = pd.DataFrame({
        "doc_id": ["a", "b", "c"],
        "text": ["café society", "café society", "other"]})
    ds = rd.from_pandas(df)
    before = exact_dup_stats(ds)
    norm = normalize_unicode(ds, form="NFC")
    after = exact_dup_stats(norm)
    # the two encodings of 'café society' collapse only after NFC
    assert int(before["n_unique"][0].as_py()) == 3
    assert int(after["n_unique"][0].as_py()) == 2


def test_encoding_scan_duckdb_parity(ray_session):
    from cerberus_ray.pipelines.webclean import (ENC_SCAN_PATTERNS,
                                                 encoding_anomaly_scan)

    docs = pd.DataFrame({"text": [
        "clean text, nothing wrong.",
        "null byte \x00 and bell \x07 inside",
        "lossy decode �� here",
        "cafÃ© is mojibake latin1",        # "cafÃ©"
        "â€œsmart quotesâ€", # "â€œ…â€"
        None,
        "tab\tand\nnewline are fine",
        "double \x00\x00 control",
    ]})
    got = encoding_anomaly_scan(
        rd.from_pandas(docs, override_num_blocks=3)).set_index("kind")
    con = duckdb.connect()
    con.register("docs", docs)
    for kind, pat in ENC_SCAN_PATTERNS:
        aff, hits = con.execute(
            "SELECT COUNT(*) FILTER (regexp_matches(coalesce(text, "
            "''), ?)), CAST(COALESCE(SUM(len(regexp_extract_all("
            "coalesce(text, ''), ?))), 0) AS BIGINT) FROM docs",
            [pat, pat]).fetchone()
        assert got.loc[kind, "docs_affected"] == aff, kind
        assert got.loc[kind, "hits"] == hits, kind
        assert got.loc[kind, "n_docs"] == len(docs), kind
    # the synthetic rows above hit every anomaly class at least once
    assert (got["docs_affected"] > 0).all()
    con.close()


def test_encoding_scan_on_real_documents(ray_session):
    from cerberus_ray.pipelines.webclean import encoding_anomaly_scan
    from cerberus_ray.sources.io import read_table

    docs = read_table("/root/testdata/sf0.001/documents.parquet",
                      columns=["text"])
    got = encoding_anomaly_scan(docs)
    n = docs.count()
    assert (got["n_docs"] == n).all()
    assert (got["hits"] >= got["docs_affected"]).all()
    assert ((got["doc_rate"] >= 0) & (got["doc_rate"] <= 1)).all()
