"""Corpus-wide line dedup: DuckDB parity for the duplicated-line set and
the cut text, keep-first winner semantics, driver/shuffle mode agreement,
and partition invariance."""

import duckdb
import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from cerberus_ray.pipelines.line_dedup import (
    cut_duplicated_lines, duplicated_line_set, line_dedup_report)

BOILER = "(c) 2024 Example Corp - all rights reserved"
NAV = "home | about | contact"


def corpus() -> pd.DataFrame:
    rows = []
    for i in range(40):
        body = [f"unique line {i} alpha", f"unique line {i} beta"]
        lines = [BOILER] + body
        if i % 2 == 0:
            lines.append(NAV)
        if i == 7:           # within-doc repeat of its own unique line:
            lines.append(f"unique line {i} alpha")   # must NOT count ×2
        if i == 3:
            lines.append("")          # blank line: never a candidate
            lines.append("   ")       # whitespace-only: ditto
        rows.append({"doc_id": f"d{i:03d}", "text": "\n".join(lines)})
    # one doc with no newline structure at all
    rows.append({"doc_id": "d100", "text": "solitary single-line document"})
    return pd.DataFrame(rows)


def duck_dup_lines(df: pd.DataFrame, min_docs: int = 2) -> set:
    con = duckdb.connect()
    con.register("docs", df)
    out = con.execute(
        "SELECT line FROM ("
        "  SELECT doc_id, trim(l) AS line FROM ("
        "    SELECT doc_id, unnest(string_split(text, chr(10))) AS l"
        "    FROM docs))"
        " WHERE line <> '' GROUP BY line"
        f" HAVING count(DISTINCT doc_id) >= {min_docs}").fetchdf()
    return set(out["line"])


def pandas_cut(df: pd.DataFrame, dup_lines: set, keep: str,
               winners: dict) -> pd.Series:
    out = {}
    for _, r in df.iterrows():
        kept = []
        for raw in r["text"].split("\n"):
            s = raw.strip()
            if s in dup_lines and s != "":
                if keep == "first" and winners[s] == r["doc_id"]:
                    kept.append(raw)
                continue
            kept.append(raw)
        out[r["doc_id"]] = "\n".join(kept)
    return pd.Series(out)


@pytest.fixture(scope="module")
def ds(ray_session):
    return rd.from_pandas(corpus(), override_num_blocks=5).materialize()


def test_dup_set_matches_duckdb(ds):
    df = corpus()
    h, k = duplicated_line_set(ds, mode="driver")
    expected = duck_dup_lines(df)
    assert len(h) == len(expected)   # {BOILER, NAV}; not doc 7's repeat
    assert expected == {BOILER, NAV}
    # winners are the min doc_id containing each line
    assert set(k) == {"d000"}        # both lines first occur in d000


def test_cut_matches_pandas_reference_keep_none(ds):
    df = corpus()
    dup = duplicated_line_set(ds, mode="driver")
    cut = cut_duplicated_lines(ds, dup, keep="none").to_pandas()
    expected = pandas_cut(df, duck_dup_lines(df), "none", {})
    got = cut.set_index("doc_id")["text"]
    for d in expected.index:
        assert got[d] == expected[d], d
    # untouched doc byte-identical
    assert got["d100"] == "solitary single-line document"
    # doc 3's blank + whitespace-only lines survive
    assert "\n\n   " in got["d003"] or got["d003"].endswith("\n   ")


def test_cut_keep_first_retains_one_copy(ds):
    df = corpus()
    dup = duplicated_line_set(ds, mode="driver")
    winners = dict(zip([BOILER, NAV], ["d000", "d000"]))
    cut = cut_duplicated_lines(ds, dup, keep="first").to_pandas()
    got = cut.set_index("doc_id")["text"]
    expected = pandas_cut(df, duck_dup_lines(df), "first", winners)
    for d in expected.index:
        assert got[d] == expected[d], d
    assert BOILER in got["d000"]
    assert all(BOILER not in got[f"d{i:03d}"] for i in range(1, 40))
    with pytest.raises(ValueError):
        cut_duplicated_lines(ds, dup, keep="bogus")


def test_mode_agreement_and_partition_invariance(ds, ray_session):
    a = duplicated_line_set(ds, mode="driver")
    b = duplicated_line_set(ds, mode="shuffle")
    np.testing.assert_array_equal(a[0], b[0])
    np.testing.assert_array_equal(a[1], b[1])
    ds2 = rd.from_pandas(corpus(), override_num_blocks=11).materialize()
    c = duplicated_line_set(ds2, mode="driver")
    np.testing.assert_array_equal(a[0], c[0])
    np.testing.assert_array_equal(a[1], c[1])
    with pytest.raises(ValueError):
        duplicated_line_set(ds, mode="bogus")


def test_report_rollup(ds):
    rep = line_dedup_report(ds, mode="driver").to_pandas()
    assert rep["n_docs"][0] == 41
    assert rep["dup_lines"][0] == 2
    removed = rep["chars_before"][0] - rep["chars_after"][0]
    # 40× BOILER + 20× NAV removed, plus one newline separator each
    assert removed == 40 * (len(BOILER) + 1) + 20 * (len(NAV) + 1)


def test_sf0001_report_pin(ray_session):
    """Exact pinned values at sf0.001 (the extras-surface query): the
    deterministic 10-token re-wrap surfaces the table's injected
    whole-doc duplicates as duplicated lines."""
    from cerberus_ray.pipelines.training_queries import q_line_dedup_report
    t = q_line_dedup_report("/root/testdata/sf0.001").to_pydict()
    assert t == {"n_docs": [500], "dup_lines": [135],
                 "chars_before": [153156], "chars_after": [139394]}


def test_empty_and_dup_free_inputs(ray_session):
    clean = rd.from_pandas(pd.DataFrame(
        {"doc_id": ["a", "b"], "text": ["only here", "only there"]}))
    h, k = duplicated_line_set(clean, mode="driver")
    assert len(h) == 0
    out = cut_duplicated_lines(clean, (h, k)).to_pandas()
    assert list(out["text"]) == ["only here", "only there"]
    h2, k2 = duplicated_line_set(clean, mode="shuffle")
    assert len(h2) == 0


# ---- paragraph granularity ------------------------------------------------

PARA_BOILER = ("This document is provided as-is.\nNo warranty of any kind\n"
               "is expressed or implied.")


def para_corpus() -> pd.DataFrame:
    rows = []
    for i in range(30):
        paras = [f"intro {i} one\ncontinues here {i}",
                 PARA_BOILER,
                 f"body {i} closing thoughts"]
        rows.append({"doc_id": f"p{i:03d}", "text": "\n\n".join(paras)})
    rows.append({"doc_id": "clean", "text": "totally unique\n\nparagraphs"})
    return pd.DataFrame(rows)


def test_paragraph_unit_detects_multiline_boilerplate(ray_session):
    df = para_corpus()
    ds_ = rd.from_pandas(df, override_num_blocks=4)
    # at line granularity the boilerplate is 3 separate duplicated lines
    lh, _ = duplicated_line_set(ds_, unit="line")
    ph, pk = duplicated_line_set(ds_, unit="paragraph")
    assert len(lh) == 3
    assert len(ph) == 1          # one duplicated PARAGRAPH unit
    assert pk[0] == "p000"        # min-key winner

    cut = cut_duplicated_lines(ds_, (ph, pk), unit="paragraph").to_pandas()
    cut = cut.set_index("doc_id")
    # whole 3-line block removed, other paragraphs joined back with \n\n
    assert cut.loc["p004", "text"] == (
        "intro 4 one\ncontinues here 4\n\nbody 4 closing thoughts")
    # untouched doc byte-exact
    assert cut.loc["clean", "text"] == "totally unique\n\nparagraphs"


def test_paragraph_keep_first_and_mode_agreement(ray_session):
    df = para_corpus()
    ds_ = rd.from_pandas(df, override_num_blocks=4)
    a = duplicated_line_set(ds_, unit="paragraph", mode="driver")
    b = duplicated_line_set(ds_, unit="paragraph", mode="shuffle")
    assert (a[0] == b[0]).all() and (a[1] == b[1]).all()
    kept = cut_duplicated_lines(ds_, a, unit="paragraph",
                                keep="first").to_pandas()
    has = kept["text"].str.contains("No warranty", regex=False)
    assert has.sum() == 1
    assert kept.loc[has, "doc_id"].iloc[0] == "p000"
    with pytest.raises(ValueError):
        duplicated_line_set(ds_, unit="sentence")


def test_paragraph_report(ray_session):
    df = para_corpus()
    r = line_dedup_report(rd.from_pandas(df).materialize(),
                          unit="paragraph").to_pandas()
    assert int(r["dup_lines"].iloc[0]) == 1
    assert int(r["chars_after"].iloc[0]) < int(r["chars_before"].iloc[0])


def test_within_doc_repeats_cut(ray_session):
    from cerberus_ray.pipelines.line_dedup import cut_within_doc_repeats

    df = pd.DataFrame([
        {"doc_id": "a", "text": "one\ntwo\none\nthree\ntwo\nfour"},
        {"doc_id": "b", "text": "unique\nlines\nonly"},
        {"doc_id": "c", "text": "x\n\n\nx\n  x  \ny"},  # strip-normalized repeats
    ])
    out = (cut_within_doc_repeats(rd.from_pandas(df, override_num_blocks=2))
           .to_pandas().set_index("doc_id"))
    assert out.loc["a", "text"] == "one\ntwo\nthree\nfour"
    assert out.loc["b", "text"] == "unique\nlines\nonly"  # byte-exact
    # 'x', '  x  ' match on stripped content; blanks survive as structure
    assert out.loc["c", "text"] == "x\n\n\ny"
    # paragraph granularity
    df2 = pd.DataFrame([{"doc_id": "p",
                         "text": "para one\nline two\n\npara one\nline two\n\nend"}])
    o2 = (cut_within_doc_repeats(rd.from_pandas(df2), unit="paragraph")
          .to_pandas())
    assert o2["text"].iloc[0] == "para one\nline two\n\nend"
    with pytest.raises(ValueError):
        cut_within_doc_repeats(rd.from_pandas(df), unit="word")
