"""Corpus datasheet: DuckDB parity for the exact columns, scored-frame
rollup parity for the quality share, partition invariance."""

import duckdb
import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from cerberus_ray.pipelines.datasheet import corpus_datasheet


def corpus():
    rng = np.random.default_rng(21)
    words = "alpha beta gamma delta epsilon zeta".split()
    rows = []
    for i in range(200):
        rows.append({
            "doc_id": i,
            "source": ("web", "books")[i % 2],
            "lang": ("en", "de")[i % 3 == 0],
            "text": " ".join(rng.choice(words, size=int(rng.integers(3, 40))))})
    # exact duplicates inside one group
    rows[10]["text"] = rows[12]["text"] = rows[14]["text"]
    for r in (rows[10], rows[12], rows[14]):
        r["source"], r["lang"] = "web", "en"
    # a junk doc that fails the quality gate
    rows[5]["text"] = "a a"
    return pd.DataFrame(rows)


@pytest.fixture(scope="module")
def sheet(ray_session):
    df = corpus()
    out = corpus_datasheet(
        rd.from_pandas(df, override_num_blocks=5)).to_pandas()
    return df, out


def test_exact_columns_duckdb_parity(sheet):
    df, out = sheet
    con = duckdb.connect()
    con.register("documents", df)
    orc = con.execute(r"""
        SELECT source, lang,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(len(list_filter(string_split_regex(
                    lower(COALESCE(text,'')), '\s+'), x -> x <> '')))
                    AS BIGINT) AS n_tokens,
               CAST(SUM(LENGTH(COALESCE(text,''))) AS BIGINT) AS n_chars,
               CAST(COUNT(DISTINCT md5(COALESCE(text,''))) AS BIGINT)
                    AS n_distinct_text
        FROM documents GROUP BY source, lang ORDER BY source, lang
    """).fetch_df()
    pd.testing.assert_frame_equal(
        out[["source", "lang", "n_docs", "n_tokens", "n_chars",
             "n_distinct_text"]], orc, check_dtype=False)


def test_quality_share_matches_scored_rollup(sheet, ray_session):
    from cerberus_ray.pipelines.text import score_text

    df, out = sheet
    scored = score_text(rd.from_pandas(df), concurrency=2).to_pandas()
    ref = (scored.groupby(["source", "lang"])["quality_pass"].mean()
           .round(4))
    for _, row in out.iterrows():
        assert row["pct_quality_pass"] == ref[(row["source"], row["lang"])]


def test_dup_frac_and_partition_invariance(sheet, ray_session):
    df, out = sheet
    web_en = out[(out["source"] == "web") & (out["lang"] == "en")].iloc[0]
    assert web_en["n_docs"] - web_en["n_distinct_text"] == 2  # 3 copies
    assert web_en["dup_frac"] == round(2 / web_en["n_docs"], 4)
    again = corpus_datasheet(
        rd.from_pandas(df, override_num_blocks=13)).to_pandas()
    pd.testing.assert_frame_equal(out, again)


def test_datasheet_sf0001(ray_session):
    from cerberus_ray.pipelines.training_queries import q_corpus_datasheet

    t = q_corpus_datasheet("/root/testdata/sf0.001").to_pandas()
    assert (t["n_docs"] > 0).all()
    assert ((t["dup_frac"] >= 0) & (t["dup_frac"] < 1)).all()
    assert ((t["pct_quality_pass"] >= 0)
            & (t["pct_quality_pass"] <= 1)).all()
    assert t["n_docs"].sum() == 500  # sf0.001 documents row count
