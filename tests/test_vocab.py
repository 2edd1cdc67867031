"""Vocabulary top-k: driver vs CMS-heavy-hitters agreement, exactness vs
a pure-pandas reference, and the one-sided-error guarantee."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from cerberus_ray.pipelines.vocab import token_top_k


def corpus(n_docs=300, seed=11):
    rng = np.random.default_rng(seed)
    # zipf-ish: token w<i> appears with weight 1/(i+1)
    vocab = [f"w{i}" for i in range(200)]
    w = 1.0 / (np.arange(200) + 1)
    w /= w.sum()
    rows = []
    for i in range(n_docs):
        toks = rng.choice(vocab, size=40, p=w)
        rows.append({"doc_id": i, "text": " ".join(toks)})
    return pd.DataFrame(rows)


def reference_counts(df):
    ex = df["text"].str.lower().str.split().explode()
    return ex.value_counts()


@pytest.fixture(scope="module")
def ds(ray_session):
    return rd.from_pandas(corpus(), override_num_blocks=6)


def test_driver_mode_matches_pandas(ds):
    top = token_top_k(ds, k=15, mode="driver").to_pandas()
    ref = reference_counts(corpus())
    assert len(top) == 15
    for tok, n in zip(top["token"], top["n"]):
        assert ref[tok] == n
    # descending, deterministic tie-break
    assert list(top["n"]) == sorted(top["n"], reverse=True)


def test_cms_mode_agrees_with_driver(ds):
    a = token_top_k(ds, k=15, mode="driver")
    b = token_top_k(ds, k=15, mode="cms")
    assert a.equals(b)
    with pytest.raises(ValueError):
        token_top_k(ds, mode="bogus")


def test_cms_candidates_survive_skewed_blocks(ray_session):
    """A token frequent overall but spread across blocks must still be
    found (the local-candidate overscan catches it)."""
    rows = []
    # 'hot' appears twice per doc everywhere; filler tokens differ per doc
    for i in range(240):
        rows.append({"doc_id": i,
                     "text": f"hot hot filler{i} filler{i} other{i%7}"})
    ds = rd.from_pandas(pd.DataFrame(rows), override_num_blocks=8)
    top = token_top_k(ds, k=3, mode="cms").to_pandas()
    assert top["token"].iloc[0] == "hot"
    assert top["n"].iloc[0] == 480


def test_empty_input(ray_session):
    ds = rd.from_pandas(pd.DataFrame({"doc_id": [1], "text": [""]}))
    assert token_top_k(ds, k=5, mode="driver").num_rows == 0


def test_token_top_k_duckdb_parity(ray_session):
    """Dual-path oracle (local: the operator lives on the extras surface
    to keep the driver registry at 50): top-20 tokens on the sf0.001
    documents table must match DuckDB exactly."""
    import duckdb
    import pyarrow as pa  # noqa: F401

    from cerberus_ray.pipelines.training_queries import q_token_top_k

    sf = "/root/testdata/sf0.001"
    mine = q_token_top_k(sf).to_pandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf}/documents.parquet')")
    orc = con.execute(r"""
        WITH t AS (
          SELECT unnest(string_split_regex(
                     lower(COALESCE(text, '')), '\s+')) AS token
          FROM documents)
        SELECT token, CAST(COUNT(*) AS BIGINT) AS n
        FROM t WHERE token <> ''
        GROUP BY token ORDER BY n DESC, token LIMIT 20
    """).fetch_df()
    assert mine["token"].tolist() == orc["token"].tolist()
    assert mine["n"].tolist() == orc["n"].tolist()


# ---- per-group heavy hitters -------------------------------------------


def grouped_corpus(n_docs=240, seed=13):
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n_docs):
        lang = ("en", "de", "fr")[i % 3]
        vocab = [f"{lang}_{j}" for j in range(80)]
        w = 1.0 / (np.arange(80) + 1)
        w /= w.sum()
        rows.append({"doc_id": i, "lang": lang,
                     "text": " ".join(rng.choice(vocab, size=30, p=w))})
    return pd.DataFrame(rows)


def test_grouped_topk_matches_pandas(ray_session):
    from cerberus_ray.pipelines.vocab import token_top_k_by_group

    df = grouped_corpus()
    ds = rd.from_pandas(df, override_num_blocks=6)
    top = token_top_k_by_group(ds, group_col="lang", k=8,
                               mode="driver").to_pandas()
    ex = df.assign(token=df["text"].str.lower().str.split()) \
           .explode("token")[["lang", "token"]]
    ref = (ex.groupby(["lang", "token"], as_index=False).size()
             .rename(columns={"size": "n", "lang": "group"})
             .sort_values(["group", "n", "token"],
                          ascending=[True, False, True])
             .groupby("group", as_index=False).head(8)
             .reset_index(drop=True))
    pd.testing.assert_frame_equal(
        top, ref.astype({"n": "int64"}), check_dtype=False)


def test_grouped_topk_mode_agreement(ray_session):
    from cerberus_ray.pipelines.vocab import token_top_k_by_group

    ds = rd.from_pandas(grouped_corpus(), override_num_blocks=6)
    a = token_top_k_by_group(ds, group_col="lang", k=8, mode="driver")
    b = token_top_k_by_group(ds, group_col="lang", k=8, mode="shuffle")
    assert a.equals(b)
    import pytest as _pytest
    with _pytest.raises(ValueError):
        token_top_k_by_group(ds, group_col="lang", mode="bogus")


def test_grouped_topk_duckdb_parity_sf0001(ray_session):
    import duckdb

    from cerberus_ray.pipelines.training_queries import q_token_top_k_by_lang

    sf = "/root/testdata/sf0.001"
    mine = q_token_top_k_by_lang(sf).to_pandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf}/documents.parquet')")
    orc = con.execute(r"""
        WITH t AS (
          SELECT lang AS "group",
                 unnest(string_split_regex(
                     lower(COALESCE(text, '')), '\s+')) AS token
          FROM documents),
        c AS (
          SELECT "group", token, CAST(COUNT(*) AS BIGINT) AS n
          FROM t WHERE token <> '' GROUP BY "group", token),
        r AS (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY "group"
                       ORDER BY n DESC, token) AS rk
          FROM c)
        SELECT "group", token, n FROM r WHERE rk <= 10
        ORDER BY "group", n DESC, token
    """).fetch_df()
    pd.testing.assert_frame_equal(mine, orc, check_dtype=False)


def test_grouped_topk_empty(ray_session):
    from cerberus_ray.pipelines.vocab import token_top_k_by_group

    ds = rd.from_pandas(pd.DataFrame({"lang": ["en"], "text": [""]}))
    assert token_top_k_by_group(ds, group_col="lang",
                                mode="driver").num_rows == 0


def test_vocab_growth_duckdb_parity(ray_session):
    import duckdb

    from cerberus_ray.pipelines.vocab import vocab_growth
    from cerberus_ray.sources.io import read_table

    SF = "/root/testdata/sf0.001"
    ds = read_table(f"{SF}/documents.parquet",
                    columns=["doc_id", "text"])
    got = vocab_growth(ds, n_checkpoints=8)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{SF}/documents.parquet')")
    dmax = con.execute("""
        WITH t2 AS (SELECT doc_id,
              unnest(string_split_regex(lower(coalesce(text,'')),
                                        '\\s+')) tok FROM documents)
        SELECT max(doc_id) FROM t2 WHERE tok <> ''""").fetchone()[0]
    grid = sorted({int(np.ceil(dmax * k / 8)) for k in range(1, 9)})
    want = con.execute(f"""
        WITH t2 AS (SELECT doc_id,
              unnest(string_split_regex(lower(coalesce(text,'')),
                                        '\\s+')) tok FROM documents),
        tt AS (SELECT doc_id, tok FROM t2 WHERE tok <> ''),
        firsts AS (SELECT tok, min(doc_id) md FROM tt GROUP BY tok),
        grid AS (SELECT unnest({grid}) AS c)
        SELECT c AS checkpoint_doc,
          (SELECT CAST(count(*) AS BIGINT) FROM tt WHERE doc_id <= c)
              AS n_tokens_cum,
          (SELECT CAST(count(*) AS BIGINT) FROM firsts WHERE md <= c)
              AS vocab_size
        FROM grid ORDER BY c""").df()
    assert list(got["checkpoint_doc"]) == list(want["checkpoint_doc"])
    np.testing.assert_array_equal(got["n_tokens_cum"],
                                  want["n_tokens_cum"])
    np.testing.assert_array_equal(got["vocab_size"], want["vocab_size"])
    con.close()


def test_vocab_growth_power_law_and_edges(ray_session):
    from cerberus_ray.pipelines.vocab import vocab_growth

    # doc i holds exactly i tokens of which ceil(sqrt) are new →
    # roughly V ≈ T^0.5; check the fit lands near 0.5 and the curve
    # is exact on a hand case first
    docs = pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "text": ["a", "a b", "b c a", "c d a b"]})
    g = vocab_growth(rd.from_pandas(docs, override_num_blocks=2),
                     n_checkpoints=4)
    assert list(g["checkpoint_doc"]) == [1, 2, 3, 4]
    assert list(g["n_tokens_cum"]) == [1, 3, 6, 10]
    assert list(g["vocab_size"]) == [1, 2, 3, 4]

    rng = np.random.default_rng(5)
    rows = []
    vocab_n = 0
    for i in range(1, 200):
        new = [f"w{vocab_n + j}" for j in range(
            max(1, int(np.sqrt(i + 1) - np.sqrt(i)) ))]
        vocab_n += len(new)
        old = [f"w{rng.integers(0, max(vocab_n, 1))}" for _ in range(i)]
        rows.append({"doc_id": i, "text": " ".join(new + old)})
    big = vocab_growth(rd.from_pandas(pd.DataFrame(rows),
                                      override_num_blocks=4),
                       n_checkpoints=10)
    assert 0.1 < big["heaps_beta"].iloc[0] < 0.9
    # monotone curve
    assert (np.diff(big["vocab_size"]) >= 0).all()
    assert (np.diff(big["n_tokens_cum"]) > 0).all()

    # empty / all-blank input
    e = vocab_growth(rd.from_pandas(pd.DataFrame(
        {"doc_id": [1, 2], "text": ["", "   "]})), n_checkpoints=3)
    assert len(e) == 0

    # layout invariance
    a = vocab_growth(rd.from_pandas(pd.DataFrame(rows),
                                    override_num_blocks=1),
                     n_checkpoints=5)
    b = vocab_growth(rd.from_pandas(pd.DataFrame(rows),
                                    override_num_blocks=7),
                     n_checkpoints=5)
    pd.testing.assert_frame_equal(a, b)


def test_token_jsd_matrix(ray_session):
    import duckdb

    from cerberus_ray.pipelines.vocab import token_jsd_matrix

    # identical distributions → 0; disjoint vocabularies → ln 2
    df = pd.DataFrame({
        "g": ["a", "a", "b", "b", "c"],
        "text": ["x y", "y x", "x y", "x y y x"[:3], "p q r"]})
    df.loc[3, "text"] = "y x"
    got = token_jsd_matrix(rd.from_pandas(df, override_num_blocks=2),
                           group_col="g", text_col="text")
    m = got.set_index(["group_a", "group_b"])
    np.testing.assert_allclose(m.loc[("a", "b"), "jsd"], 0.0,
                               atol=1e-12)
    np.testing.assert_allclose(m.loc[("a", "c"), "jsd"], np.log(2),
                               atol=1e-12)
    # distance is sqrt(jsd) and satisfies the triangle inequality here
    np.testing.assert_allclose(got["distance"], np.sqrt(got["jsd"]))

    # DuckDB parity for one pair over the real table
    from cerberus_ray.sources.io import read_table

    SF = "/root/testdata/sf0.001"
    ds = read_table(f"{SF}/documents.parquet",
                    columns=["lang", "text"])
    full = token_jsd_matrix(ds, group_col="lang", text_col="text")
    pair = full.set_index(["group_a", "group_b"]).loc[("de", "en")]
    con = duckdb.connect()
    want = con.execute(f"""
        WITH t AS (SELECT lang g,
              unnest(string_split_regex(lower(coalesce(text,'')),
                                        '\\s+')) tok
            FROM read_parquet('{SF}/documents.parquet')
            WHERE lang IN ('de','en')),
        c AS (SELECT g, tok, COUNT(*)::DOUBLE n FROM t
              WHERE tok <> '' GROUP BY 1, 2),
        p AS (SELECT tok,
              COALESCE(SUM(n) FILTER (g = 'de'), 0)
                / (SELECT SUM(n) FROM c WHERE g = 'de') AS pp,
              COALESCE(SUM(n) FILTER (g = 'en'), 0)
                / (SELECT SUM(n) FROM c WHERE g = 'en') AS qq
              FROM c GROUP BY tok)
        SELECT SUM(CASE WHEN pp > 0 THEN pp/2 * LN(pp / ((pp+qq)/2))
                        ELSE 0 END)
             + SUM(CASE WHEN qq > 0 THEN qq/2 * LN(qq / ((pp+qq)/2))
                        ELSE 0 END) AS jsd
        FROM p""").df().iloc[0]
    np.testing.assert_allclose(pair["jsd"], want["jsd"], atol=1e-9)
    con.close()

    # layout invariance
    a = token_jsd_matrix(rd.from_pandas(df, override_num_blocks=1),
                         group_col="g")
    b = token_jsd_matrix(rd.from_pandas(df, override_num_blocks=5),
                         group_col="g")
    pd.testing.assert_frame_equal(a, b)
