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
