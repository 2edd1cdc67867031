"""Co-occurrence/PMI: hand vectors, DuckDB bigram-count parity on the
real documents table, mode agreement, PMI reference parity."""

import duckdb
import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from cerberus_ray.pipelines.cooccurrence import adjacent_pair_counts, pmi_top_k

SF = "/root/testdata/sf0.001"

BIGRAM_SQL = """
WITH t AS (
  SELECT list_filter(string_split_regex(lower(COALESCE(text, '')),
                                        '\\s+'), x -> x <> '') AS toks
  FROM {src}
),
p AS (SELECT unnest(list_zip(toks, toks[2:])) AS z FROM t)
SELECT z[1] AS w1, z[2] AS w2, CAST(COUNT(*) AS BIGINT) AS n
FROM p WHERE z[2] IS NOT NULL
GROUP BY 1, 2
ORDER BY n DESC, w1, w2
"""


def _norm(df):
    return (df.sort_values(["n", "w1", "w2"],
                           ascending=[False, True, True])
            .reset_index(drop=True))


def test_hand_vectors(ray_session):
    df = pd.DataFrame({"text": [
        "the cat  sat", "the cat", "", None, "cat THE cat"]})
    got = adjacent_pair_counts(rd.from_pandas(df, override_num_blocks=2))
    # the cat ×3 (incl. 'cat THE cat'); cat sat ×1; cat the ×1;
    # boundary pairs ('sat|the', 'cat|cat' across docs) do NOT count
    want = _norm(pd.DataFrame({"w1": ["the", "cat", "cat"],
                               "w2": ["cat", "sat", "the"],
                               "n": [3, 1, 1]}))
    pd.testing.assert_frame_equal(_norm(got), want)


def test_duckdb_parity_real_docs(ray_session):
    from cerberus_ray.sources.io import read_table

    ds = read_table(f"{SF}/documents.parquet", columns=["text"])
    got = _norm(adjacent_pair_counts(ds, "text", min_count=2))
    want = duckdb.sql(BIGRAM_SQL.format(
        src=f"read_parquet('{SF}/documents.parquet')")).fetchdf()
    want = _norm(want[want["n"] >= 2])
    pd.testing.assert_frame_equal(got, want)


def test_mode_agreement(ray_session):
    from cerberus_ray.sources.io import read_table

    ds = read_table(f"{SF}/documents.parquet", columns=["text"])
    a = adjacent_pair_counts(ds, "text", min_count=3, mode="driver")
    b = adjacent_pair_counts(ds, "text", min_count=3, mode="shuffle")
    pd.testing.assert_frame_equal(_norm(a), _norm(b))
    with pytest.raises(ValueError, match="unknown mode"):
        adjacent_pair_counts(ds, "text", mode="nope")


def test_pmi_reference(ray_session):
    rng = np.random.default_rng(9)
    # 'san francisco' always collocates; 'the' is everywhere
    docs = []
    for _ in range(300):
        words = list(rng.choice(["the", "a", "dog", "park", "walk"],
                                size=8))
        if rng.random() < 0.3:
            pos = rng.integers(0, 7)
            words[pos:pos + 2] = ["san", "francisco"]
        docs.append(" ".join(words))
    ds = rd.from_pandas(pd.DataFrame({"text": docs}),
                        override_num_blocks=3)
    got = pmi_top_k(ds, "text", k=5, min_count=5)
    assert got.iloc[0][["w1", "w2"]].tolist() == ["san", "francisco"]

    # slow reference for the winner's PMI value
    toks = [d.split() for d in docs]
    uni = pd.Series([w for t in toks for w in t]).value_counts()
    pairs = pd.Series([(t[i], t[i + 1]) for t in toks
                       for i in range(len(t) - 1)]).value_counts()
    n_tok, n_pair = uni.sum(), pairs.sum()
    want = np.log2((pairs[("san", "francisco")] / n_pair)
                   / ((uni["san"] / n_tok) * (uni["francisco"] / n_tok)))
    np.testing.assert_allclose(float(got.iloc[0]["pmi"]), want, rtol=1e-12)


def test_pmi_denominator_uses_unfiltered_totals(ray_session):
    """min_count gates which pairs are REPORTED, not the probability
    denominators (regression: filtered totals inflated every PMI)."""
    docs = ["a b"] * 10 + ["c d"] * 2 + ["e f"]  # 'e f' below min_count
    ds = rd.from_pandas(pd.DataFrame({"text": docs}))
    got = pmi_top_k(ds, "text", k=5, min_count=2)
    toks = [w for d in docs for w in d.split()]
    uni = pd.Series(toks).value_counts()
    n_tok = uni.sum()
    n_pair = 13.0  # ALL adjacent pairs, incl. the filtered 'e f'
    want = np.log2((10 / n_pair) / ((uni["a"] / n_tok) * (uni["b"] / n_tok)))
    row = got[(got["w1"] == "a") & (got["w2"] == "b")]
    np.testing.assert_allclose(float(row["pmi"].iloc[0]), want, rtol=1e-12)
    assert not ((got["w1"] == "e") & (got["w2"] == "f")).any()
