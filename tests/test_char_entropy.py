"""Character-entropy signal: closed-form vectors, numpy reference,
DuckDB per-codepoint parity (shared 4-dp half-away rounding), and the
bottom-k report."""

import math

import duckdb
import numpy as np
import pandas as pd
import pytest

from cerberus_ray.pipelines.text import char_entropy

SF_DIR = "/root/testdata/sf0.001"


def _ds(rows, ray_session):
    import ray.data as rd

    return rd.from_pandas(pd.DataFrame(rows)).repartition(2)


def test_closed_form_vectors(ray_session):
    rows = {"doc_id": [1, 2, 3, 4, 5],
            "text": ["aaaa",          # 1 symbol → H = 0
                     "abab",          # 2 equiprobable → H = 1
                     "abcd",          # 4 equiprobable → H = 2
                     "",              # empty → 0 by convention
                     None]}           # null → 0
    out = (char_entropy(_ds(rows, ray_session)).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    assert out["entropy_bits"].tolist() == [0.0, 1.0, 2.0, 0.0, 0.0]
    assert out["distinct_chars"].tolist() == [1, 2, 4, 0, 0]
    assert out["n_chars"].tolist() == [4, 4, 4, 0, 0]


def test_non_bmp_codepoints_count_once(ray_session):
    # 𝄞 is outside the BMP: one codepoint, like DuckDB's per-char split
    out = char_entropy(
        _ds({"doc_id": [1], "text": ["𝄞𝄞aa"]}, ray_session)).to_pandas()
    assert out["n_chars"].tolist() == [4]
    assert out["distinct_chars"].tolist() == [2]
    assert out["entropy_bits"].tolist() == [1.0]


def test_matches_numpy_reference(ray_session):
    rng = np.random.default_rng(11)
    texts = ["".join(rng.choice(list("abcdef XYZ.!"), rng.integers(1, 200)))
             for _ in range(100)]
    rows = {"doc_id": list(range(100)), "text": texts}
    out = (char_entropy(_ds(rows, ray_session)).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    for t, h, d in zip(texts, out["entropy_bits"], out["distinct_chars"]):
        counts = pd.Series(list(t)).value_counts().to_numpy(dtype=float)
        n = counts.sum()
        ref = math.log2(n) - float((counts * np.log2(counts)).sum()) / n
        assert abs(h - ref) < 5e-5, (t[:30], h, ref)
        assert d == len(set(t))


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    c.execute(f"CREATE VIEW documents AS SELECT * FROM "
              f"read_parquet('{SF_DIR}/documents.parquet')")
    return c


def test_report_matches_duckdb(ray_session, con):
    from cerberus_ray.pipelines.training_queries import q_char_entropy_report

    mine = q_char_entropy_report(SF_DIR).to_pandas()
    theirs = con.execute("""
        WITH chars AS (
          SELECT doc_id, unnest(string_split(text, '')) AS ch
          FROM documents WHERE length(text) > 0),
        counts AS (
          SELECT doc_id, ch, count(*)::DOUBLE AS c
          FROM chars GROUP BY doc_id, ch),
        ent AS (
          SELECT doc_id, count(*)::BIGINT AS distinct_chars,
                 ROUND(log2(sum(c)) - sum(c * log2(c)) / sum(c), 4) AS h
          FROM counts GROUP BY doc_id)
        SELECT d.doc_id, length(d.text)::BIGINT AS n_chars,
               COALESCE(e.distinct_chars, 0) AS distinct_chars,
               COALESCE(e.h, 0.0) AS entropy_bits
        FROM documents d LEFT JOIN ent e USING (doc_id)
        ORDER BY entropy_bits, doc_id LIMIT 20""").df()
    pd.testing.assert_frame_equal(
        mine[sorted(mine.columns)].reset_index(drop=True),
        theirs[sorted(theirs.columns)].reset_index(drop=True))
