"""Dedup operators on a synthetic corpus with KNOWN duplicates: exact
copies, near-copies (small edits), and unrelated docs."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from cerberus_ray.pipelines import dedup as DD

BASE = ("the quick brown fox jumps over the lazy dog while the rain "
        "falls gently on the quiet village roofs every single evening")


def corpus():
    rng = np.random.default_rng(42)
    words = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
             "lambda mu nu xi omicron pi rho sigma tau upsilon").split()
    rows = []
    # 20 unrelated random docs
    for i in range(20):
        text = " ".join(rng.choice(words, size=30))
        rows.append({"doc_id": f"r{i:03d}", "text": text})
    # exact duplicate pair
    rows.append({"doc_id": "x001", "text": BASE})
    rows.append({"doc_id": "x002", "text": BASE})
    # near duplicates: one word changed / appended
    rows.append({"doc_id": "n001", "text": BASE.replace("quiet", "noisy")})
    rows.append({"doc_id": "n002", "text": BASE + " indeed"})
    return pd.DataFrame(rows)


@pytest.fixture(scope="module")
def ds(ray_session):
    return rd.from_pandas(corpus())


def test_exact_dedup_keeps_one_of_pair(ds):
    kept = DD.exact_dedup_keep_first(ds).to_pandas()
    ids = set(kept["doc_id"])
    assert "x001" in ids and "x002" not in ids  # min doc_id wins
    assert len(ids) == 23  # 24 docs - 1 duplicate


def test_exact_dup_stats(ds):
    t = DD.exact_dup_stats(ds).to_pandas()
    assert t["n_docs"][0] == 24 and t["n_unique"][0] == 23


def test_minhash_finds_near_dups(ds):
    pairs = DD.minhash_near_dup_pairs(ds, threshold=0.5).to_pandas()
    got = set(map(tuple, pairs[["doc_id_a", "doc_id_b"]].values))
    # the exact pair estimates jaccard 1.0; near pairs high
    assert ("x001", "x002") in got
    assert any(a.startswith(("x", "n")) and b.startswith(("x", "n"))
               for a, b in got)
    # no random-doc false positives at this threshold
    assert not any(a.startswith("r") or b.startswith("r") for a, b in got)
    exact = pairs[(pairs.doc_id_a == "x001") & (pairs.doc_id_b == "x002")]
    assert exact["jaccard_est"].iloc[0] == 1.0


def test_minhash_signature_estimates_jaccard():
    texts = np.array([BASE, BASE.replace("quiet", "noisy"),
                      "completely different words here entirely"], dtype=object)
    sigs = DD.minhash_signatures(texts, k=256)
    est_close = (sigs[0] == sigs[1]).mean()
    true_j = DD.ngram_jaccard(texts[0], texts[1])
    assert abs(est_close - true_j) < 0.15
    assert (sigs[0] == sigs[2]).mean() < 0.1


def test_simhash_near_dups(ds):
    pairs = DD.simhash_near_dup_pairs(ds, max_hamming=3).to_pandas()
    got = set(map(tuple, pairs[["doc_id_a", "doc_id_b"]].values))
    assert ("x001", "x002") in got
    ham = pairs[(pairs.doc_id_a == "x001") & (pairs.doc_id_b == "x002")]
    assert ham["hamming"].iloc[0] == 0


def test_simhash64_deterministic_and_locality():
    a = DD.simhash64(np.array([BASE], dtype=object))[0]
    b = DD.simhash64(np.array([BASE.replace("quiet", "noisy")], dtype=object))[0]
    c = DD.simhash64(np.array(["zzz yyy xxx www vvv uuu"], dtype=object))[0]
    assert DD.hamming64(np.array([a]), np.array([b]))[0] <= 8
    assert DD.hamming64(np.array([a]), np.array([c]))[0] > 16


def test_ngram_jaccard_bounds():
    assert DD.ngram_jaccard(BASE, BASE) == 1.0
    assert DD.ngram_jaccard(BASE, "totally unrelated text") == 0.0
    assert DD.ngram_jaccard("", "") == 1.0
    j = DD.ngram_jaccard(BASE, BASE.replace("quiet", "noisy"))
    assert 0.5 < j < 1.0


def test_verify_pairs_exact(ds):
    cand = pa.Table.from_pydict({
        "doc_id_a": ["x001", "x001"],
        "doc_id_b": ["x002", "r000"],
        "jaccard_est": [1.0, 0.9]})
    verified = DD.verify_pairs_exact(cand, ds, threshold=0.8).to_pandas()
    assert list(verified["doc_id_b"]) == ["x002"]  # false candidate killed
    assert verified["jaccard"].iloc[0] == 1.0
