"""DSIR importance resampling: exact log-weight parity vs a slow numpy
reference, target-affinity of the selection, exact size, partition
invariance and seed sensitivity."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from cerberus_ray.determinism import hash_strings
from cerberus_ray.pipelines.dsir import (
    DEFAULT_BUCKETS,
    dsir_log_ratio,
    dsir_select,
    fit_hashed_ngram_dist,
    score_dsir,
)

NB = 512  # small bucket universe: collisions exercised, math unchanged


def _ref_features(text: str) -> np.ndarray:
    toks = (text or "").lower().split()
    feats = toks + [a + "\x00" + b for a, b in zip(toks, toks[1:])]
    if not feats:
        return np.empty(0, dtype=np.int64)
    return (hash_strings(np.array(feats, dtype=object))
            % np.uint64(NB)).astype(np.int64)


def _ref_dist(texts, smoothing=1.0) -> np.ndarray:
    dense = np.zeros(NB, dtype=np.float64)
    for t in texts:
        ids = _ref_features(t)
        np.add.at(dense, ids, 1.0)
    dense += smoothing
    return dense / dense.sum()


def _corpus():
    rng = np.random.default_rng(11)
    va = [f"alpha{i}" for i in range(30)]   # target-like vocabulary
    vb = [f"beta{i}" for i in range(30)]    # off-target vocabulary
    rows = []
    for i in range(120):
        v = va if i < 60 else vb
        rows.append({"doc_id": i,
                     "text": " ".join(rng.choice(v, size=25)),
                     "kind": "A" if i < 60 else "B"})
    raw = pd.DataFrame(rows)
    target = pd.DataFrame(
        {"doc_id": np.arange(40),
         "text": [" ".join(rng.choice(va, size=25)) for _ in range(40)]})
    return raw, target


@pytest.fixture(scope="module")
def corpora(ray_session):
    raw, target = _corpus()
    return (raw, target,
            rd.from_pandas(raw, override_num_blocks=5),
            rd.from_pandas(target, override_num_blocks=3))


def test_fit_matches_reference_and_sums_to_one(corpora):
    raw, _, raw_ds, _ = corpora
    probs = fit_hashed_ngram_dist(raw_ds, n_buckets=NB)
    ref = _ref_dist(raw["text"])
    np.testing.assert_allclose(probs, ref, rtol=0, atol=1e-12)
    assert abs(probs.sum() - 1.0) < 1e-9
    assert (probs > 0).all()  # smoothing leaves no zero bucket


def test_logw_matches_slow_reference(corpora):
    raw, target, raw_ds, target_ds = corpora
    p = fit_hashed_ngram_dist(target_ds, n_buckets=NB)
    q = fit_hashed_ngram_dist(raw_ds, n_buckets=NB)
    lr = dsir_log_ratio(p, q)
    out = (score_dsir(raw_ds, lr, n_buckets=NB).to_pandas()
           .set_index("doc_id"))
    for _, r in raw.sample(15, random_state=3).iterrows():
        ids = _ref_features(r["text"])
        want = lr[ids].sum() / len(ids)
        assert abs(out.loc[r["doc_id"], "dsir_logw"] - want) < 1e-9


def test_selection_prefers_target_like_docs(corpora):
    raw, _, raw_ds, target_ds = corpora
    sel = dsir_select(raw_ds, target_ds, 30, n_buckets=NB, seed=7,
                      temperature=0.05).to_pandas()
    assert len(sel) == 30
    # at near-zero temperature this is top-k by weight: all target-like
    assert (sel["kind"] == "A").mean() >= 0.95


def test_partition_invariance_and_determinism(corpora):
    raw, target, _, _ = corpora
    picks = []
    for blocks in (2, 9):
        raw_ds = rd.from_pandas(raw, override_num_blocks=blocks)
        t_ds = rd.from_pandas(target, override_num_blocks=blocks)
        sel = dsir_select(raw_ds, t_ds, 25, n_buckets=NB, seed=5)
        picks.append(tuple(sorted(sel.to_pandas()["doc_id"])))
    assert picks[0] == picks[1]
    assert len(set(picks[0])) == 25


def test_seed_sensitivity(corpora):
    raw, target, raw_ds, target_ds = corpora
    a = sorted(dsir_select(raw_ds, target_ds, 25, n_buckets=NB,
                           seed=1).to_pandas()["doc_id"])
    b = sorted(dsir_select(raw_ds, target_ds, 25, n_buckets=NB,
                           seed=2).to_pandas()["doc_id"])
    assert a != b  # resampling, not a fixed top-k


def test_default_bucket_universe_constant():
    assert DEFAULT_BUCKETS == 10_000  # documented fixed dimensionality
