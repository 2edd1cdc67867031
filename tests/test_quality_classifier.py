"""Naive Bayes quality classifier: exact-math parity with a slow
reference, partition invariance of the fit, driver/shuffle mode
agreement, vocab-cap OOV accounting, and end-to-end classification."""

import math
from collections import Counter

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from cerberus_ray.pipelines.quality_classifier import (fit_nb, score_nb)

GOOD = ["the quick brown fox jumps over the lazy dog",
        "a well written sentence with varied words",
        "informative prose explains the topic clearly",
        "the author presents a coherent argument here"]
JUNK = ["buy buy buy click click now now now",
        "zzz zzz zzz spam spam spam spam",
        "click here buy now spam offer offer",
        "offer offer offer zzz click spam"]


def train_df() -> pd.DataFrame:
    rows = [{"doc_id": f"g{i}", "text": t, "label": "good"}
            for i, t in enumerate(GOOD)]
    rows += [{"doc_id": f"j{i}", "text": t, "label": "junk"}
             for i, t in enumerate(JUNK)]
    return pd.DataFrame(rows)


def ref_model(df, alpha=1.0, vocab_size=10_000):
    counts = {}
    for _, r in df.iterrows():
        c = counts.setdefault(r["label"], Counter())
        c.update(r["text"].lower().split())
    tot = Counter()
    for c in counts.values():
        tot.update(c)
    vocab = sorted(sorted(tot), key=lambda t: (-tot[t], t))[:vocab_size]
    vocab = sorted(vocab)
    classes = sorted(counts)
    out = {}
    for cls in classes:
        n = sum(counts[cls].values())
        denom = n + alpha * (len(vocab) + 1)
        out[cls] = {
            "lp": {t: math.log((counts[cls].get(t, 0) + alpha) / denom)
                   for t in vocab},
            "oov": math.log(
                (n - sum(counts[cls].get(t, 0) for t in vocab) + alpha)
                / denom),
            "prior": math.log(
                (df["label"] == cls).sum() / len(df)),
        }
    return vocab, out


def ref_score(text, vocab_set, refm, cls):
    m = refm[cls]
    s = m["prior"]
    for t in text.lower().split():
        s += m["lp"][t] if t in vocab_set else m["oov"]
    return s


@pytest.fixture(scope="module")
def tds(ray_session):
    return rd.from_pandas(train_df(), override_num_blocks=3).materialize()


def test_fit_matches_reference(tds):
    m = fit_nb(tds, vocab_size=10_000)
    vocab, refm = ref_model(train_df())
    assert list(m.vocab) == vocab
    assert m.classes == ["good", "junk"]
    for ci, cls in enumerate(m.classes):
        for vi, t in enumerate(vocab):
            assert m.log_prob[ci, vi] == pytest.approx(refm[cls]["lp"][t])
        assert m.log_oov[ci] == pytest.approx(refm[cls]["oov"])
        assert m.log_prior[ci] == pytest.approx(refm[cls]["prior"])


def test_partition_invariance_and_mode_agreement(tds, ray_session):
    a = fit_nb(tds, vocab_size=10_000)
    b = fit_nb(rd.from_pandas(train_df(), override_num_blocks=8)
               .materialize(), vocab_size=10_000)
    np.testing.assert_array_equal(a.vocab, b.vocab)
    np.testing.assert_array_equal(a.log_prob, b.log_prob)
    np.testing.assert_array_equal(a.log_oov, b.log_oov)
    c = fit_nb(tds, vocab_size=10_000, mode="shuffle")
    np.testing.assert_array_equal(a.vocab, c.vocab)
    np.testing.assert_array_equal(a.log_prob, c.log_prob)
    np.testing.assert_array_equal(a.log_prior, c.log_prior)
    with pytest.raises(ValueError):
        fit_nb(tds, mode="bogus")


def test_vocab_cap_oov_accounting(tds):
    m = fit_nb(tds, vocab_size=5)
    assert len(m.vocab) == 5
    # distributions stay normalized: sum over vocab + oov ≈ 1 per class
    for ci in range(len(m.classes)):
        total = np.exp(m.log_prob[ci]).sum() + np.exp(m.log_oov[ci])
        # (V+1) smoothing cells exactly cover the simplex minus the
        # remaining alpha mass of unobserved vocab tokens — bounded by 1
        assert 0.9 < total <= 1.0 + 1e-9


def test_scores_match_reference_and_classify(tds, ray_session):
    m = fit_nb(tds, vocab_size=10_000)
    vocab, refm = ref_model(train_df())
    vs = set(vocab)
    held = pd.DataFrame({
        "doc_id": ["h1", "h2", "h3"],
        "text": ["the fox explains the argument",
                 "click buy spam offer zzz",
                 "unseen tokens only xyzzy quux"]})
    out = (score_nb(rd.from_pandas(held), m).to_pandas()
           .set_index("doc_id"))
    assert out.loc["h1", "nb_pred"] == "good"
    assert out.loc["h2", "nb_pred"] == "junk"
    for _, r in held.iterrows():
        sg = ref_score(r["text"], vs, refm, "good")
        sj = ref_score(r["text"], vs, refm, "junk")
        exp_margin = abs(sg - sj)
        got = out.loc[r["doc_id"], "nb_margin"]
        assert got == pytest.approx(
            np.floor(exp_margin * 1e4 + 0.5) / 1e4, abs=1e-9)


def test_sf0001_report_pin(ray_session):
    from cerberus_ray.pipelines.training_queries import q_nb_quality_report
    t = q_nb_quality_report("/root/testdata/sf0.001").to_pydict()
    assert t == {"n_docs": [500], "n_pred_good": [238],
                 "n_pred_junk": [262], "weak_label_agreement": [0.6]}
