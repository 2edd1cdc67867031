"""Interpolated bigram LM: slow-reference exactness, λ=0 unigram
agreement, word-order sensitivity (what unigram cannot see), guards."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from cerberus_ray.pipelines.lm_score import (
    score_perplexity,
    score_perplexity_bigram,
)

CORPUS = ["the cat sat on the mat",
          "the dog sat on the rug",
          "a cat and a dog",
          "the cat and the dog sat",
          "on the mat sat a cat"]


def _ref_bigram_xent(docs, fit_docs, lam, vocab_size=50_000):
    """Slow reference: identical math, plain Python."""
    from collections import Counter

    uni = Counter(w for d in fit_docs for w in d.lower().split())
    vocab = dict(sorted(uni.items(),
                        key=lambda kv: (-kv[1], kv[0]))[:vocab_size])
    total = sum(vocab.values()) + len(vocab) + 1
    p_uni = {w: (c + 1) / total for w, c in vocab.items()}
    oov_p = 1.0 / total

    def m(w):
        return w if w in vocab else "\x1dOOV"

    bi = Counter()
    ctx = Counter()
    for d in fit_docs:
        ts = [m(w) for w in d.lower().split()]
        for h, w in zip(ts, ts[1:]):
            bi[(h, w)] += 1
            ctx[h] += 1
    out = []
    for d in docs:
        ts = d.lower().split()
        if not ts:
            out.append(0.0)
            continue
        lp = 0.0
        for i, w in enumerate(ts):
            pu = p_uni.get(w, oov_p)
            if i == 0:
                p = pu
            else:
                h, ww = m(ts[i - 1]), m(w)
                pb = (bi.get((h, ww), 0) / ctx[h]) if ctx.get(h) else 0.0
                p = lam * pb + (1 - lam) * pu
            lp += np.log2(p)
        out.append(-lp / len(ts))
    return np.array(out)


def test_slow_reference_exactness(ray_session):
    df = pd.DataFrame({"doc_id": [f"d{i}" for i in range(len(CORPUS))],
                       "text": CORPUS})
    ds = rd.from_pandas(df, override_num_blocks=2)
    got = (score_perplexity_bigram(ds, lam=0.6).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    want = _ref_bigram_xent(CORPUS, CORPUS, 0.6)
    np.testing.assert_allclose(got["xent"].to_numpy(), np.round(want, 4),
                               atol=2e-4)


def test_lambda_zero_is_unigram(ray_session):
    df = pd.DataFrame({"doc_id": [f"d{i}" for i in range(len(CORPUS))],
                       "text": CORPUS})
    ds = rd.from_pandas(df, override_num_blocks=2)
    a = (score_perplexity_bigram(ds, lam=0.0).to_pandas()
         .sort_values("doc_id").reset_index(drop=True))
    b = (score_perplexity(ds).to_pandas()
         .sort_values("doc_id").reset_index(drop=True))
    np.testing.assert_allclose(a["xent"].to_numpy(),
                               b["xent"].to_numpy(), atol=2e-4)
    with pytest.raises(ValueError, match="lam"):
        score_perplexity_bigram(ds, lam=1.0)


def test_word_order_sensitivity(ray_session):
    # same bag of words, scrambled order: unigram xent identical,
    # bigram xent strictly worse for the scramble
    rng = np.random.default_rng(61)
    fit = [" ".join(rng.choice(["the", "cat", "sat", "on", "mat"], 6))
           for _ in range(50)] + ["the cat sat on the mat"] * 50
    ordered = "the cat sat on the mat"
    scrambled = "mat the on sat cat the"
    df = pd.DataFrame({"doc_id": ["o", "s"],
                       "text": [ordered, scrambled]})
    fit_ds = rd.from_pandas(pd.DataFrame({
        "doc_id": [str(i) for i in range(len(fit))], "text": fit}))
    ds = rd.from_pandas(df)
    got = (score_perplexity_bigram(ds, lam=0.8, reference_ds=fit_ds)
           .to_pandas().set_index("doc_id"))
    uni = (score_perplexity(ds, reference_ds=fit_ds)
           .to_pandas().set_index("doc_id"))
    assert got.loc["o", "ppl"] < got.loc["s", "ppl"]
    np.testing.assert_allclose(uni.loc["o", "xent"],
                               uni.loc["s", "xent"], atol=1e-9)


def test_determinism(ray_session):
    df = pd.DataFrame({"doc_id": [f"d{i}" for i in range(len(CORPUS))],
                       "text": CORPUS})
    ds = rd.from_pandas(df, override_num_blocks=3)
    a = (score_perplexity_bigram(ds, lam=0.5).to_pandas()
         .sort_values("doc_id").reset_index(drop=True))
    b = (score_perplexity_bigram(ds, lam=0.5).to_pandas()
         .sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)
