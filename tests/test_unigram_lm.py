"""Unigram-LM tokenizer: segmentation round-trip, NLL descent within
EM rounds, frequent words become single pieces, vocab budget, layout
invariance, encode counts, guards."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from cerberus_ray.pipelines.unigram_lm import (
    encode_unigram, fit_unigram, viterbi_segment)


def _corpus(n=300, seed=8):
    rng = np.random.default_rng(seed)
    common = ["internationalization", "tokenizer", "streaming"]
    filler = ["the", "of", "data", "ray", "run", "batch"]
    rows = []
    for i in range(n):
        words = (list(rng.choice(common, 4))
                 + list(rng.choice(filler, 6)))
        rows.append((i, " ".join(words)))
    return pd.DataFrame(rows, columns=["doc_id", "text"])


def test_roundtrip_and_vocab_budget(ray_session):
    df = _corpus()
    m = fit_unigram(rd.from_pandas(df, override_num_blocks=4),
                    vocab_size=64, n_iters=2)
    n_multi = sum(1 for p in m.logprobs if len(p) > 1)
    n_chars = sum(1 for p in m.logprobs if len(p) == 1)
    assert n_multi + min(n_chars, n_chars) <= 64 + n_chars
    assert n_multi <= 64
    for w in ["tokenizer", "streaming", "data", "zzzqx"]:
        segs = viterbi_segment(w, m.logprobs, m.max_piece_len)
        rebuilt = "".join(p for p in segs)
        if "<unk>" not in segs:
            assert rebuilt == w, (w, segs)


def test_frequent_words_become_single_pieces(ray_session):
    df = _corpus(n=400)
    m = fit_unigram(rd.from_pandas(df), vocab_size=128, n_iters=3,
                    max_piece_len=24)
    # the dominating content words should be whole pieces
    for w in ["tokenizer", "streaming", "the", "data"]:
        segs = viterbi_segment(w, m.logprobs, m.max_piece_len)
        assert segs == [w], (w, segs)


def test_nll_decreases_within_rounds(ray_session):
    df = _corpus(n=250, seed=3)
    m = fit_unigram(rd.from_pandas(df), vocab_size=96, n_iters=3)
    nll = m.nll_per_iter[:3]        # first EM block, fixed vocab
    assert all(b <= a + 1e-9 for a, b in zip(nll, nll[1:])), nll


def test_layout_invariance(ray_session):
    df = _corpus(n=200, seed=5)
    a = fit_unigram(rd.from_pandas(df, override_num_blocks=2),
                    vocab_size=48, n_iters=2)
    b = fit_unigram(rd.from_pandas(df, override_num_blocks=9),
                    vocab_size=48, n_iters=2)
    assert a.logprobs.keys() == b.logprobs.keys()
    for p in a.logprobs:
        assert abs(a.logprobs[p] - b.logprobs[p]) < 1e-9
    assert a.nll_per_iter == b.nll_per_iter


def test_encode_counts(ray_session):
    df = _corpus(n=120)
    ds = rd.from_pandas(df, override_num_blocks=3)
    m = fit_unigram(ds, vocab_size=64, n_iters=2)
    out = encode_unigram(ds, m).to_pandas()
    assert (out["n_unigram_tokens"] > 0).all()
    # per-doc count == sum of per-word Viterbi lengths
    row = out.iloc[0]
    want = sum(len(viterbi_segment(w, m.logprobs, m.max_piece_len))
               for w in row["text"].lower().split())
    assert row["n_unigram_tokens"] == want


def test_guards(ray_session):
    df = _corpus(n=10)
    with pytest.raises(ValueError):
        fit_unigram(rd.from_pandas(df), vocab_size=1)
    empty = pd.DataFrame({"doc_id": [1], "text": [""]})
    with pytest.raises(ValueError, match="empty"):
        fit_unigram(rd.from_pandas(empty))
