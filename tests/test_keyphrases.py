"""RAKE keyphrases: single-process reference parity, planted phrase
ranks top, stopword/number boundary semantics, layout invariance."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from cerberus_ray.pipelines.keyphrases import (
    DEFAULT_STOPWORDS, extract_keyphrases, phrase_candidates)


def _corpus(n=150, seed=12):
    rng = np.random.default_rng(seed)
    docs = []
    for i in range(n):
        parts = ["the data was processed"]
        if rng.random() < 0.6:
            parts.append("streaming execution engine runs with backpressure")
        if rng.random() < 0.3:
            parts.append("object store spills to disk")
        parts.append(f"run {i} finished")
        docs.append(". ".join(parts))
    return pd.DataFrame({"doc_id": range(n), "text": docs})


def _reference(df, top_k, max_len, min_count):
    pc, fr, dg = {}, {}, {}
    for t in df["text"]:
        for ph in phrase_candidates(t, DEFAULT_STOPWORDS, max_len):
            key = " ".join(ph)
            pc[key] = pc.get(key, 0) + 1
            for w in ph:
                fr[w] = fr.get(w, 0) + 1
                dg[w] = dg.get(w, 0) + len(ph)
    ws = {w: dg[w] / fr[w] for w in fr}
    rows = [(k, n, round(sum(ws[w] for w in k.split()), 6))
            for k, n in pc.items() if n >= min_count]
    out = pd.DataFrame(rows, columns=["phrase", "n", "score"])
    return (out.sort_values(["score", "phrase"],
                            ascending=[False, True])
            .head(top_k).reset_index(drop=True))


def test_matches_reference(ray_session):
    df = _corpus()
    got = extract_keyphrases(rd.from_pandas(df, override_num_blocks=5),
                             top_k=10, max_phrase_len=3, min_count=2)
    want = _reference(df, 10, 3, 2)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_planted_phrase_ranks_high(ray_session):
    df = _corpus(n=200)
    got = extract_keyphrases(rd.from_pandas(df), top_k=5,
                             max_phrase_len=3)
    # multiword content phrases out-score single words (RAKE property)
    assert got.iloc[0]["phrase"].count(" ") >= 1
    assert "streaming execution engine" in set(got["phrase"])


def test_candidate_semantics():
    ph = phrase_candidates(
        "The Streaming Execution engine, with 42 blocks and backpressure!",
        DEFAULT_STOPWORDS, 3)
    assert ("streaming", "execution", "engine") in ph
    assert ("blocks",) in ph            # '42' breaks the run
    assert ("backpressure",) in ph
    assert all("the" not in p and "with" not in p for p in ph)
    # truncation at max_phrase_len
    ph2 = phrase_candidates("alpha beta gamma delta", frozenset(), 2)
    assert ph2 == [("alpha", "beta")]


def test_layout_invariance_and_guards(ray_session):
    df = _corpus(n=80, seed=3)
    a = extract_keyphrases(rd.from_pandas(df, override_num_blocks=2),
                           top_k=8)
    b = extract_keyphrases(rd.from_pandas(df, override_num_blocks=9),
                           top_k=8)
    pd.testing.assert_frame_equal(a, b)
    with pytest.raises(ValueError):
        extract_keyphrases(rd.from_pandas(df), top_k=0)
