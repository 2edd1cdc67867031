"""BPE tokenizer training: the Sennrich worked example, determinism and
partition invariance of the distributed word-count pass, mode agreement,
encode consistency with the merge loop, and the sf0.001 extras pin."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from cerberus_ray.pipelines.bpe import (bpe_merge_loop, encode_bpe,
                                        fit_bpe, word_counts)


def sennrich_counts() -> pd.Series:
    # the worked example of Sennrich et al. 2016 (§3.2)
    return pd.Series({"low": 5, "lower": 2, "newest": 6, "widest": 3})


def test_sennrich_worked_example():
    merges = bpe_merge_loop(sennrich_counts(), 4)
    # hand-verified pair counts with the last-char-fused </w> convention
    # (the reference learn_bpe shape): es=9 → es·t</w>=9 → lo=7 →
    # ew=6 (count-6 three-way tie, lexicographic min wins)
    assert merges == [("e", "s"), ("es", "t</w>"), ("l", "o"),
                      ("e", "w")]


def test_merge_loop_tie_break_deterministic():
    # two pairs with equal count → lexicographically smallest merges first
    c = pd.Series({"ab": 3, "cd": 3})
    merges = bpe_merge_loop(c, 2)
    assert merges[0] == ("a", "b</w>")
    assert merges[1] == ("c", "d</w>")


def corpus_df() -> pd.DataFrame:
    words = ["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3
    rng = np.random.default_rng(9)
    rng.shuffle(words)
    # spread the words over documents arbitrarily
    docs, i = [], 0
    while i < len(words):
        k = int(rng.integers(1, 4))
        docs.append(" ".join(words[i:i + k]))
        i += k
    return pd.DataFrame({"doc_id": [f"d{j}" for j in range(len(docs))],
                         "text": docs})


def test_distributed_fit_matches_loop(ray_session):
    df = corpus_df()
    ds = rd.from_pandas(df, override_num_blocks=3).materialize()
    m1 = fit_bpe(ds, num_merges=4)
    assert m1 == bpe_merge_loop(sennrich_counts(), 4)
    # partition invariance + shuffle-mode agreement
    ds2 = rd.from_pandas(df, override_num_blocks=7).materialize()
    assert fit_bpe(ds2, num_merges=4) == m1
    assert fit_bpe(ds, num_merges=4, mode="shuffle") == m1
    with pytest.raises(ValueError):
        word_counts(ds, mode="bogus")


def test_encode_counts(ray_session):
    ds = rd.from_pandas(pd.DataFrame({
        "doc_id": ["a", "b", "c"],
        "text": ["newest lowest", "low low low", ""]}))
    merges = bpe_merge_loop(sennrich_counts(), 4)
    out = encode_bpe(ds, merges).to_pandas().set_index("doc_id")
    # newest → [n, ew, est</w>] = 3; lowest → [lo, w, est</w>] = 3
    assert out.loc["a", "n_bpe_tokens"] == 6
    # low → [lo, w</w>] = 2 each
    assert out.loc["b", "n_bpe_tokens"] == 6
    assert out.loc["c", "n_bpe_tokens"] == 0


def test_word_count_cap_deterministic(ray_session):
    df = pd.DataFrame({"doc_id": ["x"], "text": ["b b a a c"]})
    ds = rd.from_pandas(df)
    top2 = word_counts(ds, max_words=2)
    # count desc, then word asc: a(2), b(2) beat c(1); a before b
    assert list(top2.index) == ["a", "b"]


def test_sf0001_extras_pin(ray_session):
    from cerberus_ray.pipelines.training_queries import q_bpe_report
    t = q_bpe_report("/root/testdata/sf0.001").to_pydict()
    assert t == {"n_merges": [40], "total_bpe_tokens": [75400],
                 "total_words": [27939], "fertility": [2.6987]}
    # determinism of the whole fit+encode path
    t2 = q_bpe_report("/root/testdata/sf0.001").to_pydict()
    assert t == t2
