"""Unigram-LM perplexity scoring: in-distribution docs score lower than
out-of-distribution docs; exactness vs a hand-computed reference."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from cerberus_ray.pipelines.lm_score import fit_unigram, score_perplexity


def corpus(n=400):
    rng = np.random.default_rng(17)
    vocab = [f"w{i}" for i in range(50)]
    w = 1.0 / (np.arange(50) + 1)
    w /= w.sum()
    rows = [{"doc_id": f"d{i:04d}",
             "text": " ".join(rng.choice(vocab, size=30, p=w))}
            for i in range(n)]
    # out-of-distribution doc: every token is OOV
    rows.append({"doc_id": "ood1",
                 "text": " ".join(f"zz{i}" for i in range(30))})
    rows.append({"doc_id": "empty1", "text": ""})
    return pd.DataFrame(rows)


@pytest.fixture(scope="module")
def scored(ray_session):
    df = corpus()
    out = score_perplexity(rd.from_pandas(df, override_num_blocks=4),
                           vocab_size=1000).to_pandas()
    return df, out.set_index("doc_id")


def test_ood_doc_scores_highest(scored):
    df, out = scored
    in_dist = out.drop(["ood1", "empty1"])
    assert out.loc["ood1", "ppl"] > in_dist["ppl"].max() * 2


def test_exact_vs_hand_computed(scored):
    df, out = scored
    # rebuild the unigram model by hand and check one document exactly
    ex = df["text"].str.lower().str.split().explode().dropna()
    counts = ex.value_counts()
    total = counts.sum() + len(counts) + 1
    logp = np.log2((counts + 1.0) / total)
    oov = np.log2(1.0 / total)
    doc = df.iloc[3]
    toks = doc["text"].lower().split()
    xent = -np.mean([logp.get(t, oov) for t in toks])
    assert abs(out.loc[doc["doc_id"], "xent"] - round(xent, 4)) <= 1e-4
    assert abs(out.loc[doc["doc_id"], "ppl"]
               - round(2 ** round(xent, 4), 2)) <= 0.01


def test_empty_doc_and_coverage(scored):
    df, out = scored
    assert len(out) == len(df)
    assert out.loc["empty1", "n_tokens"] == 0
    assert out.loc["empty1", "xent"] == 0.0


def test_reference_corpus_changes_model(ray_session):
    """Scoring against a comparable-size reference with a DISJOINT
    vocabulary makes every corpus token OOV — ppl must rise (a tiny
    reference would not: add-one smoothing over a small total makes its
    OOV bucket cheap, which is correct unigram math)."""
    rng = np.random.default_rng(23)
    df = corpus(100)
    ref = pd.DataFrame({
        "doc_id": [f"r{i}" for i in range(100)],
        "text": [" ".join(rng.choice([f"q{j}" for j in range(50)], size=30))
                 for i in range(100)]})
    a = score_perplexity(rd.from_pandas(df)).to_pandas()["ppl"].mean()
    b = score_perplexity(rd.from_pandas(df),
                         reference_ds=rd.from_pandas(ref)).to_pandas()["ppl"].mean()
    assert b > a  # corpus fully OOD w.r.t. the disjoint reference


def test_vocab_truncation(ray_session):
    df = corpus(100)
    toks, logp, oov = fit_unigram(rd.from_pandas(df), vocab_size=10)
    assert len(toks) == 10 and len(logp) == 10
    assert (np.sort(toks) == toks).all()


def test_fit_and_score_agree_on_unicode_whitespace(ray_session):
    """fit tokenizes with the Arrow RE2 kernel; scoring must use the
    SAME kernel — with Python .split() a non-breaking space (U+00A0)
    produced fit-time tokens that could never match at scoring time and
    scored as OOV."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from cerberus_ray.pipelines.lm_score import (
        fit_unigram,
        score_perplexity,
    )

    # "caf bar" is ONE RE2 token (NBSP is not \s to RE2)
    df = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": ["caf bar"] * 3,
    })
    ds = rd.from_pandas(df)
    toks, logp, oov = fit_unigram(ds)
    assert "caf bar" in set(toks.tolist())
    out = score_perplexity(rd.from_pandas(df)).to_pandas()
    assert list(out["n_tokens"]) == [1, 1, 1]
    # scored via the vocab entry, NOT the OOV bucket
    want = -float(logp[list(toks).index("caf bar")])
    assert np.allclose(out["xent"], round(want, 4))
    assert not np.allclose(out["xent"], round(-oov, 4))
