"""CCNet-style per-language perplexity bucketing: tercile sizes, strict
bucket separation on the score, per-group threshold rank accuracy, and
driver-surface report determinism."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from cerberus_ray.pipelines.lm_score import (bucket_by_perplexity,
                                             grouped_quantile_thresholds)


def corpus(n_per_lang=300):
    """Two 'languages' with disjoint vocabularies and different tail
    behavior so their perplexity scales differ."""
    rng = np.random.default_rng(31)
    rows = []
    for lang, vocab_n, doc_len in (("en", 60, 40), ("de", 25, 25)):
        vocab = [f"{lang}_{i}" for i in range(vocab_n)]
        w = 1.0 / (np.arange(vocab_n) + 1)
        w /= w.sum()
        for i in range(n_per_lang):
            rows.append({"doc_id": f"{lang}{i:04d}", "lang": lang,
                         "text": " ".join(rng.choice(vocab, size=doc_len,
                                                     p=w))})
    return pd.DataFrame(rows)


@pytest.fixture(scope="module")
def labeled(ray_session):
    df = corpus()
    out = bucket_by_perplexity(
        rd.from_pandas(df, override_num_blocks=4),
        vocab_size=1000).to_pandas()
    return df, out


def test_every_doc_assigned(labeled):
    df, out = labeled
    assert len(out) == len(df)
    assert set(out["bucket"]) <= {"head", "middle", "tail"}
    assert out["bucket"].notna().all()


def test_tercile_sizes_per_language(labeled):
    df, out = labeled
    for lang, g in out.groupby("lang"):
        n = len(g)
        sizes = g["bucket"].value_counts()
        for b in ("head", "middle", "tail"):
            # t-digest cut points are rank-approximate; ±8% of the group
            assert abs(sizes.get(b, 0) - n / 3) <= 0.08 * n, (lang, sizes)


def test_strict_bucket_separation_on_ppl(labeled):
    """Assignment is exact w.r.t. the cut points: within each language,
    every head ppl <= every middle ppl <= every tail ppl (ties stay in
    the lower bucket, so the ordering is non-strict only at ties)."""
    df, out = labeled
    for lang, g in out.groupby("lang"):
        head = g.loc[g["bucket"] == "head", "ppl"]
        mid = g.loc[g["bucket"] == "middle", "ppl"]
        tail = g.loc[g["bucket"] == "tail", "ppl"]
        assert head.max() <= mid.min()
        assert mid.max() <= tail.min()


def test_languages_split_on_own_scales(labeled):
    """The whole point of the per-language split: a language whose ppl
    distribution sits entirely above another's still gets its own
    head/middle/tail (a global split would dump it all in 'tail')."""
    df, out = labeled
    for lang in ("en", "de"):
        g = out[out["lang"] == lang]
        assert set(g["bucket"]) == {"head", "middle", "tail"}


def test_grouped_thresholds_rank_accuracy(ray_session):
    rng = np.random.default_rng(7)
    df = pd.DataFrame({
        "g": np.repeat(["a", "b"], 2000),
        "x": np.concatenate([rng.normal(0, 1, 2000),
                             rng.lognormal(1, 0.5, 2000)])})
    thr = grouped_quantile_thresholds(
        rd.from_pandas(df, override_num_blocks=6), score_col="x",
        group_col="g", cuts=(1 / 3, 2 / 3))
    for g, vals in df.groupby("g")["x"]:
        v = np.sort(vals.to_numpy())
        for q, t in zip((1 / 3, 2 / 3), thr[g]):
            rank = np.searchsorted(v, t) / len(v)
            assert abs(rank - q) <= 0.02, (g, q, rank)


def test_determinism(ray_session):
    df = corpus(80)
    a = bucket_by_perplexity(rd.from_pandas(df, override_num_blocks=3),
                             vocab_size=500).to_pandas()
    b = bucket_by_perplexity(rd.from_pandas(df, override_num_blocks=3),
                             vocab_size=500).to_pandas()
    pd.testing.assert_frame_equal(
        a.sort_values("doc_id").reset_index(drop=True),
        b.sort_values("doc_id").reset_index(drop=True))


def test_report_sf0001(ray_session):
    from cerberus_ray.pipelines.training_queries import q_ppl_bucket_report

    t = q_ppl_bucket_report("/root/testdata/sf0.001").to_pandas()
    assert list(t.columns) == ["lang", "bucket", "n_docs", "mean_ppl"]
    assert set(t["bucket"]) <= {"head", "middle", "tail"}
    # per-language bucket means are monotone head <= middle <= tail
    for lang, g in t.groupby("lang"):
        m = g.set_index("bucket")["mean_ppl"]
        if {"head", "middle", "tail"} <= set(m.index):
            assert m["head"] <= m["middle"] <= m["tail"]
    # deterministic across reruns (pinned block layout)
    t2 = q_ppl_bucket_report("/root/testdata/sf0.001").to_pandas()
    pd.testing.assert_frame_equal(t, t2)
