"""Dedup-quality harness: planted near-duplicates are found with high
exact-Jaccard precision; a clean corpus reports ~zero random dup rate;
seeded determinism."""

import numpy as np
import pandas as pd
import ray.data as rd

from cerberus_ray.pipelines.dedup_eval import near_dup_eval


def _corpus_with_dups(n=150, n_dup=15, seed=7):
    rng = np.random.default_rng(seed)
    vocab = [f"w{i}" for i in range(300)]
    texts = [" ".join(rng.choice(vocab, 40)) for _ in range(n)]
    rows = [{"doc_id": str(i), "text": t} for i, t in enumerate(texts)]
    # planted near-dups: copy with one word changed
    for j in range(n_dup):
        base = texts[j].split()
        base[5] = "CHANGED"
        rows.append({"doc_id": f"dup{j}", "text": " ".join(base)})
    return pd.DataFrame(rows)


def test_planted_duplicates(ray_session):
    df = _corpus_with_dups()
    ds = rd.from_pandas(df, override_num_blocks=3)
    out = near_dup_eval(ds, threshold=0.5, n_random=200,
                        bands=32, k=128).iloc[0]
    assert out["n_docs"] == len(df)
    # the planted pairs are found and exact-verified: precision high
    assert out["n_candidates"] >= 10
    assert out["precision"] >= 0.8
    # random pairs of independent 40-word docs share almost nothing
    assert out["random_dup_rate"] <= 0.02


def test_clean_corpus_and_determinism(ray_session):
    rng = np.random.default_rng(13)
    vocab = [f"t{i}" for i in range(500)]
    df = pd.DataFrame({
        "doc_id": [str(i) for i in range(100)],
        "text": [" ".join(rng.choice(vocab, 30)) for _ in range(100)]})
    ds1 = rd.from_pandas(df, override_num_blocks=1)
    ds4 = rd.from_pandas(df, override_num_blocks=4)
    a = near_dup_eval(ds1, threshold=0.5, n_random=150)
    b = near_dup_eval(ds4, threshold=0.5, n_random=150)
    pd.testing.assert_frame_equal(a, b)
    assert a["random_dup_rate"].iloc[0] == 0.0
