"""PPMI-SVD word vectors: census parity vs pure-python counting,
planted-synonym recovery, layout invariance, guards."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from cerberus_ray.pipelines.word_embed import (fit_word_vectors,
                                               similar_words,
                                               window_pair_counts)


def _corpus(n=400, seed=16):
    """'cat' and 'dog' share contexts (planted synonyms); 'stock' and
    'bond' share different contexts."""
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        pet = rng.choice(["cat", "dog"])
        fin = rng.choice(["stock", "bond"])
        rows.append((i, f"the {pet} chased its tail all day . "
                        f"the {fin} price moved in trading today"))
    return pd.DataFrame(rows, columns=["doc_id", "text"])


def _ref_census(df, vocab, window):
    idx = {w: i for i, w in enumerate(vocab)}
    acc = {}
    for t in df["text"]:
        toks = [idx[w] for w in t.lower().split() if w in idx]
        # NOTE: the engine restricts to vocab BEFORE pairing? No — it
        # maps non-vocab to NaN and pairs over the raw token stream,
        # so offsets are in TOKEN positions, not vocab positions.
        toks_all = [idx.get(w) for w in t.lower().split()]
        for off in range(1, window + 1):
            for a, b in zip(toks_all[:-off], toks_all[off:]):
                if a is None or b is None:
                    continue
                acc[(a, b)] = acc.get((a, b), 0) + 1
                acc[(b, a)] = acc.get((b, a), 0) + 1
    return acc


def test_census_matches_python_reference(ray_session):
    df = _corpus(n=60)
    vocab = sorted(set(" ".join(df["text"]).lower().split()))[:10]
    got = window_pair_counts(rd.from_pandas(df, override_num_blocks=3),
                             vocab, window=2)
    want = _ref_census(df, vocab, 2)
    gd = {(int(a), int(b)): int(n)
          for a, b, n in got.itertuples(index=False)}
    assert gd == want


def test_synonyms_cluster(ray_session):
    df = _corpus()
    m = fit_word_vectors(rd.from_pandas(df, override_num_blocks=4),
                         vocab_size=30, window=2, dim=16)
    near_cat = similar_words(m, "cat", top_n=3)
    assert "dog" in set(near_cat["word"].head(2)), near_cat
    near_stock = similar_words(m, "stock", top_n=3)
    assert "bond" in set(near_stock["word"].head(2)), near_stock
    # cross-domain similarity lower than in-domain
    cd = float(m["cat"] @ m["dog"])
    cs = float(m["cat"] @ m["stock"])
    assert cd > cs


def test_layout_invariance_and_guards(ray_session):
    df = _corpus(n=150, seed=2)
    a = fit_word_vectors(rd.from_pandas(df, override_num_blocks=2),
                         vocab_size=20, window=2, dim=8)
    b = fit_word_vectors(rd.from_pandas(df, override_num_blocks=9),
                         vocab_size=20, window=2, dim=8)
    assert a.words == b.words
    np.testing.assert_allclose(a.vectors, b.vectors, atol=1e-8)
    with pytest.raises(KeyError):
        similar_words(a, "notaword")
    with pytest.raises(ValueError):
        window_pair_counts(rd.from_pandas(df), ["a", "b"], window=0)
