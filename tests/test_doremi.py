"""Domain KL mixture reweighting: exact numpy reference on a tiny
vocab, distribution-identical domain gets no excess weight, smoothing
bounds, partition invariance."""

import numpy as np
import pandas as pd
import ray.data as rd

from cerberus_ray.pipelines.mixing import domain_kl_weights


def _corpus():
    # domain A and B share the corpus distribution; C is skewed
    rows = []
    rows += [("A", "x x y z")] * 30
    rows += [("B", "x x y z")] * 30
    rows += [("C", "q q q q")] * 10
    return pd.DataFrame(rows, columns=["source", "text"])


def test_exact_reference_small_vocab(ray_session):
    df = _corpus()
    got = domain_kl_weights(rd.from_pandas(df, override_num_blocks=4),
                            vocab_size=10, eta=1.0, smooth=0.0)
    # independent reference: add-one smoothed per-domain dists over the
    # corpus vocab + OOV bucket, KL to the pooled mixture
    toks = sorted({t for s in df["text"] for t in s.split()})
    v = len(toks)
    doms = sorted(df["source"].unique())
    counts = np.ones((len(doms), v + 1))
    for d, s in zip(df["source"], df["text"]):
        for t in s.split():
            counts[doms.index(d), toks.index(t)] += 1
    p = counts / counts.sum(axis=1, keepdims=True)
    q = counts.sum(axis=0) / counts.sum()
    kl = (p * np.log2(p / q)).sum(axis=1)
    w = np.exp(kl) / np.exp(kl).sum()
    assert got["domain"].tolist() == doms
    np.testing.assert_allclose(got["kl_bits"].to_numpy(), kl, atol=1e-5)
    np.testing.assert_allclose(got["weight"].to_numpy(), w, atol=1e-5)
    # the skewed domain is upweighted past its token share
    tok_share = got["n_tokens"] / got["n_tokens"].sum()
    c = got["domain"].tolist().index("C")
    assert got["weight"][c] > tok_share[c]
    # identical-distribution domains get (near-)identical weight
    a, b = (got["domain"].tolist().index(x) for x in "AB")
    assert abs(got["weight"][a] - got["weight"][b]) < 1e-6
    assert got["kl_bits"][c] > got["kl_bits"][a]


def test_smoothing_and_normalization(ray_session):
    df = _corpus()
    got = domain_kl_weights(rd.from_pandas(df), vocab_size=10,
                            eta=2.0, smooth=0.5)
    assert abs(got["weight"].sum() - 1.0) < 5e-6  # 6-dp rounding
    # uniform floor: every weight ≥ smooth / k
    assert (got["weight"] >= 0.5 / 3 - 1e-9).all()


def test_partition_invariance(ray_session):
    df = _corpus()
    outs = [domain_kl_weights(rd.from_pandas(df, override_num_blocks=b),
                              vocab_size=10)
            for b in (1, 7)]
    pd.testing.assert_frame_equal(outs[0], outs[1])


def test_real_documents_by_lang(ray_session):
    ds = rd.read_parquet("/root/testdata/sf0.001/documents.parquet",
                         columns=["lang", "text"])
    got = domain_kl_weights(ds, domain_col="lang", vocab_size=5000)
    assert abs(got["weight"].sum() - 1.0) < 5e-6  # 6-dp rounding
    assert len(got) >= 3 and (got["kl_bits"] >= 0).all()
