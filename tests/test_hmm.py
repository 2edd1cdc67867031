"""HMM Baum-Welch: single-process reference parity, monotone
log-likelihood, planted regime recovery, layout invariance, guards."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from cerberus_ray.pipelines.hmm import (_init_params, fit_hmm,
                                        forward_backward)


def _log(n_seq=60, T=40, seed=21):
    """Two planted regimes: state 0 emits mostly 'a'/'b', state 1
    mostly 'x'/'y'; sticky transitions."""
    rng = np.random.default_rng(seed)
    A = np.array([[0.9, 0.1], [0.15, 0.85]])
    B = np.array([[0.45, 0.45, 0.05, 0.05],
                  [0.05, 0.05, 0.45, 0.45]])
    syms = np.array(["a", "b", "x", "y"])
    rows = []
    for k in range(n_seq):
        s = rng.integers(2)
        for t in range(T):
            o = rng.choice(4, p=B[s])
            rows.append((f"s{k:03d}", t, syms[o]))
            s = rng.choice(2, p=A[s])
    return pd.DataFrame(rows, columns=["seq_id", "ts", "ev"])


def _reference(df, S, n_iters, seed):
    symbols = sorted(df["ev"].unique())
    sym = {s: i for i, s in enumerate(symbols)}
    pi, A, B = _init_params(S, len(symbols), seed)
    seqs = [g.sort_values("ts")["ev"].map(sym).to_numpy(np.int64)
            for _, g in df.groupby("seq_id")]
    lls = []
    for _ in range(n_iters):
        g1 = np.zeros(S)
        xi = np.zeros((S, S))
        em = np.zeros((S, len(symbols)))
        ll = 0.0
        for o in seqs:
            gamma, x, l = forward_backward(o, pi, A, B)
            g1 += gamma[0]
            xi += x
            np.add.at(em.T, o, gamma)
            ll += l
        lls.append(round(ll / len(seqs), 10))
        pi = g1 / g1.sum()
        A = xi / xi.sum(axis=1, keepdims=True)
        B = em / em.sum(axis=1, keepdims=True)
    return pi, A, B, lls


def test_matches_reference(ray_session):
    df = _log(n_seq=30, T=25)
    m = fit_hmm(rd.from_pandas(df, override_num_blocks=4), "seq_id",
                "ts", "ev", n_states=2, n_iters=4, seed=9,
                n_buckets=8)
    pi, A, B, lls = _reference(df, 2, 4, 9)
    np.testing.assert_allclose(m.pi, pi, atol=1e-9)
    np.testing.assert_allclose(m.A, A, atol=1e-9)
    np.testing.assert_allclose(m.B, B, atol=1e-9)
    np.testing.assert_allclose(m.loglik, lls, atol=1e-8)


def test_monotone_loglik_and_regime_recovery(ray_session):
    df = _log()
    # seed 3 alone converges to a known local optimum; the restart
    # guard (seed 3, then 4) must escape it by best final loglik
    m = fit_hmm(rd.from_pandas(df, override_num_blocks=5), "seq_id",
                "ts", "ev", n_states=2, n_iters=25, seed=3,
                n_restarts=2)
    ll = m.loglik
    assert all(b >= a - 1e-9 for a, b in zip(ll, ll[1:])), ll[-5:]
    # emissions: one state concentrates on {a,b}, the other on {x,y}
    ab = m.B[:, :2].sum(axis=1)          # symbols sorted: a,b,x,y
    assert (ab.max() > 0.8) and (ab.min() < 0.2), m.B
    # sticky diagonal recovered
    assert m.A[0, 0] > 0.6 and m.A[1, 1] > 0.6, m.A


def test_batch_fb_equals_per_sequence():
    from cerberus_ray.pipelines.hmm import _fb_batch

    rng = np.random.default_rng(2)
    pi, A, B = _init_params(3, 4, 11)
    lens = np.array([7, 12, 1, 9])
    seqs = [rng.integers(0, 4, l) for l in lens]
    pad = np.zeros((4, 12), dtype=np.int64)
    for i, o in enumerate(seqs):
        pad[i, :len(o)] = o
    g1, xi, em, ll = _fb_batch(pad, lens, pi, A, B)
    g1r = np.zeros(3); xir = np.zeros((3, 3))
    emr = np.zeros((3, 4)); llr = 0.0
    for o in seqs:
        gamma, x, l = forward_backward(o, pi, A, B)
        g1r += gamma[0]; xir += x; llr += l
        np.add.at(emr.T, o, gamma)
    np.testing.assert_allclose(g1, g1r, atol=1e-12)
    np.testing.assert_allclose(xi, xir, atol=1e-12)
    np.testing.assert_allclose(em, emr, atol=1e-12)
    assert abs(ll - llr) < 1e-10


def test_layout_invariance(ray_session):
    df = _log(n_seq=20, T=15, seed=5)
    a = fit_hmm(rd.from_pandas(df, override_num_blocks=2), "seq_id",
                "ts", "ev", n_states=2, n_iters=3, n_buckets=4)
    b = fit_hmm(rd.from_pandas(df, override_num_blocks=9), "seq_id",
                "ts", "ev", n_states=2, n_iters=3, n_buckets=16)
    np.testing.assert_allclose(a.A, b.A, atol=1e-9)
    np.testing.assert_allclose(a.loglik, b.loglik, atol=1e-9)


def test_guards(ray_session):
    df = _log(n_seq=3, T=5)
    with pytest.raises(ValueError):
        fit_hmm(rd.from_pandas(df), "seq_id", "ts", "ev", n_states=0)
    with pytest.raises(Exception, match="max_symbols"):
        fit_hmm(rd.from_pandas(df), "seq_id", "ts", "ev",
                max_symbols=1)
