"""Discrete-emission hidden Markov model via distributed Baum-Welch.

The latent-state sequence model beside the fully-observed Markov
stages (`stages/markov.py` fits transition matrices of what you SEE;
an HMM explains sequences with a small hidden regime — the classic
user-session / channel-state model; Rabiner 1989).

Distribution of work per EM iteration (the ALS/NMF pattern):

- parameters (π, A (S×S), B (S×V)) are tiny and broadcast;
- ONE ``keyed_apply`` pass — every key's events land in one bucket,
  sorted by (key, ts); each sequence runs the SCALED forward-backward
  recursions (numpy over states; the per-sequence time loop is
  inherent to the DP) and contributes mergeable sufficient statistics
  (initial-state γ₁, transition ξ sums, emission counts, log-lik);
- the driver M-step renormalizes rows — O(S² + S·V).

Log-likelihood is recorded BEFORE each update → non-decreasing by EM
(tests' gate); single-process reference parity and planted
regime-switching recovery in tests/test_hmm.py.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List

import numpy as np
import pandas as pd
import pyarrow as pa

import ray

__all__ = ["HMMModel", "fit_hmm", "forward_backward"]


@dataclass
class HMMModel:
    symbols: List[str]
    pi: np.ndarray               # (S,)
    A: np.ndarray                # (S, S)
    B: np.ndarray                # (S, V)
    loglik: List[float] = field(default_factory=list)

    @property
    def n_states(self) -> int:
        return len(self.pi)


def forward_backward(obs: np.ndarray, pi: np.ndarray, A: np.ndarray,
                     B: np.ndarray):
    """Scaled forward-backward for one integer-coded sequence.
    → (gamma (T,S), xi_sum (S,S), loglik)."""
    T, S = len(obs), len(pi)
    alpha = np.empty((T, S))
    c = np.empty(T)
    # zero-mass guard: degenerate parameters (pi/B zeros from an
    # M-step on degenerate data) can zero a whole step's mass; dividing
    # by 0 would poison every sufficient statistic with NaN
    alpha[0] = pi * B[:, obs[0]]
    c[0] = alpha[0].sum() or 1.0
    alpha[0] /= c[0]
    for t in range(1, T):
        alpha[t] = (alpha[t - 1] @ A) * B[:, obs[t]]
        c[t] = alpha[t].sum() or 1.0
        alpha[t] /= c[t]
    beta = np.empty((T, S))
    beta[-1] = 1.0
    for t in range(T - 2, -1, -1):
        beta[t] = (A @ (B[:, obs[t + 1]] * beta[t + 1])) / c[t + 1]
    gamma = alpha * beta
    gs = gamma.sum(axis=1, keepdims=True)
    # zero-mass steps stay zero (the batched twin's where-guard)
    gamma = np.divide(gamma, gs, out=np.zeros_like(gamma),
                      where=gs > 0)
    xi = np.zeros((S, S))
    for t in range(T - 1):
        m = (alpha[t][:, None] * A * (B[:, obs[t + 1]]
                                      * beta[t + 1])[None, :] / c[t + 1])
        xi += m
    return gamma, xi, float(np.log(c).sum())


def _fb_batch(obs_pad: np.ndarray, lens: np.ndarray, pi, A, B):
    """Batched scaled forward-backward over padded sequences
    (U, T_max): the time loop runs once per STEP, vectorized across
    every sequence in the bucket — per-step cost (U, S) instead of a
    Python loop per sequence. → (Σγ₁, Σξ, emission counts, Σloglik).
    Exactly equal to per-sequence `forward_backward` sums (tested)."""
    U, Tm = obs_pad.shape
    S = len(pi)
    V = B.shape[1]
    active = np.arange(Tm)[None, :] < lens[:, None]      # (U, Tm)
    alpha = np.zeros((U, Tm, S))
    c = np.ones((U, Tm))
    Bo = B.T[obs_pad]                                    # (U, Tm, S)
    alpha[:, 0] = pi[None, :] * Bo[:, 0]
    c0 = alpha[:, 0].sum(axis=1)
    c[:, 0] = np.where(c0 > 0, c0, 1.0)   # same guard as t >= 1
    alpha[:, 0] /= c[:, 0, None]
    for t in range(1, Tm):
        act = active[:, t]
        if not act.any():
            break
        a = (alpha[:, t - 1] @ A) * Bo[:, t]
        s = a.sum(axis=1)
        s = np.where(act & (s > 0), s, 1.0)
        alpha[:, t] = a / s[:, None]
        c[:, t] = np.where(act, s, 1.0)
    beta = np.zeros((U, Tm, S))
    beta[np.arange(U), lens - 1] = 1.0
    xi = np.zeros((S, S))
    for t in range(Tm - 2, -1, -1):
        act = active[:, t + 1]
        if not act.any():
            continue
        w = Bo[:, t + 1] * beta[:, t + 1]                # (U, S)
        b = (w @ A.T) / c[:, t + 1, None]
        beta[:, t] = np.where(act[:, None], b, beta[:, t])
        # ξ contributions only from sequences active at t+1
        aw = np.where(act[:, None], alpha[:, t], 0.0)
        ww = np.where(act[:, None], w / c[:, t + 1, None], 0.0)
        xi += (aw.T @ ww) * A
    gamma = alpha * beta
    gs = gamma.sum(axis=2, keepdims=True)
    gamma = np.divide(gamma, gs, out=np.zeros_like(gamma),
                      where=gs > 0)
    g1 = gamma[:, 0].sum(axis=0)
    em = np.zeros((S, V))
    flat_obs = obs_pad[active]
    flat_g = gamma[active]
    np.add.at(em.T, flat_obs, flat_g)
    ll = float(np.log(np.where(active, c, 1.0)).sum())
    return g1, xi, em, ll


def _init_params(S: int, V: int, seed: int):
    rng = np.random.default_rng(seed)
    pi = rng.dirichlet(np.ones(S))
    A = rng.dirichlet(np.ones(S), size=S)
    B = rng.dirichlet(np.ones(V), size=S)
    return pi, A, B


def fit_hmm(ds, key_col: str, ts_col: str, obs_col: str, *,
            n_states: int = 2, n_iters: int = 10, seed: int = 42,
            n_buckets: int = 32, max_symbols: int = 10_000,
            n_restarts: int = 1) -> HMMModel:
    """``n_restarts`` > 1 reruns EM from seed, seed+1, … and returns
    the best final log-likelihood — the standard guard against EM's
    local optima (each restart costs its own passes)."""
    from ..stages.keyed_window import keyed_apply

    if n_states < 1:
        raise ValueError("n_states must be >= 1")
    if n_iters < 1:
        raise ValueError("n_iters must be >= 1")
    if n_restarts < 1:
        raise ValueError("n_restarts must be >= 1")
    symbols = sorted(
        ds.groupby(obs_col).count().to_pandas()[obs_col].tolist())
    if not symbols:
        raise ValueError("empty sequence table")
    if len(symbols) > max_symbols:
        raise ValueError(f"{len(symbols)} symbols exceed max_symbols")
    sym_idx = {s: i for i, s in enumerate(symbols)}
    V, S = len(symbols), n_states

    seqs = ds.select_columns([key_col, ts_col, obs_col]).materialize()
    best = None
    for r in range(n_restarts):
        m = _fit_once(seqs, key_col, ts_col, obs_col, symbols, sym_idx,
                      V, S, n_iters, seed + r, n_buckets, keyed_apply)
        if best is None or m.loglik[-1] > best.loglik[-1]:
            best = m
    return best


def _fit_once(seqs, key_col, ts_col, obs_col, symbols, sym_idx, V, S,
              n_iters, seed, n_buckets, keyed_apply) -> HMMModel:
    pi, A, B = _init_params(S, V, seed)
    model = HMMModel(symbols=symbols, pi=pi, A=A, B=B)
    for _ in range(n_iters):
        pref = ray.put((model.pi, model.A, model.B))

        def partial(df: pd.DataFrame, _pref=pref) -> pd.DataFrame:
            piv, Av, Bv = ray.get(_pref)
            df = df.sort_values([key_col, ts_col], kind="mergesort")
            keys = df[key_col].to_numpy()
            obs = df[obs_col].map(sym_idx).to_numpy(np.int64)
            seg = np.flatnonzero(np.r_[True, keys[1:] != keys[:-1]])
            lens = np.diff(np.append(seg, len(keys)))
            # chunk sequences by PADDED-CELL budget, lengths ascending:
            # padding to (U, max_len) costs U x Tm regardless of real
            # rows, so one long sequence among many short ones used to
            # inflate the dense arrays ~(U x longest) — worker OOM
            order = np.argsort(lens, kind="stable")
            budget = 1_000_000
            g1 = np.zeros(S)
            xi = np.zeros((S, S))
            em = np.zeros((S, V))
            ll = 0.0
            i = 0
            while i < len(order):
                j = i
                while j < len(order):
                    tm = int(lens[order[j]])
                    if (j - i + 1) * tm > budget and j > i:
                        break
                    j += 1
                idx = order[i:j]
                ls = lens[idx]
                st = seg[idx]
                rows = np.repeat(np.arange(len(idx)), ls)
                colpos = (np.arange(int(ls.sum()))
                          - np.repeat(np.cumsum(ls) - ls, ls))
                pad = np.zeros((len(idx), int(ls.max())),
                               dtype=np.int64)
                pad[rows, colpos] = obs[np.repeat(st, ls) + colpos]
                cg1, cxi, cem, cll = _fb_batch(pad, ls, piv, Av, Bv)
                g1 += cg1
                xi += cxi
                em += cem
                ll += cll
                i = j
            return pd.DataFrame({
                "g1": [g1.tobytes()], "xi": [xi.tobytes()],
                "em": [em.tobytes()], "ll": [ll],
                "nseq": [len(seg)]})

        p = keyed_apply(seqs, key_col, partial,
                        n_buckets=n_buckets).to_pandas()
        g1 = sum(np.frombuffer(x) for x in p["g1"])
        xi = sum(np.frombuffer(x).reshape(S, S) for x in p["xi"])
        em = sum(np.frombuffer(x).reshape(S, V) for x in p["em"])
        nseq = int(p["nseq"].sum())
        model.loglik.append(round(float(p["ll"].sum()) / nseq, 10))
        model.pi = g1 / g1.sum()
        model.A = xi / np.maximum(xi.sum(axis=1, keepdims=True), 1e-12)
        model.B = em / np.maximum(em.sum(axis=1, keepdims=True), 1e-12)
    return model
