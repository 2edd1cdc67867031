"""First-order Markov transition mining over keyed event sequences —
the "what happens next" analytics layer over the same per-entity
ordered streams the FSM validators check (cerberus/models/booking.py's
status chains are the reference's hand-declared edge tables; this stage
LEARNS the empirical edge weights from data).

Scale plan: one `keyed_apply` hash exchange co-locates each key's rows;
the per-bucket kernel sorts by (key, *order_cols) once and pairs each
row with its successor via a shifted-array boundary mask — fully
vectorized, no per-key Python. Buckets emit LOCAL (state, next_state)
count partials, so the driver merge is bounded by |states|² per bucket,
never by rows. Exact: a key's rows never straddle buckets.

DuckDB parity (LEAD OVER (PARTITION BY key ORDER BY ...)) in
tests/test_markov.py.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd

__all__ = ["transition_matrix", "stationary_distribution",
           "entropy_rate"]


def transition_matrix(ds, key_col: str, order_cols: Sequence[str],
                      state_col: str, *, order: int = 1, sep: str = ">",
                      n_buckets: int = 32,
                      round_digits: int = 6) -> pd.DataFrame:
    """Empirical order-``order`` transition matrix of ``state_col``
    along each ``key_col`` entity's timeline (ordered by
    ``order_cols``, which must be a per-key total order — include a
    unique tiebreak column such as an event id). For ``order > 1`` the
    'state' is the ``sep``-joined history of the last ``order``
    observations (state values must not contain ``sep``).

    → frame (state, next_state, n, p) sorted by (state, next_state);
    ``p`` is row-normalized: P(next | state)."""
    from .keyed_window import keyed_apply

    order_cols = list(order_cols)
    if order < 1:
        raise ValueError("order must be >= 1")

    def kern(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key_col] + order_cols, kind="mergesort")
        k = g[key_col].to_numpy()
        s = g[state_col].to_numpy()
        n = len(g)
        if n <= order:
            return pd.DataFrame({"state": pd.Series([], dtype=object),
                                 "next_state": pd.Series([], dtype=object),
                                 "n": pd.Series([], dtype="int64")})
        # window of order+1 consecutive rows, all within one key
        same = np.ones(n - order, dtype=bool)
        for j in range(order):
            same &= k[j:n - order + j] == k[j + 1:n - order + j + 1]
        if order == 1:
            hist = s[:n - 1]            # raw state values, any dtype
        else:
            hist = s[:n - order].astype(str)
            for j in range(1, order):
                hist = np.char.add(np.char.add(hist, sep),
                                   s[j:n - order + j].astype(str))
        cur, nxt = hist[same], s[order:][same]
        if not len(cur):
            return pd.DataFrame({"state": pd.Series([], dtype=object),
                                 "next_state": pd.Series([], dtype=object),
                                 "n": pd.Series([], dtype="int64")})
        loc = (pd.DataFrame({"state": cur, "next_state": nxt})
               .groupby(["state", "next_state"], dropna=False)
               .size().rename("n").reset_index())
        return loc

    parts = keyed_apply(ds, key_col, kern, n_buckets=n_buckets).to_pandas()
    if not len(parts):
        return pd.DataFrame(columns=["state", "next_state", "n", "p"])
    agg = (parts.groupby(["state", "next_state"], dropna=False)["n"]
           .sum().reset_index())
    tot = agg.groupby("state")["n"].transform("sum")
    agg["p"] = (agg["n"] / tot).round(round_digits)
    agg["n"] = agg["n"].astype("int64")
    return (agg.sort_values(["state", "next_state"])
            .reset_index(drop=True))


def stationary_distribution(tm: pd.DataFrame, *, tol: float = 1e-12,
                            max_iter: int = 10_000,
                            round_digits: int = 6) -> pd.DataFrame:
    """Stationary distribution π (πP = π) of a ``transition_matrix``
    output by power iteration — a driver-side closed-form step: the
    matrix is |states|², never data-sized. States that appear only as
    absorbing next_states (no outgoing row) are treated as absorbing
    (self-loop), the standard dangling-node fix. Raises if the chain
    hasn't converged in ``max_iter`` — never returns a silently
    unconverged vector.

    → frame (state, pi) sorted by state."""
    states = sorted(set(tm["state"]) | set(tm["next_state"]))
    idx = {s: i for i, s in enumerate(states)}
    m = len(states)
    P = np.zeros((m, m))
    for s, ns, p in zip(tm["state"], tm["next_state"], tm["p"]):
        P[idx[s], idx[ns]] = p
    row = P.sum(axis=1)
    for i in np.flatnonzero(row == 0):
        P[i, i] = 1.0                   # absorbing
    P /= P.sum(axis=1, keepdims=True)   # renormalize rounded p's
    pi = np.full(m, 1.0 / m)
    for _ in range(max_iter):
        nxt = pi @ P
        if np.abs(nxt - pi).max() < tol:
            pi = nxt
            break
        pi = nxt
    else:
        raise RuntimeError(
            f"power iteration did not converge in {max_iter} steps")
    return pd.DataFrame({"state": states,
                         "pi": np.round(pi / pi.sum(), round_digits)})


def entropy_rate(tm: pd.DataFrame, *, round_digits: int = 9) -> dict:
    """Entropy rate of the empirical chain (nats/step): H = −Σ_i π_i
    Σ_j P_ij·ln P_ij with π from ``stationary_distribution`` — the
    sequence-predictability score (0 = deterministic next-state,
    ln |states| = uniform). Computed from the EXACT transition counts
    (``n``), not the rounded ``p`` column; a driver closed-form over
    the |states|²-bounded matrix.

    → {"entropy_rate", "max_entropy", "predictability"} where
    predictability = 1 − H/ln|states| (1 when |states| = 1)."""
    if not len(tm):
        return {"entropy_rate": float("nan"),
                "max_entropy": float("nan"),
                "predictability": float("nan")}
    pi = stationary_distribution(tm).set_index("state")["pi"]
    h_rows = {}
    for s, sub in tm.groupby("state", sort=True):
        n = sub.sort_values("next_state")["n"] \
            .to_numpy(dtype=np.float64)
        p = n / n.sum()
        nz = p[p > 0]
        h_rows[s] = float(-(nz * np.log(nz)).sum())
    h = float(sum(pi.get(s, 0.0) * hs for s, hs in
                  sorted(h_rows.items())))
    m = len(set(tm["state"]) | set(tm["next_state"]))
    hmax = float(np.log(m)) if m > 1 else 0.0
    pred = 1.0 - h / hmax if hmax > 0 else 1.0
    return {"entropy_rate": round(h, round_digits),
            "max_entropy": round(hmax, round_digits),
            "predictability": round(pred, round_digits)}
