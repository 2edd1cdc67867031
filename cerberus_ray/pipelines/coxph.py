"""Cox proportional-hazards regression (Breslow partial likelihood).

The covariate-adjusted survival model beside the Kaplan-Meier curves
(`stages/survival.py`): hazard h(t|x) = h₀(t)·exp(xᵀw), fit by Newton
iterations (Cox 1972; Breslow ties).

Key factorization: with Breslow ties the partial likelihood, gradient
and Hessian depend on the data ONLY through per-distinct-time sums —

    per time t: d_t (events), Σ_event x,  and the risk terms
    (Σ exp(xᵀw), Σ x·exp, Σ xxᵀ·exp) over rows WITH that time,

because the risk set S(t) = Σ_{times ≥ t}(per-time sums) is a suffix
cumsum over the distinct-time axis. So each Newton iteration is ONE
streamed pass emitting per-(block, time) mergeable partials —
O(#block-local distinct times × d²) bytes — and the driver does a
sort-desc + suffix-cumsum over the per-time census (bounded by
DISTINCT event/censor times, the same census-bound convention as the
engine's grouped statistics; continuous timestamps should be
coarsened by the caller if distinct times approach row count).

Tests: single-process Newton parity, planted hazard-ratio recovery,
monotone partial likelihood, layout invariance.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Sequence

import numpy as np
import pandas as pd
import pyarrow as pa

__all__ = ["CoxPHModel", "fit_coxph"]


@dataclass
class CoxPHModel:
    feature_cols: List[str]
    coef: np.ndarray
    n: int
    n_events: int
    loglik: List[float] = field(default_factory=list)

    def hazard_ratios(self) -> dict:
        return {c: round(float(np.exp(b)), 6)
                for c, b in zip(self.feature_cols, self.coef)}


def fit_coxph(ds, time_col: str, event_col: str,
              feature_cols: Sequence[str], *, n_iters: int = 8,
              reg: float = 1e-8, max_times: int = 2_000_000
              ) -> CoxPHModel:
    """Newton fit; ``event_col`` ∈ {0, 1} (1 = observed event).
    Features should be roughly standardized by the caller (the usual
    Newton contract)."""
    cols = list(feature_cols)
    d = len(cols)
    if d == 0:
        raise ValueError("feature_cols must be non-empty")
    narrow = (ds.select_columns(cols + [time_col, event_col])
              .materialize())          # the loop rescans ~n_iters×

    w = np.zeros(d)
    model = CoxPHModel(feature_cols=cols, coef=w, n=0, n_events=0)
    tri = np.triu_indices(d)           # pack symmetric xxᵀ

    for _it in range(n_iters + 1):     # final pass = evaluation only
        wcur = w.copy()

        def partial(b: pa.Table, _w=wcur) -> pa.Table:
            df = b.to_pandas().dropna()
            if not len(df):
                # empty / all-NaN block: typed empty partial (reduceat
                # on a zero-row segment index would IndexError)
                return pa.Table.from_pydict({
                    "t": pa.array([], pa.float64()),
                    "d": pa.array([], pa.float64()),
                    "exw": pa.array([], pa.float64()),
                    "s0": pa.array([], pa.binary()),
                    "s1": pa.array([], pa.binary()),
                    "s2": pa.array([], pa.binary()),
                    "ex": pa.array([], pa.binary()),
                    "n": pa.array([], pa.int64())})
            X = df[cols].to_numpy(np.float64)
            t = df[time_col].to_numpy(np.float64)
            ev = df[event_col].to_numpy(np.float64)
            r = np.exp(np.clip(X @ _w, -30.0, 30.0))
            order = np.argsort(t, kind="mergesort")
            X, t, ev, r = X[order], t[order], ev[order], r[order]
            seg = np.flatnonzero(np.r_[True, t[1:] != t[:-1]])
            nt = len(seg)
            red = lambda v: np.add.reduceat(v, seg, axis=0)
            s0 = red(r)
            s1 = red(X * r[:, None])
            xxr = (X[:, :, None] * X[:, None, :])[:, tri[0], tri[1]]
            s2 = red(xxr * r[:, None])
            dts = red(ev)
            ex = red(X * ev[:, None])
            exw = red((X @ _w) * ev)
            return pa.Table.from_pydict({
                "t": pa.array(t[seg], pa.float64()),
                "d": pa.array(dts), "exw": pa.array(exw),
                "s0": pa.array([x.tobytes() for x in
                                s0[:, None]]),
                "s1": pa.array([x.tobytes() for x in s1]),
                "s2": pa.array([x.tobytes() for x in s2]),
                "ex": pa.array([x.tobytes() for x in ex]),
                "n": pa.array(np.diff(np.append(seg, len(t))),
                              pa.int64())})

        parts = narrow.map_batches(partial, batch_format="pyarrow",
                                   zero_copy_batch=True).to_pandas()
        if len(parts) > max_times:
            raise ValueError("distinct-time census exceeds max_times; "
                             "coarsen the time column")
        if not len(parts):
            raise ValueError(
                "no complete (time, event, features) rows to fit on")
        # merge block-local per-time rows → global per-time census
        def unpack(col, width):
            return np.stack([np.frombuffer(x) for x in parts[col]]
                            ).reshape(len(parts), width)

        census = pd.DataFrame({
            "t": parts["t"], "d": parts["d"], "exw": parts["exw"],
            "n": parts["n"]})
        s0 = unpack("s0", 1)
        s1 = unpack("s1", d)
        s2 = unpack("s2", len(tri[0]))
        ex = unpack("ex", d)
        g = census.groupby("t", sort=True)
        gi = g.indices
        times = np.array(sorted(gi))
        agg = lambda M: np.stack([M[gi[t]].sum(axis=0) for t in times])
        S0 = agg(s0)[:, 0]
        S1 = agg(s1)
        S2p = agg(s2)
        EX = agg(ex)
        D = np.array([census["d"].to_numpy()[gi[t]].sum()
                      for t in times])
        EXW = np.array([census["exw"].to_numpy()[gi[t]].sum()
                        for t in times])
        n = int(census["n"].sum())
        n_events = int(D.sum())
        if n_events == 0:
            raise ValueError("no events (event_col all zero)")
        # suffix cumsums over DESC time = risk-set sums at each time
        o = np.argsort(-times)
        R0 = np.cumsum(S0[o])
        R1 = np.cumsum(S1[o], axis=0)
        R2 = np.cumsum(S2p[o], axis=0)
        Dd = D[o]
        EXo = EX[o]
        EXWo = EXW[o]
        m = Dd > 0
        ll = float((EXWo[m] - Dd[m] * np.log(R0[m])).sum())
        model.loglik.append(round(ll / n_events, 10))
        model.n, model.n_events = n, n_events
        if _it == n_iters:
            break
        Z = R1 / R0[:, None]
        grad = (EXo[m] - Dd[m][:, None] * Z[m]).sum(axis=0) - reg * w
        S2f = np.zeros((m.sum(), d, d))
        S2f[:, tri[0], tri[1]] = R2[m]
        S2f[:, tri[1], tri[0]] = R2[m]
        H = ((S2f / R0[m][:, None, None]
              - Z[m][:, :, None] * Z[m][:, None, :])
             * Dd[m][:, None, None]).sum(axis=0) + reg * np.eye(d)
        w = w + np.linalg.solve(H, grad)
    model.coef = w
    return model
