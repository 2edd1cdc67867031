"""Kaplan-Meier survival (product-limit estimator, standard public
formula) over a (duration, event-observed) table — e.g. user lifetime
until churn with right-censoring at the observation cutoff.

Distributed shape: the only big pass is a map-side pyarrow
hash-aggregate per block collapsing rows to one (n_events, n_total) row
per DISTINCT duration (`grouped_agg` partials, no keyed shuffle); the
driver sorts the distinct-time rows and takes a cumulative product —
O(distinct durations), bounded by the time domain (days/weeks), not the
row count. Companion to the retention cohorts in `pipelines/funnel.py`.

    S(t) = Π_{tᵢ ≤ t} (1 − dᵢ / rᵢ),   rᵢ = at-risk just before tᵢ

DuckDB parity via EXP(SUM(LN(1−d/r)) OVER ...) windows in
tests/test_survival.py.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .groupagg import grouped_agg

__all__ = ["kaplan_meier"]


def kaplan_meier(ds, duration_col: str, event_col: str, *,
                 group_col: str | None = None,
                 round_digits: int = 6) -> pd.DataFrame:
    """→ frame (group?, t, at_risk, events, censored, survival), one row
    per distinct duration, ascending. ``event_col`` is 0/1 (1 = the
    event happened at t, 0 = censored at t). ``survival`` is S(t) after
    the deaths at t; censored-only times carry the running value."""
    groups = [group_col] if group_col else []
    per_t = grouped_agg(ds, groups + [duration_col],
                        {"d": (event_col, "sum"),
                         "n": (event_col, "count")})
    if not len(per_t):
        cols = groups + ["t", "at_risk", "events", "censored",
                         "survival"]
        return pd.DataFrame({c: [] for c in cols})

    def one(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(duration_col, kind="mergesort")
        d = g["d"].to_numpy(dtype=np.float64)
        n = g["n"].to_numpy(dtype=np.float64)
        total = n.sum()
        at_risk = total - np.r_[0.0, np.cumsum(n)[:-1]]
        surv = np.cumprod(1.0 - d / at_risk)
        return pd.DataFrame({
            "t": g[duration_col].to_numpy(),
            "at_risk": at_risk.astype(np.int64),
            "events": d.astype(np.int64),
            "censored": (n - d).astype(np.int64),
            "survival": np.round(surv, round_digits)})

    if groups:
        outs = []
        for key, sub in per_t.groupby(groups[0], sort=True):
            o = one(sub)
            o.insert(0, groups[0], key)
            outs.append(o)
        return pd.concat(outs, ignore_index=True)
    return one(per_t).reset_index(drop=True)
