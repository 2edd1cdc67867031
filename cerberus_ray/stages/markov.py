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

__all__ = ["transition_matrix"]


def transition_matrix(ds, key_col: str, order_cols: Sequence[str],
                      state_col: str, *, n_buckets: int = 32,
                      round_digits: int = 6) -> pd.DataFrame:
    """Empirical first-order transition matrix of ``state_col`` along
    each ``key_col`` entity's timeline (ordered by ``order_cols``,
    which must be a per-key total order — include a unique tiebreak
    column such as an event id).

    → frame (state, next_state, n, p) sorted by (state, next_state);
    ``p`` is row-normalized: P(next | state)."""
    from .keyed_window import keyed_apply

    order_cols = list(order_cols)

    def kern(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key_col] + order_cols, kind="mergesort")
        k = g[key_col].to_numpy()
        s = g[state_col].to_numpy()
        same = k[:-1] == k[1:]          # successor belongs to same key
        cur, nxt = s[:-1][same], s[1:][same]
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
