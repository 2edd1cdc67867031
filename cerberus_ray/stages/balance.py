"""Clamped running balance per key: B_t = max(floor, B_{t−1} + x_t) —
inventory / wallet / rate-limiter semantics, the non-associative scan
that plain window SUMs can't express. Public identity (Skorokhod
reflection): with S_t the plain cumulative sum and B_0 = 0,

    B_t = S_t − min(0, min_{j≤t}(S_j − floor))

so the clamped scan is TWO associative scans (cumsum + cummin) — fully
vectorized per key with groupby transforms, and expressible in SQL as
``S - LEAST(0, MIN(S - floor) OVER (... ROWS UNBOUNDED PRECEDING))``
(the DuckDB oracle in tests/test_balance.py).

Deltas are 2-dp measures → exact integer cents, so the scan is
order-deterministic and bit-exact against the oracle. One
`keyed_apply` exchange; output is one row per input row.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .keyed_window import keyed_apply

__all__ = ["clamped_running_balance"]


def clamped_running_balance(ds, key_col: str, order_cols,
                            delta_col: str, *, floor: float = 0.0,
                            scale: int = 100, n_buckets: int = 32):
    """→ Dataset (key_col, *order_cols, delta, balance, clamped):
    ``balance`` after applying the row's delta (starting balance 0,
    never below ``floor``); ``clamped`` marks rows where the floor
    actually bound. 0 must be ≥ floor (the starting state must be
    feasible) — raises otherwise."""
    if floor > 0:
        raise ValueError(f"floor must be ≤ 0 (the starting balance), "
                         f"got {floor}")
    order_cols = list(order_cols)
    floor_c = int(round(floor * scale))

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        d = g.sort_values([key_col, *order_cols],
                          kind="mergesort").reset_index(drop=True)
        x = np.rint(d[delta_col].to_numpy(np.float64)
                    * scale).astype(np.int64)
        t = pd.DataFrame({key_col: d[key_col], "x": x})
        grp = t.groupby(key_col, sort=False)["x"]
        s = grp.cumsum().to_numpy(np.int64)
        t["sf"] = s - floor_c
        low = t.groupby(key_col, sort=False)["sf"].cummin() \
            .to_numpy(np.int64)
        adj = np.minimum(low, 0)
        bal = s - adj
        out = d[[key_col, *order_cols]].copy()
        out["delta"] = x / scale
        out["balance"] = bal / scale
        # the floor bound exactly when the reflection term grew
        prev_adj = t.assign(a=adj).groupby(
            key_col, sort=False)["a"].shift(1).fillna(0).to_numpy()
        out["clamped"] = adj < prev_adj
        return out

    return keyed_apply(ds, key_col, kernel, n_buckets=n_buckets)
