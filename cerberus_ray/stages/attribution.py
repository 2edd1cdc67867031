"""Conversion attribution over per-entity event journeys: credit each
conversion's value to a touch channel under the first-touch and
last-touch models — the marketing-analytics companion of the engine's
journey family (events_sessions, funnel, retention cohorts). Public
semantics: the standard position-based attribution definitions; SQL
equivalent is FIRST_VALUE/LAST_VALUE … IGNORE NULLS over the entity's
time-ordered window (the DuckDB oracle in tests/test_attribution.py).

Model (within one entity, rows totally ordered by ``order_cols``):
- a CONVERSION is a row whose channel equals ``conversion``;
- its last-touch channel = the nearest preceding non-conversion row;
- its first-touch channel = the earliest non-conversion row at or
  before it; conversions with no preceding touch credit ``direct``.

Execution: one `keyed_apply` hash exchange co-locates each entity;
the bucket kernel is groupby-ffill over marker columns (vectorized
across all keys in the bucket — no per-entity Python). Conversion
values sum in EXACT integer cents; the rollup is bounded by
2 × #channels rows.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .keyed_window import keyed_apply

__all__ = ["touch_attribution"]


def touch_attribution(ds, key_col: str, order_cols, channel_col: str,
                      value_col: str, *, conversion: str,
                      direct_label: str = "direct",
                      n_buckets: int = 32,
                      scale: int = 100) -> pd.DataFrame:
    """→ DataFrame (model, channel, n_conversions, revenue) sorted by
    (model, channel), models ∈ {first_touch, last_touch}. ``value_col``
    is a 2-dp measure (``scale``-exact)."""
    order_cols = list(order_cols)

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        d = g.sort_values([key_col, *order_cols],
                          kind="mergesort").reset_index(drop=True)
        ch = d[channel_col]
        is_conv = (ch == conversion).to_numpy()
        touch = ch.where(~is_conv)  # NaN on conversion rows
        # last-touch = per-key ffill of touch markers (a conversion
        # row's own marker is NaN, so "preceding" is automatic)
        tdf = pd.DataFrame({key_col: d[key_col], "t": touch,
                            "h": touch.notna().astype(np.int64)})
        gb = tdf.groupby(key_col, sort=False)
        last = gb["t"].ffill()
        # first-touch = ffill of ONLY each key's first touch marker
        cum = gb["h"].cumsum()
        firsts = touch.where(touch.notna() & (cum == 1))
        first = pd.DataFrame({key_col: d[key_col], "f": firsts}) \
            .groupby(key_col, sort=False)["f"].ffill()
        conv = d[is_conv]
        cents = np.rint(conv[value_col].to_numpy(np.float64)
                        * scale).astype(np.int64)
        frames = []
        for model, col in (("first_touch", first), ("last_touch",
                                                    last)):
            lab = col[is_conv].fillna(direct_label).to_numpy()
            t = pd.DataFrame({"model": model, "channel": lab,
                              "n_conversions": 1, "cents": cents})
            frames.append(t.groupby(["model", "channel"],
                                    as_index=False).sum())
        return pd.concat(frames, ignore_index=True)

    parts = keyed_apply(ds, key_col, kernel,
                        n_buckets=n_buckets).to_pandas()
    if not len(parts):
        return pd.DataFrame({"model": [], "channel": [],
                             "n_conversions": [], "revenue": []})
    out = parts.groupby(["model", "channel"], as_index=False).sum()
    out["revenue"] = out.pop("cents").astype("int64") / scale
    out["n_conversions"] = out["n_conversions"].astype("int64")
    return (out.sort_values(["model", "channel"])
            .reset_index(drop=True))
