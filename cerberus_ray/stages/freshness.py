"""Per-key data-freshness and arrival-gap validation.

A feed that silently stops (or skips an interval) passes every
row-level rule — the violation is the ABSENCE of rows. This stage
checks each key's arrival process against its own learned cadence:

- ``staleness_s`` = asof − last event ts; a key is ``stale`` when that
  exceeds ``factor ×`` its median inter-arrival gap (self-calibrated —
  a daily feed and a per-second feed get the right threshold without
  configuration).
- ``n_internal_gaps`` / ``max_gap_s`` flag historical holes: gaps
  between consecutive events larger than the same threshold.

The monitoring twin of `stages/drift.py` (values drift) and
`event_rate_anomalies` (volume drift): this one watches TIME.

Scale shape: one keyed exchange through `keyed_window.keyed_apply`
(hash buckets, vectorized multi-key kernel — diffs + grouped
median/max/count with group-boundary masks, no per-key Python).
Output rows ∝ distinct keys; the asof default (global max ts) is one
streamed max-partial pass.

Reference anchor: the overdue-invoice dual path
(cerberus/models/invoice.py:211-231) is the reference's only
time-based rule; SURVEY.md §2.8 names cadence monitoring as the
stream-shaped extension. Tests: tests/test_freshness.py (DuckDB
window-median parity, planted stale key / internal gap, determinism).
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pandas as pd
import pyarrow as pa

from .keyed_window import group_boundary_mask, keyed_apply

__all__ = ["freshness_report", "freshness_summary"]

_EPOCH = pd.Timestamp(0)


def _epoch_s(ts: pd.Series) -> np.ndarray:
    # unit-safe epoch seconds whatever the source resolution (testdata
    # events.ts is datetime64[ms]; .astype('int64') would be unit-bound)
    return ((ts - _EPOCH) // pd.Timedelta(seconds=1)).to_numpy(np.int64)


def global_max_ts(ds, ts_col: str):
    """Streamed max: per-block max partials, driver reduce."""
    def partial(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.Table.from_pydict({"m": [pc.max(b[ts_col]).as_py()]},
                                    schema=pa.schema([("m", b[ts_col].type)]))

    pdf = ds.map_batches(partial, batch_format="pyarrow",
                         zero_copy_batch=True).to_pandas()
    return pd.Timestamp(pdf["m"].max())


def freshness_report(ds, key_col: str = "user_id", ts_col: str = "ts", *,
                     asof: Optional[pd.Timestamp] = None,
                     factor: float = 3.0,
                     n_buckets: int = 32) -> pa.Table:
    """→ per-key (key, n_events, last_ts_s, median_gap_s, staleness_s,
    stale, n_internal_gaps, max_gap_s), sorted by key.

    ``median_gap_s``/gap columns are NaN/0 for single-event keys (no
    cadence to calibrate against → never flagged; list them via
    n_events == 1 if single-shot keys are themselves suspicious)."""
    if asof is None:
        asof = global_max_ts(ds, ts_col)
    asof_s = int((pd.Timestamp(asof) - _EPOCH) // pd.Timedelta(seconds=1))

    def kernel(d: pd.DataFrame) -> pd.DataFrame:
        d = d.sort_values([key_col, ts_col], kind="mergesort")
        sec = _epoch_s(d[ts_col])
        gap = np.diff(sec, prepend=sec[:1]).astype(np.float64)
        gap[group_boundary_mask(d[key_col])] = np.nan
        f = pd.DataFrame({key_col: d[key_col].to_numpy(),
                          "sec": sec, "gap": gap})
        g = f.groupby(key_col, sort=True)
        med = g["gap"].median()          # NaN for single-event keys
        thresh = f[key_col].map(med * factor).to_numpy()
        over = (gap > thresh)            # NaN compares False
        agg = pd.DataFrame({
            "n_events": g["sec"].size(),
            "last_ts_s": g["sec"].max(),
            "median_gap_s": med,
            "n_internal_gaps": pd.Series(over, index=f.index)
                                 .groupby(f[key_col].to_numpy()).sum()
                                 .astype("int64"),
            "max_gap_s": g["gap"].max().fillna(0.0),
        })
        agg.index.name = key_col
        agg = agg.reset_index()
        agg["staleness_s"] = (asof_s - agg["last_ts_s"]).astype("int64")
        agg["stale"] = (agg["staleness_s"]
                        > factor * agg["median_gap_s"]).fillna(False)
        return agg[[key_col, "n_events", "last_ts_s", "median_gap_s",
                    "staleness_s", "stale", "n_internal_gaps",
                    "max_gap_s"]]

    out = (keyed_apply(ds, key_col, kernel, n_buckets=n_buckets)
           .to_pandas().sort_values(key_col).reset_index(drop=True))
    out["n_events"] = out["n_events"].astype("int64")
    out["stale"] = out["stale"].astype(bool)
    return pa.Table.from_pandas(out, preserve_index=False)


def freshness_summary(ds, key_col: str = "user_id", ts_col: str = "ts",
                      **kw) -> pa.Table:
    """One-row rollup of :func:`freshness_report`: (n_keys, n_stale,
    n_keys_with_internal_gaps, max_staleness_s, max_gap_s)."""
    per = freshness_report(ds, key_col, ts_col, **kw).to_pandas()
    return pa.Table.from_pydict({
        "n_keys": pa.array([len(per)], pa.int64()),
        "n_stale": pa.array([int(per["stale"].sum())], pa.int64()),
        "n_keys_with_internal_gaps": pa.array(
            [int((per["n_internal_gaps"] > 0).sum())], pa.int64()),
        "max_staleness_s": pa.array(
            [int(per["staleness_s"].max()) if len(per) else 0], pa.int64()),
        "max_gap_s": pa.array(
            [float(per["max_gap_s"].max()) if len(per) else 0.0],
            pa.float64()),
    })
