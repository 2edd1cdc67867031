"""Per-key time-series resampling onto a regular grid with as-of
forward-fill — the gap-filling step before windowed feature extraction
(SQL shape: per-key ``generate_series`` grid ``ASOF LEFT JOIN`` the
observations).

Execution shape: one ``keyed_apply`` hash exchange co-locates every
observation of a key, then a single vectorized kernel per bucket builds
all grid rows (``np.repeat``/``arange``, no per-key Python) and fills
them with one ``pd.merge_asof(..., by=key)`` — the C-level multi-key
as-of merge. Grid bounds default to each key's own [min, max] span
(``start``/``end`` pin a global window instead). Output rows carry the
grid timestamp, the filled value columns, and ``age`` — seconds since
the observation that filled the row (0 on exact hits; the staleness
signal downstream quality gates cut on).

Timestamps are treated as int64 epoch seconds (cast first; a datetime
column divides cleanly by ``freq`` after ``.astype('int64') // 10**9``).
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np
import pandas as pd

from .keyed_window import keyed_apply

__all__ = ["resample_ffill", "hopping_window_agg"]


def hopping_window_agg(ds, ts_col: str, value_col: str, *,
                       window_s: int, hop_s: int):
    """Overlapping (hopping) fixed windows: every event lands in the
    ``window_s // hop_s`` windows that contain it, aggregated per
    window start → pandas frame (win_start epoch-s int64, n, total).

    The missing sibling of the tumbling (`events_hourly_windows`) and
    per-event rolling (`events_rolling_1h`) shapes. One streamed pass:
    each batch REPLICATES its rows k times vectorized (k = window/hop,
    a small constant) and pre-aggregates per window start, so the
    exchange volume is (#window-starts × #blocks) partials — bounded by
    the TIME SPAN / hop, not by events (`groupagg` contract). SQL
    mirror: unnest a constant-length list of the k covering starts
    (DuckDB generate_series can't take lateral column args —
    list_transform over a constant series instead; tests/test_resample).
    """
    import pyarrow as pa

    from .groupagg import grouped_agg

    if window_s % hop_s:
        raise ValueError("window_s must be a multiple of hop_s")
    k = window_s // hop_s

    def expand(b: "pa.Table") -> "pa.Table":
        t = b[ts_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
        unit = 10 ** 6 if pa.types.is_timestamp(b[ts_col].type) else 1
        sec = t // unit
        v = b[value_col].to_numpy(zero_copy_only=False)
        base = (sec // hop_s) * hop_s
        # window starts covering each event: base - i*hop, i ∈ [0, k)
        ws = (base[None, :] - (np.arange(k) * hop_s)[:, None]).ravel()
        vv = np.tile(v, k)
        return pa.Table.from_pydict({
            "win_start": pa.array(ws, pa.int64()),
            value_col: pa.array(vv)})

    out = grouped_agg(
        ds.map_batches(expand, batch_format="pyarrow",
                       zero_copy_batch=True),
        ["win_start"],
        {"n": ("", "count"), "total": (value_col, "sum")})
    out["win_start"] = out["win_start"].astype("int64")
    out["n"] = out["n"].astype("int64")
    return out.sort_values("win_start").reset_index(drop=True)


def resample_ffill(ds, key_col: str, ts_col: str,
                   value_cols: Sequence[str], *, freq: int,
                   start: Optional[int] = None, end: Optional[int] = None,
                   n_buckets: int = 32):
    """→ Dataset (key, ts, *value_cols, age): one row per key per grid
    tick, each filled with the key's latest observation at or before the
    tick. Ticks are the multiples of ``freq`` (global alignment) from
    the key's first observation (or ``start``, whichever is later — a
    tick before the first observation has nothing to fill it) through
    the key's last observation (or ``end``, which may extend past it —
    the last observation persists)."""
    if freq <= 0:
        raise ValueError("freq must be a positive number of seconds")
    value_cols = list(value_cols)

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([ts_col, key_col],
                          kind="mergesort").reset_index(drop=True)
        g[ts_col] = g[ts_col].astype(np.int64)
        b = g.groupby(key_col, sort=False)[ts_col].agg(["min", "max"])
        mn = b["min"].to_numpy(dtype=np.int64)
        mx = b["max"].to_numpy(dtype=np.int64)
        lo = (mn + freq - 1) // freq * freq  # first fillable tick
        if start is not None:
            lo = np.maximum(lo, (int(start) + freq - 1) // freq * freq)
        hi = mx if end is None else np.full_like(mx, int(end))
        counts = np.maximum(0, (hi - lo) // freq + 1)
        if counts.sum() == 0:
            out = pd.DataFrame({key_col: [], "ts": []})
            for c in value_cols:
                out[c] = []
            out["age"] = []
            return out
        keys = np.repeat(b.index.to_numpy(), counts)
        starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
        offs = (np.arange(int(counts.sum()), dtype=np.int64)
                - np.repeat(starts, counts))  # 0..count-1 per key, no loop
        ticks = np.repeat(lo, counts) + offs * freq
        grid = pd.DataFrame({key_col: keys, "ts": ticks}).sort_values(
            ["ts", key_col], kind="mergesort")
        obs = g[[key_col, ts_col] + value_cols].rename(
            columns={ts_col: "ts"})
        filled = pd.merge_asof(grid, obs, on="ts", by=key_col,
                               direction="backward",
                               suffixes=("", "_obs"))
        # merge_asof leaves the obs ts implicit; recover staleness via a
        # second as-of on the ts column itself
        obs_ts = obs[[key_col, "ts"]].assign(_src_ts=obs["ts"])
        age_src = pd.merge_asof(grid, obs_ts, on="ts", by=key_col,
                                direction="backward")["_src_ts"]
        filled["age"] = (filled["ts"] - age_src).astype(np.int64)
        return (filled.sort_values([key_col, "ts"], kind="mergesort")
                .reset_index(drop=True))

    return keyed_apply(ds, key_col, kernel, n_buckets=n_buckets)


def resample_interpolate(ds, key_col: str, ts_col: str,
                         value_col: str, *, freq: int,
                         n_buckets: int = 32,
                         round_digits: int = 6):
    """Linear-interpolation resampling: per key, values at every
    ``freq``-aligned tick BETWEEN the first and last observation,
    linearly interpolated between the bracketing observations (exact
    at observation ticks). The two-sided companion of
    ``resample_ffill`` — a backward as-of brings the previous
    observation, a forward as-of the next, and the tick value is the
    time-weighted blend; both as-ofs are the same C-level
    ``pd.merge_asof`` kernel over whole buckets.

    → Dataset (key_col, ts, <value_col>) one row per tick per key."""
    if freq <= 0:
        raise ValueError("freq must be a positive number of seconds")

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([ts_col, key_col],
                          kind="mergesort").reset_index(drop=True)
        g[ts_col] = g[ts_col].astype(np.int64)
        b = g.groupby(key_col, sort=False)[ts_col].agg(["min", "max"])
        mn = b["min"].to_numpy(dtype=np.int64)
        mx = b["max"].to_numpy(dtype=np.int64)
        lo = (mn + freq - 1) // freq * freq
        counts = np.maximum(0, (mx - lo) // freq + 1)
        if counts.sum() == 0:
            return pd.DataFrame({key_col: [], "ts": [],
                                 value_col: []})
        keys = np.repeat(b.index.to_numpy(), counts)
        starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
        offs = (np.arange(int(counts.sum()), dtype=np.int64)
                - np.repeat(starts, counts))
        ticks = np.repeat(lo, counts) + offs * freq
        grid = pd.DataFrame({key_col: keys, "ts": ticks}).sort_values(
            ["ts", key_col], kind="mergesort")
        obs = (g[[key_col, ts_col, value_col]]
               .rename(columns={ts_col: "ts"})
               .assign(_src_ts=lambda d: d["ts"]))
        back = pd.merge_asof(grid, obs, on="ts", by=key_col,
                             direction="backward")
        fwd = pd.merge_asof(grid, obs, on="ts", by=key_col,
                            direction="forward",
                            suffixes=("", "_f"))
        t0 = back["_src_ts"].to_numpy(dtype=np.float64)
        t1 = fwd["_src_ts"].to_numpy(dtype=np.float64)
        v0 = back[value_col].to_numpy(dtype=np.float64)
        v1 = fwd[value_col].to_numpy(dtype=np.float64)
        t = back["ts"].to_numpy(dtype=np.float64)
        span = t1 - t0
        with np.errstate(invalid="ignore", divide="ignore"):
            w = np.where(span > 0, (t - t0) / span, 0.0)
        val = v0 + w * (v1 - v0)
        out = pd.DataFrame({key_col: back[key_col].to_numpy(),
                            "ts": back["ts"].to_numpy(),
                            value_col: np.round(val, round_digits)})
        return (out.sort_values([key_col, "ts"], kind="mergesort")
                .reset_index(drop=True))

    return keyed_apply(ds, key_col, kernel, n_buckets=n_buckets)
