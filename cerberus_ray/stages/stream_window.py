"""Streaming tumbling-window aggregation with watermarks and
late-data flagging.

The batch path (`q_events_hourly_windows`) re-scans the corpus; a stream
must emit each window's aggregate as soon as it can no longer change.
Like `stream_fsm.py` / `stream_dedup.py` this is the shape the Dataset
API can't express (cross-batch mutable state + time-based eviction), so
it drops to raw Ray actors:

- N ``WindowShard`` actors, each owning the open-window accumulators for
  the keys that hash into its bucket (one key always routes to the same
  shard — the stage's partitioning assumption; keyless streams use one
  constant key).
- The driver feeds batches in arrival order and maintains the WATERMARK
  ``max(event ts seen) − allowed_lateness``, advanced BETWEEN batches
  (rows inside one batch never declare each other late). A row whose
  window already closed (window_end ≤ watermark) is routed to the LATE
  output with its lateness — flagged, never silently dropped or
  silently merged (the standard beyond-allowed-lateness contract).
- After each feed, windows whose end ≤ watermark are FLUSHED: each
  emits one (key, window_start, n, sum, min, max) row and leaves actor
  memory — per-shard state is O(open windows / N), bounded by
  key-cardinality × (lateness / window), not by stream length.
- snapshot()/restore() make the stage resumable mid-stream.

Agreement contract (tested): on any feed order whose disorder stays
within ``allowed_lateness``, the finalized rows equal the batch tumbling
aggregate of the non-late rows.

Reference anchor: the weekly report (`cerberus/reports.py:19-35`) is
this aggregate's batch twin; SURVEY.md §2.8 names windows as the
stream-shaped extension.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from ..determinism import hash_strings

_NEG_INF = float("-inf")


@ray.remote
class WindowShard:
    """Open-window accumulators for one key bucket."""

    def __init__(self):
        # (key, window_start) -> [n, sum, min, max]
        self.acc: Dict[Tuple, List[float]] = {}

    def update(self, keys: List, wstarts: List[int],
               values: List[float]) -> None:
        acc = self.acc
        for k, w, v in zip(keys, wstarts, values):
            a = acc.get((k, w))
            if a is None:
                acc[(k, w)] = [1, v, v, v]
            else:
                a[0] += 1
                a[1] += v
                if v < a[2]:
                    a[2] = v
                if v > a[3]:
                    a[3] = v

    def flush(self, watermark: float, window: int) -> List[tuple]:
        """Emit and evict every window with end ≤ watermark."""
        done = [kw for kw in self.acc if kw[1] + window <= watermark]
        out = []
        for kw in done:
            n, s, lo, hi = self.acc.pop(kw)
            out.append((kw[0], kw[1], int(n), float(s), float(lo),
                        float(hi)))
        return out

    def snapshot(self) -> List[tuple]:
        return [(k, w, *a) for (k, w), a in sorted(self.acc.items())]

    def restore(self, rows: List[tuple]) -> None:
        for k, w, n, s, lo, hi in rows:
            self.acc[(k, w)] = [n, s, lo, hi]

    def n_open(self) -> int:
        return len(self.acc)


def _ts_seconds(col) -> np.ndarray:
    a = np.asarray(col)
    if np.issubdtype(a.dtype, np.datetime64):
        return a.astype("datetime64[s]").astype(np.int64)
    return a.astype(np.int64)


class StreamingWindowAggregator:
    """Driver-side facade: watermark bookkeeping, shard routing,
    finalized/late row assembly."""

    COLS = ["key", "window_start", "n", "sum", "min", "max"]

    def __init__(self, *, window: int, allowed_lateness: int = 0,
                 n_shards: int = 4, key_col: Optional[str] = None,
                 ts_col: str = "ts", value_col: str = "value"):
        if window <= 0 or allowed_lateness < 0:
            raise ValueError("window > 0 and allowed_lateness >= 0")
        self.window = int(window)
        self.lateness = int(allowed_lateness)
        self.key_col, self.ts_col, self.value_col = key_col, ts_col, value_col
        self.n_shards = n_shards
        self.shards = [WindowShard.remote() for _ in range(n_shards)]
        self.watermark: float = _NEG_INF
        self.n_late = 0

    def _finalized_frame(self, rows: List[tuple]) -> pd.DataFrame:
        df = pd.DataFrame(rows, columns=self.COLS)
        return (df.sort_values(["window_start", "key"], kind="mergesort")
                .reset_index(drop=True))

    def feed(self, batch: pd.DataFrame) -> Tuple[pd.DataFrame, pd.DataFrame]:
        """→ (finalized window rows, late rows). The watermark advances
        AFTER the batch's rows are classified against the previous one."""
        ts = _ts_seconds(batch[self.ts_col].to_numpy())
        vals = batch[self.value_col].to_numpy(dtype=np.float64)
        keys = (batch[self.key_col].astype(str).to_numpy()
                if self.key_col else np.full(len(batch), "", dtype=object))
        wstart = (ts // self.window) * self.window

        late_mask = (wstart + self.window) <= self.watermark
        late = batch.loc[late_mask].copy()
        if len(late):
            late["lateness"] = self.watermark - (wstart[late_mask]
                                                 + self.window)
            self.n_late += len(late)

        live = ~late_mask
        if live.any():
            bucket = (hash_strings(np.asarray(keys[live], dtype=object))
                      % np.uint64(self.n_shards)).astype(np.int64)
            lk, lw, lv = keys[live], wstart[live], vals[live]
            refs = []
            for s in range(self.n_shards):
                idx = np.flatnonzero(bucket == s)
                if len(idx):
                    refs.append(self.shards[s].update.remote(
                        [lk[i] for i in idx],
                        [int(lw[i]) for i in idx],
                        [float(lv[i]) for i in idx]))
            ray.get(refs)

        if len(ts):
            self.watermark = max(self.watermark,
                                 float(ts.max()) - self.lateness)
        flushed = [r for part in ray.get(
            [s.flush.remote(self.watermark, self.window)
             for s in self.shards]) for r in part]
        return self._finalized_frame(flushed), late.reset_index(drop=True)

    def finalize(self) -> pd.DataFrame:
        """Flush every still-open window (end of stream)."""
        rows = [r for part in ray.get(
            [s.flush.remote(float("inf"), self.window)
             for s in self.shards]) for r in part]
        return self._finalized_frame(rows)

    def snapshot(self) -> dict:
        return {"watermark": self.watermark, "n_late": self.n_late,
                "shards": ray.get([s.snapshot.remote()
                                   for s in self.shards])}

    def restore(self, snap: dict) -> None:
        if len(snap["shards"]) != len(self.shards):
            raise ValueError(
                f"snapshot has {len(snap['shards'])} shards, stage has "
                f"{len(self.shards)} — window keys would silently "
                f"mis-route")
        self.watermark = snap["watermark"]
        self.n_late = snap["n_late"]
        ray.get([s.restore.remote(rows)
                 for s, rows in zip(self.shards, snap["shards"])])

    def n_open_windows(self) -> int:
        return sum(ray.get([s.n_open.remote() for s in self.shards]))

    def shutdown(self) -> None:
        for s in self.shards:
            ray.kill(s)
        self.shards = []


def window_stream(ds, *, window: int, allowed_lateness: int = 0,
                  n_shards: int = 4, key_col: Optional[str] = None,
                  ts_col: str = "ts", value_col: str = "value",
                  batch_size: int = 4096) -> Tuple[pa.Table, pa.Table]:
    """Run the streaming aggregator over a Dataset in block order →
    (finalized windows table, late rows table)."""
    agg = StreamingWindowAggregator(
        window=window, allowed_lateness=allowed_lateness,
        n_shards=n_shards, key_col=key_col, ts_col=ts_col,
        value_col=value_col)
    fin: List[pd.DataFrame] = []
    late: List[pd.DataFrame] = []
    try:
        for batch in ds.iter_batches(batch_size=batch_size,
                                     batch_format="pandas"):
            f, l = agg.feed(batch)
            if len(f):
                fin.append(f)
            if len(l):
                late.append(l)
        fin.append(agg.finalize())
        f_all = (pd.concat(fin, ignore_index=True)
                 .sort_values(["window_start", "key"], kind="mergesort")
                 .reset_index(drop=True))
        l_all = (pd.concat(late, ignore_index=True) if late
                 else pd.DataFrame())
        return (pa.Table.from_pandas(f_all, preserve_index=False),
                pa.Table.from_pandas(l_all, preserve_index=False))
    finally:
        agg.shutdown()
