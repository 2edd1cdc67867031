"""Streaming heavy hitters — Space-Saving counters in hash shards.

The batch path (`vocab.token_top_k`) re-scans the corpus; a stream
needs the current top-k AT ANY MOMENT under bounded memory. Like the
other stream stages (`stream_dedup`, `stream_fsm`, `stream_window`)
this is cross-batch mutable state → raw Ray actors:

- N ``TopKShard`` actors, each running one Space-Saving summary
  (Metwally et al. 2005, public method) of capacity ``m`` over the keys
  that hash into its bucket. A key always routes to the same shard, so
  the CLASSIC guarantees hold per shard on exactly that key subset:
  every key's estimate overshoots its true count by at most that
  shard's min-counter, and any key with true count > n_shard/m is
  guaranteed present.
- ``topk()`` merges the shard summaries on the driver (N × m rows) and
  returns (key, count_est, count_err) — err is the per-key maximum
  overcount, 0 whenever the shard never evicted (exact mode: capacity ≥
  distinct keys per shard reproduces exact counts, the equivalence the
  tests pin against the batch heavy-hitter op).
- snapshot()/restore() make the stage resumable mid-stream.
"""

from __future__ import annotations

import heapq
from typing import Dict, List, Tuple

import numpy as np
import pandas as pd
import ray

from ..determinism import hash_strings


@ray.remote
class TopKShard:
    """One Space-Saving summary: key → (count, overcount_err).

    Eviction picks the (count, key)-minimal counter via a lazy min-heap
    (stale entries skipped on pop) — O(log m) amortized per eviction
    instead of a full O(m) dict scan, so high-churn streams (mostly
    distinct keys at capacity) stay feed-bound, not eviction-bound."""

    def __init__(self, capacity: int):
        self.capacity = capacity
        self.counts: Dict[str, int] = {}
        self.errs: Dict[str, int] = {}
        self._heap: List[Tuple[int, str]] = []   # (count, key), lazy

    def _pop_victim(self) -> Tuple[str, int]:
        while True:
            c, k = heapq.heappop(self._heap)
            # stale entries: key evicted earlier, or count since grown
            if self.counts.get(k) == c:
                return k, c

    def _maybe_rebuild(self) -> None:
        # Hot-key increments push one stale tuple each; without
        # evictions to drain them the lazy heap would grow with total
        # updates, not capacity. Rebuild keeps memory O(capacity).
        if len(self._heap) > 4 * self.capacity:
            self._heap = [(c, k) for k, c in self.counts.items()]
            heapq.heapify(self._heap)

    def update(self, keys: List[str], counts: List[int]) -> None:
        for k, c in zip(keys, counts):
            if k in self.counts:
                new = self.counts[k] + c
                self.counts[k] = new
                heapq.heappush(self._heap, (new, k))
                self._maybe_rebuild()
            elif len(self.counts) < self.capacity:
                self.counts[k] = c
                self.errs[k] = 0
                heapq.heappush(self._heap, (c, k))
            else:
                # evict the min counter; the newcomer inherits its
                # count as its maximum possible overcount
                victim, base = self._pop_victim()
                self.counts.pop(victim)
                self.errs.pop(victim)
                self.counts[k] = base + c
                self.errs[k] = base
                heapq.heappush(self._heap, (base + c, k))

    def summary(self) -> List[Tuple[str, int, int]]:
        return [(k, self.counts[k], self.errs[k])
                for k in sorted(self.counts)]

    def snapshot(self):
        return (self.capacity, dict(self.counts), dict(self.errs))

    def restore(self, snap) -> None:
        self.capacity, self.counts, self.errs = snap
        self._heap = [(c, k) for k, c in self.counts.items()]
        heapq.heapify(self._heap)


class StreamingTopK:
    """Driver-side feed loop + merge (the documented streaming surface,
    like StreamingDeduper)."""

    def __init__(self, *, n_shards: int = 4, capacity: int = 1024):
        if capacity < 1:
            raise ValueError("capacity must be positive")
        self.n = n_shards
        self.shards = [TopKShard.remote(capacity)
                       for _ in range(n_shards)]

    def feed(self, keys) -> None:
        """Ingest one batch of key occurrences (pre-aggregated within
        the batch, then routed — one message per touched shard). Null
        keys are dropped, matching SQL COUNT/GROUP BY semantics (and
        np.unique cannot sort a None/str mix)."""
        arr = np.asarray(keys, dtype=object)
        if len(arr):
            arr = arr[np.array([k is not None and k == k for k in arr],
                               dtype=bool)]
        if not len(arr):
            return
        uk, cnt = np.unique(arr, return_counts=True)
        shard = (hash_strings(uk) % np.uint64(self.n)).astype(np.int64)
        refs = []
        for s in range(self.n):
            m = shard == s
            if m.any():
                refs.append(self.shards[s].update.remote(
                    uk[m].tolist(), cnt[m].tolist()))
        ray.get(refs)

    def topk(self, k: int) -> pd.DataFrame:
        """→ (key, count_est, count_err) — top-k by (count desc, key),
        merged from the N × m shard summaries."""
        rows = [r for s in ray.get(
            [sh.summary.remote() for sh in self.shards]) for r in s]
        df = pd.DataFrame(rows, columns=["key", "count_est",
                                         "count_err"])
        if not len(df):
            return df
        return (df.sort_values(["count_est", "key"],
                               ascending=[False, True])
                .head(k).reset_index(drop=True))

    def snapshot(self):
        return ray.get([s.snapshot.remote() for s in self.shards])

    def restore(self, snaps) -> None:
        if len(snaps) != self.n:
            raise ValueError(
                f"snapshot has {len(snaps)} shards, stage has {self.n} "
                f"— keys would silently mis-route (h % n changes)")
        ray.get([s.restore.remote(sn)
                 for s, sn in zip(self.shards, snaps)])

    def shutdown(self) -> None:
        for s in self.shards:
            ray.kill(s)
        self.shards = []
