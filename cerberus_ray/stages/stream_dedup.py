"""Streaming (online) exact dedup — drop duplicate documents AT INGEST.

The batch path (pipelines/dedup.py) needs the whole corpus; a stream
cannot wait. Like stages/stream_fsm.py this is the one shape the Dataset
API can't express (cross-batch mutable state), so it drops to raw Ray
actors:

- N ``DedupShard`` actors, each owning the seen-hash set for the content
  hashes that land in its bucket (hash(md5) % N — one hash always routes
  to the same shard, the stage's partitioning assumption).
- The driver feeds batches in arrival order; each shard returns the
  batch rows whose content hash is NEW to it (first occurrence wins —
  arrival order, not min-key, is the streaming tie-break).
- Shard state is a set of FULL 16-byte md5 digests (not texts): memory is
  O(distinct docs / N) per shard, and equivalence to batch exact dedup
  (which compares full md5) holds without a truncated-hash collision
  window. snapshot()/restore() make the stage resumable mid-stream.

Equivalent to batch exact dedup on the same feed order (asserted in
tests); a Bloom filter can replace the exact set per shard when false
drops are acceptable — the exact set IS the correctness baseline.
"""

from __future__ import annotations

import hashlib
from typing import List

import numpy as np
import pandas as pd
import pyarrow as pa
import ray


def _md5_digests(texts) -> List[bytes]:
    """Full 16-byte md5(text) digests (same content hash family as
    pipelines/dedup.add_md5 — no truncation, so no silent false drop on
    a 64-bit collision at billions of docs)."""
    return [hashlib.md5((t or "").encode()).digest() for t in texts]


@ray.remote
class DedupShard:
    """Holds the seen-hash set for one bucket; filters incrementally."""

    def __init__(self):
        self.seen: set = set()

    def filter_new(self, hashes: List[bytes],
                   payload_idx: List[int]) -> List[int]:
        """→ the payload indices whose hash is first-seen (marks them seen).
        Duplicates WITHIN the call keep only the first occurrence."""
        out = []
        for h, i in zip(hashes, payload_idx):
            if h not in self.seen:
                self.seen.add(h)
                out.append(i)
        return out

    def snapshot(self) -> List[bytes]:
        return sorted(self.seen)

    def restore(self, seen: List[bytes]) -> None:
        self.seen.update(seen)

    def n_seen(self) -> int:
        return len(self.seen)


class StreamingDeduper:
    """Driver-side facade: routes batches to hash-bucket shards and
    reassembles the surviving rows in original order."""

    def __init__(self, n_shards: int = 4):
        self.n_shards = n_shards
        self.shards = [DedupShard.remote() for _ in range(n_shards)]

    def feed(self, batch: pd.DataFrame, *, text_col: str = "text") -> pd.DataFrame:
        """→ the subset of ``batch`` (original order) not seen before."""
        digs = _md5_digests(batch[text_col].to_numpy())
        h64 = np.array([int.from_bytes(d[:8], "big") for d in digs],
                       dtype=np.uint64)
        bucket = (h64 % np.uint64(self.n_shards)).astype(np.int64)
        refs = []
        for s in range(self.n_shards):
            idx = np.flatnonzero(bucket == s)
            if len(idx):
                refs.append(self.shards[s].filter_new.remote(
                    [digs[i] for i in idx], [int(i) for i in idx]))
        keep = sorted(i for r in ray.get(refs) for i in r)
        return batch.iloc[keep].reset_index(drop=True)

    def snapshot(self) -> List[List[bytes]]:
        return ray.get([s.snapshot.remote() for s in self.shards])

    def restore(self, snaps: List[List[bytes]]) -> None:
        if len(snaps) != self.n_shards:
            raise ValueError(
                f"snapshot has {len(snaps)} shards, stage has "
                f"{self.n_shards} — hashes would silently mis-route "
                f"(h % n changes) and seen docs re-admit as new")
        ray.get([s.restore.remote(sn)
                 for s, sn in zip(self.shards, snaps)])

    def n_seen(self) -> int:
        return sum(ray.get([s.n_seen.remote() for s in self.shards]))

    def shutdown(self) -> None:
        for s in self.shards:
            ray.kill(s)
        self.shards = []


def dedup_stream(ds, *, text_col: str = "text", n_shards: int = 4,
                 batch_size: int = 4096) -> pa.Table:
    """Run the streaming deduper over a Dataset in block order → the kept
    rows as one table (driver-collected: the KEPT stream is the output a
    caller would normally re-write to parquet per batch)."""
    d = StreamingDeduper(n_shards=n_shards)
    parts: List[pd.DataFrame] = []
    try:
        for batch in ds.iter_batches(batch_size=batch_size,
                                     batch_format="pandas"):
            kept = d.feed(batch, text_col=text_col)
            if len(kept):
                parts.append(kept)
        if not parts:
            # schema-stable empty (a zero-column table would KeyError
            # downstream selects / break parquet writes)
            return ds.schema().empty_table()
        return pa.Table.from_pandas(pd.concat(parts, ignore_index=True),
                                    preserve_index=False)
    finally:
        d.shutdown()
