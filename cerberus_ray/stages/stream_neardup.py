"""Streaming (online) NEAR-dup filtering — the MinHash-LSH tier of
`stream_dedup.py`: drop a document at ingest when any of its LSH band
hashes was already registered by a KEPT document.

Like the other stream_* stages this is cross-batch mutable state →
raw Ray actors (the documented Dataset-API exception):

- N ``BandShard`` actors, each owning the seen-band-hash set for the
  band hashes that route to it (band_hash % N — a band hash always
  lands on the same shard).
- Two-phase protocol per batch, so dropped documents never poison the
  filter: (1) membership query for every band of every doc; (2)
  register the bands of the KEPT docs only. Within-batch collisions
  resolve first-occurrence-wins on the driver before phase 1.

Semantics vs the batch path: this is the CANDIDATE criterion of
``pipelines/dedup.minhash_near_dup_pairs`` applied online — a band
collision drops the doc WITHOUT the exact-Jaccard verify (a stream
cannot re-read the kept doc's text; banding params (k, bands) set the
implied similarity threshold and the false-drop rate — P(collision) =
jaccardʳ per band, r = k/bands). The batch path remains the verified
baseline; ``pipelines/dedup_eval`` measures either.

snapshot()/restore() make the stage resumable mid-stream (tested).
"""

from __future__ import annotations

from typing import List

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

__all__ = ["StreamingNearDeduper", "near_dedup_stream"]


@ray.remote
class BandShard:
    def __init__(self):
        self.seen: set = set()

    def member(self, hashes: List[int]) -> List[bool]:
        return [h in self.seen for h in hashes]

    def register(self, hashes: List[int]) -> None:
        self.seen.update(hashes)

    def snapshot(self) -> List[int]:
        return sorted(self.seen)

    def restore(self, seen: List[int]) -> None:
        self.seen = set(seen)

    def n_seen(self) -> int:
        return len(self.seen)


class StreamingNearDeduper:
    """Driver-side facade mirroring ``StreamingDeduper``."""

    def __init__(self, n_shards: int = 4, *, k: int = 128, w: int = 3,
                 bands: int = 16, seed: int = 42):
        self.n_shards = n_shards
        self.k, self.w, self.bands, self.seed = k, w, bands, seed
        self.shards = [BandShard.remote() for _ in range(n_shards)]

    def _band_hashes(self, texts: np.ndarray) -> np.ndarray:
        from ..pipelines.dedup import band_hashes, minhash_signatures

        sigs = minhash_signatures(texts, k=self.k, w=self.w,
                                  seed=self.seed)
        bh = band_hashes(sigs, bands=self.bands)   # (n, bands) uint64
        # XOR the band INDEX into the hash — the batch LSH's bucket key
        # (pipelines/dedup.py pass-1). Pooling bare band hashes into one
        # seen-set would let a band-2 vs band-9 coincidence drop a doc
        # the batch path would never bucket together (~bands× the
        # documented per-band collision rate).
        return bh ^ (np.arange(self.bands, dtype=np.uint64)
                     << np.uint64(56))

    def feed(self, batch: pd.DataFrame, *,
             text_col: str = "text") -> pd.DataFrame:
        """→ the subset of ``batch`` (original order) with no band
        collision against earlier KEPT docs (or earlier rows of this
        batch)."""
        texts = batch[text_col].to_numpy()
        if not len(texts):
            return batch
        bh = self._band_hashes(texts)          # (n, bands)
        n = len(texts)
        # phase 1: cross-batch membership
        flat = bh.ravel()
        shard_of = (flat % np.uint64(self.n_shards)).astype(np.int64)
        hit = np.zeros(flat.shape, dtype=bool)
        refs, spans = [], []
        for s in range(self.n_shards):
            idx = np.flatnonzero(shard_of == s)
            if len(idx):
                refs.append(self.shards[s].member.remote(
                    [int(h) for h in flat[idx]]))
                spans.append(idx)
        for r, idx in zip(ray.get(refs), spans):
            hit[idx] = r
        doc_hit = hit.reshape(n, -1).any(axis=1)
        # within-batch first-occurrence: a band seen earlier IN THIS
        # batch (by a surviving doc) also drops
        keep = np.zeros(n, dtype=bool)
        local: set = set()
        for i in range(n):
            if doc_hit[i]:
                continue
            row = bh[i]
            if any(int(h) in local for h in row):
                continue
            keep[i] = True
            local.update(int(h) for h in row)
        # phase 2: register kept docs' bands
        kept_flat = bh[keep].ravel()
        shard_of_k = (kept_flat
                      % np.uint64(self.n_shards)).astype(np.int64)
        regs = []
        for s in range(self.n_shards):
            idx = np.flatnonzero(shard_of_k == s)
            if len(idx):
                regs.append(self.shards[s].register.remote(
                    [int(h) for h in kept_flat[idx]]))
        ray.get(regs)
        return batch.iloc[np.flatnonzero(keep)].reset_index(drop=True)

    def snapshot(self) -> List[List[int]]:
        return ray.get([s.snapshot.remote() for s in self.shards])

    def restore(self, snaps: List[List[int]]) -> None:
        if len(snaps) != self.n_shards:
            raise ValueError(
                f"snapshot has {len(snaps)} shards, stage has "
                f"{self.n_shards} — band hashes would silently "
                f"mis-route and seen docs re-admit as new")
        ray.get([s.restore.remote(sn)
                 for s, sn in zip(self.shards, snaps)])

    def n_seen(self) -> int:
        return sum(ray.get([s.n_seen.remote() for s in self.shards]))

    def shutdown(self) -> None:
        for s in self.shards:
            ray.kill(s)
        self.shards = []


def near_dedup_stream(ds, *, text_col: str = "text", n_shards: int = 4,
                      batch_size: int = 4096, **lsh_kw) -> pa.Table:
    """Run the streaming near-deduper over a Dataset in block order →
    the kept rows as one table (the per-batch kept stream is what a
    caller would re-write to parquet)."""
    d = StreamingNearDeduper(n_shards=n_shards, **lsh_kw)
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
