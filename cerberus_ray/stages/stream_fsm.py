"""Streaming FSM validation — incremental cross-batch state in actors.

The batch path (crm.rules.fsm_log_validity) groups the whole log and
replays each entity's history. A *stream* of transition events can't wait
for the full log: state must persist across batches. That is the one shape
the Dataset API can't express (SURVEY.md §2.8; the guide's "incremental
state in an actor, one actor per key-hash bucket, fed batches in ts
order"), so this stage drops to raw Ray actors:

- N ``FSMShard`` actors, each owning the current state of the entities
  that hash into its bucket (the partitioning assumption: one entity's
  events always route to the same shard — hash(entity, entity_id) % N).
- The driver streams event batches IN TIMESTAMP ORDER (the stage's
  documented ordering assumption, like any keyed stream consumer);
  within a batch each shard applies its bucket's events sorted by ts.
- Shards validate edges against the FSM edge sets and continuity against
  their held state, emitting violation rows incrementally.

Equivalent to the batch replay on a complete log (asserted in tests), but
O(active entities) memory per shard and constant work per event.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Set, Tuple

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from ..determinism import hash_strings
from ..schema import VIOLATIONS


@ray.remote
class FSMShard:
    """Holds current state per entity key; validates incrementally."""

    def __init__(self, edges: Dict[str, Set[Tuple[str, str]]]):
        self.edges = edges
        self.state: Dict[str, str] = {}
        self.last_ts: Dict[str, object] = {}

    def process(self, batch: pd.DataFrame) -> List[dict]:
        out: List[dict] = []
        # stable sort: equal-ts events keep feed order, so replays are
        # deterministic on ties (stream-vs-batch equivalence)
        for r in batch.sort_values("ts", kind="mergesort").itertuples():
            # str() keying matches the router's astype(str) form — an
            # int() here crashed on UUID/string entity ids the router
            # and the batch path both accept
            key = f"{r.entity}|{r.entity_id}"
            # guard the stage's ordering assumption: an event older than
            # the entity's last processed ts means the feed violated the
            # ts-ordered contract — flag it AND DROP it: applying a
            # stale event to newer held state would emit cascading
            # spurious broken-chain violations and corrupt the chain
            # the batch replay (global sort) would have validated
            prev_ts = self.last_ts.get(key)
            if prev_ts is not None and r.ts < prev_ts:
                out.append({"doc_id": key, "rule": "fsm-out-of-order-feed",
                            "path": "ts",
                            "detail": f"event at {r.ts} arrived after "
                                      f"{prev_ts} was processed"})
                continue
            self.last_ts[key] = r.ts
            eset = self.edges.get(r.entity, set())
            if (r.source, r.target) not in eset:
                out.append({"doc_id": key, "rule": "fsm-illegal-edge",
                            "path": "state",
                            "detail": f"{r.source}→{r.target} not allowed"})
            held = self.state.get(key)
            if held is not None and held != r.source:
                out.append({"doc_id": key, "rule": "fsm-broken-chain",
                            "path": "state",
                            "detail": f"log jumps from {held} to {r.source}"})
            self.state[key] = r.target
        return out

    def snapshot(self) -> Dict[str, dict]:
        """Current state AND last-processed ts per entity — both are needed
        to resume: without last_ts, out-of-order detection silently resets
        after a restore."""
        return {"state": dict(self.state), "last_ts": dict(self.last_ts)}

    def restore(self, snap: Dict[str, dict]) -> None:
        if "state" in snap or "last_ts" in snap:
            self.state.update(snap.get("state", {}))
            self.last_ts.update(snap.get("last_ts", {}))
        else:  # legacy snapshot: state mapping only
            self.state.update(snap)


class StreamingFSMValidator:
    """Driver-side facade: routes ts-ordered event batches to shards."""

    def __init__(self, edges: Dict[str, Set[Tuple[str, str]]],
                 n_shards: int = 4):
        self.n_shards = n_shards
        self.shards = [FSMShard.remote(edges) for _ in range(n_shards)]
        self._pending = []

    def _bucket(self, batch: pd.DataFrame) -> np.ndarray:
        keys = (batch["entity"].astype(str) + "|"
                + batch["entity_id"].astype(str)).to_numpy()
        return (hash_strings(keys.astype(object))
                % np.uint64(self.n_shards)).astype(np.int64)

    def feed(self, batch: pd.DataFrame) -> None:
        """Feed one batch (batches must arrive in global ts order)."""
        b = self._bucket(batch)
        for s in range(self.n_shards):
            sub = batch[b == s]
            if len(sub):
                self._pending.append(self.shards[s].process.remote(sub))

    def collect(self) -> pa.Table:
        rows: List[dict] = []
        for ref in self._pending:
            rows.extend(ray.get(ref))
        self._pending = []
        if not rows:
            return VIOLATIONS.empty_table()
        pdf = pd.DataFrame(rows).sort_values(["doc_id", "rule"]) \
            .reset_index(drop=True)
        return pa.Table.from_pandas(pdf, preserve_index=False,
                                    schema=VIOLATIONS)

    def snapshot(self) -> List[Dict[str, str]]:
        return ray.get([s.snapshot.remote() for s in self.shards])

    def restore(self, snaps: List[Dict[str, str]]) -> None:
        if len(snaps) != self.n_shards:
            raise ValueError(
                f"snapshot has {len(snaps)} shards, stage has "
                f"{self.n_shards} — keys would silently mis-route")
        ray.get([s.restore.remote(sn)
                 for s, sn in zip(self.shards, snaps)])

    def shutdown(self) -> None:
        for s in self.shards:
            ray.kill(s)
        self.shards = []


def validate_stream(log_ds, edges: Optional[Dict] = None, *,
                    n_shards: int = 4, batch_size: int = 4096) -> pa.Table:
    """Run the streaming validator over an event-log Dataset sorted by ts
    (the sort IS the stream order; iter_batches streams with backpressure)."""
    if edges is None:
        from ..crm.fixtures import BOOKING_EDGES, CHARGE_EDGES, INVOICE_EDGES

        edges = {"booking": BOOKING_EDGES, "charge": CHARGE_EDGES,
                 "invoice": INVOICE_EDGES}
    v = StreamingFSMValidator(edges, n_shards=n_shards)
    parts: List[pa.Table] = []
    try:
        for i, batch in enumerate(log_ds.sort("ts").iter_batches(
                batch_size=batch_size, batch_format="pandas")):
            v.feed(batch)
            if i % 64 == 63:  # bound pending-result growth on long streams
                parts.append(v.collect())
        parts.append(v.collect())
        parts = [p for p in parts if p.num_rows]
        if not parts:
            return VIOLATIONS.empty_table()
        return (pa.concat_tables(parts)
                .sort_by([("doc_id", "ascending"), ("rule", "ascending")]))
    finally:
        v.shutdown()
