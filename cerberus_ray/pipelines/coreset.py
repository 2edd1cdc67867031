"""Greedy k-center coreset selection over an embedding column.

The Gonzalez (1985) farthest-point heuristic — the standard diverse-
subset / coreset selector for training data (2-approximation to the
optimal k-center radius, public method): repeatedly pick the point
farthest (cosine distance) from everything already selected.

Distributed shape: unit vectors are materialized once; each of the k
rounds is ONE streamed pass against the full center matrix (k×d,
broadcast — KBs) emitting a per-block (argmax-of-min-distance id, dist,
vec) partial, so the driver compares #blocks candidate rows and appends
one center. k passes over object-store-cached blocks, no shuffle, no
per-round re-materialize; O(k²·n·d) flops total — the per-row
running-min-column variant (O(k·n·d) flops but 2k executions and k
materializes) only wins when k·d outgrows the flop budget, which at
coreset-sized k it does not. Ties break on the smaller id, so the
selection is deterministic and partition-invariant.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .similarity import _mat, _unit


def k_center_select(ds, *, k: int = 16, vec_col: str = "embedding",
                    id_col: str = "vec_id") -> pd.DataFrame:
    """→ frame (order, id, radius): the k selected ids in pick order;
    ``radius`` is each pick's distance to the previously selected set —
    non-increasing, and radius[i] upper-bounds the final covering
    radius of the first i centers (the Gonzalez guarantee)."""
    import ray

    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")

    def prep(b: pa.Table) -> pa.Table:
        e = _unit(_mat(b[vec_col]).astype(np.float64))
        return pa.Table.from_pydict({
            "id": b[id_col],
            "vec": pa.array(list(e.astype(np.float32)),
                            pa.list_(pa.float32()))})

    cur = ds.map_batches(prep, batch_format="pyarrow",
                         zero_copy_batch=True).materialize()

    # deterministic seed center: the smallest id — per-block (min-id,
    # vec) partials, no full-row filter pass
    def seed_partial(b: pa.Table) -> pa.Table:
        ids = b["id"].to_numpy(zero_copy_only=False)
        j = int(np.argmin(ids))
        return b.take([j])

    sp = (cur.map_batches(seed_partial, batch_format="pyarrow",
                          zero_copy_batch=True).to_pandas()
          .sort_values("id").iloc[0])
    picks = [(int(sp["id"]), float("inf"))]
    centers = [np.asarray(sp["vec"], dtype=np.float64)]

    # one streamed pass per round against the FULL center matrix (k×d,
    # tiny): fewer executions beat the per-row state column at any k
    # where O(k²·n·d) flops stay cheap; no per-round re-materialize.
    for _ in range(1, min(k, cur.count())):
        cref = ray.put(np.stack(centers))

        def partial_max(b: pa.Table) -> pa.Table:
            cm = ray.get(cref)                      # (n_centers, d)
            e = _mat(b["vec"]).astype(np.float64)
            mind = 1.0 - (e @ cm.T).max(axis=1)
            ids = b["id"].to_numpy(zero_copy_only=False)
            best = int(np.lexsort((ids, -mind))[0])
            return pa.Table.from_pydict({
                "id": pa.array([int(ids[best])], pa.int64()),
                "d": pa.array([float(mind[best])], pa.float64()),
                "vec": b["vec"].take([best])})

        cand = (cur.map_batches(partial_max, batch_format="pyarrow",
                                zero_copy_batch=True).to_pandas()
                .sort_values(["d", "id"],
                             ascending=[False, True]).iloc[0])
        picks.append((int(cand["id"]), float(cand["d"])))
        centers.append(np.asarray(cand["vec"], dtype=np.float64))

    return pd.DataFrame({
        "order": np.arange(len(picks), dtype=np.int64),
        "id": [p[0] for p in picks],
        "radius": [p[1] for p in picks]})
