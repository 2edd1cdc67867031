"""Quantile-threshold corpus pruning — keep the top (or bottom) fraction
of documents by a numeric score column, at any scale.

The standard quality gate of public training-data pipelines (CCNet's
perplexity-tercile split, Gopher/C4 keep-above-threshold rules) needs a
GLOBAL quantile of the score distribution, which is exactly the kind of
operation that must not materialize or sort the corpus. Ray shape:

- Pass 1 (``quantile_threshold``): one streamed ``map_batches`` pass
  emits a serialized per-block t-digest (`state/tdigest.py` — mergeable,
  deterministic, ~KB each); the driver merges #blocks tiny sketches and
  reads the threshold off the merged digest. No shuffle, no value
  materialization; the driver structure is O(blocks), not O(rows).
- Pass 2 (``prune_by_quantile``): a stateless streamed filter against
  the scalar threshold.

The threshold is approximate (t-digest edge accuracy ~1e-3 relative rank
at compression 200 — tested against exact quantiles in
tests/test_pruning.py); the FILTER itself is exact w.r.t. the chosen
threshold. Note the sketch is order-invariant but NOT block-boundary-
invariant: reruns over a differently-split input can move the threshold
by ~1 rank ulp. For strict rerun/resume stability, pin the input's block
structure or persist the pass-1 threshold in the run manifest and reuse
it in pass 2 (what the corpus funnel's checkpointing does for its own
gates).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..state.tdigest import TDigest


def quantile_threshold(ds, col: str, q: float, *,
                       compression: float = 200.0) -> float:
    """Approximate global q-quantile of ``col`` via merged per-block
    t-digests (one tiny row per block to the driver)."""
    if not 0.0 <= q <= 1.0:
        raise ValueError(f"q must be in [0,1], got {q}")

    def partial(b: pa.Table) -> pa.Table:
        v = b[col].to_numpy(zero_copy_only=False).astype(np.float64)
        v = v[~np.isnan(v)]
        td = TDigest(compression=compression)
        td.update(v)
        return pa.Table.from_pydict(
            {"sketch": pa.array([td.to_bytes().hex()], pa.string())})

    pdf = ds.map_batches(partial, batch_format="pyarrow",
                         zero_copy_batch=True).to_pandas()
    merged = TDigest(compression=compression)
    for s in pdf["sketch"]:
        merged = merged.merge(TDigest.from_bytes(bytes.fromhex(s)))
    return float(merged.quantile(q))


def prune_by_quantile(ds, col: str, keep_frac: float, *,
                      side: str = "upper", compression: float = 200.0):
    """Keep ~``keep_frac`` of rows: the upper tail (score ≥ threshold,
    the quality-gate direction) or the lower tail (score ≤ threshold,
    the perplexity-gate direction). → (filtered Dataset, threshold)."""
    if not 0.0 < keep_frac <= 1.0:
        raise ValueError(f"keep_frac must be in (0,1], got {keep_frac}")
    if side not in ("upper", "lower"):
        raise ValueError(f"side must be 'upper' or 'lower', got {side!r}")
    if keep_frac == 1.0:
        return ds, float("-inf") if side == "upper" else float("inf")
    thr = quantile_threshold(
        ds, col, 1.0 - keep_frac if side == "upper" else keep_frac,
        compression=compression)

    def keep(b: pa.Table) -> pa.Table:
        v = b[col]
        mask = (pc.greater_equal(v, thr) if side == "upper"
                else pc.less_equal(v, thr))
        return b.filter(pc.fill_null(mask, False))

    return ds.map_batches(keep, batch_format="pyarrow",
                          zero_copy_batch=True), thr
