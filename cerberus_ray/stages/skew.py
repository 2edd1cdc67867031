"""Salted-key skew mitigation (SURVEY.md §4; north_rule names this
explicitly).

A grouped aggregate over a hot key (one key holding a large fraction of
all rows) funnels that key's entire volume through one reducer. The salted
two-phase pattern splits each key into `n_salts` sub-keys for the first
(wide) aggregation, then merges the per-salt partials in a second, tiny
aggregation — the hot key's volume is spread across n_salts reducers.

Here phase 1 additionally map-side combines inside each block (pyarrow
hash aggregate), so the phase-1 shuffle carries at most
(#blocks × #keys × n_salts) partial rows regardless of row counts.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..determinism import uniform01


def salted_grouped_sum(ds, key: str, value: str, *, n_salts: int = 16,
                       seed: int = 42) -> pa.Table:
    """→ (key, total, n) via salt → partial → unsalt. Deterministic salt
    assignment (counter-based hash of a per-batch row index), output
    identical to an unsalted grouped sum."""

    def phase1(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        salt = (uniform01(np.arange(n), seed, 0x5A17) * n_salts).astype(np.int64)
        t = pa.Table.from_arrays(
            [pc.cast(batch[key], pa.string()), pa.array(salt),
             pc.cast(batch[value], pa.float64())],
            names=["k", "salt", "v"])
        return t.group_by(["k", "salt"]).aggregate([("v", "sum"),
                                                    ([], "count_all")])

    partials = ds.map_batches(phase1, batch_format="pyarrow",
                              zero_copy_batch=True).to_pandas()
    # phase 2: merge per-salt partials (tiny — ≤ keys × salts rows)
    g = partials.groupby("k", as_index=False).agg(total=("v_sum", "sum"),
                                                  n=("count_all", "sum"))
    g["total"] = g["total"].round(6)
    g["n"] = g["n"].astype("int64")
    g = g.sort_values("k").reset_index(drop=True)
    return pa.Table.from_arrays(
        [pa.array(g["k"], type=pa.string()),
         pa.array(g["total"]), pa.array(g["n"])],
        names=[key, "total", "n"])


def key_skew_report(ds, key: str, *, mode: str = "driver",
                    agg_partitions: int = 64,
                    top_n: int = 10) -> "pa.Table":
    """Key-distribution diagnostic for shuffle planning: BEFORE keying a
    groupby/join/window on ``key``, measure how hot the hot keys are.
    → one row: (n_rows, n_keys, max_count, p50_count, p99_count,
    top{N}_share, gini) — ``top_n_share`` is the fraction of all rows
    held by the N hottest keys; ``gini`` ∈ [0, 1) is the count
    concentration (0 = perfectly uniform). A top-share near 1 or a
    p99/p50 ratio ≫ 1 says: salt this key (``salted_grouped_sum``) or
    sub-bucket it before the exchange.

    Modes (planner contract): 'driver' merges per-block (key, count)
    hash-aggregate partials — O(#distinct keys) driver rows; 'shuffle'
    routes the counts through ``groupby(key).count()`` and collects only
    the per-block COUNT DISTRIBUTION sketch rows... at this engine's
    scale band the count vector itself is collected (the distribution
    stats need the exact counts; the documented beyond-memory swap is a
    KLL sketch over counts, `state/kll.py`). Both modes output-identical
    (agreement-tested).
    """
    import pandas as pd
    import pyarrow.compute as pc

    if mode not in ("driver", "shuffle"):
        raise ValueError(f"unknown skew-report mode {mode!r}")

    if mode == "driver":
        def partial(b: pa.Table) -> pa.Table:
            g = b.select([key]).group_by(key).aggregate([([], "count_all")])
            return pa.Table.from_arrays(
                [pc.cast(g[key], pa.string()), g["count_all"]],
                names=["k", "c"])

        pdf = ds.map_batches(partial, batch_format="pyarrow",
                             zero_copy_batch=True).to_pandas()
        counts = (pdf.groupby("k")["c"].sum().to_numpy(dtype=np.int64)
                  if len(pdf) else np.array([], dtype=np.int64))
    else:
        # coalesce schema-less empties; width ∝ the distinct-key
        # universe a 100-TB run expects (knob, not a constant)
        agg = ds.groupby(key).count().repartition(agg_partitions)

        def grab(b: pa.Table) -> pa.Table:
            if b.num_rows == 0 or "count()" not in b.column_names:
                return pa.Table.from_pydict({"c": pa.array([], pa.int64())})
            return pa.Table.from_arrays([b["count()"]], names=["c"])

        pdf = agg.map_batches(grab, batch_format="pyarrow").to_pandas()
        counts = (pdf["c"].to_numpy(dtype=np.int64) if len(pdf)
                  else np.array([], dtype=np.int64))

    if not len(counts):
        return pa.Table.from_pydict({
            "n_rows": [0], "n_keys": [0], "max_count": [0],
            "p50_count": [0.0], "p99_count": [0.0],
            f"top{top_n}_share": [0.0], "gini": [0.0]})
    counts = np.sort(counts)
    n_rows = int(counts.sum())
    n_keys = len(counts)
    cum = np.cumsum(counts, dtype=np.float64)
    # Gini over the count distribution (sorted-areas formula)
    gini = float(1.0 - 2.0 * (cum.sum() / (cum[-1] * n_keys))
                 + 1.0 / n_keys)
    top_share = float(counts[-top_n:].sum() / n_rows)
    return pa.Table.from_pydict({
        "n_rows": [n_rows], "n_keys": [n_keys],
        "max_count": [int(counts[-1])],
        "p50_count": [float(np.percentile(counts, 50))],
        "p99_count": [float(np.percentile(counts, 99))],
        f"top{top_n}_share": [round(top_share, 4)],
        "gini": [round(gini, 4)]})
