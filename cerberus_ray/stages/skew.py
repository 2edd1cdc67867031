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
