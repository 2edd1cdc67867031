"""Audience-overlap matrix: pairwise set intersections between groups
via HyperLogLog sketches.

The classic "users in segment A ∩ segment B" analytics question at a
scale where exact pairwise distinct-intersections would need a shuffle
per pair: ONE streamed pass emits a KB-sized HLL per (block, group);
the driver max-merges per group and derives every pairwise overlap by
inclusion-exclusion — |A∩B| ≈ |A| + |B| − |A∪B| (union is exact HLL
register-max, so the subtraction is the only approximation). Exchange
and driver state are bounded by #groups × sketch size, never by keys.

HLL register merge is max — commutative, associative, idempotent — so
the result is BIT-IDENTICAL across block layouts and retries, not just
statistically stable (stronger than the t-digest/KLL sketches'
layout-marginal contract; asserted in tests/test_overlap.py).
"""

from __future__ import annotations

from typing import Dict

import numpy as np
import pandas as pd
import pyarrow as pa

from ..state.hll import HyperLogLog


def group_overlap_matrix(ds, group_col: str, key_col: str, *,
                         p: int = 14) -> pd.DataFrame:
    """→ frame (group_a, group_b, est_a, est_b, est_union,
    est_intersection, jaccard) for every unordered group pair
    (group_a < group_b), estimates rounded to whole keys and clipped
    at 0 (inclusion-exclusion can go slightly negative on disjoint
    sets — that's the honest reading: no overlap)."""

    def partial(b: pa.Table) -> pa.Table:
        g = b[group_col].to_numpy(zero_copy_only=False)
        k = b[key_col].to_numpy(zero_copy_only=False)
        out_g, out_s = [], []
        for grp in pd.unique(g):
            h = HyperLogLog(p=p)
            vals = k[g == grp]
            if vals.dtype.kind in "iu":
                h.update_ints(vals.astype(np.int64))
            else:
                h.update_strings(vals)
            out_g.append(str(grp))
            out_s.append(h.to_bytes())
        return pa.Table.from_pydict({
            "g": pa.array(out_g, pa.string()),
            "s": pa.array(out_s, pa.binary())})

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True).to_pandas()
    sketches: Dict[str, HyperLogLog] = {}
    for _, r in parts.iterrows():
        if r["g"] in sketches:
            sketches[r["g"]].merge_bytes(r["s"])
        else:
            sketches[r["g"]] = HyperLogLog.from_bytes(r["s"])
    groups = sorted(sketches)
    rows = []
    for i, a in enumerate(groups):
        for b_ in groups[i + 1:]:
            ea = sketches[a].estimate()
            eb = sketches[b_].estimate()
            u = HyperLogLog.from_bytes(sketches[a].to_bytes())
            u.merge(sketches[b_])
            eu = u.estimate()
            inter = max(ea + eb - eu, 0.0)
            rows.append({
                "group_a": a, "group_b": b_,
                "est_a": round(ea), "est_b": round(eb),
                "est_union": round(eu),
                "est_intersection": round(inter),
                "jaccard": round(inter / eu, 6) if eu > 0 else 0.0})
    out = pd.DataFrame(rows)
    for c in ("est_a", "est_b", "est_union", "est_intersection"):
        if len(out):
            out[c] = out[c].astype("int64")
    return out
