"""Corpus snapshot diff — which documents were added, removed or changed
between two versions of a table. The incremental-validation primitive:
re-validate only `added ∪ changed`, retire `removed`, skip the rest —
the Ray-native analogue of the reference's save/update audit trail
(SURVEY.md §2.1 S9 event-log append; reference:
cerberus/models/customer.py save-path history).

Both sides reduce to compact (key, content-hash) rows — the text never
rides the exchange — tagged with a side bit and unioned. Per-key status
falls out of ONE keyed aggregation:

    n_a = Σ(1−side),  n_b = Σ side,
    h_a = max(h·(1−side)),  h_b = max(h·side)

(keys are unique per side, so the max over a one-hot product recovers
each side's hash) and a stateless classify map:
added (n_a=0) / removed (n_b=0) / changed (h_a≠h_b) / unchanged.

Mode planner, matching the engine's other keyed stages: ``driver`` pulls
the compact rows and classifies with one pandas merge (≤ the planner
band); ``shuffle`` routes the aggregation through
``groupby(key).aggregate(Sum, Max)`` and classifies inside
``map_batches`` — fully distributed, any key count. Agreement-tested;
equivalent to a SQL FULL OUTER JOIN on key (tested against DuckDB).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..determinism import hash_strings

_DRIVER_MAX_ROWS = 2_000_000


def _compact(ds, key_col: str, text_col: str, side: int):
    """→ Dataset of (key, h:int64, side:int8): 63-bit content hash (the
    sign bit is cleared so the one-hot max trick is order-safe)."""

    def rows(b: pa.Table) -> pa.Table:
        h = hash_strings(pc.fill_null(b[text_col], "").to_numpy(
            zero_copy_only=False))
        h = (h >> np.uint64(1)).astype(np.int64)  # non-negative
        return pa.Table.from_pydict({
            "key": b[key_col],
            "h": pa.array(h, pa.int64()),
            "side": pa.array(np.full(b.num_rows, side, np.int64))})

    return ds.map_batches(rows, batch_format="pyarrow",
                          zero_copy_batch=True)


def _classify_np(n_a, n_b, h_a, h_b) -> np.ndarray:
    out = np.where(n_a == 0, "added",
                   np.where(n_b == 0, "removed",
                            np.where(h_a != h_b, "changed", "unchanged")))
    return out


def snapshot_diff(ds_a, ds_b, *, key_col: str = "doc_id",
                  agg_partitions: int = 64,
                  text_col: str = "text", mode: str = "auto"):
    """→ Dataset (key, status ∈ {added, removed, changed, unchanged}):
    per-document diff of snapshot B against snapshot A. Keys must be
    unique within each side (the exact-dedup invariant upstream)."""
    if mode not in ("auto", "driver", "shuffle"):
        raise ValueError(f"unknown mode {mode!r}")
    a = _compact(ds_a, key_col, text_col, 0)
    b = _compact(ds_b, key_col, text_col, 1)
    if mode == "auto":
        mode = ("driver"
                if ds_a.count() + ds_b.count() <= _DRIVER_MAX_ROWS
                else "shuffle")

    if mode == "driver":
        pa_df = a.to_pandas()
        pb_df = b.to_pandas()
        m = pa_df.merge(pb_df, on="key", how="outer",
                        suffixes=("_a", "_b"))
        status = _classify_np(m["side_a"].notna().astype(int) * 1,
                              m["side_b"].notna().astype(int) * 1,
                              m["h_a"].fillna(-1), m["h_b"].fillna(-2))
        out = pd.DataFrame({"key": m["key"], "status": status})
        import ray.data as rd
        return rd.from_pandas(out.sort_values("key")
                              .reset_index(drop=True))

    from ray.data.aggregate import Max, Sum

    def onehot(t: pa.Table) -> pa.Table:
        side = t["side"]
        inv = pc.subtract(1, side)
        return (t.append_column("na", inv)
                 .append_column("nb", side)
                 .append_column("ha", pc.multiply(t["h"], inv))
                 .append_column("hb", pc.multiply(t["h"], side)))

    agg = (a.union(b)
            .map_batches(onehot, batch_format="pyarrow",
                         zero_copy_batch=True)
            .groupby("key")
            .aggregate(Sum("na"), Sum("nb"), Max("ha"), Max("hb"))
            # coalesce schema-less empties; width ∝ the key universe
            .repartition(agg_partitions))

    def classify(t: pa.Table) -> pa.Table:
        n_a = t["sum(na)"].to_numpy(zero_copy_only=False)
        n_b = t["sum(nb)"].to_numpy(zero_copy_only=False)
        h_a = t["max(ha)"].to_numpy(zero_copy_only=False)
        h_b = t["max(hb)"].to_numpy(zero_copy_only=False)
        return pa.Table.from_pydict({
            "key": t["key"],
            "status": pa.array(_classify_np(n_a, n_b, h_a, h_b),
                               pa.string())})

    return agg.map_batches(classify, batch_format="pyarrow",
                           zero_copy_batch=True)


def snapshot_diff_summary(ds_a, ds_b, *, key_col: str = "doc_id",
                          text_col: str = "text",
                          mode: str = "auto") -> pa.Table:
    """→ one row per status with its count (bounded rollup)."""
    d = snapshot_diff(ds_a, ds_b, key_col=key_col, text_col=text_col,
                      mode=mode)

    def partial(t: pa.Table) -> pa.Table:
        u, c = np.unique(t["status"].to_numpy(zero_copy_only=False),
                         return_counts=True)
        return pa.Table.from_pydict({
            "status": pa.array(u.astype(str)),
            "c": pa.array(c.astype(np.int64))})

    pdf = d.map_batches(partial, batch_format="pyarrow").to_pandas()
    g = (pdf.groupby("status")["c"].sum().sort_index()
         if len(pdf) else pd.Series(dtype=np.int64))
    return pa.Table.from_pydict({
        "status": list(g.index),
        "n_docs": [int(v) for v in g.to_numpy()]})
