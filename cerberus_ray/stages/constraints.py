"""Cross-row dataset constraints — functional dependency and per-key
ordering checks, emitting standard violation rows.

Two constraint classes the per-row rule families cannot express:

- ``functional_dependency_violations``: A → B (every value of the
  determinant column maps to exactly one dependent value — the
  denormalization-consistency check; e.g. nation → region, sku → unit
  price). Ray shape: per-block DISTINCT (A, B) pairs via one pyarrow
  hash-aggregate (the map-side combine — block output is bounded by the
  pair universe, not rows), then a driver merge (``mode='driver'``,
  right while distinct pairs fit) or a ``groupby(A)`` distinct-count
  shuffle that filters to violating determinants BEFORE collecting
  (``mode='shuffle'``). Violating keys broadcast back for the row-level
  violation pass, ∝ violation rate.
- ``monotonic_violations``: within each key, a sequence column must be
  non-decreasing (or strictly increasing) in a given order column —
  the event-stream sanity check (per-user timestamps, per-device
  counters). Ray shape: the `keyed_window.keyed_apply` exchange — one
  hash-bucketed keyed exchange, vectorized diff per bucket with
  group-boundary masks; no per-key Python.

Both are SQL-expressible (GROUP BY / LAG) — the parity tests compare
against DuckDB on the same frames.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from ..schema import VIOLATIONS

__all__ = ["functional_dependency_violations", "monotonic_violations"]


def functional_dependency_violations(ds, det_col: str, dep_col: str, *,
                                     key_col: str = "doc_id",
                                     mode: str = "driver",
                                     rule: str | None = None):
    """→ violations Dataset: one row per input row whose ``det_col``
    value maps to >1 distinct ``dep_col`` value corpus-wide."""
    if mode not in ("driver", "shuffle"):
        raise ValueError(f"unknown mode {mode!r}")
    rule = rule or f"fd-{det_col}->{dep_col}"

    def pairs(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        t = pa.Table.from_arrays(
            [pc.cast(b[det_col], pa.string()),
             pc.cast(b[dep_col], pa.string())], names=["a", "bb"])
        return t.group_by(["a", "bb"]).aggregate([])

    parts = ds.map_batches(pairs, batch_format="pyarrow",
                           zero_copy_batch=True)
    if mode == "driver":
        pdf = parts.to_pandas()
        if not len(pdf):
            bad = np.array([], dtype=object)
        else:
            nun = pdf.drop_duplicates().groupby("a")["bb"].nunique()
            bad = np.sort(nun[nun > 1].index.to_numpy(dtype=object))
    else:
        # distinct (a,b) pairs may recur across blocks: re-distinct on
        # the PAIR first, then count dependents per determinant; only
        # violating determinants are ever collected
        dedup = parts.groupby(["a", "bb"]).count()

        def drop_cnt(t: pa.Table) -> pa.Table:
            return t.select(["a"])

        merged = (dedup.map_batches(drop_cnt, batch_format="pyarrow")
                  .groupby("a").count())

        def only_bad(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc
            return t.filter(pc.greater(t["count()"], 1)).select(["a"])

        pdf = merged.map_batches(only_bad, batch_format="pyarrow") \
            .to_pandas()
        bad = (np.sort(pdf["a"].to_numpy(dtype=object))
               if "a" in pdf.columns and len(pdf)
               else np.array([], dtype=object))

    ref = ray.put(bad)

    def flag(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        bk = ray.get(ref)
        if not len(bk):
            return VIOLATIONS.empty_table()
        a = pc.cast(b[det_col], pa.string()).to_numpy(zero_copy_only=False)
        pos = np.clip(np.searchsorted(bk, a), 0, len(bk) - 1)
        hit = bk[pos] == a
        if not hit.any():
            return VIOLATIONS.empty_table()
        keys = pc.cast(b[key_col], pa.string()).to_numpy(
            zero_copy_only=False)[hit]
        dep = pc.cast(b[dep_col], pa.string()).to_numpy(
            zero_copy_only=False)[hit]
        det = a[hit]
        return pa.Table.from_arrays([
            pa.array(keys, pa.string()),
            pa.array(np.full(len(keys), rule, dtype=object), pa.string()),
            pa.array(np.full(len(keys), dep_col, dtype=object),
                     pa.string()),
            pa.array([f"{d!s} maps to multiple {dep_col} values "
                      f"(saw {v!s})" for d, v in zip(det, dep)],
                     pa.string())], schema=VIOLATIONS)

    return ds.map_batches(flag, batch_format="pyarrow",
                          zero_copy_batch=True)


def monotonic_violations(ds, key_col: str, order_col: str, value_col: str,
                         *, strict: bool = False, id_col: str = "doc_id",
                         rule: str | None = None, n_buckets: int = 8):
    """→ violations Dataset: one row per element whose ``value_col``
    decreases (or fails to strictly increase) relative to the previous
    element of the same ``key_col`` when ordered by ``order_col`` (ties
    broken by ``id_col`` for determinism)."""
    from .keyed_window import keyed_apply

    rule = rule or (f"monotonic-{value_col}-strict" if strict
                    else f"monotonic-{value_col}")

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key_col, order_col, id_col],
                            kind="mergesort").reset_index(drop=True)
        k = df[key_col].to_numpy()
        v = df[value_col].to_numpy()
        same = np.zeros(len(df), dtype=bool)
        same[1:] = k[1:] == k[:-1]
        prev = np.roll(v, 1)
        bad = same & ((v < prev) if not strict else (v <= prev))
        out = df.loc[bad, [id_col]].copy()
        out["rule"] = rule
        out["path"] = value_col
        pv = prev[bad]
        cv = v[bad]
        out["detail"] = [f"{c} after {p} within {key_col}"
                         for c, p in zip(cv, pv)]
        out = out.rename(columns={id_col: "doc_id"})
        out["doc_id"] = out["doc_id"].astype(str)
        return out[["doc_id", "rule", "path", "detail"]]

    return keyed_apply(ds, key_col, kernel, n_buckets=n_buckets)
