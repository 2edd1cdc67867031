"""MERGE / upsert: apply a change set onto a key-unique base dataset —
the incremental-corpus maintenance primitive (SQL ``MERGE INTO`` with
matched-update / not-matched-insert / matched-delete semantics).

Semantics: the output holds, per key, the WINNING row — a change row
beats the base row; among several change rows for one key the highest
``version_col`` wins (required when change keys repeat; ties are an
error surfaced by the kernel, not silently resolved). A change row
whose ``op_col`` value is ``'delete'`` tombstones the key. Base must be
key-unique (same contract as ``snapshot_diff``).

Execution planner:

- ``broadcast`` (small change sets — the common incremental delta):
  the change set collects once to the driver, the winning row per key
  is resolved there, and the base STREAMS through one filter pass with
  the O(#changes) key set broadcast via ``ray.put``; winners append as
  their own blocks. Base is never shuffled, never materialized.
- ``shuffle`` (change sets beyond driver memory): both sides tag and
  union, one ``keyed_apply`` hash exchange co-locates each key's rows,
  and a vectorized kernel picks winners per bucket.

Both modes return a streaming Dataset with the base's columns.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np
import pandas as pd

import ray

__all__ = ["merge_upsert"]

_TAG = "__merge_side"
DELETE = "delete"


def _winners(ch: pd.DataFrame, key: str, op_col: Optional[str],
             version_col: Optional[str]) -> pd.DataFrame:
    """One winning change row per key (highest version; duplicate keys
    without a version column, or version ties, raise)."""
    if version_col is not None:
        mx = ch.groupby(key)[version_col].transform("max")
        # a key whose versions are ALL null: a single row is an
        # unambiguous winner; several rows are an unresolvable tie
        nullmax = mx.isna()
        top = ch[(ch[version_col] == mx) | nullmax]
        if top.duplicated(key).any():
            raise ValueError("unresolvable version tie in change set")
        return top
    elif ch[key].duplicated().any():
        raise ValueError(
            "change set repeats keys; pass version_col to resolve")
    return ch


def merge_upsert(base_ds, changes_ds, key: str, *,
                 op_col: Optional[str] = None,
                 version_col: Optional[str] = None,
                 mode: str = "auto", n_buckets: int = 32):
    """→ Dataset: base with the change set applied (upserts replace /
    insert, deletes tombstone). Output column set = base's columns."""
    base_cols: List[str] = base_ds.schema().names

    if mode == "auto":
        mode = "broadcast" if changes_ds.count() <= 2_000_000 else "shuffle"

    if mode == "broadcast":
        ch = changes_ds.to_pandas()
        if not len(ch):  # empty Dataset loses its schema in to_pandas
            return base_ds
        ch = _winners(ch, key, op_col, version_col)
        if op_col is not None:
            inserts = ch[ch[op_col] != DELETE]
        else:
            inserts = ch
        touched = ray.put(set(ch[key].tolist()))

        def drop_touched(df: pd.DataFrame) -> pd.DataFrame:
            t = ray.get(touched)
            return df[~df[key].isin(t)]

        kept = base_ds.map_batches(drop_touched, batch_format="pandas")
        if not len(inserts):
            return kept
        import ray.data as rd

        ins = rd.from_pandas(inserts[base_cols].reset_index(drop=True))
        return kept.union(ins)

    if mode != "shuffle":
        raise ValueError(f"unknown mode {mode!r}")

    from ..stages.keyed_window import keyed_apply

    aux = ([op_col] if op_col else []) + ([version_col] if version_col
                                          else [])

    def tag(side: int, cols: List[str]):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            out = df[cols].copy()
            for c in aux:
                if c not in out.columns:
                    out[c] = None
            out[_TAG] = np.int8(side)
            return out
        return fn

    u = (base_ds.map_batches(tag(0, base_cols), batch_format="pandas")
         .union(changes_ds.map_batches(
             tag(1, base_cols + [c for c in aux
                                 if c not in base_cols]),
             batch_format="pandas")))

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        ch = g[g[_TAG] == 1]
        if len(ch):
            ch = _winners(ch, key, op_col, version_col)
            if op_col is not None:
                ch = ch[ch[op_col] != DELETE]
        keep_base = g[(g[_TAG] == 0)
                      & ~g[key].isin(set(g.loc[g[_TAG] == 1, key]))]
        out = pd.concat([keep_base, ch], ignore_index=True)
        return out[base_cols]

    return keyed_apply(u, key, kernel, n_buckets=n_buckets)
