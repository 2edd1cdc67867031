"""Keyed-window execution helper: vectorized per-key sweeps without
per-key Python.

``groupby(key).map_groups(fn)`` pays one Python/pandas invocation per
DISTINCT key — hundreds of millions of interpreter calls at corpus scale
for per-user windows. This helper keeps the same keyed-shuffle semantics
but hash-buckets the key first and calls ``fn`` once per BUCKET: the
callable sees whole groups (every row of a key lands in exactly one
bucket), sorts by (key, ts) inside the bucket, and computes diffs /
sessions / rolling windows / as-of merges vectorized with group-boundary
masks. Python invocations drop from O(#keys) to O(n_buckets); bucket
count scales with cluster size, data per bucket with 1/n_buckets.

Reference shape: the per-booking overlap/ordering sweeps
(cerberus/models/booking.py:72-83) — partition by key, order by time
within the key.
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import pandas as pd
import pyarrow as pa

from ..determinism import splitmix64

_BUCKET = "__kw_bucket"


#: auto-sizing target: rows per bucket ≈ one kernel invocation's heap
#: residency. 200k rows × ~100 B ≈ 20 MB — comfortably inside a worker
#: heap while keeping kernel-call overhead amortized.
_TARGET_ROWS_PER_BUCKET = 200_000
#: floor keeps every core of a small cluster busy; cap bounds the
#: shuffle partition count (beyond ~4096 the per-partition fixed cost
#: dominates at any realistic block size)
_MIN_BUCKETS, _MAX_BUCKETS = 16, 4096


def auto_buckets(n_rows: int,
                 target_rows_per_bucket: int = _TARGET_ROWS_PER_BUCKET) -> int:
    """Bucket count for a keyed sweep over ``n_rows`` rows: scales
    linearly with input (the 100-TB lever), clamped to [16, 4096]."""
    want = -(-max(n_rows, 1) // max(target_rows_per_bucket, 1))
    return int(min(_MAX_BUCKETS, max(_MIN_BUCKETS, want)))


def keyed_apply(ds, key_col: str, fn: Callable[[pd.DataFrame], pd.DataFrame],
                *, n_buckets: int | None = None, n_rows_hint: int = 0):
    """Apply ``fn`` (a vectorized multi-group pandas kernel) to every
    hash bucket of ``key_col``. ``fn`` receives a DataFrame holding all
    rows of every key in the bucket (unordered — the kernel sorts) and
    returns any DataFrame; bucket outputs are concatenated.

    Sizing: one bucket is one kernel invocation AND one shuffle
    partition, so ``n_buckets ≈ total_rows / rows_per_call`` where
    rows_per_call fits a worker's heap (and ≥ cluster cores to keep every
    worker busy). With ``n_buckets=None`` (the default) the count is
    auto-sized via :func:`auto_buckets` from ``n_rows_hint`` if given,
    else ``ds.count()`` — thread the hint when the input is a computed
    lineage (count() re-executes it; parquet-scan counts are metadata).
    Iterative callers should size ONCE outside their loop and pass the
    explicit count. A single pathologically hot key still lands in one
    bucket — inherent to whole-key window semantics (the same skew
    bound any engine's window partitioning has)."""
    if n_buckets is None:
        # free metadata path first (parquet footers / materialized
        # blocks); count() as last resort — it executes a computed
        # lineage once just for sizing
        from ..scale import dataset_rows_hint

        n = n_rows_hint if n_rows_hint > 0 else dataset_rows_hint(ds)
        n_buckets = auto_buckets(n if n > 0 else ds.count())

    def add_bucket(b: pa.Table) -> pa.Table:
        k = b[key_col].to_numpy(zero_copy_only=False)
        if k.dtype.kind in "iu":
            h = splitmix64(k.astype(np.uint64))
        else:
            from ..determinism import hash_strings

            h = hash_strings(np.asarray(k, dtype=object))
        bucket = (h % np.uint64(n_buckets)).astype(np.int64)
        return b.append_column(_BUCKET, pa.array(bucket))

    bucketed = ds.map_batches(add_bucket, batch_format="pyarrow",
                              zero_copy_batch=True)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        return fn(g.drop(columns=[_BUCKET]))

    return bucketed.groupby(_BUCKET).map_groups(per_bucket,
                                                batch_format="pandas")


def group_boundary_mask(keys: pd.Series) -> np.ndarray:
    """True at the first row of each key run (input sorted by key)."""
    return keys.ne(keys.shift()).to_numpy()


def bucket_runs(bucket: np.ndarray, key: np.ndarray, *cols: np.ndarray):
    """Shared bucket-index scaffold for the vectorized pair kernels
    (MinHash / SimHash / embedding near-dup): lexsort by (bucket, key),
    drop duplicate (bucket, key) rows, index the bucket runs.

    → (key_sorted, cols_sorted tuple, starts, counts); rows of one
    bucket are contiguous, keys ascending within the bucket (so pair
    (i < j) ⇒ key_i < key_j after the dedup)."""
    order = np.lexsort((key, bucket))
    bucket, key = bucket[order], key[order]
    out = tuple(c[order] for c in cols)
    keep = np.ones(len(bucket), dtype=bool)
    keep[1:] = ~((bucket[1:] == bucket[:-1]) & (key[1:] == key[:-1]))
    bucket, key = bucket[keep], key[keep]
    out = tuple(c[keep] for c in out)
    _, starts, counts = np.unique(bucket, return_index=True,
                                  return_counts=True)
    return key, out, starts, counts


def bucket_pair_indices(starts: np.ndarray, counts: np.ndarray,
                        cap: int) -> tuple:
    """All intra-bucket (i < j) index pairs for buckets with
    2 ≤ size ≤ cap, expanded per distinct bucket SIZE (Python iterates
    over sizes, not buckets). → (ii, jj) global row indices."""
    II: list = []
    JJ: list = []
    small = (counts >= 2) & (counts <= cap)
    for s in np.unique(counts[small]):
        st = starts[small & (counts == s)]
        idx = st[:, None] + np.arange(int(s))
        iu, ju = np.triu_indices(int(s), 1)
        II.append(idx[:, iu].ravel())
        JJ.append(idx[:, ju].ravel())
    if not II:
        return (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64))
    return np.concatenate(II), np.concatenate(JJ)
