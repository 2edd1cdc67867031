"""Bucketed storage layout + co-located (shuffle-free) joins.

The Spark/Hive bucketing contract: pay the hash exchange ONCE at write
time — every row lands in the hive partition ``bucket=h(key) % n`` —
and every subsequent equi-join between two tables bucketed the same way
(same key hash, same bucket count) needs NO shuffle: bucket i of A can
only match bucket i of B, so the join is n independent co-located
merges, each reading exactly two partition directories. On a repeated-
join workload (fact tables re-joined every run) this converts the
dominant all-to-all into a one-time cost.

A ``_bucket_manifest.json`` records (key, n_buckets, hash) per layout;
``bucketed_join`` refuses mismatched layouts — joining across different
bucket functions silently drops rows, which must be loud.

Per-bucket joins run as one Ray task per bucket (``ray.remote``, not a
Dataset join — this is precisely the "co-located state the Dataset API
can't express" case: n independent read→merge units with no exchange);
results stream back as Arrow refs into a Dataset without driver
materialization.
"""

from __future__ import annotations

import json
import os
from typing import List, Optional

import numpy as np
import pyarrow as pa

from ..determinism import hash_strings, splitmix64

_MANIFEST = "_bucket_manifest.json"


class BucketLayoutMismatch(ValueError):
    pass


def _bucket_of(arr: np.ndarray, n_buckets: int) -> np.ndarray:
    if arr.dtype.kind in "iu":
        h = splitmix64(arr.astype(np.uint64))
    else:
        h = hash_strings(np.asarray(arr, dtype=object))
    return (h % np.uint64(n_buckets)).astype(np.int64)


def write_bucketed(ds, path: str, key: str, *, n_buckets: int = 16) -> str:
    """Hash-bucket ``ds`` by ``key`` into hive partitions
    ``bucket=0..n-1`` under ``path`` + manifest. The one exchange this
    layout ever pays."""
    def tag(b: pa.Table) -> pa.Table:
        k = b[key].to_numpy(zero_copy_only=False)
        return b.append_column(
            "bucket", pa.array(_bucket_of(k, n_buckets), pa.int64()))

    os.makedirs(path, exist_ok=True)
    (ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
       .write_parquet(path, partition_cols=["bucket"]))
    with open(os.path.join(path, _MANIFEST), "w") as f:
        json.dump({"key": key, "n_buckets": n_buckets,
                   "hash": "splitmix64|fnv-strings"}, f)
    return path


def _read_manifest(path: str) -> dict:
    with open(os.path.join(path, _MANIFEST)) as f:
        return json.load(f)


def bucketed_join(path_a: str, path_b: str, *, how: str = "inner",
                  suffix_b: str = "_b",
                  columns_a: Optional[List[str]] = None,
                  columns_b: Optional[List[str]] = None):
    """Shuffle-free equi-join of two same-layout bucketed tables →
    Dataset. Each bucket is one Ray task: read the two partition dirs
    (column-pruned), one vectorized pandas merge, emit Arrow. Only
    ``inner`` and ``left`` joins (the co-located-safe kinds; a right/
    full join is the same call with the sides swapped)."""
    import ray
    import ray.data as rd

    import pyarrow.parquet as pq

    ma, mb = _read_manifest(path_a), _read_manifest(path_b)
    if (ma["n_buckets"], ma["hash"]) != (mb["n_buckets"], mb["hash"]):
        raise BucketLayoutMismatch(
            f"layouts differ: {ma} vs {mb} — re-bucket one side")
    if how not in ("inner", "left"):
        raise ValueError(f"how must be inner|left, got {how!r}")
    key_a, key_b, n = ma["key"], mb["key"], ma["n_buckets"]
    join_type = "inner" if how == "inner" else "left outer"

    def _side_schema(root, cols):
        """Footer schema of the first existing bucket (all buckets share
        one write-time schema), pruned to ``cols``."""
        for i in range(n):
            d = os.path.join(root, f"bucket={i}")
            if os.path.isdir(d):
                for f in sorted(os.listdir(d)):
                    if f.endswith(".parquet"):
                        s = pq.read_schema(os.path.join(d, f))
                        if cols:
                            s = pa.schema([(c, s.field(c).type)
                                           for c in cols])
                        return s
        return None

    sa = _side_schema(path_a, columns_a)
    sb = _side_schema(path_b, columns_b)
    if sa is None:
        return rd.from_items([])       # empty left side ⇒ empty join
    if sb is None:
        if how == "left":
            raise ValueError(
                "left join against an empty bucketed table: the right "
                "schema is unknowable (no files) — write it first")
        return rd.from_items([])

    @ray.remote
    def join_bucket(i: int) -> pa.Table:
        import pyarrow.parquet as pqt

        def load(root, cols, schema):
            d = os.path.join(root, f"bucket={i}")
            if not os.path.isdir(d):
                return schema.empty_table()
            return pqt.read_table(d, columns=list(schema.names))

        a = load(path_a, columns_a, sa)
        b = load(path_b, columns_b, sb)
        # typed acero join — no pandas dtype forking across buckets
        return a.join(b, keys=key_a, right_keys=key_b,
                      join_type=join_type, right_suffix=suffix_b)

    # results stay in the object store — the driver holds only refs
    refs = [join_bucket.remote(i) for i in range(n)]
    return rd.from_arrow_refs(refs)


def bucketed_groupby(path: str, aggs: dict, *,
                     columns: Optional[List[str]] = None):
    """Shuffle-free grouped aggregation over a bucketed layout: every
    row of a key lives in one bucket, so a per-bucket pyarrow hash
    aggregate is already GLOBALLY exact — no merge step, no exchange,
    unlike the map-side-partial + driver-merge plan the un-bucketed
    tables need (``groupagg.grouped_agg``). One Ray task per bucket;
    → Dataset of final (key, agg...) rows.

    ``aggs`` maps output column → (input column, fn) with fn ∈
    {count, sum, mean, min, max} (count ignores its input column)."""
    import ray
    import ray.data as rd

    m = _read_manifest(path)
    key, n = m["key"], m["n_buckets"]
    pa_aggs, renames = [], {}
    for out_col, (col, fn) in aggs.items():
        if fn == "count":
            pa_aggs.append(([], "count_all"))
            renames["count_all"] = out_col
        elif fn in ("sum", "mean", "min", "max"):
            pa_aggs.append((col, fn))
            renames[f"{col}_{fn}"] = out_col
        else:
            raise ValueError(f"unsupported agg {fn!r}")

    import pyarrow.parquet as pq

    # driver-side footer schema (all buckets share the write schema) —
    # lets empty/missing buckets emit typed empties so refs stream
    # straight into a Dataset without a driver get
    schema = None
    for i in range(n):
        d = os.path.join(path, f"bucket={i}")
        if os.path.isdir(d):
            for f in sorted(os.listdir(d)):
                if f.endswith(".parquet"):
                    schema = pq.read_schema(os.path.join(d, f))
                    break
        if schema is not None:
            break
    if schema is None:
        return rd.from_items([])
    if columns:
        cols = ([key] if key not in columns else []) + list(columns)
        schema = pa.schema([(c, schema.field(c).type) for c in cols])

    @ray.remote
    def agg_bucket(i: int) -> pa.Table:
        import pyarrow.parquet as pqt

        d = os.path.join(path, f"bucket={i}")
        t = (pqt.read_table(d, columns=list(schema.names))
             if os.path.isdir(d) else schema.empty_table())
        out = t.group_by(key).aggregate(pa_aggs)
        return out.rename_columns(
            [renames.get(c, c) for c in out.column_names])

    return rd.from_arrow_refs([agg_bucket.remote(i) for i in range(n)])
