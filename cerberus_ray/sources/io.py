"""Storage adapter: Lance when available, Parquet otherwise.

The north_rule targets Lance-backed tables; this sandbox has no pylance, so
the adapter resolves at import time and everything runs on Parquet with an
identical logical schema (SURVEY.md §7 step 0). Reads always push column
pruning (and, for parquet, row-group predicate filters) into the scan —
"prune at the read".
"""

from __future__ import annotations

from typing import Optional, Sequence

import ray.data as rd

try:  # pragma: no cover - not installed in this sandbox
    import lance  # noqa: F401

    HAVE_LANCE = True
except ImportError:
    HAVE_LANCE = False


#: Target bytes per input block when sizing reads by data volume.
_TARGET_BLOCK_BYTES = 8 << 20


def _size_blocks(path: str) -> Optional[int]:
    """Blocks ∝ data, not CPUs: Ray's default read parallelism follows
    the cluster CPU count, which over-splits small inputs (64 blocks for
    a 5 MB file ⇒ ~13 ms fixed cost per block per execution dominates).
    Estimate block count from the input's byte size at
    ``_TARGET_BLOCK_BYTES``/block with a floor of 8; return None (defer
    to Ray) for large inputs or unreadable paths — at scale Ray's
    row-group-based splitting is already proportional to data."""
    import os

    try:
        if os.path.isdir(path):
            # recursive: partitioned outputs nest key=value directories —
            # counting only top-level files would undercount and pin a
            # large dataset to the floor block count
            size = 0
            for root, _, files in os.walk(path):
                for f in files:
                    size += os.path.getsize(os.path.join(root, f))
                    if size >= 64 * _TARGET_BLOCK_BYTES:
                        return None  # big enough — defer to Ray early
        else:
            size = os.path.getsize(path)
    except OSError:
        return None
    est = max(8, -(-size // _TARGET_BLOCK_BYTES))
    return est if est < 64 else None


def read_table(path: str, *, columns: Optional[Sequence[str]] = None,
               filter=None, **kwargs) -> "rd.Dataset":
    """Read a logical table as a Ray Dataset with column/predicate pushdown."""
    if HAVE_LANCE and path.endswith(".lance"):  # pragma: no cover
        return rd.read_lance(path, columns=list(columns) if columns else None,
                             **kwargs)
    if "override_num_blocks" not in kwargs:
        est = _size_blocks(path)
        if est is not None:
            kwargs["override_num_blocks"] = est
    return rd.read_parquet(path, columns=list(columns) if columns else None,
                           filter=filter, **kwargs)


def read_jsonl(path: str, *, columns: Optional[Sequence[str]] = None,
               schema=None, **kwargs) -> "rd.Dataset":
    """Read newline-delimited JSON as a Ray Dataset with the same logical
    schema contract as ``read_table``.

    JSON has no footer statistics, so column pruning cannot be pushed
    into the scan the way parquet row-group pruning can — the projection
    runs as a ``select_columns`` immediately after the read (each block
    drops the extra columns before anything downstream sees it). For
    scale work prefer parquet/lance inputs; JSONL is the common EXCHANGE
    format for web-scraped corpora, supported so those land directly.

    ``schema`` (a ``pyarrow.Schema``) is applied as a post-read cast so
    type drift in the text representation (e.g. ints parsed as strings)
    surfaces at read time, not deep in a pipeline.
    """
    ds = rd.read_json(path, **kwargs)
    if columns is not None:
        ds = ds.select_columns(list(columns))
    if schema is not None:
        import pyarrow as pa

        target = schema

        def cast(batch: "pa.Table") -> "pa.Table":
            cols = [batch[f.name].cast(f.type) for f in target]
            return pa.Table.from_arrays(cols, schema=target)

        ds = ds.map_batches(cast, batch_format="pyarrow",
                            zero_copy_batch=True)
    return ds


def read_csv(path: str, *, columns: Optional[Sequence[str]] = None,
             schema=None, **kwargs) -> "rd.Dataset":
    """Read CSV as a Ray Dataset (same contract as ``read_jsonl``:
    post-read projection + optional schema cast; prefer parquet/lance
    for scale — CSV exists as an ingestion format)."""
    ds = rd.read_csv(path, **kwargs)
    if columns is not None:
        ds = ds.select_columns(list(columns))
    if schema is not None:
        import pyarrow as pa

        target = schema

        def cast(batch: "pa.Table") -> "pa.Table":
            cols = [batch[f.name].cast(f.type) for f in target]
            return pa.Table.from_arrays(cols, schema=target)

        ds = ds.map_batches(cast, batch_format="pyarrow",
                            zero_copy_batch=True)
    return ds


def write_table(ds: "rd.Dataset", path: str, **kwargs) -> None:
    """Write a Dataset as a directory of files (resumable layout: the caller
    picks one directory per partition/fragment; see state.checkpoint)."""
    if HAVE_LANCE and path.endswith(".lance"):  # pragma: no cover
        ds.write_lance(path, **kwargs)
        return
    ds.write_parquet(path, **kwargs)


def write_partitioned(ds: "rd.Dataset", path: str, by, **kwargs) -> None:
    """Hive-partitioned parquet write (``path/col=value/…``) — the
    resumable/prunable sink layout: a rerun can skip finished partition
    directories, and :func:`read_table` over the root pushes partition
    filters into directory pruning (tested). ``by`` is a column name or
    list of names; prefer bounded-cardinality keys (source, lang, date
    bucket) — one directory per distinct tuple."""
    cols = [by] if isinstance(by, str) else list(by)
    ds.write_parquet(path, partition_cols=cols, **kwargs)
