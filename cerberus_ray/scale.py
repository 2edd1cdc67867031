"""Shared parallelism sizing for the beyond-driver-memory paths.

Every hash-exchange knob in the engine (join partition counts,
post-aggregate coalesce widths, keyed-apply bucket counts) must scale
with the DATA, not sit at a constant — a fixed 8-partition exchange is
invisible at benchmark scale and a serialization point at 10^9 rows.
The formulas here are deliberately coarse (powers matter, constants
don't): ~2M rows per join partition keeps a partition's build side in a
worker heap, and the clamps bound scheduler overhead on tiny inputs and
partition-metadata overhead on huge ones.
"""

from __future__ import annotations


def join_partitions(n_rows: int) -> int:
    """Hash-join exchange partitions ∝ the larger input's rows
    (~2M rows/partition), clamped to [8, 1024]."""
    return int(min(1024, max(8, n_rows // 2_000_000 + 1)))


def fact_join_partitions(sf_dir: str, table: str) -> int:
    """Join partitions ∝ a named fact table's parquet-footer row count."""
    return join_partitions(table_nrows(f"{sf_dir}/{table}.parquet"))


def dataset_rows_hint(ds) -> int:
    """Free row-count hint for a Ray Dataset: metadata only (parquet
    footers / already-materialized blocks), NEVER executes lineage —
    returns 0 for unknown so callers fall back to their other sizing
    input. The one shared home for this probe (it touches a private
    Ray API that may drift)."""
    try:
        n = ds._meta_count()
        return int(n) if n else 0
    except Exception:
        return 0


def table_nrows(path: str) -> int:
    """Row count from a parquet file/directory footer — free (metadata
    only, no scan). Returns 0 when unreadable; callers treat 0 as
    'unknown' and fall back to their floor."""
    import os

    import pyarrow.parquet as pq

    try:
        if os.path.isdir(path):
            total = 0
            for root, _, files in os.walk(path):
                for f in files:
                    if f.endswith(".parquet"):
                        total += pq.read_metadata(
                            os.path.join(root, f)).num_rows
            return total
        return pq.read_metadata(path).num_rows
    except Exception:
        return 0
