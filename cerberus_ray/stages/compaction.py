"""Small-file compaction for partitioned parquet layouts.

Streaming writers (the engine's partitioned sink, incremental appends,
failed-run retries) accumulate many small files per partition; at scale
the scan cost becomes footer-count-bound, not byte-bound (1 M × 1 MB
files is unreadable even when 1 TB of data is fine). Compaction rewrites
each partition's files into ~``target_rows_per_file``-row files — the
`OPTIMIZE`/`rewrite_data_files` maintenance step of lakehouse engines.

Shape:
- planning is FOOTER-ONLY: file row counts come from parquet metadata,
  never a data scan.
- the unit of work is one PARTITION (bounded cardinality by design —
  the partitioned sink documents the same constraint): each partition
  compacts as an independent streamed read → repartition → write, so a
  failed run resumes by skipping partitions that already carry a
  ``_SUCCESS`` marker. On a multi-node cluster the independent
  partitions would be submitted concurrently; the loop here is driver
  ORCHESTRATION, not driver data movement.
- no exchange: ``repartition(shuffle=False)`` only splits/coalesces
  blocks, so rows never cross the network beyond the read itself.
"""

from __future__ import annotations

import os
from typing import List, Optional, Tuple

import pyarrow as pa

__all__ = ["plan_compaction", "compact_dataset"]

_MARKER = "_COMPACT_SUCCESS"


def _partitions(root: str) -> List[Tuple[str, List[str]]]:
    """→ sorted [(relative partition dir, parquet files)] under root."""
    groups = {}
    for dirpath, _, files in os.walk(root):
        pq_files = sorted(os.path.join(dirpath, f) for f in files
                          if f.endswith(".parquet"))
        if pq_files:
            groups[os.path.relpath(dirpath, root)] = pq_files
    return sorted(groups.items())


def plan_compaction(path: str, *, target_rows_per_file: int
                    ) -> List[dict]:
    """Footer-only plan: per partition — file count, total rows, and the
    output file count ``ceil(rows / target)``."""
    import pyarrow.parquet as pq

    plan = []
    for rel, files in _partitions(path):
        rows = sum(pq.ParquetFile(f).metadata.num_rows for f in files)
        plan.append({
            "partition": rel, "files_before": len(files), "rows": rows,
            "files_target": max(1, -(-rows // target_rows_per_file)),
        })
    return plan


def compact_dataset(path: str, out_path: str, *,
                    target_rows_per_file: int = 1_000_000,
                    sort_by: Optional[List[str]] = None,
                    resume: bool = True) -> pa.Table:
    """Compact every partition under ``path`` into ``out_path`` (same
    relative partition layout) and return the summary table
    (partition, files_before, files_after, rows, skipped).

    ``sort_by`` additionally clusters each partition's rows on the given
    columns while rewriting (lakehouse ``CLUSTER BY``): the sort is an
    exchange scoped to ONE partition at a time, and the payoff is tight
    per-file/row-group statistics on the sort columns — range scans over
    the compacted layout prune (measure with
    `layout.rowgroups_overlapping`). For multi-COLUMN locality in one
    layout use `layout.zorder_sort` instead.

    ``resume=True`` skips partitions whose output already carries the
    success marker — rerunning after a failure redoes only unfinished
    partitions. Output rows per partition are verified against the
    planned footer count before the marker is written, so a partial
    write can never be mistaken for a finished partition.
    """
    from ..sources.io import read_table

    rows_out = {"partition": [], "files_before": [], "files_after": [],
                "rows": [], "skipped": []}
    for item in plan_compaction(path,
                                target_rows_per_file=target_rows_per_file):
        rel = item["partition"]
        dst = out_path if rel == "." else os.path.join(out_path, rel)
        marker = os.path.join(dst, _MARKER)
        skipped = resume and os.path.exists(marker)
        if not skipped:
            import shutil

            shutil.rmtree(dst, ignore_errors=True)
            src_dir = path if rel == "." else os.path.join(path, rel)
            ds = read_table(src_dir)
            if sort_by:
                ds = ds.sort(sort_by)
            ds.repartition(item["files_target"]).write_parquet(dst)
            import pyarrow.parquet as pq

            written = sum(
                pq.ParquetFile(os.path.join(dst, f)).metadata.num_rows
                for f in os.listdir(dst) if f.endswith(".parquet"))
            if written != item["rows"]:
                raise RuntimeError(
                    f"compaction of {rel!r} wrote {written} rows, "
                    f"expected {item['rows']}")
            open(marker, "w").write("ok")
        n_after = sum(f.endswith(".parquet") for f in os.listdir(dst))
        rows_out["partition"].append(rel)
        rows_out["files_before"].append(item["files_before"])
        rows_out["files_after"].append(n_after)
        rows_out["rows"].append(item["rows"])
        rows_out["skipped"].append(bool(skipped))
    return pa.Table.from_pydict({
        "partition": pa.array(rows_out["partition"], pa.string()),
        "files_before": pa.array(rows_out["files_before"], pa.int64()),
        "files_after": pa.array(rows_out["files_after"], pa.int64()),
        "rows": pa.array(rows_out["rows"], pa.int64()),
        "skipped": pa.array(rows_out["skipped"], pa.bool_()),
    })
