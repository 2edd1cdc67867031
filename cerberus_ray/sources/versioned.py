"""Versioned parquet table — a minimal commit-log layout giving
snapshot-isolated reads, time travel, and vacuum over a directory of
parquet files (the transactional core of lakehouse table formats,
reduced to what a single-writer pipeline needs).

Layout::

    root/
      data/v<N>/*.parquet      one immutable directory per commit
      _manifests/v<N>.json     {"version", "mode", "files", "rows"}

Invariants:
- DATA FILES ARE IMMUTABLE and a commit's directory is written BEFORE
  its manifest: a reader resolves the latest manifest and reads exactly
  the files it lists, so a crashed or in-flight writer is invisible
  (its data directory exists but no manifest references it).
- the manifest is claimed with ``open(path, "x")`` — an atomic
  create-exclusive, so two writers racing to the same version number
  fail loudly instead of corrupting history (optimistic concurrency,
  single-winner).
- ``append`` manifests reference the previous manifest's files plus the
  new directory; ``overwrite`` references only the new directory. Either
  way a manifest is a complete self-contained snapshot — time travel is
  "read the file list of manifest N".
- ``vacuum`` deletes data files referenced by NO retained manifest —
  the only operation that removes anything, and it never touches files
  a retained snapshot can still reach.

Scale: manifests hold file PATHS (not footers), so a manifest is
O(#files) text; reads go through ``sources.io.read_table``-equivalent
``read_parquet`` on the explicit file list (column pruning and
predicate pushdown apply as usual). Footer row counts are collected at
commit time, footer-only.
"""

from __future__ import annotations

import json
import os
from typing import List, Optional

import pyarrow as pa

__all__ = ["VersionedTable"]


class VersionedTable:
    def __init__(self, root: str):
        self.root = root
        self._data = os.path.join(root, "data")
        self._man = os.path.join(root, "_manifests")
        os.makedirs(self._data, exist_ok=True)
        os.makedirs(self._man, exist_ok=True)

    # -- internals -------------------------------------------------------

    def _versions(self) -> List[int]:
        out = []
        for f in os.listdir(self._man):
            if f.startswith("v") and f.endswith(".json"):
                out.append(int(f[1:-len(".json")]))
        return sorted(out)

    def _manifest(self, version: int) -> dict:
        with open(os.path.join(self._man, f"v{version}.json")) as fh:
            return json.load(fh)

    def latest_version(self) -> Optional[int]:
        vs = self._versions()
        return vs[-1] if vs else None

    # -- write path -------------------------------------------------------

    def commit(self, ds, *, mode: str = "append") -> int:
        """Write ``ds`` as a new immutable commit → new version number.

        ``mode='append'`` adds to the current snapshot;
        ``'overwrite'`` replaces it. Raises if another writer claimed
        the same version (retry commits the NEXT version)."""
        if mode not in ("append", "overwrite"):
            raise ValueError(f"unknown commit mode: {mode!r}")
        prev = self.latest_version()
        version = 0 if prev is None else prev + 1
        vdir = os.path.join(self._data, f"v{version}")
        ds.write_parquet(vdir)
        new_files = sorted(
            os.path.join("data", f"v{version}", f)
            for f in os.listdir(vdir) if f.endswith(".parquet"))

        import pyarrow.parquet as pq

        new_rows = sum(
            pq.ParquetFile(os.path.join(self.root, f)).metadata.num_rows
            for f in new_files)
        if mode == "append" and prev is not None:
            base = self._manifest(prev)
            files = base["files"] + new_files
            rows = base["rows"] + new_rows
        else:
            files, rows = new_files, new_rows
        manifest = {"version": version, "mode": mode, "files": files,
                    "rows": rows}
        path = os.path.join(self._man, f"v{version}.json")
        try:
            with open(path, "x") as fh:  # atomic create-exclusive claim
                json.dump(manifest, fh)
        except FileExistsError:
            raise RuntimeError(
                f"version {version} was committed concurrently; "
                f"retry to commit as version {version + 1}") from None
        return version

    # -- read path ----------------------------------------------------------

    def read(self, version: Optional[int] = None, *, columns=None,
             filter=None):
        """→ Ray Dataset of snapshot ``version`` (default: latest).
        Reads exactly the manifest's file list — concurrent/crashed
        writers are invisible."""
        import ray.data as rd

        if version is None:
            version = self.latest_version()
        if version is None or version not in self._versions():
            raise ValueError(f"no such version: {version!r}")
        m = self._manifest(version)
        paths = [os.path.join(self.root, f) for f in m["files"]]
        if not paths:
            return rd.from_arrow(pa.table({}))
        return rd.read_parquet(
            paths, columns=list(columns) if columns else None,
            filter=filter)

    def history(self) -> pa.Table:
        """→ (version, mode, n_files, rows) per committed snapshot."""
        rows = [self._manifest(v) for v in self._versions()]
        return pa.Table.from_pydict({
            "version": pa.array([m["version"] for m in rows], pa.int64()),
            "mode": pa.array([m["mode"] for m in rows], pa.string()),
            "n_files": pa.array([len(m["files"]) for m in rows],
                                pa.int64()),
            "rows": pa.array([m["rows"] for m in rows], pa.int64()),
        })

    # -- table-format composition ------------------------------------------

    def diff(self, version_a: int, version_b: int, *,
             key_col: str, content_col: str, mode: str = "auto"):
        """Change-data feed between two snapshots → Dataset
        (key, status ∈ {added, removed, changed, unchanged}) — the
        versioned-table face of `pipelines.snapshot_diff` (keys must be
        unique per snapshot, the exact-dedup invariant)."""
        from ..pipelines.snapshot_diff import snapshot_diff

        return snapshot_diff(
            self.read(version_a, columns=[key_col, content_col]),
            self.read(version_b, columns=[key_col, content_col]),
            key_col=key_col, text_col=content_col, mode=mode)

    def merge_commit(self, changes_ds, key: str, *,
                     op_col: Optional[str] = None,
                     version_col: Optional[str] = None,
                     mode: str = "auto") -> int:
        """MERGE a change set into the latest snapshot and commit the
        result as a new OVERWRITE version (upserts replace/insert,
        deletes tombstone — `pipelines.merge.merge_upsert` semantics).
        Time travel still reaches the pre-merge snapshot."""
        from ..pipelines.merge import merge_upsert

        merged = merge_upsert(self.read(), changes_ds, key,
                              op_col=op_col, version_col=version_col,
                              mode=mode)
        return self.commit(merged, mode="overwrite")

    # -- maintenance -------------------------------------------------------

    def vacuum(self, *, keep_last: int = 1) -> List[str]:
        """Drop manifests older than the last ``keep_last`` and delete
        data files no retained snapshot references. → deleted files."""
        if keep_last < 1:
            raise ValueError("keep_last must be >= 1")
        vs = self._versions()
        keep, drop = vs[-keep_last:], vs[:-keep_last]
        referenced = set()
        for v in keep:
            referenced.update(self._manifest(v)["files"])
        deleted = []
        for dirpath, _, names in os.walk(self._data):
            for f in names:
                if not f.endswith(".parquet"):
                    continue
                rel = os.path.relpath(os.path.join(dirpath, f), self.root)
                if rel not in referenced:
                    os.remove(os.path.join(self.root, rel))
                    deleted.append(rel)
        for v in drop:
            os.remove(os.path.join(self._man, f"v{v}.json"))
        return sorted(deleted)
