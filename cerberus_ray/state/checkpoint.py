"""Per-partition checkpoint / lineage / resume (north_rule).

Layout under a checkpoint root (works on any fsspec-able store; local dir
here):

    {root}/fragments/{fragment_id}.json      manifest: fragment id,
        rule-set hash, n_rows, n_violations, per-rule counts, run id
    {root}/violations/{fragment_id}.parquet  that fragment's violations
    {root}/global/{name}.json + .parquet     global (cross-fragment) rules
        — uniqueness/referential can't be fragment-local
    {root}/profile/baseline.json             drift baseline profile

Atomicity: parquet + manifest are written to a temp path then renamed;
the manifest rename is last, so a fragment is "completed" only when its
violations file is durable. A changed rule-set hash invalidates prior
checkpoints (the manifest carries the hash it was produced under) — the
reference analogue is rerunning validation after a migration changed the
constraints (cerberus/migrations/ versioning, SURVEY.md §1.2).

The reference's durability story is DB transactions + django-reversion
row history (cerberus/models/customer.py:61); here lineage is explicit:
each manifest records exactly which input fragment, under which rule-set,
produced which outputs.
"""

from __future__ import annotations

import json
import os
import tempfile
from typing import Dict, List, Optional, Set

import pyarrow as pa
import pyarrow.parquet as pq

from ..schema import VIOLATIONS


def _publish_tmp(tmp: str, path: str) -> None:
    """fsync + umask-honoring chmod + atomic rename: the durability the
    module docstring promises. Without the fsync, a crash after the
    rename can persist the manifest but not the data blocks — resume
    would then skip a fragment whose violations file is truncated.
    mkstemp creates 0600 files and os.replace preserves that, locking
    out other readers of a shared checkpoint root — restore the
    process-umask default."""
    fd = os.open(tmp, os.O_RDONLY)
    try:
        os.fsync(fd)
    finally:
        os.close(fd)
    umask = os.umask(0)
    os.umask(umask)
    os.chmod(tmp, 0o666 & ~umask)
    os.replace(tmp, path)


def _atomic_write_bytes(path: str, data: bytes) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=os.path.dirname(path))
    try:
        with os.fdopen(fd, "wb") as f:
            f.write(data)
            f.flush()
            os.fsync(f.fileno())
        _publish_tmp(tmp, path)
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise


def _atomic_write_table(path: str, table: pa.Table) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=os.path.dirname(path), suffix=".parquet")
    os.close(fd)
    try:
        pq.write_table(table, tmp)
        _publish_tmp(tmp, path)
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise


class CheckpointManager:
    def __init__(self, root: str, ruleset_hash: str, run_id: str = "run-0",
                 layout: str = ""):
        """``layout`` identifies the fragmentation scheme (e.g. the
        fragment size). A manifest only counts as complete under the SAME
        layout — otherwise a resume with a different fragment_size would
        mistake an old fragment of the same name (covering different
        rows) for finished work."""
        self.root = root
        self.ruleset_hash = ruleset_hash
        self.run_id = run_id
        self.layout = layout
        os.makedirs(os.path.join(root, "fragments"), exist_ok=True)

    # -- fragments ---------------------------------------------------------
    def _manifest_path(self, fragment_id: str) -> str:
        return os.path.join(self.root, "fragments", f"{fragment_id}.json")

    def _violations_path(self, fragment_id: str) -> str:
        return os.path.join(self.root, "violations", f"{fragment_id}.parquet")

    def completed_fragments(self) -> Set[str]:
        """Fragments whose manifest exists AND was produced under the
        CURRENT rule-set hash (stale hashes are treated as incomplete).
        Delegates to fragment_manifests so the staleness filter has ONE
        definition — resume skip-decisions can never drift from run-
        summary accounting."""
        return {m["fragment_id"] for m in self.fragment_manifests()}

    def record_fragment(self, fragment_id: str, violations: pa.Table,
                        n_rows: int) -> None:
        _atomic_write_table(self._violations_path(fragment_id), violations)
        vc = violations["rule"].combine_chunks() if isinstance(
            violations["rule"], pa.ChunkedArray) else violations["rule"]
        counts: Dict[str, int] = {
            str(r["values"]): int(r["counts"])
            for r in pa.compute.value_counts(vc).to_pylist()}
        manifest = {
            "fragment_id": fragment_id,
            "ruleset_hash": self.ruleset_hash,
            "layout": self.layout,
            "run_id": self.run_id,
            "n_rows": int(n_rows),
            "n_violations": int(violations.num_rows),
            "violations_by_rule": counts,
            "pass": violations.num_rows == 0,
        }
        _atomic_write_bytes(self._manifest_path(fragment_id),
                            json.dumps(manifest, sort_keys=True).encode())

    def fragment_manifests(self, expected: Optional[Set[str]] = None) -> List[dict]:
        """Manifests produced under the CURRENT rule-set hash only — stale
        hashes and (when ``expected`` is given) orphaned fragment ids from
        prior runs with a different fragment layout are excluded, so run
        summaries never double-count them. completed_fragments() applies
        the same hash filter for resume."""
        d = os.path.join(self.root, "fragments")
        out = []
        for fn in sorted(os.listdir(d)):
            if not fn.endswith(".json"):
                continue
            try:
                with open(os.path.join(d, fn)) as f:
                    m = json.load(f)
            except (json.JSONDecodeError, OSError):
                continue
            if (m.get("ruleset_hash") != self.ruleset_hash
                    or m.get("layout", "") != self.layout):
                continue
            if expected is not None and m.get("fragment_id") not in expected:
                continue
            out.append(m)
        return out

    def read_fragment_violations(self, fragment_id: str) -> pa.Table:
        p = self._violations_path(fragment_id)
        if not os.path.exists(p):
            return VIOLATIONS.empty_table()
        return pq.read_table(p)

    def invalidate(self, fragment_id: str) -> None:
        for p in (self._manifest_path(fragment_id),
                  self._violations_path(fragment_id)):
            if os.path.exists(p):
                os.unlink(p)

    # -- global (cross-fragment) rules ------------------------------------
    def _global_paths(self, name: str):
        g = os.path.join(self.root, "global")
        return os.path.join(g, f"{name}.json"), os.path.join(g, f"{name}.parquet")

    def global_completed(self, name: str) -> bool:
        mp, _ = self._global_paths(name)
        if not os.path.exists(mp):
            return False
        try:
            with open(mp) as f:
                return json.load(f).get("ruleset_hash") == self.ruleset_hash
        except (json.JSONDecodeError, OSError):
            return False

    def record_global(self, name: str, violations: pa.Table) -> None:
        mp, vp = self._global_paths(name)
        _atomic_write_table(vp, violations)
        _atomic_write_bytes(mp, json.dumps({
            "name": name, "ruleset_hash": self.ruleset_hash,
            "run_id": self.run_id,
            "n_violations": int(violations.num_rows)}, sort_keys=True).encode())

    def read_global(self, name: str) -> pa.Table:
        _, vp = self._global_paths(name)
        if not os.path.exists(vp):
            return VIOLATIONS.empty_table()
        return pq.read_table(vp)

    # -- drift baseline ----------------------------------------------------
    def save_baseline_profile(self, profile_json: str) -> None:
        _atomic_write_bytes(os.path.join(self.root, "profile", "baseline.json"),
                            profile_json.encode())

    def load_baseline_profile(self) -> Optional[str]:
        p = os.path.join(self.root, "profile", "baseline.json")
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return f.read()

    # -- run summary -------------------------------------------------------
    def run_manifest(self, expected: Optional[Set[str]] = None) -> dict:
        frags = self.fragment_manifests(expected)
        return {
            "run_id": self.run_id,
            "ruleset_hash": self.ruleset_hash,
            "n_fragments": len(frags),
            "n_rows": sum(m["n_rows"] for m in frags),
            "n_violations": sum(m["n_violations"] for m in frags),
            "fragments": [m["fragment_id"] for m in frags],
        }
