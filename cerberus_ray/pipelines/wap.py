"""Write-Audit-Publish (WAP): stage a dataset to an isolated directory,
audit the STAGED bytes with the full flagship rule-set, and publish
atomically via a manifest only if the audit passes — the ingestion
gate pattern (public: Netflix/Iceberg WAP). Composes the engine's
north-star validation (`pipelines/flagship.run_flagship`) with the
partitioned-parquet sink; readers resolve through the manifest, so a
failed or in-flight load is never visible.

Guarantees:
- AUDIT READS BACK the staged parquet (not the in-memory Dataset), so
  write corruption and schema drift are inside the audited surface.
- PUBLISH is one atomic rename of a complete manifest file; a crash
  anywhere earlier leaves the previous published version intact.
- A failed audit quarantines the staging dir with an _AUDIT_FAILED
  report (violation counts per rule) — evidence, not silent deletion.
- Versions are append-only; the manifest names the current one, and
  re-publish after a fix supersedes without touching old data.

Scale shape: staging is the normal streamed partitioned write; the
audit is the flagship pass (its scale story is the engine's); the
manifest/report are O(#rules) driver JSON.
"""

from __future__ import annotations

import json
import os
from typing import Optional

import pyarrow as pa

__all__ = ["wap_publish", "read_published", "published_version"]

_MANIFEST = "_MANIFEST.json"


def _atomic_write_json(path: str, obj: dict) -> None:
    tmp = f"{path}.tmp"
    with open(tmp, "w") as f:
        json.dump(obj, f, indent=1, sort_keys=True)
    os.replace(tmp, path)  # atomic on POSIX


def wap_publish(docs_ds, media_ds, out_dir: str, *, version: str,
                max_violation_rate: float = 0.0,
                ref_mode: str = "broadcast") -> dict:
    """Stage ``docs_ds`` under ``{out_dir}/v={version}``, audit it with
    the flagship rule-set against ``media_ds``, and publish or
    quarantine. → report dict {version, n_docs, n_violations,
    violation_rate, by_rule, published}. Raises if ``version`` was
    already staged (versions are immutable)."""
    import ray.data as rd

    from .flagship import run_flagship

    stage_dir = os.path.join(out_dir, f"v={version}")
    if os.path.exists(stage_dir):
        raise ValueError(f"version {version!r} already staged at "
                         f"{stage_dir} — versions are immutable")
    os.makedirs(out_dir, exist_ok=True)

    # WRITE: streamed parquet into the isolated version dir
    docs_ds.write_parquet(stage_dir)

    # AUDIT: read BACK what landed on disk and run the full rule-set
    staged = rd.read_parquet(stage_dir)
    n_docs = staged.count()
    res = run_flagship(staged, media_ds, ref_mode=ref_mode,
                       with_verdicts=False, collect=True)
    viol = res.violations
    n_viol = viol.num_rows
    import pyarrow.compute as pc
    by_rule = {}
    if n_viol:
        vc = pa.TableGroupBy(viol, "rule").aggregate(
            [("doc_id", "count")])
        by_rule = dict(zip(vc["rule"].to_pylist(),
                           vc["doc_id_count"].to_pylist()))
    bad_docs = (len(pc.unique(viol["doc_id"])) if n_viol else 0)
    rate = bad_docs / n_docs if n_docs else 0.0
    report = {"version": version, "n_docs": int(n_docs),
              "n_violations": int(n_viol),
              "n_violating_docs": int(bad_docs),
              "violation_rate": rate,
              "by_rule": {k: int(v) for k, v in sorted(
                  by_rule.items())},
              "max_violation_rate": max_violation_rate,
              "published": rate <= max_violation_rate}

    if report["published"]:
        # PUBLISH: manifest rename is the single atomic commit point
        _atomic_write_json(os.path.join(out_dir, _MANIFEST), {
            "current_version": version, "path": f"v={version}",
            "n_docs": int(n_docs), "audit": report})
    else:
        _atomic_write_json(os.path.join(stage_dir,
                                        "_AUDIT_FAILED.json"), report)
    return report


def published_version(out_dir: str) -> Optional[str]:
    """→ the currently published version id, or None."""
    p = os.path.join(out_dir, _MANIFEST)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)["current_version"]


def read_published(out_dir: str):
    """→ Dataset over the manifest's current version ONLY — staged or
    quarantined versions are invisible. Raises if nothing is
    published."""
    import ray.data as rd

    p = os.path.join(out_dir, _MANIFEST)
    if not os.path.exists(p):
        raise FileNotFoundError(f"no published version under "
                                f"{out_dir} (WAP manifest missing)")
    with open(p) as f:
        man = json.load(f)
    return rd.read_parquet(os.path.join(out_dir, man["path"]))
