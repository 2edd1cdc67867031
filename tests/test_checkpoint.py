"""Checkpoint/resume: per-fragment manifests + lineage; resume recomputes
ONLY missing fragments; a changed rule-set hash invalidates everything;
results are identical across full, resumed, and rule-changed runs."""

import pyarrow as pa
import pytest

from cerberus_ray.datagen import GenConfig, expected_violations
from cerberus_ray.pipelines.flagship import run_flagship_checkpointed
from cerberus_ray.state.checkpoint import CheckpointManager


def rows(t: pa.Table):
    return sorted(zip(t["doc_id"].to_pylist(), t["rule"].to_pylist(),
                      t["path"].to_pylist(), t["detail"].to_pylist()))


@pytest.fixture(scope="module")
def cfg():
    return GenConfig(n_docs=3000, n_media=400)


def test_full_run_then_noop_resume(ray_session, cfg, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("ckpt1"))
    r1 = run_flagship_checkpointed(cfg, d, fragment_size=500)
    assert len(r1["processed_fragments"]) == 6
    assert rows(r1["violations"]) == rows(expected_violations(cfg))
    assert r1["verdicts"].to_pandas()["n_rows"].sum() == cfg.n_docs

    # second run: everything checkpointed → nothing recomputed
    r2 = run_flagship_checkpointed(cfg, d, fragment_size=500, run_id="run-1")
    assert r2["processed_fragments"] == []
    assert len(r2["skipped_fragments"]) == 6
    assert rows(r2["violations"]) == rows(r1["violations"])


def test_partial_resume_recomputes_only_missing(ray_session, cfg,
                                                tmp_path_factory):
    d = str(tmp_path_factory.mktemp("ckpt2"))
    r1 = run_flagship_checkpointed(cfg, d, fragment_size=500)
    from cerberus_ray.rules.row_rules import interleaved_ruleset

    rs_hash = interleaved_ruleset(text_max_len=cfg.text_max_len).hash
    mgr = CheckpointManager(d, rs_hash, layout="fs-500")
    mgr.invalidate("frag-000002")
    mgr.invalidate("frag-000004")

    r2 = run_flagship_checkpointed(cfg, d, fragment_size=500, run_id="run-1")
    assert r2["processed_fragments"] == ["frag-000002", "frag-000004"]
    assert rows(r2["violations"]) == rows(r1["violations"])
    # lineage: manifests carry run ids — resumed fragments from run-1
    mans = {m["fragment_id"]: m for m in mgr.fragment_manifests()}
    assert mans["frag-000002"]["run_id"] == "run-1"
    assert mans["frag-000000"]["run_id"] == "run-0"


def test_ruleset_change_invalidates(ray_session, cfg, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("ckpt3"))
    run_flagship_checkpointed(cfg, d, fragment_size=1000)
    # a different text_max_len ⇒ different rule-set hash ⇒ full recompute
    cfg2 = GenConfig(n_docs=cfg.n_docs, n_media=cfg.n_media, text_max_len=128)
    r = run_flagship_checkpointed(cfg2, d, fragment_size=1000, run_id="run-1")
    assert len(r["processed_fragments"]) == 3
    assert rows(r["violations"]) == rows(expected_violations(cfg2))


def test_manifest_fields(ray_session, cfg, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("ckpt4"))
    r = run_flagship_checkpointed(cfg, d, fragment_size=1500)
    m = r["run_manifest"]
    assert m["n_fragments"] == 2
    assert m["n_rows"] == cfg.n_docs
    assert m["ruleset_hash"]
    frag = CheckpointManager(d, m["ruleset_hash"],
                             layout="fs-1500").fragment_manifests()[0]
    assert set(frag) >= {"fragment_id", "ruleset_hash", "run_id", "n_rows",
                         "n_violations", "violations_by_rule", "pass"}


def test_run_manifest_excludes_stale_and_orphans(ray_session, cfg,
                                                 tmp_path_factory):
    """A prior run with a smaller fragment_size leaves orphaned frag-*
    manifests whose NAMES collide with the new layout's fragments but
    cover different rows. They must count as neither complete (resume
    revalidates everything under the new layout) nor toward the run
    summary."""
    d = str(tmp_path_factory.mktemp("ckpt_orphan"))
    run_flagship_checkpointed(cfg, d, fragment_size=500)   # 6 fragments
    r = run_flagship_checkpointed(cfg, d, fragment_size=1500, run_id="run-1")
    m = r["run_manifest"]
    assert m["n_fragments"] == 2
    assert m["n_rows"] == cfg.n_docs  # orphans would double-count rows
    assert rows(r["violations"]) == rows(expected_violations(cfg))
