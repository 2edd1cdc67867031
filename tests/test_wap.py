"""Write-Audit-Publish: clean load publishes, dirty load quarantines,
manifest atomicity/versioning, reader isolation."""

import json
import os

import pytest

from cerberus_ray.datagen import GenConfig, docs_dataset, media_dataset
from cerberus_ray.pipelines.wap import (published_version,
                                        read_published, wap_publish)


def _clean_cfg(n=400):
    return GenConfig(n_docs=n, fractions={})


def _dirty_cfg(n=400):
    return GenConfig(n_docs=n)  # default violation fractions


def test_clean_publish_and_read(ray_session, tmp_path):
    out = str(tmp_path / "tbl")
    cfg = _clean_cfg()
    rep = wap_publish(docs_dataset(cfg), media_dataset(cfg), out,
                      version="001")
    assert rep["published"] and rep["n_violations"] == 0
    assert published_version(out) == "001"
    ds = read_published(out)
    assert ds.count() == cfg.n_docs
    man = json.load(open(os.path.join(out, "_MANIFEST.json")))
    assert man["audit"]["violation_rate"] == 0.0


def test_dirty_load_quarantined(ray_session, tmp_path):
    out = str(tmp_path / "tbl")
    cfg = _dirty_cfg()
    rep = wap_publish(docs_dataset(cfg), media_dataset(cfg), out,
                      version="001")
    assert not rep["published"]
    assert rep["n_violations"] > 0 and rep["by_rule"]
    # nothing published: reader refuses, no manifest
    assert published_version(out) is None
    with pytest.raises(FileNotFoundError):
        read_published(out)
    # quarantine evidence exists next to the staged data
    failed = json.load(open(os.path.join(out, "v=001",
                                         "_AUDIT_FAILED.json")))
    assert failed["n_violating_docs"] > 0
    # versions are immutable — restaging the same id refuses
    with pytest.raises(ValueError, match="immutable"):
        wap_publish(docs_dataset(cfg), media_dataset(cfg), out,
                    version="001")


def test_fix_then_republish_supersedes(ray_session, tmp_path):
    out = str(tmp_path / "tbl")
    dirty = _dirty_cfg(300)
    wap_publish(docs_dataset(dirty), media_dataset(dirty), out,
                version="001")
    assert published_version(out) is None
    clean = _clean_cfg(300)
    rep2 = wap_publish(docs_dataset(clean), media_dataset(clean), out,
                       version="002")
    assert rep2["published"]
    assert published_version(out) == "002"
    assert read_published(out).count() == 300
    # tolerant threshold publishes a slightly-dirty load
    out2 = str(tmp_path / "tol")
    rep3 = wap_publish(docs_dataset(dirty), media_dataset(dirty),
                       out2, version="001", max_violation_rate=1.0)
    assert rep3["published"] and rep3["n_violations"] > 0
    assert read_published(out2).count() == 300
