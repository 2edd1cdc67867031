"""End-to-end flagship pipeline over Ray Data: violations (row-local +
uniqueness + referential) must equal the generator's golden table exactly,
and verdicts must partition correctly (north_rule per-partition pass/fail)."""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest

from cerberus_ray.datagen import (
    GenConfig,
    docs_dataset,
    expected_violations,
    media_dataset,
)
from cerberus_ray.pipelines.flagship import run_flagship
from cerberus_ray.stages.referential import referential_violations, span_media_keys
from cerberus_ray.stages.uniqueness import approx_distinct, unique_violations


def rows(t: pa.Table):
    return sorted(
        zip(t["doc_id"].to_pylist(), t["rule"].to_pylist(),
            t["path"].to_pylist(), t["detail"].to_pylist()))


@pytest.fixture(scope="module")
def cfg():
    return GenConfig(n_docs=4000, n_media=500)


def test_flagship_matches_golden(ray_session, cfg):
    res = run_flagship(docs_dataset(cfg, fragment_size=1000),
                       media_dataset(cfg), text_max_len=cfg.text_max_len)
    golden = expected_violations(cfg)
    assert rows(res.violations) == rows(golden)
    assert res.n_docs == cfg.n_docs


def test_flagship_verdicts(ray_session, cfg):
    res = run_flagship(docs_dataset(cfg, fragment_size=1000),
                       media_dataset(cfg), text_max_len=cfg.text_max_len)
    v = res.verdicts.to_pandas()
    assert len(v) == 4  # 4000 docs / 1000 per fragment
    assert v["n_rows"].sum() == cfg.n_docs
    assert (v["pass"] == (v["n_violations"] == 0)).all()
    # with default violation fractions every fragment of 1000 docs fails
    assert (~v["pass"]).all()


def test_clean_data_all_pass(ray_session):
    clean = GenConfig(n_docs=1000, fractions={})
    res = run_flagship(docs_dataset(clean, fragment_size=250),
                       media_dataset(clean), text_max_len=clean.text_max_len)
    assert res.violations.num_rows == 0
    v = res.verdicts.to_pandas()
    assert v["pass"].all()


def test_unique_stage_alone(ray_session, cfg):
    v = unique_violations(docs_dataset(cfg), ["doc_id"], rule="unique-doc-id")
    golden = expected_violations(cfg)
    g = golden.filter(pc.equal(golden["rule"], "unique-doc-id"))
    assert rows(v) == rows(g)


def test_referential_broadcast_vs_bloom_agree(ray_session, cfg):
    golden = expected_violations(cfg)
    g = golden.filter(pc.equal(golden["rule"], "fk-missing"))
    for mode in ("broadcast", "bloom"):
        v = referential_violations(
            docs_dataset(cfg), media_dataset(cfg), extract=span_media_keys,
            parent_key="media_ref", rule="fk-missing",
            parent_name="media_catalog", mode=mode,
            n_keys_hint=cfg.n_media).to_pandas()
        got = sorted(zip(v["doc_id"], v["rule"], v["path"], v["detail"]))
        assert got == rows(g), mode


def test_hll_distinct_close_to_exact(ray_session, cfg):
    ds = docs_dataset(cfg)
    est = approx_distinct(ds, "doc_id", p=14)
    ids = np.array([f"d{i:010d}" for i in range(cfg.n_docs)])
    # duplicates reduce the distinct count below n_docs
    exact = cfg.n_docs - expected_violations(cfg).filter(
        pc.equal(expected_violations(cfg)["rule"], "unique-doc-id")).num_rows
    assert abs(est - exact) / exact < 0.05


def test_assign_fragments_deterministic(ray_session, cfg):
    from cerberus_ray.stages.validate import assign_fragments

    ds = docs_dataset(cfg)
    a = assign_fragments(ds, "doc_id", 8).to_pandas()
    b = assign_fragments(docs_dataset(cfg), "doc_id", 8).to_pandas()
    assert (a["fragment_id"] == b["fragment_id"]).all()
    assert a["fragment_id"].nunique() == 8
    # same doc_id always lands in the same fragment
    g = a.groupby("doc_id")["fragment_id"].nunique()
    assert (g == 1).all()


def test_flagship_from_parquet_roundtrip(ray_session, cfg, tmp_path):
    """Nested list<struct> spans must survive the parquet round-trip:
    write generated docs, read back via the storage adapter, validate —
    identical golden output (the bench/production input path)."""
    from cerberus_ray.datagen import gen_docs_batch
    from cerberus_ray.sources.io import read_table

    t = gen_docs_batch(np.arange(cfg.n_docs), cfg)
    import pyarrow.parquet as pq

    p = str(tmp_path / "docs.parquet")
    pq.write_table(t, p)
    res = run_flagship(read_table(p), media_dataset(cfg),
                       text_max_len=cfg.text_max_len, with_verdicts=False)
    assert rows(res.violations) == rows(expected_violations(cfg))


def test_referential_bloom_shuffle_semi_join_agrees(ray_session, cfg):
    """The 10^9-parent path: bloom-positive candidates verified via the
    tagged distinct-key groupby — byte-identical to the driver semi-join
    and the broadcast mode."""
    golden = expected_violations(cfg)
    g = golden.filter(pc.equal(golden["rule"], "fk-missing"))
    v = referential_violations(
        docs_dataset(cfg), media_dataset(cfg), extract=span_media_keys,
        parent_key="media_ref", rule="fk-missing",
        parent_name="media_catalog", mode="bloom", semi_join="shuffle",
        n_keys_hint=cfg.n_media).to_pandas()
    got = sorted(zip(v["doc_id"], v["rule"], v["path"], v["detail"]))
    assert got == rows(g)


def test_flagship_streaming_no_driver_collect(ray_session, tmp_path):
    """A pathological input where EVERY doc violates must stream: with
    collect=False the violation flow stays a Dataset end-to-end into a
    partitioned parquet sink — no driver table proportional to the
    violation count is ever built."""
    cfg = GenConfig(n_docs=3000, n_media=300)
    res = run_flagship(docs_dataset(cfg, fragment_size=1000),
                       media_dataset(cfg), text_max_len=1,  # all spans violate
                       with_verdicts=False, collect=False,
                       out_dir=str(tmp_path))
    assert res.violations is None
    import ray.data as rd
    assert isinstance(res.violations_ds, rd.Dataset)
    # every doc has >= 1 over-length span violation; written files are
    # partitioned (multiple fragments -> multiple files)
    n = res.violations_ds.count()
    assert n >= cfg.n_docs
    n_docs_violating = (res.violations_ds
                        .groupby("doc_id").count().count())
    # near-universal violation (docs whose spans are all empty/media escape)
    assert n_docs_violating >= 0.9 * cfg.n_docs
    import os
    files = os.listdir(str(tmp_path / "violations"))
    assert len(files) >= 1
