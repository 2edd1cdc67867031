"""Generator determinism + golden self-consistency (FIXTURES.md)."""

import numpy as np
import pyarrow as pa

from cerberus_ray.datagen import (
    DEFAULT_FRACTIONS,
    GenConfig,
    expected_violations,
    gen_docs_batch,
    gen_media_catalog,
)


def test_batch_split_independence():
    cfg = GenConfig(n_docs=3000)
    full = gen_docs_batch(np.arange(3000), cfg)
    parts = pa.concat_tables([
        gen_docs_batch(np.arange(0, 700), cfg),
        gen_docs_batch(np.arange(700, 701), cfg),
        gen_docs_batch(np.arange(701, 3000), cfg),
    ])
    assert parts.equals(full)


def test_schema_matches_input_hint():
    cfg = GenConfig(n_docs=10)
    t = gen_docs_batch(np.arange(10), cfg)
    assert t.schema.names == ["doc_id", "spans"]
    span_t = t.schema.field("spans").type.value_type
    assert [span_t.field(i).name for i in range(span_t.num_fields)] == [
        "kind", "text", "media_ref", "offset"]


def test_clean_config_has_no_violations():
    cfg = GenConfig(n_docs=500, fractions={})
    assert expected_violations(cfg).num_rows == 0


def test_duplicate_groups_are_pairs():
    cfg = GenConfig(n_docs=4000)
    t = gen_docs_batch(np.arange(4000), cfg)
    ids = np.array(t["doc_id"].to_pylist())
    uniq, counts = np.unique(ids, return_counts=True)
    dup = uniq[counts > 1]
    golden = expected_violations(cfg)
    g_dup = sorted(
        golden.filter(
            pa.compute.equal(golden["rule"], "unique-doc-id"))["doc_id"].to_pylist())
    assert sorted(dup.tolist()) == g_dup
    assert (counts[counts > 1] == 2).all()


def test_media_catalog_unique_and_typed():
    cfg = GenConfig(n_docs=10, n_media=500)
    m = gen_media_catalog(cfg)
    refs = m["media_ref"].to_pylist()
    assert len(set(refs)) == len(refs) == 500
    assert set(m["kind"].to_pylist()) <= {"image", "audio", "table"}
    assert min(m["bytes"].to_pylist()) >= 0


def test_all_rules_injected_at_default_fractions():
    cfg = GenConfig(n_docs=20_000)
    golden = expected_violations(cfg)
    rules = set(golden["rule"].to_pylist())
    assert rules == set(DEFAULT_FRACTIONS)


def test_docs_dataset_parallelism_invariant(ray_session):
    """Dataset content is identical regardless of block split (retry /
    repartition safety at the Dataset level)."""
    from cerberus_ray.datagen import docs_dataset

    cfg = GenConfig(n_docs=2000)
    a = docs_dataset(cfg, parallelism=2).to_pandas().sort_values("doc_id")
    b = docs_dataset(cfg, parallelism=16).to_pandas().sort_values("doc_id")
    assert a.reset_index(drop=True).equals(b.reset_index(drop=True))


def test_expected_fragment_verdicts_match_pipeline(ray_session):
    """Golden verdict derivation (generator bookkeeping) must equal the
    validate→fragment_verdicts pipeline output — the dual-path pattern
    that backs the flagship_verdicts DuckDB oracle."""
    from cerberus_ray.datagen import docs_dataset, expected_fragment_verdicts
    from cerberus_ray.rules.row_rules import interleaved_ruleset
    from cerberus_ray.stages.validate import fragment_verdicts, validate

    cfg = GenConfig(n_docs=2000, n_media=400)
    frag = max(cfg.n_docs // 8, 1)
    docs = docs_dataset(cfg, fragment_size=frag).materialize()
    rs = interleaved_ruleset(text_max_len=cfg.text_max_len)
    got = fragment_verdicts(docs, validate(docs, rs))
    want = expected_fragment_verdicts(cfg, frag)
    assert got.equals(want), (got.to_pandas(), want.to_pandas())


def test_flagship_cfg_unknown_sf_raises(tmp_path):
    """An sf level unknown to BOTH gate maps must fail loudly — a silent
    default would run the engine at one size while the SQL golden gate
    selects another (or errors)."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import pytest

    from cerberus_ray.pipelines.training_queries import _flagship_cfg

    pq.write_table(pa.table({"l_orderkey": list(range(7))}),
                   str(tmp_path / "lineitem.parquet"))
    with pytest.raises(ValueError, match="unknown sf level"):
        _flagship_cfg(str(tmp_path))


def test_flagship_cfg_known_levels():
    from cerberus_ray.pipelines.training_queries import _flagship_cfg

    assert _flagship_cfg("/root/testdata/sf0.001").n_docs == 2000
    assert _flagship_cfg("/root/testdata/sf0.01").n_docs == 5000
