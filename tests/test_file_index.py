"""Per-file Bloom index: no false negatives, bounded candidate fan-out
for absent keys, layout-invariant construction, sidecar round trip, and
pruned point-lookup parity with a plain filter."""

import numpy as np
import pandas as pd
import pytest

from cerberus_ray.stages.file_index import FileBloomIndex


@pytest.fixture(scope="module")
def indexed(ray_session, tmp_path_factory):
    import ray.data as rd

    tmp = tmp_path_factory.mktemp("bloomidx")
    rng = np.random.default_rng(3)
    df = pd.DataFrame({
        # keys clustered per file region so pruning is meaningful
        "k": np.arange(20_000, dtype=np.int64),
        "v": rng.integers(0, 1000, 20_000),
    })
    src = str(tmp / "data")
    rd.from_pandas(df).repartition(20).write_parquet(src)
    idx = FileBloomIndex.build(src, "k", fpp=0.01)
    return src, df, idx, tmp


def test_no_false_negatives(indexed):
    src, df, idx, _ = indexed
    # every present key must map to at least one candidate file, and the
    # lookup must return its row
    probes = df["k"].to_numpy()[::997]
    for k in probes:
        assert idx.files_for(k), k
    got = idx.lookup(probes).to_pandas().sort_values("k")
    assert got["k"].tolist() == sorted(probes.tolist())
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True),
        df[df.k.isin(probes)].sort_values("k").reset_index(drop=True))


def test_absent_keys_prune_most_files(indexed):
    _, _, idx, _ = indexed
    absent = np.arange(1_000_000, 1_000_050, dtype=np.int64)
    hits = [len(idx.files_for(k)) for k in absent]
    # fpp=0.01 over 20 files → expected 0.2 candidates per probe; allow
    # generous slack but require real pruning
    assert np.mean(hits) < 2.0, hits
    assert idx.lookup(absent[:3]).count() == 0


def test_index_is_block_layout_invariant(indexed, ray_session):
    src, _, idx, _ = indexed
    idx2 = FileBloomIndex.build(src, "k", fpp=0.01)
    assert sorted(idx.blooms) == sorted(idx2.blooms)
    for p in idx.blooms:
        assert idx.blooms[p].to_bytes() == idx2.blooms[p].to_bytes()


def test_sidecar_round_trip(indexed):
    src, df, idx, tmp = indexed
    sidecar = str(tmp / "k.bloomidx.parquet")
    idx.save(sidecar)
    loaded = FileBloomIndex.load(sidecar)
    assert loaded.col == "k" and loaded.fpp == 0.01
    assert sorted(loaded.blooms) == sorted(idx.blooms)
    for p in idx.blooms:
        assert loaded.blooms[p].to_bytes() == idx.blooms[p].to_bytes()
    assert loaded.lookup(np.int64(1234)).count() == 1


def test_string_keys(ray_session, tmp_path):
    import ray.data as rd

    df = pd.DataFrame({"name": [f"user-{i:05d}" for i in range(5000)]})
    src = str(tmp_path / "s")
    rd.from_pandas(df).repartition(10).write_parquet(src)
    idx = FileBloomIndex.build(src, "name", fpp=0.01)
    assert idx.lookup(np.asarray(["user-04999"])).count() == 1
    assert idx.lookup(np.asarray(["nobody"])).count() == 0
