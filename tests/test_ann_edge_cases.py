"""Regression tests for the round-5 similarity/ANN review findings:
tiny-corpus index builds, rebuild-in-place freshness, uint8 code-range
guards, empty-input handling, rounded-tie block-layout invariance, and
degenerate calibration corpora."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from cerberus_ray.pipelines import similarity as S
from cerberus_ray.pipelines.ann_index import (
    build_ivf_index,
    probe_ivf_index,
    train_pq_codebooks,
)


def _vecs(n, d=8, seed=0):
    rng = np.random.default_rng(seed)
    return pd.DataFrame({
        "vec_id": np.arange(n, dtype=np.int64),
        "embedding": [rng.normal(size=d).astype(np.float64).tolist()
                      for _ in range(n)],
    })


def test_build_index_fewer_rows_than_lists(ray_session, tmp_path):
    """8 vectors with the default 16 lists must build (effective
    centroid count persisted) and probe correctly — not crash on a
    centroids-table length mismatch."""
    df = _vecs(8)
    out = build_ivf_index(rd.from_pandas(df), str(tmp_path / "idx"),
                          n_lists=16)
    r = probe_ivf_index(out, np.stack(df["embedding"][:2]), k=3,
                        n_probe=16)
    got = r.to_pandas()
    # each query's own vector is its top hit at sim 1.0
    top = got.sort_values(["query_id", "sim"], ascending=[True, False]) \
             .groupby("query_id").head(1)
    assert list(top["vec_id"]) == [0, 1]


def test_rebuild_replaces_stale_rows(ray_session, tmp_path):
    """Rebuilding into the same out_dir must not mix row files from the
    previous generation."""
    idx = str(tmp_path / "idx")
    build_ivf_index(rd.from_pandas(_vecs(30, seed=1)), idx, n_lists=4)
    df2 = _vecs(10, seed=2)
    build_ivf_index(rd.from_pandas(df2), idx, n_lists=4)
    rows = rd.read_parquet(f"{idx}/lists").to_pandas()
    assert len(rows) == 10
    assert sorted(rows["vec_id"]) == sorted(df2["vec_id"])


def test_pq_code_range_guards(ray_session, tmp_path):
    ds = rd.from_pandas(_vecs(20))
    with pytest.raises(ValueError, match="256"):
        train_pq_codebooks(ds, m=4, n_codes=512)
    with pytest.raises(ValueError, match="256"):
        build_ivf_index(ds, str(tmp_path / "idx"), pq_m=4, pq_codes=512)


def test_empty_dataset_topk_paths(ray_session):
    """Empty inputs (zero rows, possibly zero blocks) return typed empty
    tables instead of reshape/KeyError crashes."""
    empty = rd.from_arrow(pa.table({
        "vec_id": pa.array([], pa.int64()),
        "embedding": pa.array([], pa.list_(pa.float64()))}))
    q = np.ones((1, 8))
    for fn in (S.brute_force_topk, S.lsh_topk, S.ivf_topk):
        out = fn(empty, q, k=3)
        assert out.num_rows == 0
        assert out.column_names == ["query_id", "vec_id", "sim"]


def test_partial_topk_layout_invariant_at_rounded_ties(ray_session):
    """Two candidates whose sims differ only BELOW the rounding digit
    must resolve to the same winner whatever block they land in: the
    per-block partial selects by (rounded sim desc, vec_id asc)."""
    d = 4
    q = np.array([[1.0, 0.0, 0.0, 0.0]])

    def vec_with_sim(s):
        # unit vector at cosine s to q
        return [s, float(np.sqrt(1 - s * s)), 0.0, 0.0]

    # ids 1 and 2 round to the same 4-dp sim; id 2 is unrounded-higher
    # but id 1 must win the tie by id order
    df = pd.DataFrame({
        "vec_id": np.array([1, 2, 3], dtype=np.int64),
        "embedding": [vec_with_sim(0.90004999), vec_with_sim(0.90004999),
                      vec_with_sim(0.5)],
    })
    outs = []
    for blocks in (1, 3):
        ds = rd.from_pandas(df, override_num_blocks=blocks)
        outs.append(S.brute_force_topk(ds, q, k=1).to_pandas())
    assert outs[0].equals(outs[1])
    assert int(outs[0]["vec_id"][0]) == 1  # id tie-break after rounding


def test_calibration_needs_two_vectors(ray_session):
    ds = rd.from_pandas(_vecs(1))
    with pytest.raises(ValueError, match="2 distinct"):
        S.emb_threshold_calibration(ds, n_pairs=100)
