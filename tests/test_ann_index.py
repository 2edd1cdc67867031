"""Persisted IVF index: build/probe agreement with the batch ivf_topk,
recall vs brute force, stale-parameter guard, probe-only reuse."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from cerberus_ray.pipelines.ann_index import (IndexParamsMismatch,
                                              build_ivf_index,
                                              probe_ivf_index)
from cerberus_ray.pipelines.similarity import brute_force_topk, ivf_topk


def vectors(n=600, d=16, seed=4):
    rng = np.random.default_rng(seed)
    # clustered vectors so IVF lists are meaningful
    centers = rng.normal(size=(8, d))
    v = centers[rng.integers(0, 8, n)] + 0.15 * rng.normal(size=(n, d))
    # plain Python lists → Arrow list<float> (the parquet tables' type;
    # numpy rows would become Ray's tensor extension type instead)
    return pd.DataFrame({"vec_id": np.arange(n, dtype=np.int64),
                         "embedding": [row.astype(np.float32).tolist()
                                       for row in v]})


@pytest.fixture(scope="module")
def index_dir(ray_session, tmp_path_factory):
    df = vectors()
    d = str(tmp_path_factory.mktemp("ivf") / "index")
    build_ivf_index(rd.from_pandas(df, override_num_blocks=4), d,
                    n_lists=8, seed=42)
    return d, df


def test_probe_agrees_with_batch_ivf(index_dir):
    d, df = index_dir
    rng = np.random.default_rng(99)
    q = rng.normal(size=(5, 16))
    a = probe_ivf_index(d, q, k=10, n_probe=3).to_pandas()
    b = ivf_topk(rd.from_pandas(df, override_num_blocks=4), q, k=10,
                 n_lists=8, n_probe=3, seed=42).to_pandas()
    for qi in range(5):
        ia = a[a["query_id"] == qi].sort_values(
            ["sim", "vec_id"], ascending=[False, True])
        ib = b[b["query_id"] == qi].sort_values(
            ["sim", "vec_id"], ascending=[False, True])
        assert set(ia["vec_id"]) == set(ib["vec_id"])
        np.testing.assert_allclose(
            np.sort(ia["sim"].to_numpy()),
            np.sort(ib["sim"].to_numpy()), atol=2e-4)


def test_probe_recall_vs_brute_force(index_dir):
    d, df = index_dir
    rng = np.random.default_rng(7)
    q = rng.normal(size=(8, 16))
    exact = brute_force_topk(rd.from_pandas(df), q, k=5).to_pandas()
    approx = probe_ivf_index(d, q, k=5, n_probe=4).to_pandas()
    hits = tot = 0
    for qi in range(8):
        truth = set(exact[exact["query_id"] == qi]["vec_id"])
        got = set(approx[approx["query_id"] == qi]["vec_id"])
        hits += len(truth & got)
        tot += len(truth)
    assert hits / tot >= 0.8


def test_stale_param_guard(index_dir):
    d, _ = index_dir
    with pytest.raises(IndexParamsMismatch):
        probe_ivf_index(d, np.zeros((1, 16)), expect={"n_lists": 32})
    # matching expectation passes
    probe_ivf_index(d, np.zeros((1, 16)), expect={"n_lists": 8, "seed": 42})


def test_probe_is_fit_free(index_dir, monkeypatch):
    """Probing must never retrain the quantizer."""
    import cerberus_ray.pipelines.ann_index as AI

    d, _ = index_dir

    def boom(*a, **k):  # pragma: no cover
        raise AssertionError("probe called the trainer")

    monkeypatch.setattr(AI, "train_ivf_centroids", boom)
    out = probe_ivf_index(d, np.ones((2, 16)), k=3).to_pandas()
    assert set(out["query_id"]) <= {0, 1}
    assert len(out) > 0


# ---- product quantization ---------------------------------------------------


def test_pq_roundtrip_recall(ray_session):
    """ADC top-k over PQ codes recovers most of the exact top-k: the
    Jégou ADC guarantee at m=4 subspaces on clustered 16-d data."""
    import ray.data as rd

    from cerberus_ray.pipelines.ann_index import (pq_encode, pq_topk,
                                                  train_pq_codebooks)

    df = vectors(800)
    ds = rd.from_pandas(df, override_num_blocks=4)
    books = train_pq_codebooks(ds, m=8, n_codes=256, seed=42)
    assert books.shape == (8, 256, 2)
    codes = pq_encode(ds, books).materialize()
    pdf = codes.to_pandas()
    assert len(pdf) == 800
    assert all(len(c) == 8 for c in pdf["code"])  # 8 bytes per vector

    rng = np.random.default_rng(2)
    q = rng.normal(size=(6, 16))
    exact = brute_force_topk(rd.from_pandas(df), q, k=10).to_pandas()
    approx = pq_topk(codes, books, q, k=10).to_pandas()
    hits = tot = 0
    for qi in range(6):
        truth = set(exact[exact["query_id"] == qi]["vec_id"])
        got = set(approx[approx["query_id"] == qi]["vec_id"])
        hits += len(truth & got)
        tot += len(truth)
    assert hits / tot >= 0.8  # measured 0.88 at m=8, 256 codes
    # ADC sims approximate the true cosine: top-1 sim within 0.1
    for qi in range(6):
        a1 = approx[approx["query_id"] == qi]["sim"].iloc[0]
        e1 = exact[exact["query_id"] == qi]["sim"].iloc[0]
        assert abs(a1 - e1) < 0.1


def test_pq_deterministic_and_validates(ray_session):
    import ray.data as rd

    from cerberus_ray.pipelines.ann_index import (pq_encode,
                                                  train_pq_codebooks)

    df = vectors(300)
    ds = rd.from_pandas(df, override_num_blocks=3)
    a = train_pq_codebooks(ds, m=4, n_codes=32, seed=42)
    b = train_pq_codebooks(ds, m=4, n_codes=32, seed=42)
    assert (a == b).all()
    ca = pq_encode(ds, a).to_pandas().sort_values("vec_id")
    cb = pq_encode(ds, a).to_pandas().sort_values("vec_id")
    assert ca["code"].tolist() == cb["code"].tolist()
    with pytest.raises(ValueError, match="divisible"):
        train_pq_codebooks(ds, m=5)


def test_ivfpq_index_end_to_end(ray_session, tmp_path):
    """IVF-PQ: uint8 codes in the persisted lists, ADC probe scoring,
    recall close to the float-vector index."""
    import ray.data as rd

    from cerberus_ray.pipelines.ann_index import (build_ivf_index,
                                                  probe_ivf_index)

    df = vectors(800)
    d = str(tmp_path / "ivfpq")
    build_ivf_index(rd.from_pandas(df, override_num_blocks=4), d,
                    n_lists=8, seed=42, pq_m=8, pq_codes=256)
    import pyarrow.parquet as pq

    lists = pq.read_table(str(tmp_path / "ivfpq" / "lists"))
    assert "code" in lists.column_names and "vec" not in lists.column_names
    rng = np.random.default_rng(6)
    q = rng.normal(size=(6, 16))
    exact = brute_force_topk(rd.from_pandas(df), q, k=5).to_pandas()
    approx = probe_ivf_index(d, q, k=5, n_probe=4,
                             expect={"pq_m": 8}).to_pandas()
    hits = tot = 0
    for qi in range(6):
        truth = set(exact[exact["query_id"] == qi]["vec_id"])
        got = set(approx[approx["query_id"] == qi]["vec_id"])
        hits += len(truth & got)
        tot += len(truth)
    assert hits / tot >= 0.7  # PQ adds quantization loss on top of IVF


def test_sq8_reconstruction_and_recall(ray_session):
    """SQ8 top-k is near-exact: 8-bit uniform lattice error is
    span/510 per dimension, so sims match brute force closely."""
    import ray.data as rd

    from cerberus_ray.pipelines.ann_index import (sq8_encode, sq8_fit,
                                                  sq8_topk)

    df = vectors(800)
    ds = rd.from_pandas(df, override_num_blocks=4)
    bounds = sq8_fit(ds)
    assert bounds.shape == (2, 16)
    assert (bounds[1] >= bounds[0]).all()
    codes = sq8_encode(ds, bounds).materialize()
    pdf = codes.to_pandas()
    assert len(pdf) == 800 and all(len(c) == 16 for c in pdf["code"])

    rng = np.random.default_rng(7)
    q = rng.normal(size=(6, 16))
    exact = brute_force_topk(rd.from_pandas(df), q, k=10).to_pandas()
    approx = sq8_topk(codes, bounds, q, k=10).to_pandas()
    hits = tot = 0
    for qi in range(6):
        truth = set(exact[exact["query_id"] == qi]["vec_id"])
        got = set(approx[approx["query_id"] == qi]["vec_id"])
        hits += len(truth & got)
        tot += len(truth)
    assert hits / tot >= 0.9          # measured: near-1.0 at 8 bits
    for qi in range(6):
        a1 = approx[approx["query_id"] == qi]["sim"].iloc[0]
        e1 = exact[exact["query_id"] == qi]["sim"].iloc[0]
        assert abs(a1 - e1) < 0.02


def test_sq8_bounds_and_determinism(ray_session):
    import ray.data as rd

    from cerberus_ray.pipelines.ann_index import (sq8_encode, sq8_fit,
                                                  sq8_topk)
    from cerberus_ray.pipelines.similarity import _mat, _unit

    # include a constant dimension → degenerate span handled exactly
    df = pd.DataFrame({
        "vec_id": np.arange(50, dtype=np.int64),
        "embedding": [[1.0, float(i), 0.5] for i in range(50)]})
    ds1 = rd.from_pandas(df, override_num_blocks=1)
    ds3 = rd.from_pandas(df, override_num_blocks=3)
    b1, b3 = sq8_fit(ds1), sq8_fit(ds3)
    np.testing.assert_array_equal(b1, b3)   # partial-merge invariance
    codes = sq8_encode(ds1, b1).to_pandas().sort_values("vec_id")
    # reconstruction error bounded by half a lattice step per dim
    raw = np.frombuffer(b"".join(codes["code"]), dtype=np.uint8) \
        .reshape(50, 3).astype(np.float64)
    lo, hi = b1[0], b1[1]
    span = np.where(hi > lo, hi - lo, 1.0)
    recon = lo + raw * span / 255.0
    true = _unit(_mat(pa.chunked_array([pa.array(
        df["embedding"].tolist())])))
    assert np.abs(recon - true).max() <= (span.max() / 510) + 1e-12
    q = np.array([[0.2, 0.9, 0.1]])
    a = sq8_topk(sq8_encode(ds1, b1), b1, q, k=5).to_pandas()
    b = sq8_topk(sq8_encode(ds3, b3), b3, q, k=5).to_pandas()
    pd.testing.assert_frame_equal(a, b)
