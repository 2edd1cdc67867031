"""Embedding threshold calibration: the calibrated cutoff actually
delivers the target false-positive rate on fresh random pairs;
determinism; separation from true duplicates."""

import numpy as np
import pandas as pd
import ray.data as rd

from cerberus_ray.pipelines.similarity import emb_threshold_calibration


def _emb_frame(n=400, d=16, seed=5):
    rng = np.random.default_rng(seed)
    v = rng.normal(size=(n, d))
    return pd.DataFrame({
        "vec_id": np.arange(n, dtype=np.int64),
        "embedding": [r.astype(np.float32).tolist() for r in v]})


def test_calibrated_threshold_controls_fpr(ray_session):
    df = _emb_frame()
    ds = rd.from_pandas(df, override_num_blocks=4)
    out = emb_threshold_calibration(ds, target_fpr=0.01,
                                    n_pairs=10_000, seed=1).iloc[0]
    thr = out["threshold"]
    # empirical check on an INDEPENDENT random-pair draw
    rng = np.random.default_rng(99)
    V = np.stack([np.asarray(v, float) for v in df["embedding"]])
    V = V / np.linalg.norm(V, axis=1, keepdims=True)
    ia = rng.integers(0, len(V), 20_000)
    ib = rng.integers(0, len(V), 20_000)
    ok = ia != ib
    cos = np.einsum("ij,ij->i", V[ia[ok]], V[ib[ok]])
    fpr = (cos >= thr).mean()
    assert fpr <= 0.03                      # ≈ target 0.01, loose band
    assert out["mean_cos"] < 0.2            # random ≈ orthogonal
    # a true duplicate (cos 1.0) sits far above the cutoff
    assert thr < 0.99


def test_deterministic_across_layouts(ray_session):
    df = _emb_frame(seed=6)
    a = emb_threshold_calibration(
        rd.from_pandas(df, override_num_blocks=1), n_pairs=3000)
    b = emb_threshold_calibration(
        rd.from_pandas(df, override_num_blocks=7), n_pairs=3000)
    pd.testing.assert_frame_equal(a, b)


def test_zero_norm_vectors_are_dropped(ray_session):
    """A zero vector has no defined cosine — it must produce no pairs
    (and not crash or emit sim=0 rows), matching the oracle where
    list_cosine_similarity would divide by a zero magnitude."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from cerberus_ray.pipelines.similarity import (
        exact_cosine_threshold_pairs,
    )

    df = pd.DataFrame({
        "vec_id": [0, 1, 2],
        "embedding": [[1.0, 0.0], [0.0, 0.0], [1.0, 0.0]],
    })
    out = exact_cosine_threshold_pairs(
        rd.from_pandas(df), threshold=0.9, n_rows_hint=3).to_pandas()
    assert list(zip(out["id_a"], out["id_b"])) == [(0, 2)]

    all_zero = pd.DataFrame({"vec_id": [0, 1],
                             "embedding": [[0.0, 0.0], [0.0, 0.0]]})
    out2 = exact_cosine_threshold_pairs(
        rd.from_pandas(all_zero), threshold=0.5, n_rows_hint=2).to_pandas()
    assert len(out2) == 0
