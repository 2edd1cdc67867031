"""Distributed PCA: exact parity with a full-data numpy reference,
partition invariance, transform/whiten correctness, deterministic signs."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from cerberus_ray.pipelines.pca import PCAModel, fit_pca, transform_pca

D, N, K = 12, 300, 4


def _data():
    rng = np.random.default_rng(23)
    # anisotropic: a few dominant directions so the spectrum is spiky
    basis = rng.normal(size=(D, D))
    scales = np.concatenate([np.array([9.0, 5.0, 2.5]),
                             np.full(D - 3, 0.3)])
    x = rng.normal(size=(N, D)) * scales @ basis.T + rng.normal(size=D)
    return x


def _df(x):
    # Python lists, not numpy cells: from_pandas turns ndarray cells into
    # ArrowTensorArray, which the engine's list<float> readers don't use
    return pd.DataFrame({"vec_id": np.arange(len(x)),
                         "embedding": [r.astype(np.float32).tolist()
                                       for r in x]})


def _ref_pca(x, k):
    x = x.astype(np.float64)
    mean = x.mean(axis=0)
    cov = np.cov(x, rowvar=False, bias=True)
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1][:k]
    return mean, evals[order], evecs[:, order].T


@pytest.fixture(scope="module")
def fitted(ray_session):
    x = _data().astype(np.float32).astype(np.float64)  # match storage
    ds = rd.from_pandas(_df(x), override_num_blocks=5)
    return x, fit_pca(ds, n_components=K)


def test_matches_numpy_reference(fitted):
    x, m = fitted
    mean, evals, comps = _ref_pca(x, K)
    np.testing.assert_allclose(m.mean, mean, atol=1e-9)
    np.testing.assert_allclose(m.explained_variance, evals, rtol=1e-8)
    # components match up to sign
    dots = np.abs(np.sum(m.components * comps, axis=1))
    np.testing.assert_allclose(dots, 1.0, atol=1e-8)


def test_sign_convention_and_ratio(fitted):
    _, m = fitted
    mx = np.abs(m.components).argmax(axis=1)
    assert (m.components[np.arange(K), mx] > 0).all()
    r = m.explained_variance_ratio
    assert (np.diff(r) <= 1e-12).all()  # descending
    assert 0 < r.sum() <= 1 + 1e-9


def test_partition_invariance(ray_session):
    x = _data()
    fits = [fit_pca(rd.from_pandas(_df(x), override_num_blocks=b),
                    n_components=K) for b in (2, 9)]
    np.testing.assert_allclose(fits[0].explained_variance,
                               fits[1].explained_variance, rtol=1e-9)
    np.testing.assert_allclose(fits[0].components, fits[1].components,
                               atol=1e-9)


def test_transform_matches_projection(fitted, ray_session):
    x, m = fitted
    ds = rd.from_pandas(_df(x), override_num_blocks=3)
    out = transform_pca(ds, m).to_pandas().sort_values("vec_id")
    got = np.stack(out["pca"].to_numpy())
    want = (x - m.mean) @ m.components.T
    np.testing.assert_allclose(got, want, atol=1e-6)
    assert "embedding" in out.columns  # keep_input default


def test_whiten_unit_variance_and_drop_input(fitted, ray_session):
    x, m = fitted
    ds = rd.from_pandas(_df(x), override_num_blocks=3)
    out = transform_pca(ds, m, whiten=True,
                        keep_input=False).to_pandas()
    got = np.stack(out["pca"].to_numpy())
    np.testing.assert_allclose(got.var(axis=0), 1.0, rtol=1e-6)
    assert "embedding" not in out.columns


def test_reconstruction_error_shrinks_with_k(ray_session):
    x = _data()
    ds = rd.from_pandas(_df(x), override_num_blocks=4)
    errs = []
    for k in (1, 3, 6):
        m = fit_pca(ds, n_components=k)
        proj = (x - m.mean) @ m.components.T
        rec = proj @ m.components + m.mean
        errs.append(float(((x - rec) ** 2).mean()))
    assert errs[0] > errs[1] > errs[2]


def test_bad_k_and_empty(ray_session):
    x = _data()
    ds = rd.from_pandas(_df(x))
    with pytest.raises(ValueError):
        fit_pca(ds, n_components=D + 1)
    with pytest.raises(ValueError):
        fit_pca(ds.filter(lambda r: False), n_components=2)


def test_pca_report_query(ray_session):
    from cerberus_ray.pipelines.training_queries import q_pca_report

    out = q_pca_report("/root/testdata/sf0.001").to_pandas()
    assert len(out) == 8
    r = out["explained_variance_ratio"].to_numpy()
    assert (np.diff(r) <= 1e-12).all() and 0 < r.sum() <= 1 + 1e-9
    assert out.equals(q_pca_report("/root/testdata/sf0.001").to_pandas())
