"""Distributed exact PCA over a ``list<float>`` embedding column.

Dimensionality reduction is a standard pre-step of the embedding stack
(ANN indexing, semantic dedup, outlier screens all get cheaper in a
lower-rank space). PCA's sufficient statistics are one pass of mergeable
moments — count, Σx (d,), ΣxᵀX (d,d) — so the distributed fit is EXACT,
not sampled:

1. fit: each block emits ONE partial row (n, Σx, flattened ΣxᵀX); the
   driver sums #blocks partials, forms the population covariance
   ``ΣxᵀX/n − μμᵀ`` and eigendecomposes it (LAPACK ``eigh`` on a d×d
   symmetric matrix — d is the embedding dim, a model constant).
   Every driver structure is O(d²), corpus-size-independent.
2. transform: the (k, d) component matrix + mean broadcast once via
   ``ray.put``; per block one ``(X − μ) @ Wᵀ`` matmul appends the
   projected coordinates — streamed, no shuffle.

Component signs are fixed deterministically (largest-|loading| element
made positive) so refits are reproducible. ``whiten=True`` scales each
projected coordinate to unit variance (1/√eigenvalue).

No reference analogue (the CRM has no vectors); grounded in the same
public practice as `similarity.py` / `semdedup.py` (SVD/PCA reduction
before indexing, e.g. the IVF-PQ literature's OPQ/PCA pre-rotations).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import ray

from .similarity import _mat


@dataclass(frozen=True)
class PCAModel:
    mean: np.ndarray                      # (d,)
    components: np.ndarray                # (k, d) rows = components
    explained_variance: np.ndarray        # (k,) eigenvalues, descending
    explained_variance_ratio: np.ndarray  # (k,) eigenvalue / trace
    n: int


def fit_pca(ds, *, vec_col: str = "embedding",
            n_components: int = 8) -> PCAModel:
    """Exact population-covariance PCA fit — one streamed pass of
    mergeable moment partials, one d×d eigendecomposition on the
    driver."""

    def partial(b: pa.Table) -> pa.Table:
        if not b.num_rows:  # empty block: dim unknown, emit no partial
            return pa.Table.from_pydict(
                {"n": pa.array([], pa.int64()),
                 "s": pa.array([], pa.list_(pa.float64())),
                 "ss": pa.array([], pa.list_(pa.float64()))})
        m = _mat(b[vec_col]).astype(np.float64)
        return pa.Table.from_pydict({
            "n": pa.array([m.shape[0]], pa.int64()),
            "s": pa.array([m.sum(axis=0)], pa.list_(pa.float64())),
            "ss": pa.array([(m.T @ m).ravel()], pa.list_(pa.float64()))})

    pdf = ds.map_batches(partial, batch_size=None, batch_format="pyarrow",
                         zero_copy_batch=True).to_pandas()
    if "n" not in pdf.columns or not len(pdf) or not pdf["n"].sum():
        raise ValueError("fit_pca: empty dataset")
    n = int(pdf["n"].sum())
    s = np.sum(np.stack(pdf["s"].to_numpy()), axis=0)
    d = s.shape[0]
    if not 1 <= n_components <= d:
        raise ValueError(f"n_components must be in [1, {d}]")
    ss = np.sum(np.stack(pdf["ss"].to_numpy()), axis=0).reshape(d, d)
    mean = s / n
    cov = ss / n - np.outer(mean, mean)
    cov = (cov + cov.T) / 2  # symmetrize away float residue
    evals, evecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(evals)[::-1][:n_components]
    comps = evecs[:, order].T            # (k, d)
    ev = np.maximum(evals[order], 0.0)
    # deterministic sign: the largest-|loading| element of each
    # component is made positive (refits/reruns reproduce exactly)
    flip = comps[np.arange(len(comps)),
                 np.abs(comps).argmax(axis=1)] < 0
    comps[flip] *= -1.0
    trace = max(float(np.trace(cov)), 1e-300)
    return PCAModel(mean=mean, components=comps, explained_variance=ev,
                    explained_variance_ratio=ev / trace, n=n)


def transform_pca(ds, model: PCAModel, *, vec_col: str = "embedding",
                  out_col: str = "pca", whiten: bool = False,
                  keep_input: bool = True):
    """Append the projected coordinates as a ``list<double>`` column —
    streamed, the (k, d) model broadcast once. ``whiten=True`` scales
    each coordinate by 1/√eigenvalue (unit component variance);
    ``keep_input=False`` drops the original vector column (the point of
    the reduction at scale: the wide column never travels further)."""
    scale = (1.0 / np.sqrt(np.maximum(model.explained_variance, 1e-12))
             if whiten else None)
    ref = ray.put((model.mean, model.components, scale))

    def add(b: pa.Table) -> pa.Table:
        mean, comps, sc = ray.get(ref)
        m = _mat(b[vec_col]).astype(np.float64)
        proj = (m - mean) @ comps.T
        if sc is not None:
            proj = proj * sc
        b = b.append_column(out_col,
                            pa.array(list(proj), pa.list_(pa.float64())))
        return b.drop_columns([vec_col]) if not keep_input else b

    return ds.map_batches(add, batch_format="pyarrow",
                          zero_copy_batch=True)
