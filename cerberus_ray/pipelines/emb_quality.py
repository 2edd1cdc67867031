"""Embedding-space distribution validation — per-group centroid cohesion
scoring and outlier detection over a ``list<float>`` embedding column.

The embedding analogue of the engine's value-distribution drift checks
(`stages/drift.py`): a labeled (or source-keyed) embedding table is
healthy when each group's vectors sit near their own centroid; vectors
far below the group's typical cosine-to-centroid are mislabeled, corrupt
or out-of-distribution — the standard centroid/cosine data-quality
screen of public embedding-curation practice.

Ray shape (three streamed passes, every driver structure bounded by
#groups, never by #vectors):

1. ``group_centroids``: per-block partial (label → vector sum, count)
   via one np.add.at scatter; the driver merges #blocks × #labels tiny
   partials and L2-normalizes → (k, d) centroid matrix, broadcast once
   with ``ray.put``.
2. Cosine scoring: streamed matmul of each block's unit vectors against
   the broadcast centroids, gathered per-row by label index; per-block
   partial (label → n, Σcos, Σcos²) merges to per-label mean/std on the
   driver (Welford-free: sums are exact at float64 for bounded cos).
3. ``embedding_outliers``: stateless streamed filter flagging
   cos < mean_label − k·std_label (threshold per group, robust to
   groups of different tightness).

No reference analogue (the CRM has no vectors); grounded in public
embedding-curation practice (centroid cosine screens; the same scoring
kernel as `similarity.py`'s brute-force baseline).
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray

from .similarity import _mat, _unit


def _label_key(batch_col) -> np.ndarray:
    return batch_col.to_numpy(zero_copy_only=False)


def group_centroids(ds, *, vec_col: str = "embedding",
                    label_col: str = "label") -> pd.DataFrame:
    """→ DataFrame (label, centroid (unit np.ndarray), n). Driver holds
    #blocks × #labels partial rows — bounded by the label domain."""

    def partial(b: pa.Table) -> pa.Table:
        m = _mat(b[vec_col])
        lab = _label_key(b[label_col])
        uniq, inv = np.unique(lab, return_inverse=True)
        sums = np.zeros((len(uniq), m.shape[1]), dtype=np.float64)
        np.add.at(sums, inv, m)
        cnt = np.bincount(inv, minlength=len(uniq)).astype(np.int64)
        return pa.Table.from_pydict({
            "label": pa.array(uniq),
            "vsum": pa.array([r.tobytes() for r in sums], pa.binary()),
            "dim": pa.array([m.shape[1]] * len(uniq), pa.int64()),
            "n": pa.array(cnt, pa.int64())})

    pdf = ds.map_batches(partial, batch_format="pyarrow",
                         zero_copy_batch=True).to_pandas()
    if not len(pdf):
        return pd.DataFrame({"label": [], "centroid": [], "n": []})
    out = []
    for lab, g in pdf.groupby("label", sort=True):
        dim = int(g["dim"].iloc[0])
        # one buffer decode + one C reduction per label (not per block)
        s = np.frombuffer(b"".join(g["vsum"]), dtype=np.float64) \
            .reshape(-1, dim).sum(axis=0)
        n = int(g["n"].sum())
        c = s / max(n, 1)
        nrm = np.linalg.norm(c)
        out.append({"label": lab, "centroid": c / (nrm or 1.0), "n": n})
    return pd.DataFrame(out)


def _broadcast_centroids(cent: pd.DataFrame):
    labels = {lab: i for i, lab in enumerate(cent["label"])}
    mat = np.stack(cent["centroid"].to_numpy())
    return ray.put((labels, mat))


def score_centroid_cosine(ds, cent: pd.DataFrame, *,
                          vec_col: str = "embedding",
                          label_col: str = "label"):
    """→ Dataset with a ``centroid_cos`` column appended: cosine of each
    unit vector against ITS OWN group's centroid (one streamed matmul-
    gather per block; centroids broadcast once). Vectors whose label has
    no centroid score NaN."""
    ref = _broadcast_centroids(cent)

    def score(b: pa.Table) -> pa.Table:
        labels, mat = ray.get(ref)
        m = _unit(_mat(b[vec_col]))
        lab = _label_key(b[label_col])
        # vectorized label→row map (no per-row Python)
        idx = (pd.Series(lab).map(labels).fillna(-1)
               .to_numpy(dtype=np.int64))
        cos = np.full(len(lab), np.nan, dtype=np.float64)
        ok = idx >= 0
        if ok.any():
            cos[ok] = np.einsum("ij,ij->i", m[ok], mat[idx[ok]])
        return b.append_column("centroid_cos", pa.array(cos, pa.float64()))

    return ds.map_batches(score, batch_format="pyarrow",
                          zero_copy_batch=True)


def _group_cos_stats(scored, label_col: str) -> pd.DataFrame:
    """Per-label (n, mean, std) of centroid_cos via bounded partials."""

    def partial(b: pa.Table) -> pa.Table:
        lab = _label_key(b[label_col])
        cos = b["centroid_cos"].to_numpy(zero_copy_only=False)
        ok = ~np.isnan(cos)
        lab, cos = lab[ok], cos[ok]
        uniq, inv = np.unique(lab, return_inverse=True)
        n = np.bincount(inv, minlength=len(uniq))
        s = np.bincount(inv, weights=cos, minlength=len(uniq))
        s2 = np.bincount(inv, weights=cos * cos, minlength=len(uniq))
        return pa.Table.from_pydict({
            "label": pa.array(uniq), "n": pa.array(n.astype(np.int64)),
            "s": pa.array(s), "s2": pa.array(s2)})

    pdf = scored.map_batches(partial, batch_format="pyarrow",
                             zero_copy_batch=True).to_pandas()
    if not len(pdf):  # empty input loses its schema in to_pandas
        return pd.DataFrame({"label": [], "n": [], "mean": [], "std": []})
    g = pdf.groupby("label", as_index=False)[["n", "s", "s2"]].sum()
    g["mean"] = g["s"] / g["n"].clip(lower=1)
    var = (g["s2"] / g["n"].clip(lower=1) - g["mean"] ** 2).clip(lower=0.0)
    g["std"] = np.sqrt(var)
    return g[["label", "n", "mean", "std"]]


def embedding_outliers(ds, *, vec_col: str = "embedding",
                       label_col: str = "label", key_col: str = "vec_id",
                       k_sigma: float = 3.0
                       ) -> Tuple["ray.data.Dataset", pd.DataFrame]:
    """→ (outliers Dataset (key, label, centroid_cos, threshold),
    per-label stats DataFrame (label, n, mean, std, threshold,
    n_outliers)). A vector is an outlier when its cosine to its own
    group centroid falls below mean − k_sigma·std for that group.
    ``ds`` is consumed three times — pass a materialized/parquet-backed
    Dataset."""
    cent = group_centroids(ds, vec_col=vec_col, label_col=label_col)
    scored = score_centroid_cosine(ds, cent, vec_col=vec_col,
                                   label_col=label_col).materialize()
    stats = _group_cos_stats(scored, label_col)
    stats["threshold"] = stats["mean"] - k_sigma * stats["std"]
    thr = dict(zip(stats["label"], stats["threshold"]))
    ref = ray.put(thr)

    def flag(b: pa.Table) -> pa.Table:
        t = ray.get(ref)
        lab = _label_key(b[label_col])
        cos = b["centroid_cos"].to_numpy(zero_copy_only=False)
        cut = (pd.Series(lab).map(t).fillna(-np.inf)
               .to_numpy(dtype=np.float64))
        m = ~np.isnan(cos) & (cos < cut)
        mask = pa.array(m, pa.bool_())
        # filter the original columns (not numpy round-trips) so Arrow
        # types — and the schema of empty blocks — are preserved
        return pa.Table.from_pydict({
            key_col: b[key_col].combine_chunks().filter(mask),
            "label": b[label_col].combine_chunks().filter(mask),
            "centroid_cos": b["centroid_cos"].combine_chunks().filter(mask),
            "threshold": pa.array(cut[m], pa.float64())})

    out = scored.map_batches(flag, batch_format="pyarrow",
                             zero_copy_batch=True).materialize()

    # per-label outlier counts: bounded partial bincounts, no shuffle
    def ocount(b: pa.Table) -> pa.Table:
        lab = _label_key(b["label"])
        if not len(lab):  # keep a typed schema on empty blocks
            return (b.select(["label"]).slice(0, 0)
                    .append_column("c", pa.array([], pa.int64())))
        uniq, cnt = np.unique(lab, return_counts=True)
        return pa.Table.from_pydict({
            "label": pa.array(uniq, b.schema.field("label").type),
            "c": pa.array(cnt.astype(np.int64))})

    oc = out.map_batches(ocount, batch_format="pyarrow",
                         zero_copy_batch=True).to_pandas()
    n_map = (oc.groupby("label")["c"].sum().to_dict() if len(oc) else {})
    stats["n_outliers"] = [int(n_map.get(l, 0)) for l in stats["label"]]
    return out, stats
