"""Numeric-column outlier validation — distribution-based range rules.

Extends the static range rule (M17, `rules/core.range_rule`) with fences
derived from the DATA: z-score (mean ± k·σ) and IQR (Tukey fences from
t-digest quartiles). This is the "column stats" leg of the validation
engine's north rule — the same two-pass shape as drift: a tiny mergeable
profile pass, then a streamed flag pass emitting standard violation rows
(doc_id, rule, path, detail).

Scale shape:

- Pass 1 reuses `drift.profile_dataset`: per-block (col → count / Σx /
  Σx² / t-digest) partial rows, driver merge is O(#cols × #blocks) tiny
  sketches. Moments are exact (population σ from Σ/Σ² at float64);
  quartiles are t-digest-approximate with the documented rank-accuracy
  contract (tests/test_pruning.py establishes it for this digest).
- Pass 2 broadcasts the per-column fence pairs (a dict of 2 floats per
  column — O(#cols)) and flags rows in one vectorized pass. No shuffle
  anywhere; violations stream to the caller ∝ outlier rate.

The z-score fences are SQL-expressible (AVG / STDDEV_POP) — the parity
test compares flagged counts per column against DuckDB on the same data.
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

import numpy as np
import pyarrow as pa
import ray

from ..schema import VIOLATIONS
from .drift import NumericProfile, profile_dataset

__all__ = ["numeric_fences", "numeric_outlier_violations", "winsorize",
           "winsorize_report", "scaling_stats", "standardize"]


def numeric_fences(ds, cols: Sequence[str], *, method: str = "zscore",
                   k: float = 3.0) -> Dict[str, Tuple[float, float]]:
    """→ {col: (lo, hi)} from one profile pass. ``zscore``: mean ± k·σ
    (population σ); ``iqr``: [q1 − k·IQR, q3 + k·IQR] (Tukey fences,
    conventionally k=1.5) from t-digest quartiles."""
    if method not in ("zscore", "iqr"):
        raise ValueError(f"unknown method {method!r}")
    prof = profile_dataset(ds, numeric=list(cols))
    fences: Dict[str, Tuple[float, float]] = {}
    for c in cols:
        p = prof.columns.get(c)
        if not isinstance(p, NumericProfile) or not p.count:
            fences[c] = (-np.inf, np.inf)
            continue
        if method == "zscore":
            mean = p.total / p.count
            var = max(p.total_sq / p.count - mean * mean, 0.0)
            sd = var ** 0.5
            fences[c] = (mean - k * sd, mean + k * sd)
        else:
            q1 = float(p.digest.quantile(0.25))
            q3 = float(p.digest.quantile(0.75))
            iqr = q3 - q1
            fences[c] = (q1 - k * iqr, q3 + k * iqr)
    return fences


def numeric_outlier_violations(ds, cols: Sequence[str], *,
                               key_col: str = "doc_id",
                               method: str = "zscore", k: float = 3.0,
                               rule_name: str | None = None):
    """→ violations Dataset (VIOLATIONS schema): one row per (row, col)
    outside that column's fence. Nulls are never outliers (nullability is
    its own rule). The fences dict broadcasts once via ``ray.put``."""
    fences = numeric_fences(ds, cols, method=method, k=k)
    rule = rule_name or f"numeric-outlier-{method}"
    ref = ray.put(fences)

    def flag(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        fen = ray.get(ref)
        keys = pc.cast(b[key_col], pa.string()).to_numpy(
            zero_copy_only=False)
        out_keys, out_path, out_detail = [], [], []
        for c, (lo, hi) in fen.items():
            x = b[c].to_numpy(zero_copy_only=False).astype(np.float64)
            bad = np.flatnonzero(~np.isnan(x) & ((x < lo) | (x > hi)))
            if not len(bad):
                continue
            out_keys.append(keys[bad])
            out_path.append(np.full(len(bad), c, dtype=object))
            out_detail.append(np.array(
                [f"{v:.6g} outside [{lo:.6g}, {hi:.6g}]"
                 for v in x[bad]], dtype=object))
        if not out_keys:
            return VIOLATIONS.empty_table()
        n = sum(len(a) for a in out_keys)
        return pa.Table.from_arrays([
            pa.array(np.concatenate(out_keys), pa.string()),
            pa.array(np.full(n, rule, dtype=object), pa.string()),
            pa.array(np.concatenate(out_path), pa.string()),
            pa.array(np.concatenate(out_detail), pa.string())],
            schema=VIOLATIONS)

    return ds.map_batches(flag, batch_format="pyarrow",
                          zero_copy_batch=True)


def winsorize(ds, cols: Sequence[str], *, method: str = "zscore",
              k: float = 3.0,
              fences: Dict[str, Tuple[float, float]] | None = None):
    """Clip each column to its distribution-derived fence (winsorization
    — the NORMALIZE counterpart of :func:`numeric_outlier_violations`,
    which flags): values below/above the fence become the fence, nulls
    stay null, everything else is untouched. Output columns are float64
    (a clipped int has no integer home). One profile pass for the fences
    (unless passed in precomputed), then one streamed clip pass with the
    O(#cols) fence dict broadcast once."""
    fen = fences if fences is not None else numeric_fences(
        ds, cols, method=method, k=k)
    ref = ray.put(fen)

    def clip(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        for c, (lo, hi) in ray.get(ref).items():
            col = b[c]
            nulls = pc.is_null(col).to_numpy(zero_copy_only=False)
            x = pc.cast(col, pa.float64()).to_numpy(zero_copy_only=False)
            y = np.clip(x, lo, hi)  # NaN passes through untouched
            b = b.set_column(b.schema.get_field_index(c), c,
                             pa.array(y, pa.float64(), from_pandas=False,
                                      mask=nulls))
        return b

    return ds.map_batches(clip, batch_format="pyarrow",
                          zero_copy_batch=True)


def winsorize_report(ds, cols: Sequence[str], *, method: str = "zscore",
                     k: float = 3.0) -> pa.Table:
    """→ (col, lo, hi, n_below, n_above): what a :func:`winsorize` with
    the same parameters would clip. Per-block count partials, O(#cols)
    driver merge."""
    fen = numeric_fences(ds, cols, method=method, k=k)
    ref = ray.put(fen)
    order = list(fen)

    def partial(b: pa.Table) -> pa.Table:
        f = ray.get(ref)
        lo_n, hi_n = [], []
        for c in order:
            lo, hi = f[c]
            x = b[c].to_numpy(zero_copy_only=False).astype(np.float64)
            lo_n.append(int(np.count_nonzero(~np.isnan(x) & (x < lo))))
            hi_n.append(int(np.count_nonzero(~np.isnan(x) & (x > hi))))
        return pa.Table.from_pydict({
            "col": pa.array(order, pa.string()),
            "n_below": pa.array(lo_n, pa.int64()),
            "n_above": pa.array(hi_n, pa.int64())})

    pdf = ds.map_batches(partial, batch_format="pyarrow",
                         zero_copy_batch=True).to_pandas()
    g = pdf.groupby("col", sort=False).sum().reindex(order)
    return pa.Table.from_pydict({
        "col": pa.array(order, pa.string()),
        "lo": pa.array([fen[c][0] for c in order], pa.float64()),
        "hi": pa.array([fen[c][1] for c in order], pa.float64()),
        "n_below": pa.array(g["n_below"].to_numpy(dtype=np.int64)),
        "n_above": pa.array(g["n_above"].to_numpy(dtype=np.int64))})


def scaling_stats(ds, cols: Sequence[str], *,
                  method: str = "zscore") -> Dict[str, Tuple[float, float]]:
    """→ {col: (center, scale)} for :func:`standardize`.

    ``zscore``: (mean, population σ) — exact from the mergeable moment
    profile. ``robust``: (median, IQR) from the t-digest (approximate,
    outlier-insensitive — the sklearn RobustScaler recipe). ``minmax``:
    (min, max − min) from an EXACT per-block min/max partial pass (the
    t-digest's q(0)/q(1) are centroid means, not true extremes)."""
    cols = list(cols)
    if method in ("zscore", "robust"):
        prof = profile_dataset(ds, numeric=cols)
        out: Dict[str, Tuple[float, float]] = {}
        for c in cols:
            p = prof.columns.get(c)
            if not isinstance(p, NumericProfile) or not p.count:
                out[c] = (0.0, 0.0)
            elif method == "zscore":
                mean = p.total / p.count
                var = max(p.total_sq / p.count - mean * mean, 0.0)
                out[c] = (mean, var ** 0.5)
            else:
                q1, med, q3 = (float(p.digest.quantile(q))
                               for q in (0.25, 0.5, 0.75))
                out[c] = (med, q3 - q1)
        return out
    if method != "minmax":
        raise ValueError(f"unknown method {method!r}")

    def mm(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        lo, hi = [], []
        for c in cols:
            s = pc.min_max(b[c])
            lo.append(s["min"].as_py())
            hi.append(s["max"].as_py())
        return pa.Table.from_pydict({
            "col": pa.array(list(cols), pa.string()),
            "lo": pa.array([float("inf") if v is None else float(v)
                            for v in lo], pa.float64()),
            "hi": pa.array([float("-inf") if v is None else float(v)
                            for v in hi], pa.float64())})

    pdf = ds.map_batches(mm, batch_format="pyarrow",
                         zero_copy_batch=True).to_pandas()
    g = pdf.groupby("col").agg(lo=("lo", "min"), hi=("hi", "max"))
    out = {}
    for c in cols:
        lo, hi = float(g.loc[c, "lo"]), float(g.loc[c, "hi"])
        out[c] = (0.0, 0.0) if not np.isfinite(lo) else (lo, hi - lo)
    return out


def standardize(ds, cols: Sequence[str], *, method: str = "zscore",
                stats: Dict[str, Tuple[float, float]] | None = None):
    """Feature scaling: replace each column with ``(x − center) / scale``
    (float64; nulls stay null; a degenerate column — constant, empty —
    has scale 0 and maps to 0.0, the sklearn convention). One stats pass
    (unless precomputed) + one streamed transform with the O(#cols)
    stats dict broadcast once."""
    st = stats if stats is not None else scaling_stats(ds, cols,
                                                       method=method)
    ref = ray.put(st)

    def scale(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        for c, (center, sc) in ray.get(ref).items():
            col = b[c]
            nulls = pc.is_null(col).to_numpy(zero_copy_only=False)
            x = pc.cast(col, pa.float64()).to_numpy(zero_copy_only=False)
            y = (x - center) / sc if sc else np.zeros_like(x)
            b = b.set_column(b.schema.get_field_index(c), c,
                             pa.array(y, pa.float64(), from_pandas=False,
                                      mask=nulls))
        return b

    return ds.map_batches(scale, batch_format="pyarrow",
                          zero_copy_batch=True)
