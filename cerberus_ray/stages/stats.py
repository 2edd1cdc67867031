"""Distributed column statistics: exact Pearson correlation / covariance
matrices over numeric columns — the feature-audit step before training
(collinearity checks, leakage screens).

Null semantics match SQL ``CORR(x, y)``: each PAIR uses exactly the rows
where BOTH columns are non-null (pairwise deletion), not listwise — so
the result is bit-comparable to DuckDB per pair.

Execution shape: one streamed pass; each block contributes five k×k
mergeable matrices computed as dense matmuls over the null-masked block
(M = non-null mask, X0 = values with nulls zeroed):

    n  = Mᵀ M          pair counts
    sx = X0ᵀ M         Σx over the pair's complete rows (and its
                       transpose is Σy)
    sxy = X0ᵀ X0       Σxy
    sx2 = (X0²)ᵀ M     Σx² (transpose: Σy²)

The driver sums O(#blocks) such matrices — k² floats each, bounded by
the column count, never the row count — and finishes the algebra:
``corr = (n·Σxy − Σx·Σy) / √(n·Σx² − Σx²ᵖ) √(n·Σy² − Σy²ᵖ)``.
"""

from __future__ import annotations

from typing import List, Sequence

import numpy as np
import pandas as pd
import pyarrow as pa

__all__ = ["corr_matrix", "cov_matrix", "grouped_regression", "histogram",
           "chi2_independence", "completeness_report"]


def _moment_partials(ds, cols: List[str]) -> List[np.ndarray]:
    k = len(cols)

    def partial(b: pa.Table) -> pa.Table:
        X = np.column_stack([
            b[c].to_numpy(zero_copy_only=False).astype(np.float64)
            for c in cols])
        M = (~np.isnan(X)).astype(np.float64)
        X0 = np.where(np.isnan(X), 0.0, X)
        mats = np.stack([M.T @ M, X0.T @ M, X0.T @ X0,
                         (X0 * X0).T @ M])
        return pa.Table.from_pydict(
            {"flat": pa.array([mats.ravel().tobytes()], pa.binary())})

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True).to_pandas()
    acc = np.zeros((4, k, k))
    for blob in parts["flat"]:
        acc += np.frombuffer(blob, dtype=np.float64).reshape(4, k, k)
    return list(acc)


def corr_matrix(ds, cols: Sequence[str]) -> pd.DataFrame:
    """→ k×k DataFrame (index/columns = ``cols``) of pairwise-complete
    Pearson correlations; a pair with <2 complete rows or zero variance
    is NaN (SQL CORR returns NULL there)."""
    cols = list(cols)
    n, sx, sxy, sx2 = _moment_partials(ds, cols)
    sy, sy2 = sx.T, sx2.T
    with np.errstate(invalid="ignore", divide="ignore"):
        cov_n = n * sxy - sx * sy
        var_x = n * sx2 - sx * sx
        var_y = n * sy2 - sy * sy
        r = cov_n / np.sqrt(var_x * var_y)
        r = np.where((n >= 2) & (var_x > 0) & (var_y > 0), r, np.nan)
    return pd.DataFrame(r, index=cols, columns=cols)


def cov_matrix(ds, cols: Sequence[str], *, ddof: int = 1) -> pd.DataFrame:
    """→ k×k pairwise-complete covariance (sample by default, ddof=1 —
    SQL COVAR_SAMP; ddof=0 for COVAR_POP)."""
    cols = list(cols)
    n, sx, sxy, _ = _moment_partials(ds, cols)
    sy = sx.T
    with np.errstate(invalid="ignore", divide="ignore"):
        c = (sxy - sx * sy / n) / (n - ddof)
        c = np.where(n > ddof, c, np.nan)
    return pd.DataFrame(c, index=cols, columns=cols)


def grouped_regression(ds, group_cols: Sequence[str], x: str,
                       y: str, *,
                       _return_moments: bool = False) -> pd.DataFrame:
    """Per-group ordinary least squares of ``y`` on ``x`` — SQL's
    ``REGR_SLOPE / REGR_INTERCEPT / REGR_R2 / REGR_COUNT`` family, same
    null semantics (a row counts only when BOTH x and y are non-null).

    → DataFrame (group cols..., n, slope, intercept, r2), sorted by
    group. One streamed pass of per-block grouped moment partials
    (n, Σx, Σy, Σxy, Σx², Σy² — a pandas hash aggregate per block), then
    an O(#groups × #blocks) driver merge — bounded by the group domain,
    the same contract as ``groupagg.grouped_agg``. A group with <2 rows
    or zero x-variance gets NaN slope/intercept (SQL returns NULL);
    r2 is additionally NaN when y has zero variance."""
    group_cols = list(group_cols)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        m = df[x].notna() & df[y].notna()
        d = df.loc[m, group_cols].copy()
        xv = df.loc[m, x].astype(np.float64)
        yv = df.loc[m, y].astype(np.float64)
        d["_n"] = 1
        d["_sx"] = xv
        d["_sy"] = yv
        d["_sxy"] = xv * yv
        d["_sx2"] = xv * xv
        d["_sy2"] = yv * yv
        return (d.groupby(group_cols, sort=False, dropna=False)
                .sum().reset_index())

    pdf = ds.map_batches(partial, batch_format="pandas").to_pandas()
    if not len(pdf):
        return pd.DataFrame({c: [] for c in group_cols
                             + ["n", "slope", "intercept", "r2"]})
    g = pdf.groupby(group_cols, dropna=False).sum().reset_index()
    if _return_moments:
        # composition hook (simpson_check): the merged per-group moment
        # sums — pooled statistics are their plain addition
        return g
    n = g["_n"].to_numpy(dtype=np.float64)
    sx, sy = g["_sx"].to_numpy(), g["_sy"].to_numpy()
    sxy, sx2, sy2 = (g["_sxy"].to_numpy(), g["_sx2"].to_numpy(),
                     g["_sy2"].to_numpy())
    with np.errstate(invalid="ignore", divide="ignore"):
        var_x = n * sx2 - sx * sx
        var_y = n * sy2 - sy * sy
        cov = n * sxy - sx * sy
        slope = np.where(var_x > 0, cov / var_x, np.nan)
        intercept = np.where(var_x > 0, (sy - slope * sx) / n, np.nan)
        r2 = np.where((var_x > 0) & (var_y > 0),
                      (cov * cov) / (var_x * var_y), np.nan)
    out = g[group_cols].copy()
    out["n"] = g["_n"].astype("int64")
    out["slope"], out["intercept"], out["r2"] = slope, intercept, r2
    return out.sort_values(group_cols).reset_index(drop=True)


def histogram(ds, col: str, *, bins: int = 20,
              lo: float | None = None,
              hi: float | None = None) -> pd.DataFrame:
    """Exact equi-width histogram → (bin, lo, hi, n): per-block
    ``np.histogram`` partials over fixed edges, O(#blocks × bins) driver
    merge. Bounds default to the column's exact min/max (one extremes
    pass); values outside explicit bounds clamp into the edge bins
    (SQL ``width_bucket`` under/overflow buckets folded in, so Σn =
    non-null row count either way). Nulls are excluded."""
    if bins < 1:
        raise ValueError("bins must be >= 1")
    if lo is None or hi is None:
        mm = ds.map_batches(
            lambda b: pa.Table.from_pydict({
                "lo": pa.array([_np_min(b[col])]),
                "hi": pa.array([_np_max(b[col])])}),
            batch_format="pyarrow", zero_copy_batch=True).to_pandas()
        lo = float(mm["lo"].min()) if lo is None else lo
        hi = float(mm["hi"].max()) if hi is None else hi
    if not np.isfinite(lo) or not np.isfinite(hi):
        lo, hi = 0.0, 1.0  # all-null/empty column: a real one-bin range
    elif hi <= lo:
        hi = lo + 1.0  # constant column: one bin
    edges = np.linspace(lo, hi, bins + 1)

    def partial(b: pa.Table) -> pa.Table:
        x = b[col].to_numpy(zero_copy_only=False).astype(np.float64)
        x = x[~np.isnan(x)]
        counts, _ = np.histogram(np.clip(x, lo, hi), bins=edges)
        return pa.Table.from_pydict({"n": pa.array(counts, pa.int64())})

    pdf = ds.map_batches(partial, batch_format="pyarrow",
                         zero_copy_batch=True).to_pandas()
    n = (pdf["n"].to_numpy(dtype=np.int64).reshape(-1, bins).sum(axis=0)
         if len(pdf) else np.zeros(bins, dtype=np.int64))
    return pd.DataFrame({"bin": np.arange(bins, dtype=np.int64),
                         "lo": edges[:-1], "hi": edges[1:], "n": n})


def _np_min(arr) -> float:
    x = arr.to_numpy(zero_copy_only=False).astype(np.float64)
    x = x[~np.isnan(x)]
    return float(x.min()) if len(x) else float("inf")


def _np_max(arr) -> float:
    x = arr.to_numpy(zero_copy_only=False).astype(np.float64)
    x = x[~np.isnan(x)]
    return float(x.max()) if len(x) else float("-inf")


def chi2_independence(ds, col_a: str, col_b: str, *,
                      max_levels: int = 1000) -> dict:
    """Pearson chi-square test of independence between two categorical
    columns → {"chi2", "dof", "n", "cramers_v", "table"} (the
    contingency table as a DataFrame). No p-value (no scipy in the
    stack); compare chi2 against the chi-square critical value for
    ``dof`` externally, or rank associations by Cramér's V directly.

    One streamed pass of per-block (a, b, n) hash-aggregate partials —
    bounded by the LEVEL domain, not the data (guarded by
    ``max_levels`` per column against accidental high-cardinality
    inputs). Rows with a null in either column are excluded (SQL
    cross-tab convention)."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        d = df[[col_a, col_b]].dropna()
        return (d.groupby([col_a, col_b], sort=False).size()
                .reset_index(name="n"))

    pdf = ds.map_batches(partial, batch_format="pandas").to_pandas()
    if not len(pdf):
        return {"chi2": float("nan"), "dof": 0, "n": 0,
                "cramers_v": float("nan"),
                "table": pd.DataFrame()}
    g = pdf.groupby([col_a, col_b], as_index=False)["n"].sum()
    tab = g.pivot_table(index=col_a, columns=col_b, values="n",
                        aggfunc="first").fillna(0.0)
    if len(tab.index) > max_levels or len(tab.columns) > max_levels:
        raise ValueError(
            f"contingency table {len(tab.index)}×{len(tab.columns)} "
            f"exceeds max_levels={max_levels} — bucket the column first")
    obs = tab.to_numpy(dtype=np.float64)
    n = obs.sum()
    exp = np.outer(obs.sum(axis=1), obs.sum(axis=0)) / n
    with np.errstate(invalid="ignore", divide="ignore"):
        cells = np.where(exp > 0, (obs - exp) ** 2 / exp, 0.0)
    chi2 = float(cells.sum())
    r, c = obs.shape
    dof = (r - 1) * (c - 1)
    k = min(r - 1, c - 1)
    v = float(np.sqrt(chi2 / (n * k))) if n > 0 and k > 0 else float("nan")
    return {"chi2": chi2, "dof": int(dof), "n": int(n),
            "cramers_v": v, "table": tab}


def completeness_report(ds, cols: Sequence[str] | None = None, *,
                        approx_distinct: bool = False) -> pd.DataFrame:
    """Per-column data-quality summary → (col, n, n_null, null_frac,
    n_distinct, min, max): the profiling table a validation run leads
    with. One streamed pass of per-column partials: counts and typed
    min/max merge exactly (numeric/temporal columns merge on a float
    sort key, strings lexicographically); distinct counts are exact via
    per-block distinct-value partials, or ±2%-HLL with
    ``approx_distinct=True`` (KB of driver state — the 10^9-distinct
    path). Min/max are None for all-null or non-orderable columns."""
    import pyarrow.compute as pc

    from ..state.hll import HyperLogLog

    cols = list(cols) if cols is not None else list(ds.schema().names)

    def _key_disp(scalar, typ):
        v = scalar.as_py()
        if v is None:
            return None, None
        if (pa.types.is_integer(typ) or pa.types.is_floating(typ)
                or pa.types.is_boolean(typ) or pa.types.is_decimal(typ)):
            return float(v), str(v)
        if pa.types.is_temporal(typ):
            return float(pa.scalar(v, typ).cast(pa.int64()).as_py()), str(v)
        return None, str(v)  # lexicographic merge on the display string

    def partial(b: pa.Table) -> pa.Table:
        out = {k: [] for k in ("col", "n", "n_null", "mn_key", "mn",
                               "mx_key", "mx", "distinct")}
        for c in cols:
            arr = b[c]
            out["col"].append(c)
            out["n"].append(b.num_rows)
            out["n_null"].append(arr.null_count)
            try:
                mm = pc.min_max(arr)
                mn_k, mn_d = _key_disp(mm["min"], arr.type)
                mx_k, mx_d = _key_disp(mm["max"], arr.type)
            except pa.ArrowNotImplementedError:
                mn_k = mn_d = mx_k = mx_d = None
            out["mn_key"].append(mn_k)
            out["mn"].append(mn_d)
            out["mx_key"].append(mx_k)
            out["mx"].append(mx_d)
            try:
                vals = pc.cast(arr.drop_null(), pa.string())
            except (pa.ArrowNotImplementedError, pa.ArrowInvalid):
                out["distinct"].append(None)  # nested type: counts only
                continue
            if approx_distinct:
                h = HyperLogLog()
                h.update_strings(vals.to_numpy(zero_copy_only=False))
                out["distinct"].append("h" + h.to_bytes().hex())
            else:
                # escape so a value containing the separator can't
                # corrupt the distinct merge (injective), and prefix
                # every value with 'x' so even a lone EMPTY STRING
                # yields a payload longer than the bare "v" marker —
                # the driver's len>1 guard used to drop it
                u = ["x" + v.replace("\x1e", "\x1e\x1e").replace(
                    "\x1f", "\x1eF") for v in vals.unique().to_pylist()]
                out["distinct"].append("v" + "\x1f".join(sorted(u)))
        return pa.Table.from_pydict({
            "col": pa.array(out["col"], pa.string()),
            "n": pa.array(out["n"], pa.int64()),
            "n_null": pa.array(out["n_null"], pa.int64()),
            "mn_key": pa.array(out["mn_key"], pa.float64()),
            "mn": pa.array(out["mn"], pa.string()),
            "mx_key": pa.array(out["mx_key"], pa.float64()),
            "mx": pa.array(out["mx"], pa.string()),
            "distinct": pa.array(out["distinct"], pa.string())})

    pdf = ds.map_batches(partial, batch_format="pyarrow",
                         zero_copy_batch=True).to_pandas()
    rows = []
    for c in cols:
        sub = pdf[pdf["col"] == c]
        n = int(sub["n"].sum())
        n_null = int(sub["n_null"].sum())
        has_key = sub["mn_key"].notna()
        if has_key.any():  # numeric/temporal: merge on the sort key
            mn = sub.loc[sub["mn_key"].idxmin(), "mn"]                 if sub["mn_key"].notna().any() else None
            mx = sub.loc[sub["mx_key"].idxmax(), "mx"]
        else:  # strings: lexicographic on the display value
            mns = sub["mn"].dropna()
            mxs = sub["mx"].dropna()
            mn = mns.min() if len(mns) else None
            mx = mxs.max() if len(mxs) else None
        ds_col = sub["distinct"].dropna()
        if len(ds_col) < len(sub):
            nd = None  # nested/uncastable type: counts only
        elif approx_distinct:
            acc = HyperLogLog()
            for d in ds_col:
                acc.merge_bytes(bytes.fromhex(d[1:]))
            nd = int(round(acc.estimate()))
        else:
            seen: set = set()
            for d in ds_col:
                if len(d) > 1:
                    seen.update(p[1:] for p in d[1:].split("\x1f"))
            nd = len(seen)
        rows.append({
            "col": c, "n": n, "n_null": n_null,
            "null_frac": round(n_null / n, 6) if n else 0.0,
            "n_distinct": nd, "min": mn, "max": mx})
    return pd.DataFrame(rows)


def approx_cdf_column(ds, col: str, *, k: int = 200,
                      out_col: str = "cdf"):
    """Global empirical-CDF transform at any scale: append ``out_col``
    = the approximate fraction of the WHOLE column ≤ the row's value.

    Two passes, no sort, no shuffle: pass 1 merges per-block KLL
    sketches (O(k log(n/k)) each — KBs) on the driver; pass 2 ranks
    every row against the merged sketch VECTORIZED (one searchsorted
    into the sketch's sorted weighted items, broadcast once). Rank
    error follows the KLL guarantee (~O(1/k) uniform); NaN/NULL rows
    get NaN. The sketch-shaped sibling of map-mode ``global_ranks``:
    right when the column is near-unique and a broadcast lookup or a
    full sort would be the wrong price for an approximate percentile.

    The merged sketch depends on block layout at the margin (same
    contract as the z-order boundary fit): reruns on a fixed layout are
    bit-identical; accuracy, not bit-identity, holds across layouts.
    """
    import ray

    from ..state.kll import KLL

    def sketch_partial(b: pa.Table) -> pa.Table:
        v = b[col].to_numpy(zero_copy_only=False).astype(np.float64)
        s = KLL(k=k)
        s.update(v[~np.isnan(v)])
        return pa.Table.from_pydict({
            "s": pa.array([s.to_bytes()], pa.binary())})

    parts = ds.map_batches(sketch_partial, batch_format="pyarrow",
                           zero_copy_batch=True).to_pandas()
    acc = KLL(k=k)
    for raw in sorted(parts["s"]):       # order-pinned merge
        acc.merge(KLL.from_bytes(raw))  # in-place, like all sketches
    items, weights = [], []
    for j, lvl in enumerate(acc.levels):
        if len(lvl):
            items.append(np.asarray(lvl, dtype=np.float64))
            weights.append(np.full(len(lvl), float(1 << j)))
    if not items:
        def passthrough(b: pa.Table) -> pa.Table:
            return b.append_column(out_col, pa.array(
                np.full(b.num_rows, np.nan), pa.float64()))

        return ds.map_batches(passthrough, batch_format="pyarrow",
                              zero_copy_batch=True)
    x = np.concatenate(items)
    w = np.concatenate(weights)
    order = np.argsort(x, kind="mergesort")
    x, cw = x[order], np.cumsum(w[order])
    total = float(cw[-1])
    ref = ray.put((x, cw))

    def rank(b: pa.Table) -> pa.Table:
        xs, cws = ray.get(ref)
        v = b[col].to_numpy(zero_copy_only=False).astype(np.float64)
        pos = np.searchsorted(xs, v, side="right")
        cdf = np.where(pos > 0, cws[np.maximum(pos - 1, 0)], 0.0) / total
        cdf = np.where(np.isnan(v), np.nan, cdf)
        return b.append_column(out_col, pa.array(cdf, pa.float64()))

    return ds.map_batches(rank, batch_format="pyarrow",
                          zero_copy_batch=True)


def spearman_by_group(ds, group_col: str, x_col: str, y_col: str, *,
                      n_buckets: int = 32,
                      round_digits: int = 6) -> pd.DataFrame:
    """Grouped Spearman rank correlation: Pearson over average-tie
    ranks per group — the monotone-association companion of
    ``corr_matrix`` (which is Pearson on raw values). Ranking is a
    whole-group property, so one `keyed_apply` hash exchange
    co-locates each group; inside a bucket everything is C-vectorized
    (groupby.rank for ranks, grouped sums for the Pearson terms — no
    per-group Python). Output is one row per group.

    NULL handling: rows with a null in either column are dropped
    per-group BEFORE ranking (SQL corr semantics).

    → frame (group_col, n, rho) sorted by group; rho is NaN for
    groups with < 2 complete rows or a constant column."""
    from .keyed_window import keyed_apply

    def kern(g: pd.DataFrame) -> pd.DataFrame:
        g = g.dropna(subset=[x_col, y_col])
        if not len(g):
            return pd.DataFrame({group_col: [], "n": [], "rho": []})
        gb = g.groupby(group_col, sort=False, dropna=False)
        rx = gb[x_col].rank(method="average")
        ry = gb[y_col].rank(method="average")
        t = pd.DataFrame({group_col: g[group_col].to_numpy(),
                          "rx": rx.to_numpy(), "ry": ry.to_numpy()})
        t["rxy"] = t["rx"] * t["ry"]
        t["rx2"] = t["rx"] ** 2
        t["ry2"] = t["ry"] ** 2
        # dropna=False: a NULL group is still a group (kendall/theil-sen
        # report it; SQL GROUP BY groups NULLs)
        s = t.groupby(group_col, sort=False, dropna=False).agg(
            n=("rx", "size"), sx=("rx", "sum"), sy=("ry", "sum"),
            sxy=("rxy", "sum"), sx2=("rx2", "sum"), sy2=("ry2", "sum"))
        n = s["n"].to_numpy(np.float64)
        cov = s["sxy"] - s["sx"] * s["sy"] / n
        vx = s["sx2"] - s["sx"] ** 2 / n
        vy = s["sy2"] - s["sy"] ** 2 / n
        denom = np.sqrt(vx * vy)
        rho = np.where((n >= 2) & (denom > 0), cov / denom, np.nan)
        return pd.DataFrame({group_col: s.index.to_numpy(),
                             "n": s["n"].to_numpy(np.int64),
                             "rho": np.round(rho, round_digits)})

    pdf = keyed_apply(ds.select_columns([group_col, x_col, y_col]),
                      group_col, kern, n_buckets=n_buckets).to_pandas()
    if not len(pdf):
        return pd.DataFrame({group_col: [], "n": [], "rho": []})
    return pdf.sort_values(group_col).reset_index(drop=True)


def theil_sen_by_group(ds, group_col: str, x_col: str, y_col: str, *,
                       max_pairs: int = 2000, seed: int = 42,
                       n_buckets: int = 32,
                       round_digits: int = 6) -> pd.DataFrame:
    """Grouped Theil-Sen robust trend (Theil 1950 / Sen 1968): slope =
    median of pairwise slopes, intercept = median(y − slope·x) —
    outlier-resistant where ``grouped_regression``'s OLS is not.

    One `keyed_apply` exchange co-locates each group; inside a bucket
    the kernel processes every group of the SAME size simultaneously
    (the per-size matrix-gather pattern): exact all-pairs while
    C(s,2) ≤ ``max_pairs``, a seeded fixed pair design beyond (the
    same deterministic-subsample convention as the engine's other
    seeded estimators — Sen's estimator over a random pair subset).
    Pairs with tied x are excluded (slope undefined), per the
    standard definition.

    → frame (group_col, n, slope, intercept); slope NaN when every
    pair has tied x or n < 2."""
    from ..determinism import randint
    from .keyed_window import keyed_apply

    def kern(g: pd.DataFrame) -> pd.DataFrame:
        g = g.dropna(subset=[x_col, y_col])
        g = g.sort_values([group_col, x_col, y_col], kind="mergesort")
        keys = g[group_col].to_numpy()
        x = g[x_col].to_numpy(dtype=np.float64)
        y = g[y_col].to_numpy(dtype=np.float64)
        uk, starts, counts = np.unique(keys, return_index=True,
                                       return_counts=True)
        out_k, out_n, out_s, out_i = [], [], [], []
        for s in np.unique(counts):
            rows = starts[counts == s]
            ks = uk[counts == s]
            if s < 2:
                out_k.append(ks)
                out_n.append(np.full(len(ks), s, dtype=np.int64))
                out_s.append(np.full(len(ks), np.nan))
                out_i.append(np.full(len(ks), np.nan))
                continue
            if s * (s - 1) // 2 <= max_pairs:
                iu, ju = np.triu_indices(s, k=1)
            else:
                # fixed seeded pair design per size class — identical
                # for every group of this size and every layout
                idx = np.arange(2 * max_pairs)
                a = randint(idx, seed, int(s), 0, int(s))
                iu0, ju0 = a[:max_pairs], a[max_pairs:]
                keep = iu0 != ju0
                iu, ju = iu0[keep], ju0[keep]
            gx = x[rows[:, None] + np.arange(s)[None, :]]
            gy = y[rows[:, None] + np.arange(s)[None, :]]
            dx = gx[:, ju] - gx[:, iu]
            dy = gy[:, ju] - gy[:, iu]
            import warnings

            with np.errstate(divide="ignore", invalid="ignore"), \
                    warnings.catch_warnings():
                warnings.simplefilter("ignore", RuntimeWarning)
                sl = np.where(dx != 0, dy / dx, np.nan)
                slope = np.nanmedian(sl, axis=1)
                inter = np.nanmedian(gy - slope[:, None] * gx, axis=1)
            out_k.append(ks)
            out_n.append(np.full(len(ks), s, dtype=np.int64))
            out_s.append(slope)
            out_i.append(inter)
        if not out_k:
            return pd.DataFrame({group_col: [], "n": [], "slope": [],
                                 "intercept": []})
        return pd.DataFrame({
            group_col: np.concatenate(out_k),
            "n": np.concatenate(out_n),
            "slope": np.round(np.concatenate(out_s), round_digits),
            "intercept": np.round(np.concatenate(out_i),
                                  round_digits)})

    pdf = keyed_apply(ds.select_columns([group_col, x_col, y_col]),
                      group_col, kern, n_buckets=n_buckets).to_pandas()
    if not len(pdf):
        return pd.DataFrame({group_col: [], "n": [], "slope": [],
                             "intercept": []})
    return pdf.sort_values(group_col).reset_index(drop=True)


def simpson_check(ds, x: str, y: str, group_col: str, *,
                  min_group_n: int = 5,
                  round_digits: int = 6) -> pd.DataFrame:
    """Simpson's-paradox screen: does the MARGINAL x→y trend reverse
    once you condition on ``group_col``? (Simpson 1951; the classic
    aggregation-bias integrity check before anyone acts on a pooled
    correlation.) Both trends are OLS slopes from the SAME one-pass
    moment partials — the pooled slope falls out of the per-group
    moment sums by addition, so the whole screen costs one
    ``grouped_regression`` pass.

    → one-row frame (pooled_slope, n_groups, n_groups_opposite,
    share_opposite, simpson_flag): flagged when the pooled slope's
    sign disagrees with the majority of (≥ ``min_group_n``-row)
    group slopes."""
    mom = grouped_regression(ds, [group_col], x, y,
                             _return_moments=True)
    if not len(mom) or "_n" not in mom.columns:
        return pd.DataFrame([{
            "pooled_slope": float("nan"), "n_groups": 0,
            "n_groups_opposite": 0, "share_opposite": float("nan"),
            "simpson_flag": False}])
    # ONE pass: per-group slopes AND the pooled slope both derive from
    # the same merged moment sums (pooled = plain addition of groups)
    n_g = mom["_n"].to_numpy(np.float64)
    with np.errstate(invalid="ignore", divide="ignore"):
        var_x = n_g * mom["_sx2"].to_numpy() - mom["_sx"].to_numpy()**2
        cov = (n_g * mom["_sxy"].to_numpy()
               - mom["_sx"].to_numpy() * mom["_sy"].to_numpy())
        slopes = np.where(var_x > 0, cov / var_x, np.nan)
    n = mom["_n"].sum()
    sx, sy = mom["_sx"].sum(), mom["_sy"].sum()
    sxy, sx2 = mom["_sxy"].sum(), mom["_sx2"].sum()
    denom = n * sx2 - sx * sx
    pooled = (n * sxy - sx * sy) / denom if denom else float("nan")
    ok = (n_g >= min_group_n) & np.isfinite(slopes)
    opp = int((np.sign(slopes[ok]) == -np.sign(pooled)).sum()) \
        if ok.any() and np.isfinite(pooled) and pooled != 0 else 0
    share = opp / int(ok.sum()) if ok.any() else float("nan")
    gg = mom[ok]
    return pd.DataFrame([{
        "pooled_slope": round(float(pooled), round_digits),
        "n_groups": int(len(gg)),
        "n_groups_opposite": opp,
        "share_opposite": round(share, round_digits)
        if share == share else share,
        "simpson_flag": bool(share == share and share > 0.5)}])


def kendall_by_group(ds, group_col: str, x_col: str, y_col: str, *,
                     max_pairs: int = 2000, seed: int = 42,
                     n_buckets: int = 32,
                     round_digits: int = 9) -> pd.DataFrame:
    """Grouped Kendall's τ-b (Kendall 1938, tie-corrected form):
    τ_b = (n_c − n_d) / √((n₀ − n₁)(n₀ − n₂)) over a group's pairs,
    where n₁/n₂ are the x-tied / y-tied pair counts — completing the
    engine's correlation family (Pearson / Spearman / Theil-Sen).

    One `keyed_apply` exchange; inside a bucket the kernel processes
    every group of the same size simultaneously (the per-size
    matrix-gather pattern shared with theil_sen_by_group): exact
    all-pairs while C(s,2) ≤ ``max_pairs``; beyond that, the SAME τ-b
    ratio over a seeded fixed pair design — a consistent estimator,
    since τ-b is exactly (P[concordant] − P[discordant]) /
    √(P[x untied]·P[y untied]) under uniform random pairs.

    → frame (group_col, n, tau_b); NaN when n < 2 or either margin is
    fully tied. SQL-oracle parity (self-join SIGN-product form) in
    tests/test_stats_spearman.py."""
    from ..determinism import randint
    from .keyed_window import keyed_apply

    def kern(g: pd.DataFrame) -> pd.DataFrame:
        g = g.dropna(subset=[x_col, y_col])
        g = g.sort_values([group_col, x_col, y_col], kind="mergesort")
        keys = g[group_col].to_numpy()
        x = g[x_col].to_numpy(dtype=np.float64)
        y = g[y_col].to_numpy(dtype=np.float64)
        uk, starts, counts = np.unique(keys, return_index=True,
                                       return_counts=True)
        out_k, out_n, out_t = [], [], []
        for s in np.unique(counts):
            rows = starts[counts == s]
            ks = uk[counts == s]
            if s < 2:
                out_k.append(ks)
                out_n.append(np.full(len(ks), s, dtype=np.int64))
                out_t.append(np.full(len(ks), np.nan))
                continue
            if s * (s - 1) // 2 <= max_pairs:
                iu, ju = np.triu_indices(s, k=1)
            else:
                idx = np.arange(2 * max_pairs)
                a = randint(idx, seed, int(s), 0, int(s))
                iu0, ju0 = a[:max_pairs], a[max_pairs:]
                keep = iu0 != ju0
                iu, ju = iu0[keep], ju0[keep]
            gx = x[rows[:, None] + np.arange(s)[None, :]]
            gy = y[rows[:, None] + np.arange(s)[None, :]]
            dx = np.sign(gx[:, ju] - gx[:, iu])
            dy = np.sign(gy[:, ju] - gy[:, iu])
            m = dx.shape[1]
            ncd = (dx * dy).sum(axis=1)
            n1 = (dx == 0).sum(axis=1)
            n2 = (dy == 0).sum(axis=1)
            denom = np.sqrt((m - n1).astype(np.float64)
                            * (m - n2).astype(np.float64))
            with np.errstate(invalid="ignore", divide="ignore"):
                tau = np.where(denom > 0, ncd / denom, np.nan)
            out_k.append(ks)
            out_n.append(np.full(len(ks), s, dtype=np.int64))
            out_t.append(tau)
        if not out_k:
            return pd.DataFrame({group_col: [], "n": [], "tau_b": []})
        return pd.DataFrame({
            group_col: np.concatenate(out_k),
            "n": np.concatenate(out_n),
            "tau_b": np.round(np.concatenate(out_t), round_digits)})

    pdf = keyed_apply(ds.select_columns([group_col, x_col, y_col]),
                      group_col, kern, n_buckets=n_buckets).to_pandas()
    if not len(pdf):
        return pd.DataFrame({group_col: [], "n": [], "tau_b": []})
    return pdf.sort_values(group_col).reset_index(drop=True)
