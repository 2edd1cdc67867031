"""Rank/robust k-group comparison tests: Kruskal-Wallis H (the
rank-based ANOVA) and Brown-Forsythe (the median-centered variance
homogeneity F) — the nonparametric companions of `stages/anova.py`.
Public methods: Kruskal & Wallis 1952, Brown & Forsythe 1974.

Both exploit the same property the engine's exact-quantile path uses
(`relational.events_quantiles`): 2-dp measures have a BOUNDED distinct
domain, so a per-(group, value) exact count histogram is a complete
sufficient statistic. Ranks, tie corrections, medians and absolute
deviations are all closed forms over that histogram — no global sort,
no rank shuffle, no second pass over raw rows for KW (Brown-Forsythe
pays one extra pass to accumulate |x − median_g| moments, with the
median map broadcast).

Scale shape: partials are per-block pyarrow hash aggregates bounded by
#groups × #distinct-values; the driver merge is over that bounded
census, never the rows. All counts/sums are exact integers until the
final constant-size float closed form (order-independent ⇒
layout-invariant results).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

__all__ = ["kruskal_wallis", "brown_forsythe"]


def _group_value_census(ds, group_col: str, value_col: str,
                        scale: int) -> pd.DataFrame:
    """Exact per-(group, value-int) count census (nulls drop per SQL
    aggregate semantics). → columns (g, v, n) merged on the driver —
    bounded by #groups × #distinct values, documented above."""

    def partial(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        col = b[value_col]
        if col.null_count:
            b = b.filter(pc.is_valid(col))
            col = b[value_col]
        v = col.to_numpy(zero_copy_only=False)
        return pa.Table.from_pydict({
            "g": b[group_col],
            "v": pa.array(np.rint(v * scale).astype(np.int64),
                          pa.int64()),
            "n": pa.array(np.ones(len(v), np.int64), pa.int64()),
        }).group_by(["g", "v"]).aggregate([("n", "sum")])

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True).to_pandas()
    if not len(parts):
        return pd.DataFrame({"g": [], "v": [], "n": []})
    out = parts.groupby(["g", "v"], as_index=False)["n_sum"].sum()
    return out.rename(columns={"n_sum": "n"})


def kruskal_wallis(ds, group_col: str, value_col: str, *,
                   scale: int = 100) -> dict:
    """→ {k, n, h_stat, h_corrected, tie_correction, df}: the
    Kruskal-Wallis statistic with the standard tie correction
    H_c = H / (1 − Σ(t³−t)/(N³−N)). Average (midrank) tie ranks are
    computed from the value census: for a distinct value with t
    occurrences starting after c earlier rows, every occurrence gets
    rank c + (t+1)/2."""
    census = _group_value_census(ds, group_col, value_col, scale)
    if not len(census):
        return {"k": 0, "n": 0, "h_stat": float("nan"),
                "h_corrected": float("nan"),
                "tie_correction": float("nan"), "df": 0}
    per_v = (census.groupby("v", as_index=False)["n"].sum()
             .sort_values("v").reset_index(drop=True))
    t = per_v["n"].to_numpy(np.int64)
    cum = np.concatenate([[0], np.cumsum(t)[:-1]])
    # midrank per distinct value (exact halves -> float64 is exact)
    avg_rank = cum + (t + 1) / 2.0
    rank_map = pd.Series(avg_rank, index=per_v["v"].to_numpy())
    n_all = int(t.sum())
    census = census.sort_values(["g", "v"])
    census["r"] = census["v"].map(rank_map)
    # weighted rank sums: Σ n_{g,v} · r_v, plus group sizes
    census["w"] = (census["n"].to_numpy(np.float64)
                   * census["r"].to_numpy())
    per_g = census.groupby("g", sort=True).agg(
        n=("n", "sum"), rsum=("w", "sum"))
    k = len(per_g)
    n_g = per_g["n"].to_numpy(np.float64)
    h = (12.0 / (n_all * (n_all + 1.0))
         * float((per_g["rsum"].to_numpy() ** 2 / n_g).sum())
         - 3.0 * (n_all + 1.0))
    tie = 1.0 - float(((t.astype(np.float64) ** 3 - t).sum())
                      / (float(n_all) ** 3 - n_all)) \
        if n_all > 1 else float("nan")
    hc = h / tie if tie and tie > 0 else float("nan")
    return {"k": k, "n": n_all, "h_stat": h, "h_corrected": hc,
            "tie_correction": tie, "df": k - 1}


def brown_forsythe(ds, group_col: str, value_col: str, *,
                   scale: int = 100) -> dict:
    """→ {k, n, f_stat, df_between, df_within}: the Brown-Forsythe
    variance-homogeneity test — a one-way ANOVA over zᵢⱼ = |xᵢⱼ −
    median_g| with the LOWER (type-1 / SQL ``quantile_disc(0.5)``)
    group median, which keeps every z an exact integer in 1/scale
    units (the interpolated median would introduce half-units and an
    engine-vs-oracle rounding surface). Two passes: the census pass
    yields exact medians; the moment pass accumulates per-group
    (n, Σz, Σz²) partials against the broadcast median map."""
    import ray

    census = _group_value_census(ds, group_col, value_col, scale)
    if not len(census):
        return {"k": 0, "n": 0, "f_stat": float("nan"),
                "df_between": 0, "df_within": 0}
    census = census.sort_values(["g", "v"]).reset_index(drop=True)
    med = {}
    for g, sub in census.groupby("g", sort=True):
        c = sub["n"].to_numpy(np.int64)
        total = int(c.sum())
        pos = (total + 1) // 2  # 1-based lower-median position
        idx = int(np.searchsorted(np.cumsum(c), pos))
        med[g] = int(sub["v"].iloc[idx])
    mref = ray.put(med)

    def partial(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        m = ray.get(mref)
        col = b[value_col]
        if col.null_count:
            b = b.filter(pc.is_valid(col))
            col = b[value_col]
        v = np.rint(col.to_numpy(zero_copy_only=False)
                    * scale).astype(np.int64)
        g = b[group_col].to_numpy(zero_copy_only=False)
        # C-speed hashtable lookup — every group key is in the census
        meds = pd.Series(g).map(m).to_numpy(np.int64)
        z = np.abs(v - meds)
        return pa.Table.from_pydict({
            "g": b[group_col],
            "n": pa.array(np.ones(len(z), np.int64), pa.int64()),
            "s1": pa.array(z, pa.int64()),
            "s2": pa.array(z * z, pa.int64()),
        }).group_by(["g"]).aggregate(
            [("n", "sum"), ("s1", "sum"), ("s2", "sum")])

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True).to_pandas()
    agg = {}
    for g, n, s1, s2 in zip(parts["g"], parts["n_sum"],
                            parts["s1_sum"], parts["s2_sum"]):
        cur = agg.setdefault(g, [0, 0, 0])
        cur[0] += int(n)
        cur[1] += int(s1)
        cur[2] += int(s2)
    groups = sorted(agg)
    n_g = np.array([agg[g][0] for g in groups], np.float64)
    s1_g = np.array([float(agg[g][1]) for g in groups])
    s2_g = np.array([float(agg[g][2]) for g in groups])
    n = float(n_g.sum())
    k = len(groups)
    grand = float(s1_g.sum()) / n
    mean_g = s1_g / n_g
    ssb = float((n_g * (mean_g - grand) ** 2).sum())
    ssw = float((s2_g - n_g * mean_g ** 2).sum())
    df_b, df_w = k - 1, int(n) - k
    f = ((ssb / df_b) / (ssw / df_w)
         if df_b > 0 and df_w > 0 and ssw > 0 else float("nan"))
    return {"k": k, "n": int(n), "f_stat": f,
            "df_between": df_b, "df_within": df_w}
