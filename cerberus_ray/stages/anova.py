"""One-way ANOVA over a grouped measure — the distribution-comparison
companion of the drift sketches (`stages/drift.py`): where KS/PSI ask
"did this column move vs a snapshot?", the F statistic asks "do these
k live groups share a mean?". Reference analogue: the reference's
grouped consistency checks over money columns
(/root/reference/cerberus/models/invoice.py:211-231) generalized to a
variance decomposition.

Scale shape: one pass, per-block pyarrow hash partials of
(n, Σc, Σc²) per group in EXACT integer 10⁻² units (2-dp measures →
int64 cents; cents² stays under int64 within a block, and the driver
merges partial sums as arbitrary-precision Python ints) — the sums are
order-independent, so the only float work is the constant-size closed
form at the end. No exchange; the partial table is #blocks × #groups.

p-values need the F CDF (scipy is absent in this stack); the report
carries (f_stat, df_between, df_within, eta_sq) — the caller compares
F against their table. eta² = SSB/SST is the effect size.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

__all__ = ["anova_oneway"]


def anova_oneway(ds, group_col: str, value_col: str, *,
                 scale: int = 100) -> dict:
    """→ {k, n, grand_mean, ss_between, ss_within, df_between,
    df_within, f_stat, eta_sq}. ``scale`` is the decimal scaling of
    ``value_col`` (100 for 2-dp measures); values must be exact
    multiples of 1/scale — the kernel rint-rounds, it never truncates.
    Nulls are dropped per SQL aggregate semantics."""

    def partial(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        col = b[value_col]
        if col.null_count:
            keep = pc.is_valid(col)
            b = b.filter(keep)
            col = b[value_col]
        v = col.to_numpy(zero_copy_only=False)
        c = np.rint(v * scale).astype(np.int64)
        return pa.Table.from_pydict({
            "g": b[group_col],
            "n": pa.array(np.ones(len(c), np.int64), pa.int64()),
            "s1": pa.array(c, pa.int64()),
            "s2": pa.array(c * c, pa.int64()),
        }).group_by(["g"]).aggregate(
            [("n", "sum"), ("s1", "sum"), ("s2", "sum")])

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True).to_pandas()
    if not len(parts):
        return {"k": 0, "n": 0, "grand_mean": float("nan"),
                "ss_between": float("nan"), "ss_within": float("nan"),
                "df_between": 0, "df_within": 0,
                "f_stat": float("nan"), "eta_sq": float("nan")}
    # exact integer merge per group (Python ints: no overflow, no
    # float order sensitivity)
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
    s1 = float(sum(agg[g][1] for g in groups))
    k = len(groups)
    grand = s1 / n
    mean_g = s1_g / n_g
    ssb = float((n_g * (mean_g - grand) ** 2).sum())
    ssw = float((s2_g - n_g * mean_g ** 2).sum())
    df_b, df_w = k - 1, int(n) - k
    f = ((ssb / df_b) / (ssw / df_w)
         if df_b > 0 and df_w > 0 and ssw > 0 else float("nan"))
    sst = ssb + ssw
    s2f = float(scale) ** 2
    return {"k": k, "n": int(n), "grand_mean": grand / scale,
            "ss_between": ssb / s2f, "ss_within": ssw / s2f,
            "df_between": df_b, "df_within": df_w, "f_stat": f,
            "eta_sq": (ssb / sst) if sst > 0 else float("nan")}
