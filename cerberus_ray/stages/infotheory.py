"""Information-theoretic column diagnostics: mutual information /
entropy between categorical columns, grouped distribution entropy, and
the Cochran–Mantel–Haenszel pooled odds ratio over stratified 2×2
tables.

Why in a training-data engine: MI(lang, source) quantifies how much a
corpus's language mix is explained by its source (a redundancy /
leakage screen when picking stratification keys); per-group entropy is
the diversity score behind mixture balancing; CMH is the stratified
companion to the Simpson screen (``stats.simpson_check``) — the pooled
effect AFTER conditioning on the confounder.

Execution shape (all three ops): one streamed pass of per-block
hash-aggregate count partials — the driver merges count tables bounded
by the LEVEL domain (never the row count) and finishes the closed-form
algebra in float64 over a deterministically sorted level order. Exact
integer counts merge order-independently, so results are
run-reproducible. This is the same partial/merge contract as
``stats.chi2_independence``; a 10^6-level column belongs behind a
bucketing step first (guarded by ``max_levels``).

Reference lineage: extends the grouped census/report family
(cerberus/models/booking.py report aggregates) with the standard
information-theory screens a data audit adds on top.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

__all__ = ["mutual_information", "grouped_entropy", "cmh_odds"]


def _joint_counts(ds, cols: list[str]) -> pd.DataFrame:
    """Exact (cols..., n) count table: per-block pandas hash-aggregate
    partials, integer-merged on the driver. Null in any column drops
    the row (SQL cross-tab convention)."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        d = df[cols].dropna()
        return (d.groupby(cols, sort=False).size()
                .reset_index(name="n"))

    pdf = ds.map_batches(partial, batch_format="pandas").to_pandas()
    if not len(pdf):
        return pd.DataFrame(columns=[*cols, "n"])
    return (pdf.groupby(cols, as_index=False)["n"].sum()
            .sort_values(cols, ignore_index=True))


def _entropy(counts: np.ndarray) -> float:
    """Shannon entropy (nats) of a count vector (zeros ignored)."""
    n = counts.sum()
    if n <= 0:
        return float("nan")
    p = counts[counts > 0] / n
    return float(-(p * np.log(p)).sum())


def mutual_information(ds, col_a: str, col_b: str, *,
                       max_levels: int = 10_000) -> pd.DataFrame:
    """Mutual information between two categorical columns → one-row
    DataFrame ``(n, levels_a, levels_b, h_a, h_b, h_ab, mi, nmi)``,
    entropies in nats; ``nmi = mi / max(h_a, h_b)`` (0 when either
    marginal entropy is 0). Conditional entropies follow by identity:
    H(A|B) = h_ab − h_b.

    One count pass; MI is computed from the exact joint table as
    Σ p(a,b)·ln(p(a,b)·n² / (n_a·n_b)) over levels in sorted order (so
    the float reduction is layout-independent)."""
    j = _joint_counts(ds, [col_a, col_b])
    if len(j) > max_levels:
        raise ValueError(
            f"joint table has {len(j)} cells > max_levels={max_levels} "
            "— bucket the columns first")
    if not len(j):
        row = {"n": 0, "levels_a": 0, "levels_b": 0, "h_a": float("nan"),
               "h_b": float("nan"), "h_ab": float("nan"),
               "mi": float("nan"), "nmi": float("nan")}
        return pd.DataFrame([row])
    n = float(j["n"].sum())
    na = j.groupby(col_a, sort=True)["n"].sum()
    nb = j.groupby(col_b, sort=True)["n"].sum()
    h_a = _entropy(na.to_numpy(dtype=np.float64))
    h_b = _entropy(nb.to_numpy(dtype=np.float64))
    h_ab = _entropy(j["n"].to_numpy(dtype=np.float64))
    mi = h_a + h_b - h_ab
    denom = max(h_a, h_b)
    nmi = mi / denom if denom > 0 else 0.0
    return pd.DataFrame([{
        "n": int(n), "levels_a": int(len(na)), "levels_b": int(len(nb)),
        "h_a": h_a, "h_b": h_b, "h_ab": h_ab, "mi": mi, "nmi": nmi}])


def grouped_entropy(ds, group_col: str, col: str) -> pd.DataFrame:
    """Per-group Shannon entropy of ``col``'s distribution →
    ``(group_col, n, n_levels, entropy, norm_entropy)`` sorted by
    group; ``norm_entropy = entropy / ln(n_levels)`` (1.0 = uniform,
    0.0 for a single level). Nats. The diversity score used when
    balancing a corpus mixture per source/domain."""
    j = _joint_counts(ds, [group_col, col])
    rows = []
    for g, sub in j.groupby(group_col, sort=True):
        c = sub.sort_values(col)["n"].to_numpy(dtype=np.float64)
        h = _entropy(c)
        k = len(c)
        rows.append({group_col: g, "n": int(c.sum()), "n_levels": k,
                     "entropy": h,
                     "norm_entropy": h / np.log(k) if k > 1 else 0.0})
    return pd.DataFrame(
        rows, columns=[group_col, "n", "n_levels", "entropy",
                       "norm_entropy"])


def cmh_odds(ds, stratum_col: str, exposed_col: str,
             outcome_col: str) -> pd.DataFrame:
    """Cochran–Mantel–Haenszel pooled odds ratio across per-stratum
    2×2 tables → one-row DataFrame ``(n, n_strata, or_pooled, or_cmh,
    chi2_cmh)``.

    ``exposed_col`` / ``outcome_col`` are boolean columns (build them
    with a map first). Per stratum k with cells a=(E,O) b=(E,¬O)
    c=(¬E,O) d=(¬E,¬O), n_k=a+b+c+d:

        OR_CMH  = Σ(a·d/n) / Σ(b·c/n)
        χ²_CMH = (|Σa − Σ(a+b)(a+c)/n| − ½)² /
                  Σ (a+b)(c+d)(a+c)(b+d) / (n²(n−1))

    (continuity-corrected). ``or_pooled`` is the crude odds ratio of
    the collapsed table — compare with ``or_cmh`` to read confounding
    (the stratified twin of ``stats.simpson_check``). Strata with a
    zero margin contribute 0 to the sums (standard convention)."""
    j = _joint_counts(ds, [stratum_col, exposed_col, outcome_col])
    if not len(j):
        return pd.DataFrame([{"n": 0, "n_strata": 0,
                              "or_pooled": float("nan"),
                              "or_cmh": float("nan"),
                              "chi2_cmh": float("nan")}])
    piv = (j.pivot_table(index=stratum_col,
                         columns=[exposed_col, outcome_col],
                         values="n", aggfunc="first", fill_value=0)
           .astype(np.float64))

    def cell(e: bool, o: bool) -> np.ndarray:
        if (e, o) in piv.columns:
            return piv[(e, o)].to_numpy()
        return np.zeros(len(piv))

    a, b = cell(True, True), cell(True, False)
    c, d = cell(False, True), cell(False, False)
    nk = a + b + c + d
    with np.errstate(invalid="ignore", divide="ignore"):
        num = float((a * d / nk).sum())
        den = float((b * c / nk).sum())
        or_cmh = num / den if den > 0 else float("inf")
        ta, tb, tc, td = a.sum(), b.sum(), c.sum(), d.sum()
        or_pooled = (ta * td) / (tb * tc) if tb * tc > 0 else float("inf")
        e_a = ((a + b) * (a + c) / nk)
        v_a = ((a + b) * (c + d) * (a + c) * (b + d)
               / (nk * nk * (nk - 1)))
        v_a = np.where(nk > 1, v_a, 0.0)
        vsum = float(v_a.sum())
        chi2 = ((abs(float(a.sum()) - float(e_a.sum())) - 0.5) ** 2
                / vsum) if vsum > 0 else float("nan")
    return pd.DataFrame([{
        "n": int(nk.sum()), "n_strata": int(len(piv)),
        "or_pooled": or_pooled, "or_cmh": or_cmh, "chi2_cmh": chi2}])
