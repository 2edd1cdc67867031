"""ROC-AUC without a global sort — the Mann-Whitney / rank-sum identity
over per-score class counts (standard public formulation; ties handled
as the average-rank / half-credit convention).

AUC = P(score⁺ > score⁻) + ½·P(score⁺ = score⁻). With one
(n_pos, n_neg) row per DISTINCT score value, sorted ascending,

    AUC = Σ_s n_pos(s) · (neg_below(s) + n_neg(s)/2) / (N⁺ · N⁻)

so the distributed part is a map-side pyarrow hash-aggregate per block
(`grouped_agg` partials, no keyed shuffle) and the driver reduces one
row per distinct score — bounded by the score domain, not the row
count. Classifier scores at 10¹²-doc scale should be quantized
(``quantize`` digits) so the distinct domain stays small; the identity
is exact for the quantized scores.

Evaluation mirror of the model stages (`pipelines/logreg.py`,
`quality_classifier.py`) — reference analogue: cerberus scores rules
per record and thresholds them; AUC is the threshold-free readout.
DuckDB window parity in tests/test_roc.py.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..determinism import round_away

from .groupagg import grouped_agg

__all__ = ["roc_auc"]


def roc_auc(ds, score_col: str, label_col: str, *,
            group_col: str | None = None, quantize: int | None = None,
            round_digits: int = 6) -> pd.DataFrame:
    """→ frame (group?, n_pos, n_neg, auc), one row per group (one row
    total when ``group_col`` is None). ``label_col`` is 0/1; ``auc`` is
    NaN for a group with only one class. ``quantize`` rounds scores to
    that many digits before grouping (bounds the distinct-score domain
    at scale; apply the same ROUND() in any SQL comparison)."""
    groups = [group_col] if group_col else []

    src = ds
    if quantize is not None:
        def q(b: pa.Table) -> pa.Table:
            return b.set_column(
                b.schema.get_field_index(score_col), score_col,
                pa.array(round_away(np.asarray(pc.cast(b[score_col],
                                                       pa.float64())),
                                    quantize)))
        src = ds.map_batches(q, batch_format="pyarrow",
                             zero_copy_batch=True)

    per_score = grouped_agg(src, groups + [score_col],
                            {"np": (label_col, "sum"),
                             "n": (label_col, "count")})
    if not len(per_score):
        cols = groups + ["n_pos", "n_neg", "auc"]
        return pd.DataFrame({c: [] for c in cols})
    per_score["nn"] = per_score["n"] - per_score["np"]

    def one(g: pd.DataFrame) -> pd.Series:
        g = g.sort_values(score_col, kind="mergesort")
        np_ = g["np"].to_numpy(dtype=np.float64)
        nn = g["nn"].to_numpy(dtype=np.float64)
        tot_p, tot_n = np_.sum(), nn.sum()
        if tot_p == 0 or tot_n == 0:
            auc = float("nan")
        else:
            neg_below = np.r_[0.0, np.cumsum(nn)[:-1]]
            auc = float((np_ * (neg_below + nn / 2)).sum()
                        / (tot_p * tot_n))
        return pd.Series({"n_pos": int(tot_p), "n_neg": int(tot_n),
                          "auc": round(auc, round_digits)})

    if groups:
        out = (per_score.groupby(groups, as_index=False)
               .apply(one, include_groups=False)
               .sort_values(groups).reset_index(drop=True))
    else:
        out = one(per_score).to_frame().T.reset_index(drop=True)
    out["n_pos"] = out["n_pos"].astype("int64")
    out["n_neg"] = out["n_neg"].astype("int64")
    out["auc"] = out["auc"].astype("float64")
    return out


def isotonic_calibration(ds, score_col: str, label_col: str, *,
                         quantize: int | None = 4,
                         round_digits: int = 6) -> pd.DataFrame:
    """Isotonic (monotone) probability calibration: the PAV algorithm
    (Ayer et al. 1955; Zadrozny & Elkan 2002 for classifier
    calibration) over per-DISTINCT-score (n, Σy) counts — the same
    bounded map-side partials as :func:`roc_auc`, so the distributed
    cost is one streamed pass and the driver PAVA runs on the score
    DOMAIN, never rows. ``quantize`` pins that domain at scale.

    → frame (score, n, frac_pos, calibrated) sorted by score;
    ``calibrated`` is the non-decreasing least-squares fit, constant
    across each pooled block, and preserves the weighted mean
    (Σ n·calibrated = Σ y)."""
    def part(b: pa.Table) -> pa.Table:
        s = b[score_col].to_numpy(zero_copy_only=False).astype(
            np.float64)
        if quantize is not None:
            s = np.round(s, quantize)
        y = b[label_col].to_numpy(zero_copy_only=False).astype(
            np.float64)
        t = pa.table({"score": pa.array(s),
                      "y": pa.array(y)})
        g = t.group_by(["score"]).aggregate([("y", "sum"),
                                             ([], "count_all")])
        return g

    pdf = ds.map_batches(part, batch_format="pyarrow",
                         zero_copy_batch=True).to_pandas()
    if not len(pdf):
        return pd.DataFrame({"score": [], "n": [], "frac_pos": [],
                             "calibrated": []})
    g = (pdf.groupby("score", as_index=False)
         .agg(sy=("y_sum", "sum"), n=("count_all", "sum"))
         .sort_values("score").reset_index(drop=True))
    # PAVA: pool adjacent violators, weighted by n
    means = (g["sy"] / g["n"]).to_numpy()
    w = g["n"].to_numpy(np.float64)
    blocks = []  # (mean, weight, count-of-rows)
    for m, wt in zip(means, w):
        blocks.append([m, wt, 1])
        while len(blocks) > 1 and blocks[-2][0] >= blocks[-1][0]:
            m2, w2, c2 = blocks.pop()
            m1, w1, c1 = blocks.pop()
            blocks.append([(m1 * w1 + m2 * w2) / (w1 + w2),
                           w1 + w2, c1 + c2])
    cal = np.concatenate([np.full(c, m) for m, _, c in blocks])
    return pd.DataFrame({
        "score": g["score"],
        "n": g["n"].astype("int64"),
        "frac_pos": np.round(means, round_digits),
        "calibrated": np.round(cal, round_digits)})
