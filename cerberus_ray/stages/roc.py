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
                pc.round(pc.cast(b[score_col], pa.float64()),
                         ndigits=quantize))
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
