"""Uplift modeling: T-learner over the engine's histogram GBDT.

Heterogeneous treatment effects (Künzel et al. 2019 meta-learners):
fit one outcome model per arm — μ₁ on treated rows, μ₀ on control —
and read uplift τ(x) = μ₁(x) − μ₀(x) per row. Pure composition of
tested engine stages: two `fit_gbdt` fits (each a few streamed
histogram passes) sharing ONE set of bin edges fit on the full data
(so both models see identical feature quantization — the comparability
requirement), then one streamed double-scoring pass.

``uplift_by_decile`` ranks rows by predicted uplift and reports the
OBSERVED treated-vs-control outcome gap per decile — the standard
uplift validation curve (planted heterogeneous effects must make it
slope downward; tested)."""

from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np
import pandas as pd
import pyarrow as pa

from .gbdt import GBDTModel, fit_gbdt, quantile_bin_edges, score_gbdt

__all__ = ["fit_t_learner", "score_uplift", "uplift_by_decile"]


def fit_t_learner(ds, treatment_col: str, outcome_col: str,
                  feature_cols: Sequence[str], *, n_rounds: int = 4,
                  depth: int = 2, n_bins: int = 32
                  ) -> Tuple[GBDTModel, GBDTModel]:
    """→ (model_treated, model_control), sharing bin edges."""
    cols = list(feature_cols)
    edges = quantile_bin_edges(ds, cols, n_bins=n_bins)
    import pyarrow.compute as pc

    def arm(v):
        def keep(b: pa.Table) -> pa.Table:
            return b.filter(pc.equal(b[treatment_col], v))

        return ds.map_batches(keep, batch_format="pyarrow",
                              zero_copy_batch=True)

    m1 = fit_gbdt(arm(1), cols, outcome_col, n_rounds=n_rounds,
                  depth=depth, bin_edges=edges)
    m0 = fit_gbdt(arm(0), cols, outcome_col, n_rounds=n_rounds,
                  depth=depth, bin_edges=edges)
    return m1, m0


def score_uplift(ds, m1: GBDTModel, m0: GBDTModel, *,
                 out_col: str = "uplift"):
    """Append τ(x) = μ₁(x) − μ₀(x)."""
    s1 = score_gbdt(ds, m1, out_col="_p1")
    s01 = score_gbdt(s1, m0, out_col="_p0")
    import pyarrow.compute as pc

    def diff(b: pa.Table) -> pa.Table:
        t = b.append_column(out_col,
                            pc.subtract(b["_p1"], b["_p0"]))
        return t.drop_columns(["_p1", "_p0"])

    return s01.map_batches(diff, batch_format="pyarrow",
                           zero_copy_batch=True)


def uplift_by_decile(scored_ds, treatment_col: str, outcome_col: str,
                     *, uplift_col: str = "uplift",
                     n_deciles: int = 10) -> pd.DataFrame:
    """Observed uplift per predicted-uplift decile: decile edges from
    merged t-digests of the uplift scores, then one census pass of
    per-(decile, arm) (n, Σy) partials. → frame (decile, n_treated,
    n_control, observed_uplift, mean_predicted)."""
    from ..state.tdigest import TDigest

    def sketch(b: pa.Table) -> pa.Table:
        td = TDigest()
        td.update(b[uplift_col].to_numpy(zero_copy_only=False)
                  .astype(np.float64))
        return pa.Table.from_pydict({"s": [td.to_bytes().hex()]})

    sk = scored_ds.map_batches(sketch, batch_format="pyarrow",
                               zero_copy_batch=True).to_pandas()
    merged = TDigest()
    for s in sk["s"]:
        merged = merged.merge(TDigest.from_bytes(bytes.fromhex(s)))
    qs = np.arange(1, n_deciles) / n_deciles
    edges = np.unique(np.round(merged.quantile(qs), 12))
    nd = len(edges) + 1

    def census(b: pa.Table) -> pa.Table:
        u = b[uplift_col].to_numpy(zero_copy_only=False)
        t = b[treatment_col].to_numpy(zero_copy_only=False).astype(
            np.float64)
        y = b[outcome_col].to_numpy(zero_copy_only=False).astype(
            np.float64)
        dec = np.searchsorted(edges, u, side="right")
        size = nd * 2
        idx = dec * 2 + (t > 0)
        return pa.Table.from_pydict({
            "n": [np.bincount(idx, minlength=size).astype(
                np.float64).tobytes()],
            "sy": [np.bincount(idx, weights=y,
                               minlength=size).tobytes()],
            "su": [np.bincount(dec, weights=u,
                               minlength=nd).tobytes()]})

    p = scored_ds.map_batches(census, batch_format="pyarrow",
                              zero_copy_batch=True).to_pandas()
    n = sum(np.frombuffer(x) for x in p["n"]).reshape(nd, 2)
    sy = sum(np.frombuffer(x) for x in p["sy"]).reshape(nd, 2)
    su = sum(np.frombuffer(x) for x in p["su"])
    with np.errstate(invalid="ignore", divide="ignore"):
        m = sy / n
    rows = pd.DataFrame({
        "decile": np.arange(nd),
        "n_treated": n[:, 1].astype(np.int64),
        "n_control": n[:, 0].astype(np.int64),
        "observed_uplift": np.round(m[:, 1] - m[:, 0], 6),
        "mean_predicted": np.round(su / np.maximum(n.sum(axis=1), 1),
                                   6)})
    return rows[rows[["n_treated", "n_control"]].min(axis=1) > 0] \
        .reset_index(drop=True)
