"""Weight-of-evidence (WOE) binning and information value (IV).

The classic credit-scoring feature screen (Siddiqi 2006; the public
scorecard method): bin each numeric feature, measure how differently
positives and negatives distribute across bins —

    WOE_b = ln( (pos_b / pos_total) / (neg_b / neg_total) )
    IV    = Σ_b (pos_share_b − neg_share_b) · WOE_b

IV ranks features for a binary target (rule of thumb: <0.02 useless,
>0.3 strong) and the WOE table is itself the monotone-encoding
artifact.

Scale shape: quantile bin edges from the GBDT module's merged
t-digests (one sketch row per block), then ONE streamed census pass
of per-(feature, bin) (n_pos, n_neg) bincount partials — O(#features
× #bins) per block — merged on the driver. Laplace ``eps`` smoothing
keeps empty-side bins finite (documented; the SQL parity test
interpolates the same edges and smoothing into DuckDB).
"""

from __future__ import annotations

from typing import List, Sequence

import numpy as np
import pandas as pd
import pyarrow as pa

from ..pipelines.gbdt import _NAN_BIN, quantile_bin_edges

__all__ = ["woe_iv_report"]


def woe_iv_report(ds, feature_cols: Sequence[str], label_col: str, *,
                  n_bins: int = 10, eps: float = 0.5,
                  bin_edges: List[np.ndarray] | None = None,
                  detail: bool = False):
    """→ per-feature frame (feature, iv, n_bins) sorted by iv desc
    (ties by feature asc); ``detail=True`` instead returns the full
    per-bin WOE table (feature, bin, n_pos, n_neg, woe)."""
    cols = list(feature_cols)
    if not cols:
        raise ValueError("feature_cols must be non-empty")
    if n_bins < 2:
        raise ValueError("n_bins must be >= 2")
    edges = (list(bin_edges) if bin_edges is not None
             else quantile_bin_edges(ds, cols, n_bins=n_bins))
    nb = max((len(e) for e in edges), default=0) + 1

    def partial(b: pa.Table) -> pa.Table:
        y = b[label_col].to_numpy(zero_copy_only=False).astype(
            np.float64)
        if ((y != 0) & (y != 1)).any():
            raise ValueError(f"{label_col} must be binary 0/1")
        size = len(cols) * nb
        pos = np.zeros(size)
        neg = np.zeros(size)
        for j, c in enumerate(cols):
            v = b[c].to_numpy(zero_copy_only=False).astype(np.float64)
            code = np.searchsorted(edges[j], v, side="right")
            code[np.isnan(v)] = _NAN_BIN
            idx = j * nb + code
            pos += np.bincount(idx, weights=y, minlength=size)
            neg += np.bincount(idx, weights=1.0 - y, minlength=size)
        return pa.Table.from_pydict({
            "pos": [pos.tobytes()], "neg": [neg.tobytes()]})

    p = ds.map_batches(partial, batch_format="pyarrow",
                       zero_copy_batch=True).to_pandas()
    pos = sum(np.frombuffer(x) for x in p["pos"]).reshape(len(cols),
                                                          nb)
    neg = sum(np.frombuffer(x) for x in p["neg"]).reshape(len(cols),
                                                          nb)
    pt, nt = pos.sum(axis=1, keepdims=True), neg.sum(axis=1,
                                                     keepdims=True)
    if pt.min() == 0 or nt.min() == 0:
        raise ValueError("need both classes present")
    ps = (pos + eps) / (pt + eps * nb)
    ns = (neg + eps) / (nt + eps * nb)
    woe = np.log(ps / ns)
    iv = ((ps - ns) * woe).sum(axis=1)
    if detail:
        rows = []
        for j, c in enumerate(cols):
            for b_ in range(nb):
                if pos[j, b_] + neg[j, b_] == 0:
                    continue
                rows.append((c, b_, int(pos[j, b_]), int(neg[j, b_]),
                             round(float(woe[j, b_]), 6)))
        return pd.DataFrame(rows, columns=["feature", "bin", "n_pos",
                                           "n_neg", "woe"])
    out = pd.DataFrame({"feature": cols,
                        "iv": np.round(iv, 6),
                        "n_bins": [len(e) + 1 for e in edges]})
    return (out.sort_values(["iv", "feature"],
                            ascending=[False, True])
            .reset_index(drop=True))
