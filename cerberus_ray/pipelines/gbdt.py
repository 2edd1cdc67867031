"""Distributed histogram gradient-boosted trees (binary logistic).

The LightGBM/XGBoost recipe (Ke et al. 2017; Chen & Guestrin 2016)
re-expressed Ray-Data-first — the engine's non-linear counterpart to
``logreg.fit_logreg`` (which mirrors the reference's linear scoring
surface, cerberus/models/customer.py:130-140 issue heuristics):

1. **Bin once.** Per-feature quantile bin edges come from merged
   t-digests (one tiny sketch row per block to the driver), then ONE
   streamed encode pass replaces each float feature with a uint8 bin
   code. Training never touches floats again — at 100 TB the binned
   copy is ~1 byte/feature/row and in production it would be written
   to parquet; here it is ``materialize()``d (the training set is the
   deliberately-small model input, not the corpus).
2. **Mergeable gradient histograms.** Each boosting round recomputes
   margins/gradients STATELESSLY per block from the broadcast model
   (no per-row driver state, retry-safe) and emits per-(node, feature,
   bin) Σgrad/Σhess/count partials — a few hundred rows per block —
   which the driver sums. Level-wise growth: one streamed pass per
   tree level, so a ``n_rounds × depth`` passes total.
3. **Driver split search.** Histograms are (nodes × features × bins)
   small; prefix-sum gain search (the XGBoost gain formula with L2
   ``reg_lambda`` and ``gamma`` complexity penalty) runs in numpy on
   the driver. Gains are rounded before argmax so block-order float
   jitter cannot flip tie-breaks (parallelism invariance, tested).

Model application is a vectorized level-order walk over uint8 bin
codes — no Python per row anywhere.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Sequence

import numpy as np
import pandas as pd
import pyarrow as pa

from ..state.tdigest import TDigest

__all__ = ["GBDTModel", "fit_gbdt", "score_gbdt", "quantile_bin_edges"]

#: reserved bin for NaN/missing values (routed left, bin 0 shares edges)
_NAN_BIN = 0


@dataclass
class GBDTModel:
    feature_cols: List[str]
    bin_edges: List[np.ndarray]          # interior edges per feature
    # per tree: feat[int32, 2^d - 1] (-1 = pass-through), split_bin
    # [int32, 2^d - 1] (go left iff bin <= split), leaf[float64, 2^d]
    trees: List[dict] = field(default_factory=list)
    base_score: float = 0.0              # log-odds prior
    depth: int = 2
    learning_rate: float = 0.3
    train_logloss: List[float] = field(default_factory=list)
    objective: str = "logistic"          # or "l2" (regression)
    # total split gain per feature (the LightGBM 'gain' importance)
    feature_gain: np.ndarray = field(
        default_factory=lambda: np.empty(0))

    def feature_importance(self) -> dict:
        tot = self.feature_gain.sum()
        return {c: round(float(g / tot), 6) if tot > 0 else 0.0
                for c, g in zip(self.feature_cols, self.feature_gain)}

    @property
    def n_bins(self) -> int:
        return max((len(e) for e in self.bin_edges), default=0) + 1


def quantile_bin_edges(ds, feature_cols: Sequence[str], *,
                       n_bins: int = 32,
                       compression: float = 200.0) -> List[np.ndarray]:
    """Per-feature interior bin edges from one streamed t-digest pass
    (deduplicated — constant features give zero edges)."""
    if not 2 <= n_bins <= 256:
        raise ValueError(
            f"n_bins must be in [2, 256] (uint8 bin codes): got {n_bins}")
    cols = list(feature_cols)

    def partial(b: pa.Table) -> pa.Table:
        out = {}
        for c in cols:
            v = b[c].to_numpy(zero_copy_only=False).astype(np.float64)
            td = TDigest(compression=compression)
            td.update(v[~np.isnan(v)])
            out[c] = [td.to_bytes().hex()]
        return pa.Table.from_pydict(out)

    pdf = ds.map_batches(partial, batch_format="pyarrow",
                         zero_copy_batch=True).to_pandas()
    qs = np.arange(1, n_bins) / n_bins
    edges = []
    for c in cols:
        merged = TDigest(compression=compression)
        for s in pdf[c]:
            merged = merged.merge(TDigest.from_bytes(bytes.fromhex(s)))
        e = np.unique(np.round(merged.quantile(qs), 12)) if merged.count \
            else np.empty(0)
        edges.append(e.astype(np.float64))
    return edges


def _bin_matrix(b: pa.Table, cols: List[str],
                edges: List[np.ndarray]) -> np.ndarray:
    """(n_rows, n_feat) uint8 codes; NaN → _NAN_BIN."""
    n = b.num_rows
    out = np.empty((n, len(cols)), dtype=np.uint8)
    for j, c in enumerate(cols):
        v = b[c].to_numpy(zero_copy_only=False).astype(np.float64)
        code = np.searchsorted(edges[j], v, side="right")
        code[np.isnan(v)] = _NAN_BIN
        out[:, j] = code.astype(np.uint8)
    return out


def _apply_tree(bins: np.ndarray, tree: dict) -> np.ndarray:
    """Vectorized level-order walk → per-row leaf VALUE."""
    feat, split, leaf = tree["feat"], tree["split"], tree["leaf"]
    depth = int(np.log2(len(leaf)))
    node = np.zeros(len(bins), dtype=np.int64)
    for _ in range(depth):
        f = feat[node]
        live = f >= 0
        go_right = np.zeros(len(bins), dtype=bool)
        if live.any():
            go_right[live] = (bins[live, f[live]]
                              > split[node[live]].astype(np.uint8))
        node = 2 * node + 1 + go_right
    return leaf[node - (len(leaf) - 1)]


def _margin(bins: np.ndarray, trees: List[dict], base: float) -> np.ndarray:
    m = np.full(len(bins), base, dtype=np.float64)
    for t in trees:
        m += _apply_tree(bins, t)
    return m


def _partial_leaf_ids(bins: np.ndarray, feat: np.ndarray,
                      split: np.ndarray, level: int) -> np.ndarray:
    """Node index (within level ``level``) under the partially-built
    tree: 0..2^level-1."""
    node = np.zeros(len(bins), dtype=np.int64)
    for _ in range(level):
        f = feat[node]
        live = f >= 0
        go_right = np.zeros(len(bins), dtype=bool)
        if live.any():
            go_right[live] = (bins[live, f[live]]
                              > split[node[live]].astype(np.uint8))
        node = 2 * node + 1 + go_right
    return node - (2 ** level - 1)


def fit_gbdt(ds, feature_cols: Sequence[str], label_col: str, *,
             n_rounds: int = 5, depth: int = 2, n_bins: int = 32,
             learning_rate: float = 0.3, reg_lambda: float = 1.0,
             gamma: float = 0.0, min_child_hess: float = 1e-3,
             bin_edges: List[np.ndarray] | None = None,
             objective: str = "logistic") -> GBDTModel:
    """Fit ``n_rounds`` depth-``depth`` trees by streamed histogram
    passes. ``objective``: 'logistic' (binary classification,
    grad = p−y, hess = p(1−p), tracked loss = logloss) or 'l2'
    (regression, grad = pred−y, hess = 1, tracked loss = MSE,
    base = global mean). Given fixed ``bin_edges`` the fit is exactly
    block-layout-invariant (rounded-gain argmax with (feature, bin)
    lexicographic tie-break); sketch-derived edges vary slightly with
    layout like any t-digest profile does."""
    cols = list(feature_cols)
    if depth < 1 or n_rounds < 1:
        raise ValueError("depth and n_rounds must be >= 1")
    if objective not in ("logistic", "l2"):
        raise ValueError(f"unknown objective {objective!r}")
    edges = (list(bin_edges) if bin_edges is not None
             else quantile_bin_edges(ds, cols, n_bins=n_bins))
    if len(edges) != len(cols):
        raise ValueError("bin_edges must align with feature_cols")
    too_wide = max((len(e) for e in edges), default=0)
    if too_wide > 255:
        # uint8 bin codes: >255 interior edges would silently wrap
        raise ValueError(
            f"at most 255 interior edges per feature (got {too_wide}); "
            f"lower n_bins or pass coarser bin_edges")
    nb = max((len(e) for e in edges), default=0) + 1

    def encode(b: pa.Table) -> pa.Table:
        bins = _bin_matrix(b, cols, edges)
        y = b[label_col].to_numpy(zero_copy_only=False)
        d = {f"b{j}": pa.array(bins[:, j]) for j in range(len(cols))}
        d["y"] = pa.array(np.asarray(y, dtype=np.float64))
        return pa.Table.from_pydict(d)

    binned = ds.map_batches(encode, batch_format="pyarrow",
                            zero_copy_batch=True).materialize()

    # base score: log-odds of the positive rate (logistic) or the
    # global mean (l2) — one tiny pass either way
    from ray.data.aggregate import Count, Sum
    tot = binned.aggregate(Sum("y"), Count())
    ysum, n = float(tot["sum(y)"] or 0.0), int(tot["count()"])
    if objective == "logistic":
        p0 = min(max(ysum / max(n, 1), 1e-6), 1 - 1e-6)
        base = float(np.log(p0 / (1 - p0)))
    else:
        base = ysum / max(n, 1)
    model = GBDTModel(feature_cols=cols, bin_edges=edges,
                      base_score=base,
                      depth=depth, learning_rate=learning_rate,
                      objective=objective,
                      feature_gain=np.zeros(len(cols)))

    nf = len(cols)

    def hist_pass(trees: List[dict], feat: np.ndarray, split: np.ndarray,
                  level: int):
        """One streamed pass → (nodes, nf, nb) Σg/Σh/count + logloss."""
        def partial(b: pa.Table) -> pa.Table:
            bins = np.column_stack([
                b[f"b{j}"].to_numpy(zero_copy_only=False)
                for j in range(nf)])
            y = b["y"].to_numpy(zero_copy_only=False)
            m = _margin(bins, trees, model.base_score)
            if objective == "logistic":
                p = 1.0 / (1.0 + np.exp(-m))
                g, h = p - y, p * (1.0 - p)
                ll = float(-(y * np.log(np.clip(p, 1e-12, 1))
                             + (1 - y) * np.log(
                                 np.clip(1 - p, 1e-12, 1))).sum())
            else:
                g, h = m - y, np.ones(len(y))
                ll = float(((m - y) ** 2).sum())
            node = _partial_leaf_ids(bins, feat, split, level)
            idx = ((node[:, None] * nf + np.arange(nf)[None, :]) * nb
                   + bins.astype(np.int64)).ravel()
            size = (2 ** level) * nf * nb
            gs = np.bincount(idx, weights=np.repeat(g, nf), minlength=size)
            hs = np.bincount(idx, weights=np.repeat(h, nf), minlength=size)
            ns = np.bincount(idx, minlength=size)
            nz = np.flatnonzero(ns)
            return pa.Table.from_pydict({
                "idx": pa.array(np.append(nz, -1), pa.int64()),
                "g": pa.array(np.append(gs[nz], ll), pa.float64()),
                "h": pa.array(np.append(hs[nz], 0.0), pa.float64()),
                "n": pa.array(np.append(ns[nz], len(y)), pa.int64())})

        pdf = (binned.map_batches(partial, batch_format="pyarrow",
                                  zero_copy_batch=True)
               .to_pandas().groupby("idx", as_index=False).sum())
        size = (2 ** level) * nf * nb
        G = np.zeros(size); H = np.zeros(size); N = np.zeros(size)
        body = pdf[pdf["idx"] >= 0]
        G[body["idx"]] = body["g"]; H[body["idx"]] = body["h"]
        N[body["idx"]] = body["n"]
        extra = pdf[pdf["idx"] < 0]
        ll = float(extra["g"].sum())
        nrows = int(extra["n"].sum())
        shape = (2 ** level, nf, nb)
        return G.reshape(shape), H.reshape(shape), N.reshape(shape), \
            ll / max(nrows, 1)

    for _ in range(n_rounds):
        n_internal = 2 ** depth - 1
        feat = np.full(n_internal, -1, dtype=np.int32)
        split = np.zeros(n_internal, dtype=np.int32)
        last = None
        for level in range(depth):
            G, H, N, ll = hist_pass(model.trees, feat, split, level)
            if level == 0:
                model.train_logloss.append(round(ll, 10))
            last = (G, H, level, feat.copy(), split.copy())
            base_idx = 2 ** level - 1
            for nd in range(2 ** level):
                g_fb, h_fb = G[nd], H[nd]             # (nf, nb)
                gtot, htot = g_fb.sum(), h_fb.sum()
                if htot <= min_child_hess:
                    continue
                gl = np.cumsum(g_fb[:, :-1], axis=1)
                hl = np.cumsum(h_fb[:, :-1], axis=1)
                gr, hr = gtot - gl, htot - hl
                ok = (hl >= min_child_hess) & (hr >= min_child_hess)
                gain = 0.5 * (gl ** 2 / (hl + reg_lambda)
                              + gr ** 2 / (hr + reg_lambda)
                              - gtot ** 2 / (htot + reg_lambda)) - gamma
                gain = np.where(ok, np.round(gain, 9), -np.inf)
                if gain.size == 0:
                    # every feature constant or all-NaN → zero interior
                    # bin edges; no split exists and argmax on the
                    # empty array would raise — the node stays a
                    # pass-through leaf (degenerate base-score model)
                    continue
                j = int(np.argmax(gain))       # lexicographic tie-break
                if gain.flat[j] <= 0:
                    continue
                feat[base_idx + nd] = j // (nb - 1)
                split[base_idx + nd] = j % (nb - 1)
                model.feature_gain[j // (nb - 1)] += float(gain.flat[j])
        # leaf values from the last level's histograms + chosen splits
        G, H, level, _, _ = last
        n_leaves = 2 ** depth
        leaf = np.zeros(n_leaves, dtype=np.float64)
        base_idx = 2 ** (depth - 1) - 1
        for nd in range(2 ** (depth - 1)):
            g_fb, h_fb = G[nd], H[nd]
            f = feat[base_idx + nd]
            if f < 0:    # pass-through: both children get the node value
                gv, hv = g_fb.sum(), h_fb.sum()
                val = -gv / (hv + reg_lambda) * learning_rate
                leaf[2 * nd] = leaf[2 * nd + 1] = val
                continue
            s = split[base_idx + nd]
            gl, hl = g_fb[f, :s + 1].sum(), h_fb[f, :s + 1].sum()
            gr, hr = g_fb[f].sum() - gl, h_fb[f].sum() - hl
            leaf[2 * nd] = -gl / (hl + reg_lambda) * learning_rate
            leaf[2 * nd + 1] = -gr / (hr + reg_lambda) * learning_rate
        model.trees.append({"feat": feat, "split": split, "leaf": leaf})

    # closing logloss (one cheap level-0 pass with the finished model)
    _, _, _, ll = hist_pass(model.trees,
                            np.full(1, -1, np.int32),
                            np.zeros(1, np.int32), 0)
    model.train_logloss.append(round(ll, 10))
    return model


def score_gbdt(ds, model: GBDTModel, *, out_col: str = "score"):
    """Append P(label=1) (logistic) or the raw prediction (l2) —
    stateless vectorized application."""
    cols, edges = model.feature_cols, model.bin_edges
    trees, base = model.trees, model.base_score
    logistic = model.objective == "logistic"

    def score(b: pa.Table) -> pa.Table:
        bins = _bin_matrix(b, cols, edges)
        m = _margin(bins, trees, base)
        out = 1.0 / (1.0 + np.exp(-m)) if logistic else m
        return b.append_column(out_col, pa.array(out, pa.float64()))

    return ds.map_batches(score, batch_format="pyarrow",
                          zero_copy_batch=True)
