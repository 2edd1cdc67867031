"""Implicit-feedback alternating least squares (Hu, Koren & Volinsky
2008) — distributed matrix factorization over an interaction log.

The classic recsys factorization re-expressed Ray-Data-first for the
common shape where one side is small (event/item types, domains,
sources: ≤ ~10⁴) and the other is corpus-sized (users, documents):

1. **Census once.** ``groupby(user, item)`` interaction counts, hash-
   bucketed by user (``keyed_apply`` semantics: every row of a user in
   exactly one bucket) and materialized — iterations rescan this
   narrow table, never the raw log.
2. **One streamed pass per iteration.** The item-factor matrix Y is
   tiny and broadcast; each bucket kernel solves its users' k×k ridge
   systems EXACTLY (batched ``np.linalg.solve`` over
   ``add.reduceat`` segment partials — no per-user Python), then
   immediately converts those fresh user factors into per-item
   normal-equation partials (k² bincounts over item ids). User
   factors are therefore never materialized between iterations — they
   are a function of (census bucket, Y) and are recomputed, which is
   exactly the retry-safe stateless-map contract.
3. **Driver item solve.** Bucket partials sum to (n_items × k×k)
   normal equations; the driver's solve is O(n_items·k³), trivial by
   assumption. The confidence-weighted objective (computed with the
   YᵀY trick over ALL user-item pairs, not just observed ones) is
   tracked per iteration and must be non-increasing — ALS's guarantee
   and the test's gate.

The final pass materializes the user-factor Dataset ``(user, f0..)``
for downstream scoring (``recommend_items``).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional

import numpy as np
import pandas as pd
import pyarrow as pa

import ray

__all__ = ["ALSModel", "fit_implicit_als", "recommend_items"]


@dataclass
class ALSModel:
    item_ids: np.ndarray            # sorted original item keys
    item_factors: np.ndarray        # (n_items, k) float64
    k: int
    alpha: float
    reg: float
    losses: List[float] = field(default_factory=list)
    user_factors: Optional[object] = None   # Dataset (user, f0..f{k-1})
    user_col: Optional[str] = None          # set at fit time (schema-safe)


def _census(ds, user_col: str, item_col: str, count_col: Optional[str]):
    """(user, item) → interaction count, map-side combined."""
    from ray.data.aggregate import Count, Sum

    if count_col is None:
        g = ds.groupby([user_col, item_col]).aggregate(Count())
        return g, "count()"
    g = ds.groupby([user_col, item_col]).aggregate(Sum(count_col))
    return g, f"sum({count_col})"


def _user_solve(df: pd.DataFrame, Y: np.ndarray, YtY_reg: np.ndarray,
                alpha: float, user_col: str) -> tuple:
    """Vectorized multi-user ridge solve over one bucket.
    → (users, X (n_users, k), seg_start, item_idx, conf)."""
    df = df.sort_values([user_col, "_item_idx"], kind="mergesort")
    users = df[user_col].to_numpy()
    item_idx = df["_item_idx"].to_numpy(np.int64)
    conf = 1.0 + alpha * df["_cnt"].to_numpy(np.float64)
    uniq, seg = np.unique(users, return_index=True)
    y = Y[item_idx]                                   # (n_rows, k)
    w = (conf - 1.0)[:, None, None]
    outer = y[:, :, None] * y[:, None, :] * w         # (n_rows, k, k)
    A = np.add.reduceat(outer, seg, axis=0) + YtY_reg[None, :, :]
    b = np.add.reduceat(conf[:, None] * y, seg, axis=0)
    X = np.linalg.solve(A, b)                         # (n_users, k)
    return uniq, X, seg, item_idx, conf


def fit_implicit_als(ds, user_col: str, item_col: str, *, k: int = 8,
                     alpha: float = 40.0, reg: float = 0.1,
                     n_iters: int = 8, n_buckets: int | None = None,
                     count_col: Optional[str] = None,
                     max_items: int = 10_000, seed: int = 42,
                     materialize_users: bool = True,
                     mode: str = "auto") -> ALSModel:
    """Fit the implicit-ALS factorization. Requires the item domain to
    be bounded (``max_items`` guard) — the engine's small-side
    assumption; a two-big-sides factorization would need a blocked
    item exchange this module deliberately does not implement.

    ``mode``: 'bucket' = the keyed-shuffle pass per iteration (the
    at-scale path); 'driver' = pull the (user, item, count) census
    once and run the SAME bucket kernel locally — right when the
    census is small, where n_iters keyed exchanges are pure fixed
    cost; 'auto' picks by census row count (agreement-tested)."""
    from ..stages.keyed_window import keyed_apply

    if mode not in ("auto", "driver", "bucket"):
        raise ValueError(f"unknown mode {mode!r}")

    census, cnt_name = _census(ds, user_col, item_col, count_col)
    # item vocabulary (small by contract)
    items = sorted(census.groupby(item_col).count()
                   .to_pandas()[item_col].tolist())
    if len(items) > max_items:
        raise ValueError(f"{len(items)} items exceed max_items="
                         f"{max_items}; implicit ALS here assumes a "
                         "bounded item domain")
    if not items:
        raise ValueError("empty interaction log")
    item_to_idx = {v: i for i, v in enumerate(items)}
    n_items = len(items)

    def prep(b: pa.Table) -> pa.Table:
        it = b[item_col].to_pandas().map(item_to_idx).to_numpy(np.int64)
        return pa.Table.from_pydict({
            user_col: b[user_col],
            "_item_idx": pa.array(it),
            "_cnt": pa.array(b[cnt_name].to_numpy(
                zero_copy_only=False).astype(np.float64))})

    interactions = census.map_batches(
        prep, batch_format="pyarrow").materialize()
    n_census = interactions.count()
    if mode == "auto":
        mode = "driver" if n_census <= 2_000_000 else "bucket"
    # bucket count ∝ census rows: the user-solve kernel allocates a
    # dense (bucket_rows, k, k) intermediate, so a fixed 32-bucket
    # exchange scales per-bucket memory linearly with census size —
    # auto_buckets caps a bucket at ~200k rows
    if n_buckets is None:
        from ..stages.keyed_window import auto_buckets

        n_buckets = auto_buckets(n_census)
    local = interactions.to_pandas() if mode == "driver" else None

    rng = np.random.default_rng(seed)
    Y = 0.1 * rng.standard_normal((n_items, k))
    eye = reg * np.eye(k)
    model = ALSModel(item_ids=np.asarray(items), item_factors=Y, k=k,
                     alpha=alpha, reg=reg, user_col=user_col)

    for _ in range(n_iters):
        YtY_reg = Y.T @ Y + eye
        G = Y.T @ Y                       # for the all-pairs loss trick
        yref = ray.put(Y)

        def partial(df: pd.DataFrame, _G=G, _YtY=YtY_reg,
                    _yref=yref) -> pd.DataFrame:
            Yb = ray.get(_yref)
            uniq, X, seg, item_idx, conf = _user_solve(
                df, Yb, _YtY, alpha, user_col)
            xrows = np.repeat(X, np.diff(np.append(seg, len(df))),
                              axis=0)                  # per-row x_u
            # item normal-equation partials: k² + k bincounts
            A_it = np.empty((n_items, k, k))
            b_it = np.empty((n_items, k))
            w = conf - 1.0
            for a in range(k):
                for c in range(a, k):
                    v = np.bincount(item_idx,
                                    weights=w * xrows[:, a] * xrows[:, c],
                                    minlength=n_items)
                    A_it[:, a, c] = v
                    A_it[:, c, a] = v
                b_it[:, a] = np.bincount(item_idx,
                                         weights=conf * xrows[:, a],
                                         minlength=n_items)
            XtX = X.T @ X
            # objective: Σ_all-pairs (0−xᵀy)² = Σ_u xᵀGx, corrected on
            # observed pairs to c(1−s)² (minus the s² counted already)
            s = np.einsum("ij,ij->i", xrows, Yb[item_idx])
            loss = float(np.einsum("ui,ij,uj->", X, _G, X)
                         + (conf * (1.0 - s) ** 2 - s ** 2).sum()
                         + reg * (X ** 2).sum())
            return pd.DataFrame({
                "A": [A_it.tobytes()], "b": [b_it.tobytes()],
                "XtX": [XtX.tobytes()], "loss": [loss],
                "n_users": [len(uniq)]})

        if mode == "driver":              # same kernel, one bucket
            parts = partial(local)
        else:
            parts = keyed_apply(interactions, user_col, partial,
                                n_buckets=n_buckets).to_pandas()
        A_sum = np.zeros((n_items, k, k))
        b_sum = np.zeros((n_items, k))
        XtX = np.zeros((k, k))
        for _, r in parts.iterrows():
            A_sum += np.frombuffer(r["A"]).reshape(n_items, k, k)
            b_sum += np.frombuffer(r["b"]).reshape(n_items, k)
            XtX += np.frombuffer(r["XtX"]).reshape(k, k)
        # losses[i] = J(X_i, Y_{i-1}): the full objective after the user
        # half-step — the alternating argmin chain makes it monotone
        model.losses.append(round(float(parts["loss"].sum())
                                  + reg * float((Y ** 2).sum()), 6))
        Y = np.linalg.solve(A_sum + XtX[None, :, :] + eye[None, :, :],
                            b_sum)
        model.item_factors = Y

    if materialize_users:
        YtY_reg = Y.T @ Y + eye
        yref = ray.put(Y)

        def emit(df: pd.DataFrame, _YtY=YtY_reg,
                 _yref=yref) -> pd.DataFrame:
            uniq, X, _, _, _ = _user_solve(df, ray.get(_yref), _YtY,
                                           alpha, user_col)
            out = {user_col: uniq}
            for j in range(k):
                out[f"f{j}"] = X[:, j]
            return pd.DataFrame(out)

        if mode == "driver":
            import ray.data as rd

            model.user_factors = rd.from_pandas(emit(local))
        else:
            model.user_factors = keyed_apply(
                interactions, user_col, emit,
                n_buckets=n_buckets).materialize()
    return model


def recommend_items(model: ALSModel, *, top_n: int = 3):
    """Score every user against the broadcast item matrix → Dataset
    (user, rank, item, score) with ``top_n`` rows per user."""
    if model.user_factors is None:
        raise ValueError("fit with materialize_users=True first")
    Y = model.item_factors
    ids = model.item_ids
    k = model.k
    # the column name is recorded at fit time — inferring it from the
    # materialized schema would misclassify user keys like 'from_id'
    user_col = model.user_col or [
        c for c in model.user_factors.schema().names
        if not c.startswith("f")][0]
    top_n = min(top_n, len(ids))

    def score(b: pa.Table) -> pa.Table:
        X = np.column_stack([
            b[f"f{j}"].to_numpy(zero_copy_only=False) for j in range(k)])
        S = X @ Y.T                                   # (n_users, n_items)
        order = np.argsort(-np.round(S, 12), axis=1,
                           kind="stable")[:, :top_n]
        n = len(X)
        users = b[user_col].to_numpy(zero_copy_only=False)
        return pa.Table.from_pydict({
            user_col: pa.array(np.repeat(users, top_n)),
            "rank": pa.array(np.tile(np.arange(1, top_n + 1), n)),
            "item": pa.array(ids[order.ravel()]),
            "score": pa.array(np.take_along_axis(
                S, order, axis=1).ravel())})

    return model.user_factors.map_batches(score, batch_format="pyarrow",
                                          zero_copy_batch=True)
