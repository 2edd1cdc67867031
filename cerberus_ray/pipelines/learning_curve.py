"""Learning-curve harness: held-out quality vs training-set size.

The "do we need more data?" artifact of a training-data pipeline
(the classic power-law learning-curve measurement): train the SAME
model on NESTED leak-free subsets of the corpus and evaluate every
size on ONE fixed holdout.

Split discipline (the `cv.py` splitmix contract — pure in the key, so
retry/repartition/re-ingestion invariant):

- holdout = rows with u < holdout_frac, where u = hash(key)/2⁶⁴;
- the f-fraction training set = rows with holdout_frac ≤ u <
  holdout_frac + f·(1 − holdout_frac) — subsets are NESTED by
  construction (smaller ⊂ larger), which is what makes points on the
  curve comparable, and no training row ever touches the holdout.

Each point costs one `fit_logreg` (few streamed passes) + one scoring
census on the shared holdout.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd
import pyarrow as pa

from ..determinism import splitmix64

__all__ = ["learning_curve"]


def _u(b: pa.Table, key_col: str, seed: int) -> np.ndarray:
    k = b[key_col].to_numpy(zero_copy_only=False)
    return (splitmix64(k.astype(np.uint64) + np.uint64(seed))
            .astype(np.float64) / 2.0 ** 64)


def learning_curve(ds, *, key_col: str = "doc_id",
                   text_col: str = "text", label_col: str = "label",
                   fractions: Sequence[float] = (0.1, 0.25, 0.5, 1.0),
                   holdout_frac: float = 0.2, n_features: int = 512,
                   iters: int = 12, seed: int = 42) -> pd.DataFrame:
    """→ frame (fraction, n_train, holdout_acc) sorted by fraction."""
    from .logreg import fit_logreg, score_logreg

    fr = sorted(set(float(f) for f in fractions))
    if not fr or fr[0] <= 0 or fr[-1] > 1:
        raise ValueError("fractions must lie in (0, 1]")
    if not 0 < holdout_frac < 1:
        raise ValueError("holdout_frac must lie in (0, 1)")

    def band(lo: float, hi: float):
        def keep(b: pa.Table) -> pa.Table:
            u = _u(b, key_col, seed)
            return b.filter(pa.array((u >= lo) & (u < hi)))

        return ds.map_batches(keep, batch_format="pyarrow",
                              zero_copy_batch=True)

    holdout = band(0.0, holdout_frac).materialize()
    rows = []
    for f in fr:
        hi = holdout_frac + f * (1.0 - holdout_frac)
        train = band(holdout_frac, hi).materialize()
        m = fit_logreg(train, text_col=text_col, label_col=label_col,
                       n_features=n_features, iters=iters)
        scored = score_logreg(holdout, m, carry_cols=[label_col])

        def acc_part(b: pa.Table) -> pa.Table:
            p = b["p"].to_numpy(zero_copy_only=False)
            y = b[label_col].to_numpy(zero_copy_only=False)
            return pa.Table.from_pydict({
                "ok": pa.array([int(((p > 0.5) == (y == 1)).sum())],
                               pa.int64()),
                "n": pa.array([len(p)], pa.int64())})

        ap = scored.map_batches(acc_part,
                                batch_format="pyarrow").to_pandas()
        rows.append((f, int(train.count()),
                     round(float(ap["ok"].sum()
                                 / max(ap["n"].sum(), 1)), 4)))
    return pd.DataFrame(rows, columns=["fraction", "n_train",
                                       "holdout_acc"])
