"""Hash-keyed k-fold cross-validation for the distributed classifiers.

Fold assignment is pure in the key (the same splitmix contract as
``mixing.assign_splits``): a row lands in the same fold under retries,
repartitions and re-ingestion — the property that prevents silent
train/eval leakage when folds are recomputed on a rebuilt corpus.
Each fold's round is train-on-(k−1)/eval-on-1 with the held-out
accuracy reduced from per-block partials; total cost is k × one
classifier fit (each fit is itself the streamed block-partial plan —
`logreg.py`), nothing O(rows) on the driver.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..determinism import splitmix64


def kfold_assign(ds, key_col: str, *, n_folds: int, seed: int = 42):
    """→ Dataset + ``__fold`` ∈ [0, n_folds): deterministic hash fold."""
    if n_folds < 2:
        raise ValueError(f"n_folds must be ≥ 2, got {n_folds}")

    def tag(b: pa.Table) -> pa.Table:
        k = b[key_col].to_numpy(zero_copy_only=False)
        h = splitmix64(k.astype(np.uint64) + np.uint64(seed))
        return b.append_column(
            "__fold", pa.array((h % np.uint64(n_folds)).astype(np.int64),
                               pa.int64()))

    return ds.map_batches(tag, batch_format="pyarrow",
                          zero_copy_batch=True)


def kfold_logreg_eval(ds, *, key_col: str = "doc_id",
                      text_col: str = "text", label_col: str = "label",
                      n_folds: int = 3, seed: int = 42,
                      **fit_kw) -> pd.DataFrame:
    """→ frame (fold, n_train, n_test, accuracy) + a summary row
    (fold = −1) with the mean held-out accuracy — the honest
    generalization estimate the in-sample train_acc reports cannot
    give."""
    from .logreg import fit_logreg, score_logreg

    tagged = kfold_assign(ds, key_col, n_folds=n_folds,
                          seed=seed).materialize()
    rows = []
    for i in range(n_folds):
        train = tagged.filter(expr=f"__fold != {i}")
        test = tagged.filter(expr=f"__fold == {i}")
        model = fit_logreg(train, text_col=text_col,
                           label_col=label_col, **fit_kw)
        scored = score_logreg(test, model, text_col=text_col,
                              key_col=key_col, carry_cols=[label_col])

        def acc_part(b: pa.Table) -> pa.Table:
            p = b["p"].to_numpy(zero_copy_only=False)
            y = b[label_col].to_numpy(zero_copy_only=False)
            return pa.Table.from_pydict({
                "ok": pa.array([int(((p > 0.5) == (y == 1)).sum())],
                               pa.int64()),
                "n": pa.array([len(p)], pa.int64())})

        ap = scored.map_batches(acc_part,
                                batch_format="pyarrow").to_pandas()
        n_test = int(ap["n"].sum())
        rows.append({
            "fold": i,
            "n_train": int(tagged.count() - n_test),
            "n_test": n_test,
            "accuracy": round(float(ap["ok"].sum() / max(n_test, 1)),
                              6)})
    out = pd.DataFrame(rows)
    out.loc[len(out)] = {
        "fold": -1, "n_train": int(out["n_train"].sum()),
        "n_test": int(out["n_test"].sum()),
        "accuracy": round(float(out["accuracy"].mean()), 6)}
    out["fold"] = out["fold"].astype("int64")
    return out
