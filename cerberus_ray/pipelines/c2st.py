"""Classifier two-sample test (C2ST, Lopez-Paz & Oquab 2017): detect
distribution shift between two text corpora by training a classifier
to TELL THEM APART — held-out AUC ≈ 0.5 means indistinguishable (no
shift); AUC near 1 means the two samples are trivially separable.

The modern complement of the per-feature KS/PSI drift checks in
`stages/drift.py`: a univariate drift test can miss a joint shift that
a classifier finds, and the AUC is an interpretable effect size.

Composition of existing engine pieces — nothing new is invented:
hash-fold split (`cv.kfold_assign` convention), distributed logistic
regression (`logreg.fit_logreg`), streamed scoring, and the rank-sum
AUC (`roc.roc_auc`) on the held-out half. Every stage is the
already-tested distributed path.

Tests: tests/test_c2st.py.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["c2st_report"]


def c2st_report(ds_a, ds_b, *, text_col: str = "text",
                key_col: str = "doc_id", n_features: int = 1024,
                seed: int = 42, round_digits: int = 6,
                **fit_kw) -> pd.DataFrame:
    """→ one-row frame (n_a, n_b, n_train, n_test, auc, separable):
    label side A = 0 / side B = 1, split rows into train/test by a
    seeded key hash (leak-free under reshuffles), fit the distributed
    logreg on train, report held-out AUC. ``separable`` flags
    auc ≥ 0.6 — the conventional "distribution shift detected" line
    (tune per use)."""
    from ..determinism import uniform01
    from ..stages.roc import roc_auc
    from .logreg import fit_logreg, score_logreg

    def tag(side: int):
        def fn(b: pa.Table) -> pa.Table:
            ids = b[key_col].to_numpy(zero_copy_only=False).astype(
                np.int64)
            # fold by key hash; salt the side so equal ids across the
            # two inputs don't co-assign
            u = uniform01(ids * 2 + side, seed)
            return pa.Table.from_pydict({
                key_col: b[key_col],
                text_col: b[text_col],
                "label": pa.array(np.full(len(ids), side, np.int64)),
                "is_test": pa.array(u < 0.5)})
        return fn

    both = (ds_a.map_batches(tag(0), batch_format="pyarrow",
                             zero_copy_batch=True)
            .union(ds_b.map_batches(tag(1), batch_format="pyarrow",
                                    zero_copy_batch=True))
            ).materialize()
    train = both.filter(expr="is_test == False")
    test = both.filter(expr="is_test == True")
    model = fit_logreg(train, text_col=text_col, label_col="label",
                       n_features=n_features, **fit_kw)
    scored = score_logreg(test, model, text_col=text_col,
                          key_col=key_col, carry_cols=["label"])
    auc_frame = roc_auc(scored, "p", "label", quantize=6)
    auc = float(auc_frame["auc"].iloc[0])
    n_a, n_b = ds_a.count(), ds_b.count()
    n_test = int(auc_frame["n_pos"].iloc[0]
                 + auc_frame["n_neg"].iloc[0])
    return pd.DataFrame([{
        "n_a": int(n_a), "n_b": int(n_b),
        "n_train": int(n_a + n_b - n_test), "n_test": n_test,
        "auc": round(auc, round_digits),
        "separable": bool(auc >= 0.6)}])
