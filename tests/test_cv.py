"""k-fold CV harness: fold assignment determinism/partition
invariance, held-out accuracy on separable data, summary row, guards."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from cerberus_ray.pipelines.cv import kfold_assign, kfold_logreg_eval
from tests.test_logreg import _frame


def test_fold_assignment_invariant(ray_session):
    df = pd.DataFrame({"doc_id": np.arange(1000, dtype=np.int64)})
    outs = []
    for blocks in (1, 9):
        t = (kfold_assign(rd.from_pandas(df, override_num_blocks=blocks),
                          "doc_id", n_folds=4).to_pandas()
             .sort_values("doc_id").reset_index(drop=True))
        outs.append(t)
    pd.testing.assert_frame_equal(outs[0], outs[1])
    # all folds populated, roughly balanced
    sizes = outs[0]["__fold"].value_counts()
    assert len(sizes) == 4 and sizes.min() > 150


def test_heldout_accuracy_separable(ray_session):
    df = _frame(n=600, seed=21)
    r = kfold_logreg_eval(rd.from_pandas(df, override_num_blocks=4),
                          n_folds=3, n_features=256, iters=6)
    per_fold = r[r["fold"] >= 0]
    assert len(per_fold) == 3
    assert (per_fold["accuracy"] > 0.9).all(), per_fold
    # summary row: mean of fold accuracies, totals sum
    s = r[r["fold"] == -1].iloc[0]
    assert abs(s["accuracy"]
               - per_fold["accuracy"].mean()) < 1e-9
    assert s["n_test"] == per_fold["n_test"].sum() == 600


def test_guard(ray_session):
    df = pd.DataFrame({"doc_id": [1], "text": ["a"], "label": [1]})
    with pytest.raises(ValueError):
        kfold_assign(rd.from_pandas(df), "doc_id", n_folds=1)
