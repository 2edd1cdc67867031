"""HLL audience overlap: accuracy vs exact pandas intersections,
bit-identical across block layouts (register-max merge), disjoint and
identical edge cases."""

import numpy as np
import pandas as pd
import ray.data as rd

from cerberus_ray.stages.overlap import group_overlap_matrix


def _frame(seed=3):
    """Three segments with engineered overlaps over ~6k users."""
    rng = np.random.default_rng(seed)
    a = rng.choice(20_000, 4000, replace=False)
    b = np.concatenate([a[:2000],                       # half of A
                        rng.choice(np.arange(20_000, 40_000), 2500,
                                   replace=False)])
    c = rng.choice(np.arange(40_000, 60_000), 3000, replace=False)
    rows = ([("A", int(x)) for x in a] + [("B", int(x)) for x in b]
            + [("C", int(x)) for x in c])
    return pd.DataFrame(rows, columns=["seg", "user"])


def test_accuracy_vs_exact(ray_session):
    df = _frame()
    got = group_overlap_matrix(
        rd.from_pandas(df, override_num_blocks=6), "seg", "user")
    exact = {g: set(df[df["seg"] == g]["user"]) for g in "ABC"}
    for _, r in got.iterrows():
        ia = exact[r["group_a"]]
        ib = exact[r["group_b"]]
        true_inter = len(ia & ib)
        true_union = len(ia | ib)
        assert abs(r["est_union"] - true_union) < 0.05 * true_union
        # intersection via inclusion-exclusion: absolute error budget
        # is ~3 sketch errors of the LARGER sets
        tol = 0.05 * max(len(ia), len(ib)) + 50
        assert abs(r["est_intersection"] - true_inter) < tol, (
            r["group_a"], r["group_b"], true_inter,
            r["est_intersection"])
    ab = got.set_index(["group_a", "group_b"])
    assert ab.loc[("A", "B"), "est_intersection"] > 1500   # real overlap
    assert ab.loc[("A", "C"), "est_intersection"] < 400    # disjoint


def test_bit_identical_across_layouts(ray_session):
    df = _frame(seed=9)
    outs = [group_overlap_matrix(
        rd.from_pandas(df, override_num_blocks=b), "seg", "user")
        for b in (1, 11)]
    pd.testing.assert_frame_equal(outs[0], outs[1])   # exact, not close


def test_identical_groups(ray_session):
    df = pd.DataFrame({"seg": ["X"] * 100 + ["Y"] * 100,
                       "user": list(range(100)) * 2})
    got = group_overlap_matrix(rd.from_pandas(df), "seg", "user")
    r = got.iloc[0]
    assert r["est_union"] == r["est_a"] == r["est_b"]
    assert r["jaccard"] > 0.99
