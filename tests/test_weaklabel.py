"""Weak-supervision label model: hand-worked vote/diagnostic vectors,
tie and all-abstain semantics, layout invariance."""

import numpy as np
import pandas as pd
import ray.data as rd

from cerberus_ray.stages.weaklabel import lf_summary, weak_vote


def _frame():
    # rows: (lf1, lf2, lf3) with -1 = abstain
    return pd.DataFrame({
        "lf1": [1, 1, 0, -1, 1, -1],
        "lf2": [1, 0, 0, -1, -1, -1],
        "lf3": [-1, 0, 1, -1, 1, -1]})


def test_vote_hand_vectors(ray_session):
    voted = weak_vote(rd.from_pandas(_frame(), override_num_blocks=2),
                      ["lf1", "lf2", "lf3"]).to_pandas()
    # row0: votes {1,1} → 1; row1: {1,0,0} → 0; row2: {0,0,1} → 0;
    # row3: all abstain → -1; row4: {1,1} → 1; row5: abstain
    assert list(voted["weak_label"]) == [1, 0, 0, -1, 1, -1]


def test_vote_tie_goes_abstain(ray_session):
    df = pd.DataFrame({"a": [1, 2], "b": [0, 2], "c": [-1, -1]})
    voted = weak_vote(rd.from_pandas(df), ["a", "b", "c"]).to_pandas()
    assert voted["weak_label"].iloc[0] == -1      # 1 vs 0 tie
    assert voted["weak_label"].iloc[1] == 2


def test_lf_summary_hand_vectors(ray_session):
    got = lf_summary(rd.from_pandas(_frame(), override_num_blocks=3),
                     ["lf1", "lf2", "lf3"]).set_index("lf")
    n = 6
    # lf1 votes rows 0,1,2,4 → coverage 4/6; overlaps on all 4 (some
    # other LF votes there too); conflicts rows 1 (lf2=0≠1) and 2
    # (lf3=1≠0) → 2/6
    np.testing.assert_allclose(got.loc["lf1", "coverage"], 4 / n, atol=1e-6)
    np.testing.assert_allclose(got.loc["lf1", "overlap"], 4 / n, atol=1e-6)
    np.testing.assert_allclose(got.loc["lf1", "conflict"], 2 / n, atol=1e-6)
    # lf3 votes rows 1,2,4: conflicts at 1 (lf1=1≠0) and 2 (both 0 vs
    # lf3=1 → conflict) → 2/6
    np.testing.assert_allclose(got.loc["lf3", "coverage"], 3 / n, atol=1e-6)
    np.testing.assert_allclose(got.loc["lf3", "conflict"], 2 / n, atol=1e-6)
    assert (got["n_rows"] == n).all()


def test_layout_invariance(ray_session):
    rng = np.random.default_rng(33)
    df = pd.DataFrame({
        f"lf{j}": rng.choice([-1, 0, 1, 2], 2000) for j in range(4)})
    cols = list(df.columns)
    a1 = lf_summary(rd.from_pandas(df, override_num_blocks=1), cols)
    a8 = lf_summary(rd.from_pandas(df, override_num_blocks=8), cols)
    pd.testing.assert_frame_equal(a1, a8)
    v1 = weak_vote(rd.from_pandas(df, override_num_blocks=1),
                   cols).to_pandas()
    v8 = weak_vote(rd.from_pandas(df, override_num_blocks=8),
                   cols).to_pandas()
    pd.testing.assert_frame_equal(v1, v8)
