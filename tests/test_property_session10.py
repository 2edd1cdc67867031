"""Property-based (hypothesis) invariants for the session-10 operator
family — the generative counterpart of their example-based suites:
conservation laws and reference-implementation agreement on arbitrary
inputs."""

import numpy as np
import pandas as pd
import ray.data as rd
from hypothesis import given, settings
from hypothesis import strategies as st

SETTINGS = dict(max_examples=15, deadline=None)


@st.composite
def keyed_frame(draw, n_max=60):
    n = draw(st.integers(2, n_max))
    keys = draw(st.lists(st.integers(0, 5), min_size=n, max_size=n))
    vals = draw(st.lists(st.sampled_from("abc"), min_size=n,
                         max_size=n))
    return pd.DataFrame({"k": keys, "s": vals,
                         "t": range(n), "i": range(n)})


@given(keyed_frame())
@settings(**SETTINGS)
def test_markov_transition_conservation(df):
    """Σ counts == Σ_key max(len(key)−1, 0); every p row-normalizes."""
    from cerberus_ray.stages.markov import transition_matrix

    tm = transition_matrix(rd.from_pandas(df, override_num_blocks=2),
                           "k", ["t", "i"], "s")
    expect = sum(max(c - 1, 0)
                 for c in df.groupby("k").size())
    assert tm["n"].sum() == expect
    if len(tm):
        sums = tm.groupby("state")["p"].sum()
        np.testing.assert_allclose(sums, 1.0, atol=1e-4)


@given(keyed_frame())
@settings(**SETTINGS)
def test_survivorship_matches_pandas_reference(df):
    from cerberus_ray.stages.survivorship import golden_records

    got = golden_records(rd.from_pandas(df, override_num_blocks=3),
                         "k", ["t", "i"], ["s"]).set_index("k")
    ref = (df.sort_values(["k", "t", "i"])
           .groupby("k").agg(s=("s", "last"), n=("s", "size")))
    assert (got["n_members"].sort_index() == ref["n"]).all()
    # no nulls in s here → last non-null == last
    assert (got["s"].sort_index() == ref["s"]).all()


@given(st.lists(st.tuples(st.integers(0, 8), st.integers(0, 6)),
                min_size=1, max_size=80))
@settings(**SETTINGS)
def test_assoc_pair_symmetry_and_bounds(pairs):
    from cerberus_ray.stages.assoc import association_rules

    df = pd.DataFrame(pairs, columns=["b", "i"])
    out = association_rules(rd.from_pandas(df), "b", "i",
                            min_pair_n=1, top_k=10**9)
    if not len(out):
        return
    # every rule's mirror exists with identical n_pair/cosine/jaccard
    g = out.set_index(["antecedent", "consequent"])
    for (a, c), row in g.iterrows():
        m = g.loc[(c, a)]
        assert m["n_pair"] == row["n_pair"]
        assert m["cosine"] == row["cosine"]
        assert m["jaccard"] == row["jaccard"]
    # bounds: confidence, support ∈ (0, 1]; n_pair ≤ min(n_a, n_c)
    assert ((out["confidence"] > 0) & (out["confidence"] <= 1)).all()
    assert (out["n_pair"] <= np.minimum(out["n_antecedent"],
                                        out["n_consequent"])).all()


@given(st.lists(st.tuples(st.floats(0, 1), st.integers(0, 1)),
                min_size=3, max_size=200))
@settings(**SETTINGS)
def test_isotonic_monotone_and_mean_preserving(rows):
    from cerberus_ray.stages.roc import isotonic_calibration

    df = pd.DataFrame(rows, columns=["s", "y"])
    got = isotonic_calibration(rd.from_pandas(df), "s", "y",
                               quantize=3)
    assert (np.diff(got["calibrated"]) >= -1e-9).all()
    np.testing.assert_allclose((got["n"] * got["calibrated"]).sum(),
                               df["y"].sum(), atol=1e-4)
    assert got["n"].sum() == len(df)


@given(st.lists(st.integers(0, 1000), min_size=1, max_size=300,
                unique=True),
       st.lists(st.integers(0, 1000), min_size=1, max_size=300,
                unique=True))
@settings(**SETTINGS)
def test_kmv_exact_band_is_exact(a_vals, b_vals):
    from cerberus_ray.stages.profile import inclusion_sketch_profile

    a = pd.DataFrame({"x": a_vals})
    b = pd.DataFrame({"y": b_vals})
    got = inclusion_sketch_profile(
        [("p", rd.from_pandas(a), "x", rd.from_pandas(b), "y")],
        k=1024).iloc[0]
    assert bool(got["exact"])
    true_cont = len(set(a_vals) & set(b_vals)) / len(set(a_vals))
    np.testing.assert_allclose(got["est_containment"], true_cont,
                               atol=1e-6)
    assert got["est_distinct_a"] == len(set(a_vals))
