"""Bayesian A/B: Evan-Miller closed-form parity, decisive/symmetric
behavior, census layout invariance, guards."""

from math import lgamma

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from cerberus_ray.stages.abtest import bayes_ab_test, prob_b_beats_a


def _closed_form(a_a, b_a, a_b, b_b):
    """Exact P(p_B > p_A) for integer parameters (Evan Miller's sum)."""
    def logbeta(a, b):
        return lgamma(a) + lgamma(b) - lgamma(a + b)

    total = 0.0
    for i in range(int(a_b)):
        total += np.exp(logbeta(a_a + i, b_a + b_b)
                        - np.log(b_b + i) - logbeta(1 + i, b_b)
                        - logbeta(a_a, b_a))
    return total


@pytest.mark.parametrize("params", [
    (3, 7, 5, 5), (10, 20, 12, 18), (1, 1, 1, 1), (40, 60, 55, 45)])
def test_quadrature_matches_closed_form(params):
    a_a, b_a, a_b, b_b = params
    got = prob_b_beats_a(a_a, b_a, a_b, b_b)
    want = _closed_form(a_a, b_a, a_b, b_b)
    # trapezoid-on-open-grid carries a ~half-cell CDF bias ≈ 1/grid
    assert abs(got - want) < 5e-4, (params, got, want)


def _frame(n=4000, p_c=0.10, p_t=0.13, seed=8):
    rng = np.random.default_rng(seed)
    g = np.where(np.arange(n) % 2 == 0, "A", "B")
    p = np.where(g == "A", p_c, p_t)
    return pd.DataFrame({"arm": g,
                         "converted": (rng.random(n) < p).astype(int)})


def test_decisive_and_symmetric(ray_session):
    df = _frame(n=20000, p_c=0.10, p_t=0.14)
    r = bayes_ab_test(rd.from_pandas(df, override_num_blocks=5),
                      "arm", "converted", control="A",
                      treatment="B").iloc[0]
    assert r["prob_beats"] > 0.99
    assert 0.02 < r["expected_lift"] < 0.06
    # null: same rate both arms → prob near 0.5
    df0 = _frame(n=20000, p_c=0.1, p_t=0.1, seed=3)
    r0 = bayes_ab_test(rd.from_pandas(df0), "arm", "converted",
                       control="A", treatment="B").iloc[0]
    # a single null draw can land ±2σ away: just assert non-decisive
    assert 0.02 < r0["prob_beats"] < 0.98
    assert abs(r0["expected_lift"]) < 0.01


def test_layout_invariance_and_guards(ray_session):
    df = _frame(n=3000)
    a = bayes_ab_test(rd.from_pandas(df, override_num_blocks=2),
                      "arm", "converted", control="A", treatment="B")
    b = bayes_ab_test(rd.from_pandas(df, override_num_blocks=9),
                      "arm", "converted", control="A", treatment="B")
    pd.testing.assert_frame_equal(a, b)
    with pytest.raises(Exception, match="both arms"):
        bayes_ab_test(rd.from_pandas(df), "arm", "converted",
                      control="A", treatment="Z")
