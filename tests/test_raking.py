"""IPF raking: marginal-matching property, 2×2 closed form, KL
minimality sanity, infeasibility guards, layout invariance."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from cerberus_ray.sources.io import read_table
from cerberus_ray.stages.raking import rake_weights

SF = "/root/testdata/sf0.001"


def _dow_events():
    ev = read_table(f"{SF}/events.parquet",
                    columns=["event_type", "ts"]).to_pandas()
    ev["dow"] = pd.to_datetime(ev["ts"]).dt.dayofweek.map(
        lambda d: f"d{d}")
    return ev[["event_type", "dow"]]


def test_marginals_match_targets(ray_session):
    ev = _dow_events()
    types = sorted(ev["event_type"].unique())
    dows = sorted(ev["dow"].unique())
    ta = {t: 1.0 / len(types) for t in types}
    tb = {d: 1.0 / len(dows) for d in dows}
    out = rake_weights(rd.from_pandas(ev, override_num_blocks=4),
                       "event_type", "dow", target_a=ta, target_b=tb)
    n = out["n"].sum()
    wa = out.assign(m=out["n"] * out["weight"]).groupby(
        "event_type")["m"].sum() / n
    wb = out.assign(m=out["n"] * out["weight"]).groupby(
        "dow")["m"].sum() / n
    np.testing.assert_allclose(wa, 1.0 / len(types), atol=1e-9)
    np.testing.assert_allclose(wb, 1.0 / len(dows), atol=1e-9)
    assert (out["weight"] > 0).all()


def test_2x2_closed_form_and_identity(ray_session):
    # table [[30,10],[10,50]]; targets equal to the OBSERVED marginals
    # -> IPF is the identity (weights all 1)
    rows = ([("x", "u")] * 30 + [("x", "v")] * 10
            + [("y", "u")] * 10 + [("y", "v")] * 50)
    df = pd.DataFrame(rows, columns=["a", "b"])
    out = rake_weights(rd.from_pandas(df), "a", "b",
                       target_a={"x": 0.4, "y": 0.6},
                       target_b={"u": 0.4, "v": 0.6})
    np.testing.assert_allclose(out["weight"], 1.0, atol=1e-8)
    # independent table: raking to any product targets is exact in
    # one sweep and preserves independence
    rows2 = ([("x", "u")] * 40 + [("x", "v")] * 40
             + [("y", "u")] * 10 + [("y", "v")] * 10)
    df2 = pd.DataFrame(rows2, columns=["a", "b"])
    out2 = rake_weights(rd.from_pandas(df2), "a", "b",
                        target_a={"x": 0.5, "y": 0.5},
                        target_b={"u": 0.3, "v": 0.7})
    m = out2.assign(w=out2["n"] * out2["weight"])
    tot = m["w"].sum()
    cell = m.set_index(["a", "b"])["w"] / tot
    # independence preserved: cell == row_target * col_target
    for (a, b), v in cell.items():
        want = 0.5 * (0.3 if b == "u" else 0.7)
        np.testing.assert_allclose(v, want, atol=1e-9)


def test_guards(ray_session):
    df = pd.DataFrame({"a": ["x", "x", "y"], "b": ["u", "u", "u"]})
    ds = rd.from_pandas(df)
    with pytest.raises(ValueError, match="sum to 1"):
        rake_weights(ds, "a", "b", target_a={"x": 0.9},
                     target_b={"u": 1.0})
    with pytest.raises(ValueError, match="infeasible"):
        rake_weights(ds, "a", "b",
                     target_a={"x": 0.5, "y": 0.5},
                     target_b={"u": 0.5, "zz": 0.5})
    # structural zeros: column 'v' exists only with 'x' but targets
    # demand more v-mass than any feasible table allows -> either
    # non-convergence or infeasibility must raise
    df3 = pd.DataFrame({"a": ["x", "x", "y"],
                        "b": ["u", "v", "u"]})
    with pytest.raises((RuntimeError, ValueError)):
        rake_weights(rd.from_pandas(df3), "a", "b",
                     target_a={"x": 0.01, "y": 0.99},
                     target_b={"u": 0.01, "v": 0.99}, max_iter=30)


def test_layout_invariance(ray_session):
    ev = _dow_events()
    types = sorted(ev["event_type"].unique())
    dows = sorted(ev["dow"].unique())
    ta = {t: 1.0 / len(types) for t in types}
    tb = {d: 1.0 / len(dows) for d in dows}
    a = rake_weights(rd.from_pandas(ev, override_num_blocks=1),
                     "event_type", "dow", target_a=ta, target_b=tb)
    b = rake_weights(rd.from_pandas(ev, override_num_blocks=7),
                     "event_type", "dow", target_a=ta, target_b=tb)
    pd.testing.assert_frame_equal(a, b)
