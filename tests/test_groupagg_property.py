"""Property test for the map-side-combined grouped aggregation: for any
blocked input with NULLs, grouped_agg must equal pandas groupby (which
implements SQL semantics: AVG/SUM ignore NULLs, COUNT(*) counts rows)."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from cerberus_ray.stages.groupagg import grouped_agg


@st.composite
def frames(draw):
    n = draw(st.integers(min_value=1, max_value=60))
    keys = draw(st.lists(st.sampled_from(["a", "b", "c"]),
                         min_size=n, max_size=n))
    vals = draw(st.lists(
        st.one_of(st.none(),
                  st.floats(min_value=-100, max_value=100,
                            allow_nan=False, width=32)),
        min_size=n, max_size=n))
    nblocks = draw(st.integers(min_value=1, max_value=4))
    return pd.DataFrame({"k": keys, "v": vals}), nblocks


@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.too_slow,
                                 HealthCheck.function_scoped_fixture])
@given(fb=frames())
def test_grouped_agg_matches_pandas_with_nulls(ray_session, fb):
    df, nblocks = fb
    ds = rd.from_pandas(df).repartition(nblocks)
    got = grouped_agg(ds, ["k"],
                      {"n": ("", "count"), "total": ("v", "sum"),
                       "avg": ("v", "mean")}).set_index("k")
    want = df.groupby("k").agg(n=("v", "size"), total=("v", "sum"),
                               avg=("v", "mean"))
    assert got.index.tolist() == sorted(want.index.tolist())
    for k in want.index:
        assert got.loc[k, "n"] == want.loc[k, "n"]
        assert got.loc[k, "total"] == pytest.approx(want.loc[k, "total"],
                                                    rel=1e-9, abs=1e-9)
        ga, wa = got.loc[k, "avg"], want.loc[k, "avg"]
        if pd.isna(wa):  # all-NULL group: SQL AVG is NULL
            assert pd.isna(ga)
        else:
            assert ga == pytest.approx(wa, rel=1e-9, abs=1e-9)
