"""Interval join: DuckDB range-predicate parity (keyed + keyless,
overlap + contains), seam safety under extreme keys, band skew,
partition invariance."""

import duckdb
import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from cerberus_ray.stages.interval_join import interval_join


def _frames():
    rng = np.random.default_rng(31)
    nl, nr = 200, 150
    ls = rng.integers(0, 1000, nl)
    rs = rng.integers(0, 1000, nr)
    L = pd.DataFrame({"k": rng.integers(0, 8, nl), "lid": np.arange(nl),
                      "start": ls, "end": ls + rng.integers(0, 60, nl)})
    R = pd.DataFrame({"k": rng.integers(0, 8, nr), "rid": np.arange(nr),
                      "start": rs, "end": rs + rng.integers(0, 60, nr)})
    return L, R


def _norm(df):
    return (df.sort_values(["lid", "rid"]).reset_index(drop=True)
            .astype({"lid": "int64", "rid": "int64"}))


def _sql(keyed, how):
    keycond = "L.k = R.k AND " if keyed else ""
    pred = ("L.start <= R.\"end\" AND R.start <= L.\"end\""
            if how == "overlap"
            else "L.start <= R.start AND R.\"end\" <= L.\"end\"")
    return (f'SELECT L.lid, R.rid FROM L, R '
            f'WHERE {keycond}{pred} ORDER BY L.lid, R.rid')


@pytest.mark.parametrize("how", ["overlap", "contains"])
def test_keyed_duckdb_parity(ray_session, how):
    L, R = _frames()
    got = interval_join(
        rd.from_pandas(L, override_num_blocks=3),
        rd.from_pandas(R, override_num_blocks=2),
        on="k", left_start="start", left_end="end",
        right_start="start", right_end="end", how=how,
        n_buckets=5).to_pandas()
    want = duckdb.sql(_sql(True, how)).fetchdf()
    pd.testing.assert_frame_equal(_norm(got[["lid", "rid"]]),
                                  _norm(want))
    # suffixed right columns present; right key dropped (equals left's)
    assert {"start_r", "end_r"} <= set(got.columns)
    assert "k_r" not in got.columns


def test_keyless_duckdb_parity(ray_session):
    L, R = _frames()
    L, R = L.head(60), R.head(40)
    got = interval_join(
        rd.from_pandas(L), rd.from_pandas(R),
        left_start="start", left_end="end",
        right_start="start", right_end="end").to_pandas()
    want = duckdb.sql(_sql(False, "overlap")).fetchdf()
    pd.testing.assert_frame_equal(_norm(got[["lid", "rid"]]),
                                  _norm(want))


def test_band_skew_and_point_rights(ray_session):
    # one huge right interval among point rights must not lose pairs
    L = pd.DataFrame({"lid": [0, 1, 2], "start": [100, 500, 900],
                      "end": [110, 510, 910]})
    R = pd.DataFrame({"rid": [0, 1, 2, 3],
                      "start": [0, 105, 505, 905],
                      "end": [1000, 105, 505, 905]})
    got = _norm(interval_join(
        rd.from_pandas(L), rd.from_pandas(R),
        left_start="start", left_end="end", right_start="start",
        right_end="end").to_pandas()[["lid", "rid"]])
    want = pd.DataFrame({"lid": [0, 0, 1, 1, 2, 2],
                         "rid": [0, 1, 0, 2, 0, 3]})
    pd.testing.assert_frame_equal(got, _norm(want))


def test_partition_invariance_and_how_guard(ray_session):
    L, R = _frames()
    outs = []
    for blocks, buckets in ((2, 3), (6, 9)):
        got = interval_join(
            rd.from_pandas(L, override_num_blocks=blocks),
            rd.from_pandas(R, override_num_blocks=blocks),
            on="k", left_start="start", left_end="end",
            right_start="start", right_end="end",
            n_buckets=buckets).to_pandas()
        outs.append(_norm(got[["lid", "rid"]]))
    pd.testing.assert_frame_equal(outs[0], outs[1])
    with pytest.raises(ValueError, match="unknown how"):
        interval_join(rd.from_pandas(L), rd.from_pandas(R), how="cross")


def test_null_bounds_dropped_not_poisoning(ray_session):
    """One null-bounded row must not NaN-poison its bucket's sweep."""
    L = pd.DataFrame({"k": [1, 1], "lid": [0, 1],
                      "start": [10.0, np.nan], "end": [20.0, np.nan]})
    R = pd.DataFrame({"k": [1, 1], "rid": [0, 1],
                      "start": [15.0, np.nan], "end": [25.0, np.nan]})
    got = interval_join(rd.from_pandas(L), rd.from_pandas(R), on="k",
                        left_start="start", left_end="end",
                        right_start="start", right_end="end").to_pandas()
    assert got[["lid", "rid"]].values.tolist() == [[0, 0]]
