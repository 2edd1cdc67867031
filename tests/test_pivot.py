"""Pivot/unpivot: DuckDB conditional-aggregation parity per agg, mode
agreement, count-zero vs null conventions, unpivot round-trip."""

import duckdb
import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from cerberus_ray.stages.pivot import pivot, pivot_values, unpivot

SF = "/root/testdata/sf0.001"


def _frame():
    rng = np.random.default_rng(11)
    n = 500
    df = pd.DataFrame({
        "g": rng.integers(0, 12, size=n),
        "p": rng.choice(["a", "b", "c", "d"], size=n),
        "v": rng.integers(-20, 80, size=n).astype("float64"),
    })
    df.loc[rng.choice(n, 25, replace=False), "v"] = np.nan
    df.loc[rng.choice(n, 10, replace=False), "p"] = None
    # group 3 never sees pivot value 'd' — exercises the missing-combo
    df = df[~((df["g"] == 3) & (df["p"] == "d"))]
    return df.reset_index(drop=True)


def _oracle(df, agg):
    fn = {"sum": "SUM", "count": "COUNT", "min": "MIN", "max": "MAX",
          "mean": "AVG"}[agg]
    cols = ", ".join(
        f"{fn}(CASE WHEN p = '{p}' THEN v END) AS {p}"
        for p in ("a", "b", "c", "d"))
    return (duckdb.sql(f"SELECT g, {cols} FROM df GROUP BY g ORDER BY g")
            .fetchdf())


@pytest.mark.parametrize("agg", ["sum", "count", "min", "max", "mean"])
def test_duckdb_parity(ray_session, agg):
    df = _frame()
    ds = rd.from_pandas(df, override_num_blocks=6)
    got = pivot(ds, ["g"], "p", "v", agg, mode="driver")
    want = _oracle(df, agg)
    assert list(got.columns) == list(want.columns)
    for c in ("a", "b", "c", "d"):
        np.testing.assert_allclose(
            got[c].to_numpy(dtype="float64"),
            want[c].to_numpy(dtype="float64"),
            atol=0, rtol=1e-12, equal_nan=True, err_msg=f"{agg}.{c}")
    if agg == "count":  # SQL conditional COUNT: missing combo = 0
        assert got["d"].dtype == np.int64
        assert int(got.loc[got["g"] == 3, "d"].iloc[0]) == 0


@pytest.mark.parametrize("agg", ["sum", "count", "mean", "max"])
def test_mode_agreement(ray_session, agg):
    df = _frame()
    ds = rd.from_pandas(df, override_num_blocks=5)
    a = pivot(ds, ["g"], "p", "v", agg, mode="driver")
    b = pivot(ds, ["g"], "p", "v", agg, mode="shuffle")
    pd.testing.assert_frame_equal(a, b.astype(a.dtypes.to_dict()),
                                  check_exact=False, rtol=1e-12)


def test_pinned_values_and_width_guard(ray_session):
    df = _frame()
    ds = rd.from_pandas(df, override_num_blocks=3)
    assert pivot_values(ds, "p") == ["a", "b", "c", "d"]
    got = pivot(ds, ["g"], "p", "v", "sum", values=["c", "a", "zz"])
    assert list(got.columns) == ["g", "c", "a", "zz"]
    assert got["zz"].isna().all()
    with pytest.raises(ValueError, match="schema explosion"):
        pivot_values(rd.from_pandas(
            pd.DataFrame({"p": [str(i) for i in range(50)]})),
            "p", max_values=10)


def test_real_events_pivot(ray_session):
    from cerberus_ray.sources.io import read_table

    ds = read_table(f"{SF}/events.parquet",
                    columns=["user_id", "event_type", "value"])
    got = pivot(ds, ["user_id"], "event_type", "value", "count")
    want = duckdb.sql(f"""
        SELECT user_id, {", ".join(
            f"COUNT(CASE WHEN event_type = '{t}' THEN value END) AS {t}"
            for t in ("click", "error", "purchase", "signup", "view"))}
        FROM read_parquet('{SF}/events.parquet')
        GROUP BY user_id ORDER BY user_id
    """).fetchdf()
    assert list(got.columns) == list(want.columns)
    for c in want.columns:
        np.testing.assert_array_equal(got[c].to_numpy(dtype="int64"),
                                      want[c].to_numpy(dtype="int64"), c)


def test_unpivot_round_trip(ray_session):
    df = _frame()
    ds = rd.from_pandas(df, override_num_blocks=4)
    wide = pivot(ds, ["g"], "p", "v", "sum")
    long = (unpivot(rd.from_pandas(wide), ["g"], ["a", "b", "c", "d"],
                    var_name="p", value_name="v", drop_null=True)
            .to_pandas().sort_values(["g", "p"]).reset_index(drop=True))
    want = (df.dropna(subset=["p"]).groupby(["g", "p"], as_index=False)
            ["v"].sum(min_count=1).dropna(subset=["v"])
            .sort_values(["g", "p"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(long, want, check_exact=False,
                                  rtol=1e-12)
