"""Generic window functions: DuckDB OVER(...) parity on synthetic and
real tables, null conventions, partition invariance, spec validation."""

import duckdb
import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from cerberus_ray.stages.window_fns import window_columns

SF = "/root/testdata/sf0.001"


def _frame():
    rng = np.random.default_rng(7)
    n = 600
    df = pd.DataFrame({
        "k": rng.integers(0, 23, size=n),
        "ts": rng.integers(0, 50, size=n),
        "rid": np.arange(n),
        "v": rng.integers(-5, 6, size=n).astype("float64"),
    })
    df.loc[rng.choice(n, 40, replace=False), "v"] = np.nan
    return df


SPECS = {
    "rn": ("row_number",),
    "prev_v": ("lag", "v", 1),
    "next_ts": ("lead", "ts", 2),
    "run_v": ("cumsum", "v"),
    "peak_ts": ("cummax", "ts"),
    "floor_ts": ("cummin", "ts"),
    "step_ts": ("delta", "ts"),
    "r_ts": ("rank", "ts"),
    "dr_ts": ("dense_rank", "ts"),
    "tile4": ("ntile", 4),
    "pr_ts": ("percent_rank", "ts"),
    "cd_ts": ("cume_dist", "ts"),
}

SQL = """
SELECT k, ts, rid, v,
       ROW_NUMBER() OVER w AS rn,
       LAG(v, 1) OVER w AS prev_v,
       LEAD(ts, 2) OVER w AS next_ts,
       SUM(v) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS run_v,
       MAX(ts) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS peak_ts,
       MIN(ts) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS floor_ts,
       ts - LAG(ts, 1) OVER w AS step_ts,
       RANK() OVER (PARTITION BY k ORDER BY ts) AS r_ts,
       DENSE_RANK() OVER (PARTITION BY k ORDER BY ts) AS dr_ts,
       NTILE(4) OVER w AS tile4,
       PERCENT_RANK() OVER (PARTITION BY k ORDER BY ts) AS pr_ts,
       CUME_DIST() OVER (PARTITION BY k ORDER BY ts) AS cd_ts
FROM df
WINDOW w AS (PARTITION BY k ORDER BY ts, rid)
"""


def _norm(df):
    return (df.sort_values(["k", "rid"]).reset_index(drop=True)
            [["k", "ts", "rid", "v"] + list(SPECS)])


def test_duckdb_parity_synthetic(ray_session):
    df = _frame()
    ds = rd.from_pandas(df, override_num_blocks=5)
    got = _norm(window_columns(ds, "k", ["ts", "rid"], SPECS,
                               n_buckets=7).to_pandas())
    want = _norm(duckdb.sql(SQL).fetchdf())
    for c in SPECS:
        a = got[c].to_numpy(dtype="float64")
        b = want[c].to_numpy(dtype="float64")
        np.testing.assert_allclose(a, b, atol=0, rtol=0, equal_nan=True,
                                   err_msg=c)


def test_partition_invariance(ray_session):
    df = _frame()
    outs = []
    for blocks, buckets in ((2, 3), (9, 16)):
        ds = rd.from_pandas(df, override_num_blocks=blocks)
        outs.append(_norm(window_columns(
            ds, "k", ["ts", "rid"], SPECS, n_buckets=buckets).to_pandas()))
    pd.testing.assert_frame_equal(outs[0], outs[1])


def test_real_events_table(ray_session):
    from cerberus_ray.sources.io import read_table

    cols = ["event_id", "user_id", "ts", "value"]
    ds = read_table(f"{SF}/events.parquet", columns=cols)
    specs = {"rn": ("row_number",), "prev_ts": ("lag", "ts", 1),
             "run_value": ("cumsum", "value"), "r_v": ("rank", "value")}
    got = (window_columns(ds, "user_id", ["ts", "event_id"], specs)
           .to_pandas().sort_values(["user_id", "rn"])
           .reset_index(drop=True))
    want = duckdb.sql(f"""
        SELECT user_id,
               ROW_NUMBER() OVER w AS rn,
               LAG(ts, 1) OVER w AS prev_ts,
               SUM(value) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) AS run_value,
               RANK() OVER (PARTITION BY user_id ORDER BY value) AS r_v
        FROM read_parquet('{SF}/events.parquet')
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ORDER BY user_id, rn
    """).fetchdf()
    assert len(got) == len(want)
    for c in ("rn", "r_v"):
        np.testing.assert_array_equal(got[c].to_numpy(dtype="int64"),
                                      want[c].to_numpy(dtype="int64"), c)
    pd.testing.assert_series_equal(
        got["prev_ts"], want["prev_ts"], check_names=False)
    # running float sums: same visit order both sides, but DuckDB may
    # tree-aggregate — tolerance, not bit equality
    np.testing.assert_allclose(got["run_value"].to_numpy(),
                               want["run_value"].to_numpy(), rtol=1e-9)


def test_null_conventions(ray_session):
    df = pd.DataFrame({"k": [1, 1, 1, 1], "o": [1, 2, 3, 4],
                       "v": [np.nan, 2.0, np.nan, 3.0]})
    ds = rd.from_pandas(df)
    out = (window_columns(ds, "k", ["o"],
                          {"run": ("cumsum", "v"), "lag1": ("lag", "v")})
           .to_pandas().sort_values("o").reset_index(drop=True))
    # null-skipping running sum, null until first non-null (SQL SUM OVER)
    np.testing.assert_allclose(out["run"].to_numpy(),
                               [np.nan, 2.0, 2.0, 5.0], equal_nan=True)
    np.testing.assert_allclose(out["lag1"].to_numpy(),
                               [np.nan, np.nan, 2.0, np.nan],
                               equal_nan=True)


def test_spec_validation(ray_session):
    ds = rd.from_pandas(pd.DataFrame({"k": [1], "o": [1]}))
    with pytest.raises(ValueError, match="unknown window kind"):
        window_columns(ds, "k", ["o"], {"x": ("median", "o")})
    with pytest.raises(ValueError, match="needs a source column"):
        window_columns(ds, "k", ["o"], {"x": ("lag",)})
