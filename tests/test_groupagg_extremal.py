"""Grouped first/last (arg-extremal) aggregate: DuckDB window parity
for the daily OHLC pipeline, tiebreak determinism, multi-block
invariance."""

import duckdb
import numpy as np
import pandas as pd
import ray.data as rd

from cerberus_ray.pipelines.training_queries import q_ohlc_report
from cerberus_ray.stages.groupagg import grouped_first_last

SF = "/root/testdata/sf0.001"


def test_ohlc_duckdb_parity(ray_session):
    got = q_ohlc_report(SF).to_pandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{SF}/events.parquet')")
    want = con.execute("""
        SELECT day, ANY_VALUE(open) AS open, MAX(value) AS high,
               MIN(value) AS low, ANY_VALUE(close) AS close,
               CAST(COUNT(value) AS BIGINT) AS volume
        FROM (SELECT CAST(ts AS DATE) AS day, value,
                     FIRST_VALUE(value) OVER w AS open,
                     LAST_VALUE(value) OVER (w ROWS BETWEEN UNBOUNDED
                       PRECEDING AND UNBOUNDED FOLLOWING) AS close
              FROM events
              WINDOW w AS (PARTITION BY CAST(ts AS DATE)
                           ORDER BY ts, event_id))
        GROUP BY day ORDER BY day""").df()
    got["day"] = pd.to_datetime(got["day"]).astype("datetime64[us]")
    want["day"] = pd.to_datetime(want["day"]).astype("datetime64[us]")
    pd.testing.assert_frame_equal(got, want)
    con.close()


def test_first_last_tiebreak(ray_session):
    # equal order values → the tiebreak column decides, deterministic
    df = pd.DataFrame({"g": ["a"] * 3, "t": [1, 1, 1],
                       "i": [2, 0, 1], "v": [20.0, 0.0, 10.0]})
    got = grouped_first_last(rd.from_pandas(df, override_num_blocks=3),
                             ["g"], ["t", "i"], ["v"]).iloc[0]
    assert got["first_v"] == 0.0 and got["last_v"] == 20.0


def test_multiblock_invariance(ray_session):
    rng = np.random.default_rng(9)
    df = pd.DataFrame({"g": rng.integers(0, 12, 3000),
                       "t": rng.integers(0, 10_000, 3000),
                       "i": np.arange(3000),
                       "v": rng.normal(size=3000)})
    a = grouped_first_last(rd.from_pandas(df, override_num_blocks=1),
                           ["g"], ["t", "i"], ["v", "t"])
    b = grouped_first_last(rd.from_pandas(df, override_num_blocks=8),
                           ["g"], ["t", "i"], ["v", "t"])
    pd.testing.assert_frame_equal(a, b)
    # reference: pandas idxmin/idxmax on the lexicographic order
    s = df.sort_values(["g", "t", "i"], kind="mergesort")
    ref_first = s.drop_duplicates("g", keep="first").set_index("g")["v"]
    ref_last = s.drop_duplicates("g", keep="last").set_index("g")["v"]
    g = a.set_index("g")
    pd.testing.assert_series_equal(g["first_v"],
                                   ref_first.sort_index(),
                                   check_names=False)
    pd.testing.assert_series_equal(g["last_v"], ref_last.sort_index(),
                                   check_names=False)


def test_geomean_hmean_duckdb_parity(ray_session):
    from cerberus_ray.stages.groupagg import grouped_agg

    rng = np.random.default_rng(27)
    df = pd.DataFrame({
        "g": rng.integers(0, 5, 2000),
        "x": rng.gamma(2.0, 3.0, 2000) + 0.1})  # strictly positive
    got = grouped_agg(rd.from_pandas(df, override_num_blocks=4),
                      ["g"], {"gm": ("x", "geomean"),
                              "hm": ("x", "hmean"),
                              "am": ("x", "mean")})
    con = duckdb.connect()
    con.register("d", df)
    want = con.execute(
        "SELECT g, EXP(AVG(LN(x))) AS gm, COUNT(x)/SUM(1/x) AS hm, "
        "AVG(x) AS am FROM d GROUP BY g ORDER BY g").df()
    np.testing.assert_allclose(got["gm"], want["gm"], rtol=1e-9)
    np.testing.assert_allclose(got["hm"], want["hm"], rtol=1e-9)
    # AM-GM-HM inequality sanity
    assert ((got["am"] >= got["gm"]) & (got["gm"] >= got["hm"])).all()
    con.close()


def test_geomean_null_and_zero_semantics(ray_session):
    from cerberus_ray.stages.groupagg import grouped_agg

    df = pd.DataFrame({"g": ["a", "a", "a", "b", "b"],
                       "x": [2.0, 8.0, None, 0.0, 4.0]})
    got = grouped_agg(rd.from_pandas(df, override_num_blocks=2),
                      ["g"], {"gm": ("x", "geomean"),
                              "hm": ("x", "hmean")}).set_index("g")
    # nulls ignored: geomean(2, 8) = 4
    np.testing.assert_allclose(got.loc["a", "gm"], 4.0, atol=1e-12)
    np.testing.assert_allclose(got.loc["a", "hm"],
                               2 / (1 / 2 + 1 / 8), atol=1e-12)
    # a zero drives both to 0 (limit convention, documented)
    np.testing.assert_allclose(got.loc["b", "gm"], 0.0, atol=1e-12)
    np.testing.assert_allclose(got.loc["b", "hm"], 0.0, atol=1e-12)
