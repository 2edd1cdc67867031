"""Resample/gap-fill: DuckDB generate_series + ASOF JOIN parity, hand
vectors, staleness ages, window pinning, partition invariance."""

import duckdb
import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from cerberus_ray.stages.resample import resample_ffill

SF = "/root/testdata/sf0.001"


def _frame():
    rng = np.random.default_rng(21)
    rows = []
    for k in range(12):
        n = rng.integers(3, 15)
        ts = np.sort(rng.choice(np.arange(0, 2000), size=n, replace=False))
        for t in ts:
            rows.append((f"k{k:02d}", int(t), float(rng.integers(0, 100))))
    return pd.DataFrame(rows, columns=["key", "t", "v"])


ASOF_SQL = """
WITH b AS (
  SELECT key, CAST(ceil(MIN(t) / {f}.0) * {f} AS BIGINT) AS lo,
         MAX(t) AS hi
  FROM df GROUP BY key
),
g AS (SELECT CAST(unnest(generate_series(0, 4000, {f})) AS BIGINT) AS ts),
grid AS (
  SELECT b.key, g.ts FROM b JOIN g ON g.ts BETWEEN b.lo AND b.hi
)
SELECT grid.key AS key, grid.ts AS ts, df.v AS v,
       grid.ts - df.t AS age
FROM grid ASOF LEFT JOIN df
  ON grid.key = df.key AND grid.ts >= df.t
ORDER BY grid.key, grid.ts
"""


def _norm(df):
    return df.sort_values(["key", "ts"]).reset_index(drop=True)


def test_duckdb_asof_parity(ray_session):
    df = _frame()
    ds = rd.from_pandas(df, override_num_blocks=4)
    got = _norm(resample_ffill(ds, "key", "t", ["v"], freq=60,
                               n_buckets=5).to_pandas())
    want = duckdb.sql(ASOF_SQL.format(f=60)).fetchdf()
    want = _norm(want).astype({"ts": "int64", "age": "int64"})
    pd.testing.assert_frame_equal(
        got[["key", "ts", "v", "age"]], want[["key", "ts", "v", "age"]])


def test_hand_vector_and_age(ray_session):
    df = pd.DataFrame({"key": ["a"] * 3, "t": [5, 10, 27],
                       "v": [1.0, 2.0, 3.0]})
    got = (resample_ffill(rd.from_pandas(df), "key", "t", ["v"], freq=10)
           .to_pandas().sort_values("ts").reset_index(drop=True))
    # ticks 10, 20 (27 not a tick; first tick ceil(5/10)*10=10)
    assert got["ts"].tolist() == [10, 20]
    assert got["v"].tolist() == [2.0, 2.0]
    assert got["age"].tolist() == [0, 10]


def test_pinned_window_extends_last_obs(ray_session):
    df = pd.DataFrame({"key": ["a", "a", "b"], "t": [0, 10, 35],
                       "v": [1.0, 2.0, 9.0]})
    got = (resample_ffill(rd.from_pandas(df), "key", "t", ["v"], freq=10,
                          end=50).to_pandas())
    a = got[got["key"] == "a"].sort_values("ts")
    assert a["ts"].tolist() == [0, 10, 20, 30, 40, 50]
    assert a["v"].tolist() == [1.0, 2.0, 2.0, 2.0, 2.0, 2.0]
    b = got[got["key"] == "b"].sort_values("ts")
    # b's first obs at 35 → first tick 40; ticks before it not emitted
    assert b["ts"].tolist() == [40, 50]
    assert b["age"].tolist() == [5, 15]


def test_partition_invariance(ray_session):
    df = _frame()
    outs = []
    for blocks, buckets in ((2, 3), (7, 11)):
        ds = rd.from_pandas(df, override_num_blocks=blocks)
        outs.append(_norm(resample_ffill(
            ds, "key", "t", ["v"], freq=45,
            n_buckets=buckets).to_pandas()))
    pd.testing.assert_frame_equal(outs[0], outs[1])


def test_bad_freq(ray_session):
    with pytest.raises(ValueError, match="freq"):
        resample_ffill(rd.from_pandas(pd.DataFrame({
            "key": ["a"], "t": [1], "v": [1.0]})), "key", "t", ["v"],
            freq=0)


def test_hopping_window_duckdb_parity(ray_session):
    import duckdb
    import numpy as np

    from cerberus_ray.stages.resample import hopping_window_agg

    sf = "/root/testdata/sf0.001"
    win, hop = 3600, 900
    k = win // hop
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{sf}/events.parquet')")
    want = con.execute(f"""
        WITH e AS (SELECT epoch_us(ts) // 1000000 AS sec, value
                   FROM events),
        x AS (SELECT unnest(list_transform(range(0, {k}),
                     i -> (sec // {hop}) * {hop} - i * {hop}))
                     AS win_start, value FROM e)
        SELECT win_start, CAST(COUNT(*) AS BIGINT) n, SUM(value) total
        FROM x GROUP BY 1 ORDER BY 1""").fetchdf()
    import ray.data as rd
    ev = rd.read_parquet(f"{sf}/events.parquet", columns=["ts", "value"])
    got = hopping_window_agg(ev, "ts", "value", window_s=win, hop_s=hop)
    assert got["win_start"].tolist() == want["win_start"].tolist()
    assert got["n"].tolist() == want["n"].tolist()
    np.testing.assert_allclose(got["total"].to_numpy(),
                               want["total"].to_numpy(), rtol=1e-9)
    # every event appears in exactly k windows
    n_events = con.execute("SELECT COUNT(*) FROM events").fetchone()[0]
    assert got["n"].sum() == n_events * k


def test_hopping_window_hand_vector(ray_session):
    import pandas as pd
    import ray.data as rd

    from cerberus_ray.stages.resample import hopping_window_agg

    # window 20, hop 10: event at t=25 covers starts {20, 10}
    df = pd.DataFrame({"t": [25, 5], "v": [1.0, 2.0]})
    got = hopping_window_agg(rd.from_pandas(df), "t", "v",
                             window_s=20, hop_s=10)
    assert got.values.tolist() == [
        [-10, 1, 2.0], [0, 1, 2.0], [10, 1, 1.0], [20, 1, 1.0]]
    import pytest

    with pytest.raises(ValueError):
        hopping_window_agg(rd.from_pandas(df), "t", "v",
                           window_s=25, hop_s=10)


def test_interpolate_hand_vectors(ray_session):
    import ray.data as rd

    from cerberus_ray.stages.resample import resample_interpolate

    # key a: observations at t=0 (v=0) and t=10 (v=100) → ticks every
    # 2s interpolate linearly; exact at observation ticks
    df = pd.DataFrame({"k": ["a", "a"], "t": [0, 10],
                       "v": [0.0, 100.0]})
    got = (resample_interpolate(rd.from_pandas(df), "k", "t", "v",
                                freq=2).to_pandas())
    assert list(got["ts"]) == [0, 2, 4, 6, 8, 10]
    np.testing.assert_allclose(got["v"],
                               [0, 20, 40, 60, 80, 100], atol=1e-9)


def test_interpolate_duckdb_parity(ray_session):
    import duckdb
    import ray.data as rd

    from cerberus_ray.stages.resample import resample_interpolate

    rng = np.random.default_rng(31)
    rows = []
    for k in range(4):
        ts = np.sort(rng.choice(np.arange(0, 1000), 15, replace=False))
        for t in ts:
            rows.append((k, int(t), float(rng.normal())))
    df = pd.DataFrame(rows, columns=["k", "t", "v"])
    got = (resample_interpolate(
        rd.from_pandas(df, override_num_blocks=3), "k", "t", "v",
        freq=50).to_pandas()
        .sort_values(["k", "ts"], ignore_index=True))
    con = duckdb.connect()
    con.register("d", df)
    want = con.execute("""
        WITH bounds AS (SELECT k, CAST(CEIL(MIN(t) / 50.0) * 50 AS
                               BIGINT) AS lo, MAX(t) AS hi FROM d
                        GROUP BY k),
        grid AS (SELECT k, unnest(range(lo, hi + 1, 50)) AS ts
                 FROM bounds),
        prev AS (SELECT g.k, g.ts, MAX_BY(d.v, d.t) AS v0,
                        MAX(d.t) AS t0
                 FROM grid g JOIN d ON d.k = g.k AND d.t <= g.ts
                 GROUP BY g.k, g.ts),
        nxt AS (SELECT g.k, g.ts, MIN_BY(d.v, d.t) AS v1,
                       MIN(d.t) AS t1
                FROM grid g JOIN d ON d.k = g.k AND d.t >= g.ts
                GROUP BY g.k, g.ts)
        SELECT p.k, p.ts,
               CASE WHEN n.t1 = p.t0 THEN p.v0
                    ELSE p.v0 + (p.ts - p.t0) * (n.v1 - p.v0)
                         / (n.t1 - p.t0) END AS v
        FROM prev p JOIN nxt n ON p.k = n.k AND p.ts = n.ts
        ORDER BY p.k, p.ts""").df()
    assert len(got) == len(want)
    np.testing.assert_array_equal(got["k"], want["k"])
    np.testing.assert_array_equal(got["ts"], want["ts"])
    np.testing.assert_allclose(got["v"], want["v"], atol=1e-6)
    con.close()


def test_interpolate_layout_invariance(ray_session):
    import ray.data as rd

    from cerberus_ray.stages.resample import resample_interpolate

    rng = np.random.default_rng(37)
    df = pd.DataFrame({
        "k": rng.integers(0, 10, 500),
        "t": rng.integers(0, 5000, 500),
        "v": rng.normal(size=500)}).drop_duplicates(["k", "t"])
    a = (resample_interpolate(rd.from_pandas(df, override_num_blocks=1),
                              "k", "t", "v", freq=100).to_pandas()
         .sort_values(["k", "ts"], ignore_index=True))
    b = (resample_interpolate(rd.from_pandas(df, override_num_blocks=7),
                              "k", "t", "v", freq=100, n_buckets=5)
         .to_pandas().sort_values(["k", "ts"], ignore_index=True))
    pd.testing.assert_frame_equal(a, b)
