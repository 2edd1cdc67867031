"""SCD Type-2 interval build: DuckDB LAG/LEAD parity (synthetic +
real events table), partition invariance, as-of slice."""

import duckdb
import numpy as np
import pandas as pd
import ray.data as rd

from cerberus_ray.stages.scd import scd2_as_of, scd2_build

SF = "/root/testdata/sf0.001"

SQL = """
WITH ordered AS (
  SELECT {k} AS k, {a} AS a, {t} AS t,
         LAG({a}) OVER (PARTITION BY {k} ORDER BY {t}, {tb}) AS prev,
         ROW_NUMBER() OVER (PARTITION BY {k} ORDER BY {t}, {tb}) AS rn
  FROM {src}),
changes AS (
  SELECT k, a, t AS valid_from, rn FROM ordered
  WHERE prev IS NULL OR a <> prev),
v AS (
  SELECT k, a, valid_from,
         LEAD(valid_from) OVER (PARTITION BY k ORDER BY rn) AS valid_to,
         ROW_NUMBER() OVER (PARTITION BY k ORDER BY rn) AS version
  FROM changes)
SELECT k, a, valid_from, valid_to, CAST(version AS BIGINT) AS version,
       valid_to IS NULL AS is_current
FROM v ORDER BY k, version
"""


def _canon(df, k, a):
    return {(str(r[k]), str(r[a]), str(r["valid_from"]),
             "NULL" if pd.isna(r["valid_to"]) else str(r["valid_to"]),
             int(r["version"]), bool(r["is_current"]))
            for _, r in df.iterrows()}


def _frame():
    rng = np.random.default_rng(11)
    n = 600
    return pd.DataFrame({
        "k": rng.integers(0, 40, n),
        "a": rng.choice(["red", "green", "blue"], n),
        "t": rng.integers(0, 10_000, n),
        "tb": np.arange(n, dtype=np.int64),   # deterministic tie order
    })


def test_duckdb_parity_synthetic(ray_session):
    df = _frame()
    got = scd2_build(rd.from_pandas(df, override_num_blocks=5),
                     "k", "a", "t", tiebreak_col="tb").to_pandas()
    want = duckdb.sql(SQL.format(k="k", a="a", t="t", tb="tb",
                                 src="df")).fetchdf()
    got = got.rename(columns={"k": "k", "a": "a"})
    assert _canon(got, "k", "a") == _canon(want, "k", "a")
    assert len(got) == len(want)


def test_duckdb_parity_events(ray_session):
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{SF}/events.parquet')")
    want = con.execute(SQL.format(k="user_id", a="event_type", t="ts",
                                  tb="event_id", src="events")).fetchdf()
    ev = rd.read_parquet(f"{SF}/events.parquet",
                         columns=["event_id", "user_id", "event_type",
                                  "ts"])
    got = scd2_build(ev, "user_id", "event_type", "ts",
                     tiebreak_col="event_id").to_pandas()
    got = got.rename(columns={"user_id": "k", "event_type": "a"})
    assert _canon(got, "k", "a") == _canon(want, "k", "a")


def test_partition_invariance(ray_session):
    df = _frame()
    outs = []
    for b in (1, 9):
        o = scd2_build(rd.from_pandas(df, override_num_blocks=b),
                       "k", "a", "t", tiebreak_col="tb").to_pandas()
        outs.append(o.sort_values(["k", "version"])
                    .reset_index(drop=True))
    pd.testing.assert_frame_equal(outs[0], outs[1])


def test_run_collapse_and_versions(ray_session):
    # one key: A A B A → three intervals, re-appearing A gets version 3
    df = pd.DataFrame({"k": [1, 1, 1, 1], "a": ["A", "A", "B", "A"],
                       "t": [10, 20, 30, 40], "tb": [0, 1, 2, 3]})
    out = (scd2_build(rd.from_pandas(df), "k", "a", "t",
                      tiebreak_col="tb").to_pandas()
           .sort_values("version").reset_index(drop=True))
    assert out["a"].tolist() == ["A", "B", "A"]
    assert out["valid_from"].tolist() == [10, 30, 40]
    assert out["valid_to"].tolist()[:2] == [30, 40]
    assert pd.isna(out["valid_to"].iloc[2])
    assert out["version"].tolist() == [1, 2, 3]
    assert out["is_current"].tolist() == [False, False, True]


def test_as_of_slice(ray_session):
    df = pd.DataFrame({"k": [1, 1, 2], "a": ["A", "B", "X"],
                       "t": [10, 30, 50], "tb": [0, 1, 2]})
    scd = scd2_build(rd.from_pandas(df), "k", "a", "t",
                     tiebreak_col="tb").materialize()
    at20 = scd2_as_of(scd, 20).to_pandas()
    assert set(zip(at20["k"], at20["a"])) == {(1, "A")}
    at60 = scd2_as_of(scd, 60).to_pandas()
    assert set(zip(at60["k"], at60["a"])) == {(1, "B"), (2, "X")}
    # boundary: interval is half-open [from, to)
    at30 = scd2_as_of(scd, 30).to_pandas()
    assert set(zip(at30["k"], at30["a"])) == {(1, "B")}
