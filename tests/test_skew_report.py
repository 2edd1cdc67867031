"""Key-skew diagnostic: exact stats vs a numpy reference, uniform-vs-hot
behavior, mode agreement, and DuckDB count parity on the real table."""

import duckdb
import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from cerberus_ray.stages.skew import key_skew_report


def _ref_stats(keys, top_n=10):
    counts = np.sort(pd.Series(keys).value_counts().to_numpy())
    n = counts.sum()
    cum = np.cumsum(counts, dtype=float)
    gini = 1.0 - 2.0 * (cum.sum() / (cum[-1] * len(counts))) + 1.0 / len(counts)
    return {
        "n_rows": int(n), "n_keys": len(counts),
        "max_count": int(counts[-1]),
        "p50_count": float(np.percentile(counts, 50)),
        "p99_count": float(np.percentile(counts, 99)),
        f"top{top_n}_share": round(float(counts[-top_n:].sum() / n), 4),
        "gini": round(float(gini), 4)}


def test_matches_reference_and_modes_agree(ray_session):
    rng = np.random.default_rng(8)
    keys = rng.zipf(1.5, 5000) % 200          # skewed keys
    df = pd.DataFrame({"k": keys})
    ds = rd.from_pandas(df, override_num_blocks=5)
    a = key_skew_report(ds, "k", mode="driver").to_pandas()
    b = key_skew_report(ds, "k", mode="shuffle").to_pandas()
    pd.testing.assert_frame_equal(a, b)
    ref = _ref_stats(keys)
    got = a.iloc[0].to_dict()
    for k, v in ref.items():
        assert got[k] == pytest.approx(v), k
    with pytest.raises(ValueError):
        key_skew_report(ds, "k", mode="bogus")


def test_uniform_vs_hot_key(ray_session):
    uniform = pd.DataFrame({"k": np.repeat(np.arange(100), 50)})
    u = key_skew_report(rd.from_pandas(uniform), "k").to_pandas().iloc[0]
    assert u["gini"] == 0.0
    assert u["top10_share"] == pytest.approx(0.1)
    hot = pd.DataFrame({"k": ["hot"] * 9_000 + [f"c{i}" for i in range(1000)]})
    h = key_skew_report(rd.from_pandas(hot, override_num_blocks=4),
                        "k").to_pandas().iloc[0]
    assert h["gini"] > 0.8
    assert h["max_count"] == 9_000
    assert h["top10_share"] > 0.9


def test_duckdb_parity_events_user(ray_session):
    sf = "/root/testdata/sf0.001"
    ds = rd.read_parquet(f"{sf}/events.parquet", columns=["user_id"])
    mine = key_skew_report(ds, "user_id").to_pandas().iloc[0]
    con = duckdb.connect()
    orc = con.execute(f"""
        SELECT CAST(SUM(c) AS BIGINT) AS n_rows,
               CAST(COUNT(*) AS BIGINT) AS n_keys,
               CAST(MAX(c) AS BIGINT) AS max_count
        FROM (SELECT user_id, COUNT(*) c
              FROM read_parquet('{sf}/events.parquet') GROUP BY user_id)
    """).fetch_df().iloc[0]
    assert mine["n_rows"] == orc["n_rows"]
    assert mine["n_keys"] == orc["n_keys"]
    assert mine["max_count"] == orc["max_count"]
