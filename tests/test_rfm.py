"""RFM segmentation: DuckDB quantile_disc parity (the KLL thresholds
are exact below sketch capacity), score-convention vectors, multi-block
invariance."""

import duckdb
import numpy as np
import pandas as pd
import ray.data as rd

from cerberus_ray.pipelines.rfm import rfm_segments
from cerberus_ray.sources.io import read_table

SF = "/root/testdata/sf0.001"


def _duck_census(n_bins: int = 4) -> pd.DataFrame:
    qs = [i / n_bins for i in range(1, n_bins)]
    qlist = "[" + ", ".join(str(q) for q in qs) + "]"

    def bucket(v, t):
        return ("(1 + " + " + ".join(
            f"CASE WHEN {v} > {t}[{i + 1}] THEN 1 ELSE 0 END"
            for i in range(len(qs))) + ")")

    con = duckdb.connect()
    con.execute(f"CREATE VIEW orders AS SELECT * FROM "
                f"read_parquet('{SF}/orders.parquet')")
    df = con.execute(f"""
        WITH agg AS (SELECT o_custkey AS k, MAX(o_orderdate) AS last,
                            CAST(COUNT(*) AS DOUBLE) AS f,
                            SUM(o_totalprice) AS m
                     FROM orders GROUP BY 1),
        r AS (SELECT k,
                     CAST(date_diff('day', last,
                          (SELECT MAX(last) FROM agg)) AS DOUBLE)
                       AS rec, f, m FROM agg),
        t AS (SELECT quantile_disc(rec, {qlist}) AS tr,
                     quantile_disc(f, {qlist}) AS tf,
                     quantile_disc(m, {qlist}) AS tm FROM r)
        SELECT {n_bins} + 1 - {bucket('rec', 'tr')} AS r_score,
               {bucket('f', 'tf')} AS f_score,
               {bucket('m', 'tm')} AS m_score,
               CAST(COUNT(*) AS BIGINT) AS n_customers,
               ROUND(SUM(m), 6) AS total_monetary
        FROM r, t GROUP BY 1, 2, 3
        ORDER BY 1 DESC, 2 DESC, 3 DESC""").df()
    con.close()
    return df


def test_duckdb_parity_on_orders(ray_session):
    orders = read_table(f"{SF}/orders.parquet",
                        columns=["o_custkey", "o_orderdate",
                                 "o_totalprice"])
    got = rfm_segments(orders, "o_custkey", "o_orderdate",
                       "o_totalprice", n_bins=4)
    want = _duck_census(4)
    pd.testing.assert_frame_equal(
        got[["r_score", "f_score", "m_score", "n_customers"]],
        want[["r_score", "f_score", "m_score", "n_customers"]],
        check_dtype=False)
    np.testing.assert_allclose(got["total_monetary"],
                               want["total_monetary"], rtol=1e-9)
    # census covers every customer exactly once
    assert got["n_customers"].sum() == orders.to_pandas(
        )["o_custkey"].nunique()


def test_score_convention(ray_session):
    # 8 customers, one order each, monetary 1..8, recency 0..7 days
    base = pd.Timestamp("2024-01-08")
    df = pd.DataFrame({
        "k": range(8),
        "ts": [base - pd.Timedelta(days=d) for d in range(8)],
        "amt": [float(i + 1) for i in range(8)]})
    got = rfm_segments(rd.from_pandas(df, override_num_blocks=3),
                       "k", "ts", "amt", n_bins=4)
    # monetary quartiles t=[2,4,6]; recency quartiles t=[1,3,5] (the
    # quantile_disc elements); bucket = 1 + #(t strictly < v), so each
    # quartile bucket holds exactly 2 of the 8 customers; all
    # frequencies equal 1 → every f threshold is 1 → f_score = 1
    g = got.set_index("segment")
    assert g.loc["411", "n_customers"] == 2     # amt {1,2}, days {0,1}
    assert g.loc["114", "n_customers"] == 2     # amt {7,8}, days {6,7}
    assert set(got["f_score"]) == {1}
    assert got["n_customers"].sum() == 8
    np.testing.assert_allclose(g.loc["411", "total_monetary"], 3.0)
    np.testing.assert_allclose(g.loc["114", "total_monetary"], 15.0)


def test_multiblock_invariance(ray_session):
    rng = np.random.default_rng(13)
    n = 5000
    df = pd.DataFrame({
        "k": rng.integers(0, 800, n),
        "ts": pd.Timestamp("2024-01-01")
        + pd.to_timedelta(rng.integers(0, 365, n), unit="D"),
        "amt": rng.gamma(2, 50, n)})
    a = rfm_segments(rd.from_pandas(df, override_num_blocks=1),
                     "k", "ts", "amt")
    b = rfm_segments(rd.from_pandas(df, override_num_blocks=8),
                     "k", "ts", "amt", n_buckets=8)
    pd.testing.assert_frame_equal(a, b)
