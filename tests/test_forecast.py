"""Seasonal-naive backtest: DuckDB LAG parity, perfect-seasonality
MASE < 1, hand vector, partition invariance, guards."""

import duckdb
import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from cerberus_ray.stages.forecast import seasonal_naive_eval


def _series(seed=3):
    """Two keys: one strongly daily-seasonal, one random walk."""
    rng = np.random.default_rng(seed)
    rows = []
    base = np.tile(np.sin(np.arange(24) / 24 * 2 * np.pi) * 10, 10)
    for t, v in enumerate(base + rng.normal(0, 0.3, len(base))):
        rows.append(("seasonal", t, v))
    w = np.cumsum(rng.normal(0, 1, 240))
    for t, v in enumerate(w):
        rows.append(("walk", t, v))
    return pd.DataFrame(rows, columns=["k", "t", "v"])


def test_duckdb_lag_parity(ray_session):
    df = _series()
    season = 24
    got = (seasonal_naive_eval(
        rd.from_pandas(df, override_num_blocks=4), "k", "t", "v",
        season=season).to_pandas().sort_values("k")
        .reset_index(drop=True))
    want = duckdb.sql(f"""
        WITH l AS (
          SELECT k, v,
                 LAG(v, {season}) OVER (PARTITION BY k ORDER BY t) ls,
                 LAG(v, 1) OVER (PARTITION BY k ORDER BY t) l1
          FROM df),
        e AS (SELECT k, abs(v - ls) em, abs(v - l1) e1 FROM l
              WHERE ls IS NOT NULL AND l1 IS NOT NULL)
        SELECT k, COUNT(*) n, AVG(em) mm, AVG(e1) m1,
               AVG(em)/AVG(e1) mase
        FROM e GROUP BY k ORDER BY k""").fetchdf()
    assert got["k"].tolist() == want["k"].tolist()
    assert got["n_evals"].tolist() == want["n"].tolist()
    np.testing.assert_allclose(got["mase"].to_numpy(),
                               want["mase"].to_numpy(), atol=1e-6)
    # the seasonal series beats naive-1; the random walk does not
    r = got.set_index("k")["mase"]
    assert r["seasonal"] < 0.3
    assert r["walk"] > 1.0


def test_hand_vector(ray_session):
    # season=2 over [1,2,1,2,1]: lag2 errors all 0 → MASE 0
    df = pd.DataFrame({"k": ["a"] * 5, "t": range(5),
                       "v": [1.0, 2.0, 1.0, 2.0, 1.0]})
    got = seasonal_naive_eval(rd.from_pandas(df), "k", "t", "v",
                              season=2).to_pandas()
    assert got["n_evals"].tolist() == [3]
    assert got["mase"].tolist() == [0.0]


def test_constant_series_nan_mase(ray_session):
    df = pd.DataFrame({"k": ["c"] * 6, "t": range(6), "v": [5.0] * 6})
    got = seasonal_naive_eval(rd.from_pandas(df), "k", "t", "v",
                              season=2).to_pandas()
    assert np.isnan(got["mase"].iloc[0])     # zero naive error


def test_partition_invariance(ray_session):
    df = _series(seed=7)
    outs = [(seasonal_naive_eval(
        rd.from_pandas(df, override_num_blocks=b), "k", "t", "v",
        season=24, n_buckets=nb).to_pandas()
        .sort_values("k").reset_index(drop=True))
        for b, nb in ((1, 4), (6, 9))]
    pd.testing.assert_frame_equal(outs[0], outs[1])


def test_bad_season(ray_session):
    df = pd.DataFrame({"k": ["a"], "t": [0], "v": [1.0]})
    with pytest.raises(ValueError):
        seasonal_naive_eval(rd.from_pandas(df), "k", "t", "v", season=0)


def test_conformal_order_statistic_vector(ray_session):
    import ray.data as rd

    from cerberus_ray.stages.forecast import conformal_intervals

    # one key, season=1: residuals are |diff|; with n=9 residuals and
    # alpha=0.2, k = ceil(10*0.8) = 8 → 8th smallest residual
    vals = [0.0, 1.0, 3.0, 6.0, 10.0, 15.0, 21.0, 28.0, 36.0, 45.0]
    df = pd.DataFrame({"k": "a", "t": range(10), "v": vals})
    out = conformal_intervals(rd.from_pandas(df), "k", "t", "v",
                              season=1, alpha=0.2).to_pandas().iloc[0]
    # residuals are 1..9; 8th smallest = 8; forecast = last value 45
    assert out["n_cal"] == 9
    np.testing.assert_allclose(out["forecast"], 45.0)
    np.testing.assert_allclose(out["lo"], 45.0 - 8.0)
    np.testing.assert_allclose(out["hi"], 45.0 + 8.0)


def test_conformal_coverage(ray_session):
    import ray.data as rd

    from cerberus_ray.stages.forecast import conformal_intervals

    # 300 keys, seasonal signal + iid noise; hold out the last tick,
    # calibrate on the rest → empirical coverage ≈ 1 − α (split
    # conformal is finite-sample valid under exchangeable residuals;
    # the iid noise here satisfies that)
    rng = np.random.default_rng(29)
    rows, truth = [], {}
    for key in range(300):
        season_pat = rng.normal(size=4) * 5
        y = np.tile(season_pat, 13) + rng.normal(size=52)
        for t in range(51):
            rows.append((key, t, y[t]))
        truth[key] = y[51]
    df = pd.DataFrame(rows, columns=["k", "t", "v"])
    out = conformal_intervals(rd.from_pandas(df, override_num_blocks=6),
                              "k", "t", "v", season=4,
                              alpha=0.2).to_pandas()
    covered = [(truth[r.k] >= r.lo) and (truth[r.k] <= r.hi)
               for r in out.itertuples()]
    assert np.mean(covered) >= 0.75          # 1 − α − finite tolerance
    # intervals are not vacuous
    assert (out["hi"] - out["lo"]).median() < 20


def test_conformal_short_series_and_guards(ray_session):
    import pytest as _pytest
    import ray.data as rd

    from cerberus_ray.stages.forecast import conformal_intervals

    df = pd.DataFrame({"k": ["a", "a"], "t": [0, 1], "v": [1.0, 2.0]})
    out = conformal_intervals(rd.from_pandas(df), "k", "t", "v",
                              season=5).to_pandas()
    assert np.isnan(out["forecast"].iloc[0]) and out["n_cal"].iloc[0] == 0
    with _pytest.raises(ValueError):
        conformal_intervals(rd.from_pandas(df), "k", "t", "v",
                            season=1, alpha=1.5)


def test_holt_numpy_reference(ray_session):
    import ray.data as rd

    from cerberus_ray.stages.forecast import holt_forecast

    rng = np.random.default_rng(17)
    rows = []
    for k in range(6):
        T = rng.integers(3, 20)
        y = rng.normal(size=T).cumsum()
        for t, v in enumerate(y):
            rows.append((k, t, float(v)))
    df = pd.DataFrame(rows, columns=["k", "t", "v"])
    a, b = 0.4, 0.2
    got = (holt_forecast(rd.from_pandas(df, override_num_blocks=3),
                         "k", "t", "v", alpha=a, beta=b)
           .to_pandas().set_index("k").sort_index())
    for k, sub in df.groupby("k"):
        y = sub.sort_values("t")["v"].to_numpy()
        lvl, tr = y[0], y[1] - y[0]
        for t in range(1, len(y)):
            prev = lvl
            lvl = a * y[t] + (1 - a) * (lvl + tr)
            tr = b * (lvl - prev) + (1 - b) * tr
        np.testing.assert_allclose(got.loc[k, "level"], lvl, atol=1e-5)
        np.testing.assert_allclose(got.loc[k, "trend"], tr, atol=1e-5)
        np.testing.assert_allclose(got.loc[k, "forecast"], lvl + tr,
                                   atol=1e-5)


def test_holt_linear_series_is_exact(ray_session):
    import ray.data as rd

    from cerberus_ray.stages.forecast import holt_forecast

    # a pure linear series is tracked EXACTLY for any alpha/beta
    df = pd.DataFrame({"k": "a", "t": range(20),
                       "v": 3.0 + 2.5 * np.arange(20)})
    got = holt_forecast(rd.from_pandas(df), "k", "t", "v",
                        alpha=0.7, beta=0.4).to_pandas().iloc[0]
    np.testing.assert_allclose(got["trend"], 2.5, atol=1e-9)
    np.testing.assert_allclose(got["forecast"], 3.0 + 2.5 * 20,
                               atol=1e-9)
    # constant series → zero trend, self-forecast; single point too
    c = pd.DataFrame({"k": ["c"] * 5 + ["s"], "t": [0, 1, 2, 3, 4, 0],
                      "v": [7.0] * 5 + [9.0]})
    g2 = (holt_forecast(rd.from_pandas(c), "k", "t", "v")
          .to_pandas().set_index("k"))
    np.testing.assert_allclose(g2.loc["c", "trend"], 0.0, atol=1e-12)
    np.testing.assert_allclose(g2.loc["c", "forecast"], 7.0)
    np.testing.assert_allclose(g2.loc["s", "forecast"], 9.0)
    assert g2.loc["s", "n_obs"] == 1


def test_holt_guards_and_layout(ray_session):
    import pytest as _pytest
    import ray.data as rd

    from cerberus_ray.stages.forecast import holt_forecast

    df = pd.DataFrame({"k": [1, 1, 2], "t": [0, 1, 0],
                       "v": [1.0, 2.0, 3.0]})
    with _pytest.raises(ValueError):
        holt_forecast(rd.from_pandas(df), "k", "t", "v", alpha=0.0)
    a = holt_forecast(rd.from_pandas(df, override_num_blocks=1),
                      "k", "t", "v").to_pandas()
    b = holt_forecast(rd.from_pandas(df, override_num_blocks=3),
                      "k", "t", "v", n_buckets=2).to_pandas()
    pd.testing.assert_frame_equal(a.sort_values("k", ignore_index=True),
                                  b.sort_values("k", ignore_index=True))


def test_lag_corr_duckdb_parity(ray_session):
    from cerberus_ray.sources.io import read_table
    from cerberus_ray.stages.forecast import lag_corr_by_key

    SF = "/root/testdata/sf0.001"
    ev = read_table(f"{SF}/events.parquet",
                    columns=["event_type", "ts", "event_id", "value"])
    got = (lag_corr_by_key(ev, "event_type", ["ts", "event_id"], "value",
                           lags=(1, 2, 3))
           .to_pandas().sort_values(["event_type", "lag"],
                                    ignore_index=True))
    con = duckdb.connect()
    want = con.execute(f"""
        WITH s AS (SELECT event_type, value,
               LAG(value, 1) OVER w l1, LAG(value, 2) OVER w l2,
               LAG(value, 3) OVER w l3
            FROM read_parquet('{SF}/events.parquet')
            WINDOW w AS (PARTITION BY event_type
                         ORDER BY ts, event_id))
        SELECT event_type, lag, n, lag_corr FROM (
          SELECT event_type, 1 AS lag,
                 CAST(COUNT(l1) AS BIGINT) n, corr(value, l1) lag_corr
          FROM s GROUP BY 1
          UNION ALL
          SELECT event_type, 2, CAST(COUNT(l2) AS BIGINT),
                 corr(value, l2) FROM s GROUP BY 1
          UNION ALL
          SELECT event_type, 3, CAST(COUNT(l3) AS BIGINT),
                 corr(value, l3) FROM s GROUP BY 1)
        ORDER BY event_type, lag""").df()
    assert list(got["event_type"]) == list(want["event_type"])
    np.testing.assert_array_equal(got["n"], want["n"])
    np.testing.assert_allclose(got["lag_corr"], want["lag_corr"],
                               atol=1e-7)
    con.close()


def test_lag_corr_known_values_and_guards(ray_session):
    from cerberus_ray.stages.forecast import lag_corr_by_key

    # strictly alternating series → lag-1 corr = −1, lag-2 corr = +1
    df = pd.DataFrame({"k": ["a"] * 8, "t": range(8),
                       "v": [1.0, -1.0] * 4})
    got = (lag_corr_by_key(rd.from_pandas(df), "k", ["t"], "v",
                           lags=(1, 2)).to_pandas()
           .sort_values("lag", ignore_index=True))
    np.testing.assert_allclose(got["lag_corr"], [-1.0, 1.0], atol=1e-12)
    assert list(got["n"]) == [7, 6]

    # constant series / too-short series → NaN, not error
    df2 = pd.DataFrame({"k": ["c"] * 4 + ["s"], "t": [0, 1, 2, 3, 0],
                        "v": [5.0] * 4 + [1.0]})
    g2 = (lag_corr_by_key(rd.from_pandas(df2), "k", ["t"], "v",
                          lags=(1,)).to_pandas().set_index("k"))
    assert np.isnan(g2.loc["c", "lag_corr"])
    assert np.isnan(g2.loc["s", "lag_corr"])

    with pytest.raises(ValueError):
        lag_corr_by_key(rd.from_pandas(df), "k", ["t"], "v", lags=(0,))

    # layout invariance
    a = (lag_corr_by_key(rd.from_pandas(df, override_num_blocks=1),
                         "k", ["t"], "v").to_pandas()
         .sort_values(["k", "lag"], ignore_index=True))
    b = (lag_corr_by_key(rd.from_pandas(df, override_num_blocks=4),
                         "k", ["t"], "v", n_buckets=2).to_pandas()
         .sort_values(["k", "lag"], ignore_index=True))
    pd.testing.assert_frame_equal(a, b)


def test_pacf_yule_walker_reference(ray_session):
    # independent reference: biased ACF computed with a plain loop,
    # PACF from the Yule-Walker Toeplitz solve (Levinson == YW)
    from cerberus_ray.stages.forecast import pacf_by_key

    rng = np.random.default_rng(11)
    frames = []
    for key in range(6):
        n = int(rng.integers(20, 60))
        frames.append(pd.DataFrame({
            "k": key, "t": np.arange(n),
            "v": rng.normal(size=n).cumsum()}))
    df = pd.concat(frames, ignore_index=True)
    got = (pacf_by_key(rd.from_pandas(df, override_num_blocks=4),
                       "k", ["t"], "v", max_lag=3, n_buckets=3)
           .to_pandas().sort_values(["k", "lag"]).reset_index(
               drop=True))
    for key, sub in df.groupby("k"):
        x = sub.sort_values("t")["v"].to_numpy()
        d = x - x.mean()
        ss = (d * d).sum()
        rho = [1.0] + [(d[:-k] * d[k:]).sum() / ss for k in (1, 2, 3)]
        for k in (1, 2, 3):
            R = np.array([[rho[abs(i - j)] for j in range(k)]
                          for i in range(k)])
            want = np.linalg.solve(R, np.array(rho[1:k + 1]))[-1]
            g = got[(got["k"] == key) & (got["lag"] == k)]
            np.testing.assert_allclose(g["pacf"].iloc[0], want,
                                       rtol=1e-8, atol=1e-10)


def test_pacf_ar1_cutoff(ray_session):
    # AR(1) with phi=0.6: pacf(1) ~ 0.6, pacf(2..3) ~ 0
    from cerberus_ray.stages.forecast import pacf_by_key

    rng = np.random.default_rng(5)
    frames = []
    for key in range(3):
        n = 4000
        x = np.zeros(n)
        eps = rng.normal(size=n)
        for t in range(1, n):
            x[t] = 0.6 * x[t - 1] + eps[t]
        frames.append(pd.DataFrame({"k": key, "t": np.arange(n),
                                    "v": x}))
    df = pd.concat(frames, ignore_index=True)
    got = pacf_by_key(rd.from_pandas(df, override_num_blocks=3),
                      "k", ["t"], "v", max_lag=3).to_pandas()
    l1 = got[got["lag"] == 1]["pacf"]
    np.testing.assert_allclose(l1, 0.6, atol=0.06)
    for k in (2, 3):
        lk = got[got["lag"] == k]["pacf"]
        assert (lk.abs() < 0.06).all()


def test_pacf_guards_and_degenerate(ray_session):
    from cerberus_ray.stages.forecast import pacf_by_key

    # constant series -> NaN at every lag; short series -> NaN beyond n
    df = pd.DataFrame({
        "k": ["c"] * 5 + ["s"] * 2,
        "t": [0, 1, 2, 3, 4, 0, 1],
        "v": [7.0] * 5 + [1.0, 2.0]})
    got = pacf_by_key(rd.from_pandas(df), "k", ["t"], "v",
                      max_lag=3).to_pandas()
    assert got[got["k"] == "c"]["pacf"].isna().all()
    s = got[got["k"] == "s"].set_index("lag")["pacf"]
    assert np.isnan(s[2]) and np.isnan(s[3])
    with pytest.raises(ValueError):
        pacf_by_key(rd.from_pandas(df), "k", ["t"], "v", max_lag=0)
