"""Drift detection: same-distribution epochs must NOT drift; shifted value
distributions and new categories MUST (FIXTURES.md §4)."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from cerberus_ray.stages.drift import (
    TableProfile,
    drift_violations,
    ks_distance,
    new_categories,
    profile_dataset,
    psi_categorical,
    psi_numeric,
)


def epoch(shift=0.0, new_type=False, n=20_000, seed=1):
    rng = np.random.default_rng(seed)
    types = ["click", "view", "purchase"] + (["refund"] if new_type else [])
    p = [0.5, 0.3, 0.2] if not new_type else [0.45, 0.27, 0.18, 0.10]
    return pd.DataFrame({
        "value": rng.normal(100 + shift, 15, size=n),
        "event_type": rng.choice(types, p=p, size=n),
    })


@pytest.fixture(scope="module")
def base_profile(ray_session):
    return profile_dataset(rd.from_pandas(epoch(seed=1)),
                           numeric=["value"], categorical=["event_type"])


def test_no_drift_same_distribution(ray_session, base_profile):
    cur = profile_dataset(rd.from_pandas(epoch(seed=2)),
                          numeric=["value"], categorical=["event_type"])
    v = drift_violations(base_profile, cur)
    assert v.num_rows == 0


def test_shifted_numeric_drifts(ray_session, base_profile):
    cur = profile_dataset(rd.from_pandas(epoch(shift=20, seed=3)),
                          numeric=["value"], categorical=["event_type"])
    v = drift_violations(base_profile, cur).to_pandas()
    assert "drift-ks" in set(v["rule"])
    assert (v[v["rule"] == "drift-ks"]["path"] == "value").all()


def test_new_category_detected(ray_session, base_profile):
    cur = profile_dataset(rd.from_pandas(epoch(new_type=True, seed=4)),
                          numeric=["value"], categorical=["event_type"])
    v = drift_violations(base_profile, cur).to_pandas()
    rules = set(v["rule"])
    assert "drift-new-category" in rules
    det = v[v["rule"] == "drift-new-category"]["detail"].iloc[0]
    assert "refund" in det


def test_profile_roundtrip_json(ray_session, base_profile):
    s = base_profile.to_json()
    back = TableProfile.from_json(s)
    assert set(back.columns) == {"value", "event_type"}
    assert back.columns["value"].count == base_profile.columns["value"].count
    assert abs(back.columns["value"].mean - base_profile.columns["value"].mean) < 1e-9
    assert back.columns["event_type"].counts == base_profile.columns["event_type"].counts


def test_ks_and_psi_magnitudes(ray_session):
    a = profile_dataset(rd.from_pandas(epoch(seed=5)), numeric=["value"])
    b = profile_dataset(rd.from_pandas(epoch(seed=6)), numeric=["value"])
    c = profile_dataset(rd.from_pandas(epoch(shift=30, seed=7)), numeric=["value"])
    same = ks_distance(a.columns["value"], b.columns["value"])
    diff = ks_distance(a.columns["value"], c.columns["value"])
    assert same < 0.03 and diff > 0.5
    assert psi_numeric(a.columns["value"], b.columns["value"]) < 0.02
    assert psi_numeric(a.columns["value"], c.columns["value"]) > 1.0


def test_events_table_profiles(ray_session):
    """Driver events table: epoch split by time; drift check runs clean."""
    ds = rd.read_parquet("/root/testdata/sf0.001/events.parquet",
                         columns=["ts", "value", "event_type"])
    pdf = ds.to_pandas().sort_values("ts")
    half = len(pdf) // 2
    a = profile_dataset(rd.from_pandas(pdf.iloc[:half]), numeric=["value"],
                        categorical=["event_type"])
    b = profile_dataset(rd.from_pandas(pdf.iloc[half:]), numeric=["value"],
                        categorical=["event_type"])
    v = drift_violations(a, b).to_pandas()
    # same generator both halves → no numeric drift; no new categories
    assert "drift-new-category" not in set(v["rule"])


# --- event-rate anomalies (hourly z-scan with gap fill) ---------------

def _rate_frame(spike_h=None, gap_h=None):
    """48 hours: 'click' steady at 60/h with an optional spike hour
    (300 events) or silent hour (entirely absent); 'view' steady 30/h."""
    base = pd.Timestamp("2024-01-01")
    rows = []
    for h in range(48):
        t0 = base + pd.Timedelta(hours=h)
        n_click = 300 if h == spike_h else (0 if h == gap_h else 60)
        for i in range(n_click):
            rows.append(("click", t0 + pd.Timedelta(seconds=i * 10)))
        for i in range(30):
            rows.append(("view", t0 + pd.Timedelta(seconds=i * 100)))
    return pd.DataFrame(rows, columns=["event_type", "ts"])


def test_event_rate_spike_flagged(ray_session):
    from cerberus_ray.stages.drift import event_rate_anomalies

    out = event_rate_anomalies(
        rd.from_pandas(_rate_frame(spike_h=20),
                       override_num_blocks=8)).to_pandas()
    spike = out[out["n_events"] == 300]
    assert len(spike) == 1 and spike["z"].iloc[0] > 3
    assert pd.to_datetime(spike["bucket_ts"]).iloc[0].hour == 20
    # steady 'view' series never flags
    assert (out["event_type"] == "view").sum() == 0
    # sorted by (type, bucket)
    assert list(out["event_type"]) == sorted(out["event_type"])


def test_event_rate_gap_zero_filled_and_flagged(ray_session):
    from cerberus_ray.stages.drift import event_rate_anomalies

    out = event_rate_anomalies(
        rd.from_pandas(_rate_frame(gap_h=30),
                       override_num_blocks=8)).to_pandas()
    gap = out[out["n_events"] == 0]
    # the absent hour was reconstructed by gap fill and flagged negative
    assert len(gap) == 1 and gap["z"].iloc[0] < -3
    assert gap["event_type"].iloc[0] == "click"


def test_event_rate_constant_series_empty(ray_session):
    from cerberus_ray.stages.drift import event_rate_anomalies

    base = pd.Timestamp("2024-01-01")
    df = pd.DataFrame({
        "event_type": ["click"] * 240,
        "ts": [base + pd.Timedelta(hours=h, minutes=m * 6)
               for h in range(24) for m in range(10)]})
    out = event_rate_anomalies(rd.from_pandas(df))
    assert out.num_rows == 0


def test_event_rate_robust_catches_masked_gap(ray_session):
    """A 300-event spike inflates the std enough that the mean/std scan
    misses a concurrent outage hour; median/MAD flags both."""
    from cerberus_ray.stages.drift import event_rate_anomalies

    frame = _rate_frame(spike_h=20, gap_h=30)
    ds = rd.from_pandas(frame, override_num_blocks=8)
    classic = event_rate_anomalies(ds).to_pandas()
    assert (classic["n_events"] == 0).sum() == 0      # gap masked
    robust = event_rate_anomalies(ds, robust=True).to_pandas()
    assert (robust["n_events"] == 300).sum() == 1     # spike still flagged
    assert (robust["n_events"] == 0).sum() == 1       # gap now flagged


def test_trailing_volume_anomalies_duckdb_parity(ray_session):
    """Engine trailing-median band == DuckDB window-median SQL on the
    real sf0.001 events table (gap-filled global calendar)."""
    import duckdb

    from cerberus_ray.sources.io import read_table
    from cerberus_ray.stages.drift import trailing_volume_anomalies

    sf = "/root/testdata/sf0.001"
    ev = read_table(f"{sf}/events.parquet",
                    columns=["event_type", "ts"])
    mine = trailing_volume_anomalies(ev).to_pandas()
    con = duckdb.connect()
    theirs = con.execute(f"""
        WITH c AS (
          SELECT event_type AS t, date_trunc('day', ts) AS d,
                 CAST(COUNT(*) AS BIGINT) AS n
          FROM read_parquet('{sf}/events.parquet') GROUP BY 1, 2),
        cal AS (
          SELECT UNNEST(generate_series(
              (SELECT MIN(d) FROM c), (SELECT MAX(d) FROM c),
              INTERVAL 1 DAY)) AS d),
        f AS (
          SELECT ty.t, cal.d, COALESCE(c.n, 0) AS n
          FROM (SELECT DISTINCT t FROM c) ty CROSS JOIN cal
          LEFT JOIN c ON c.t = ty.t AND c.d = cal.d),
        w AS (
          SELECT t, d, n,
                 MEDIAN(n) OVER (PARTITION BY t ORDER BY d
                     ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING) AS med,
                 COUNT(n) OVER (PARTITION BY t ORDER BY d
                     ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING) AS nh
          FROM f)
        SELECT t AS event_type, CAST(d AS TIMESTAMP) AS day,
               n AS n_events, med AS trailing_median,
               CASE WHEN n < 0.5 * med THEN 'low'
                    ELSE 'high' END AS status
        FROM w
        WHERE nh >= 3 AND (n < 0.5 * med OR n > 2.0 * med)
        ORDER BY event_type, day""").df()
    pd.testing.assert_frame_equal(mine, theirs, check_dtype=False)


def test_trailing_volume_planted_outage(ray_session):
    """A planted zero-volume day inside a steady stream is flagged low;
    a 10x spike is flagged high; warm-up days never flag."""
    import ray.data as rd

    from cerberus_ray.stages.drift import trailing_volume_anomalies

    rows = []
    for day in range(20):
        if day == 12:
            continue  # outage: no rows at all that day
        n = 1000 if day != 16 else 100  # day 16: 10x spike... inverse
        for i in range(n if day != 16 else 10000):
            rows.append({"event_type": "steady",
                         "ts": pd.Timestamp("2024-01-01")
                         + pd.Timedelta(days=day, seconds=i % 863)})
    df = pd.DataFrame(rows)
    ds = rd.from_pandas(df, override_num_blocks=6).materialize()
    out = trailing_volume_anomalies(ds).to_pandas()
    flagged = {(r.day.day, r.status) for r in out.itertuples()}
    assert (13, "low") in flagged      # Jan 13 == planted outage day 12
    assert (17, "high") in flagged     # Jan 17 == planted spike day 16
    # warm-up: first min_history days never flagged
    assert out["day"].min() >= pd.Timestamp("2024-01-04")


def test_trailing_volume_layout_invariance(ray_session):
    import ray.data as rd

    from cerberus_ray.stages.drift import trailing_volume_anomalies

    rng = np.random.default_rng(3)
    df = pd.DataFrame({
        "event_type": rng.choice(["a", "b"], 5000),
        "ts": pd.Timestamp("2024-03-01")
        + pd.to_timedelta(rng.integers(0, 40 * 86400, 5000), unit="s")})
    a = trailing_volume_anomalies(
        rd.from_pandas(df, override_num_blocks=1).materialize()
    ).to_pandas()
    b = trailing_volume_anomalies(
        rd.from_pandas(df.sample(frac=1.0, random_state=1),
                       override_num_blocks=9).materialize()).to_pandas()
    pd.testing.assert_frame_equal(a, b)


def test_trailing_volume_seasonal_phase_baseline(ray_session):
    """A weekly-troughed stream false-flags its troughs under the flat
    baseline but is clean under season=7; a planted missing TROUGH day
    still flags (judged against trough history). DuckDB phase-window
    parity."""
    import duckdb
    import ray.data as rd

    from cerberus_ray.stages.drift import trailing_volume_anomalies

    rows = []
    for day in range(63):
        trough = day % 7 == 6
        n = 100 if trough else 1000
        if day == 41:          # a trough day (41 % 7 == 6): outage
            n = 0
        for i in range(n):
            rows.append({"event_type": "wk",
                         "ts": pd.Timestamp("2024-01-01")
                         + pd.Timedelta(days=day, seconds=i)})
    df = pd.DataFrame(rows)
    ds = rd.from_pandas(df, override_num_blocks=5).materialize()
    flat = trailing_volume_anomalies(ds).to_pandas()
    seasonal = trailing_volume_anomalies(ds, season=7).to_pandas()
    # flat baseline mistakes every trough for an outage
    assert len(flat) > 5
    # seasonal baseline flags exactly the planted outage
    assert len(seasonal) == 1
    assert seasonal["day"].iloc[0] == pd.Timestamp("2024-01-01") \
        + pd.Timedelta(days=41)
    assert seasonal["status"].iloc[0] == "low"
    # DuckDB parity for the seasonal variant
    import pyarrow as pa

    con = duckdb.connect()
    con.register("ev", pa.Table.from_pandas(df))
    theirs = con.execute("""
        WITH c AS (
          SELECT event_type AS t, date_trunc('day', ts) AS d,
                 CAST(COUNT(*) AS BIGINT) AS n
          FROM ev GROUP BY 1, 2),
        cal AS (
          SELECT UNNEST(generate_series(
              (SELECT MIN(d) FROM c), (SELECT MAX(d) FROM c),
              INTERVAL 1 DAY)) AS d),
        f AS (
          SELECT ty.t, cal.d, COALESCE(c.n, 0) AS n,
                 CAST(date_diff('day',
                      (SELECT MIN(d) FROM c), cal.d) % 7 AS BIGINT)
                     AS ph
          FROM (SELECT DISTINCT t FROM c) ty CROSS JOIN cal
          LEFT JOIN c ON c.t = ty.t AND c.d = cal.d),
        w AS (
          SELECT t, d, n,
                 MEDIAN(n) OVER (PARTITION BY t, ph ORDER BY d
                     ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING) AS med,
                 COUNT(n) OVER (PARTITION BY t, ph ORDER BY d
                     ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING) AS nh
          FROM f)
        SELECT t AS event_type, CAST(d AS TIMESTAMP) AS day,
               n AS n_events, med AS trailing_median,
               CASE WHEN n < 0.5 * med THEN 'low'
                    ELSE 'high' END AS status
        FROM w
        WHERE nh >= 3 AND (n < 0.5 * med OR n > 2.0 * med)
        ORDER BY event_type, day""").df()
    pd.testing.assert_frame_equal(seasonal, theirs, check_dtype=False)


def test_wasserstein_shift_identity_and_exact_parity(ray_session):
    from cerberus_ray.stages.drift import wasserstein_distance

    base = profile_dataset(rd.from_pandas(epoch(seed=7)),
                           numeric=["value"])
    shifted = profile_dataset(rd.from_pandas(epoch(shift=20, seed=7)),
                              numeric=["value"])
    w = wasserstein_distance(base.columns["value"],
                             shifted.columns["value"])
    # identical samples shifted by +20 → W1 = 20 exactly
    assert abs(w - 20.0) < 0.5, w
    # exact sample W1 parity on different draws (t-digest tolerance)
    a, b = epoch(seed=1)["value"], epoch(seed=2)["value"]
    pa_, pb_ = (profile_dataset(rd.from_pandas(pd.DataFrame({"value": s})),
                                numeric=["value"])
                for s in (a, b))
    exact = np.mean(np.abs(np.sort(a.to_numpy())
                           - np.sort(b.to_numpy())))
    got = wasserstein_distance(pa_.columns["value"],
                               pb_.columns["value"])
    assert abs(got - exact) < max(0.1, 0.1 * exact), (got, exact)
    # self-distance ~ 0
    self_w = wasserstein_distance(base.columns["value"],
                                  base.columns["value"])
    assert self_w < 1e-9


def test_drift_psi_null_and_empty_inputs_match_oracle(ray_session, tmp_path):
    """events_drift_psi on legal-but-degenerate input (null ts/value/
    event_type rows; fully empty table) must agree with its DuckDB
    oracle instead of crashing — NULL ts rows fall into half 0 on both
    sides, and the empty table still yields the 10 zero value bins."""
    import duckdb
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from cerberus_ray.pipelines.training_queries import (
        ORACLE_SQL,
        q_events_drift_psi,
    )

    t = pa.table({
        "event_id": pa.array([1, 2, 3, 4], pa.int64()),
        "user_id": pa.array([1, 1, 2, 2], pa.int64()),
        "event_type": pa.array(["click", None, "view", "click"]),
        "ts": pa.array([pd.Timestamp("2024-01-01"), None,
                        pd.Timestamp("2024-01-03"),
                        pd.Timestamp("2024-01-04")], pa.timestamp("us")),
        "value": pa.array([1.0, None, 3.0, None], pa.float64()),
        "props": pa.array(["{}"] * 4),
    })
    for name, tab, want_rows in [("nulls", t, 12), ("empty", t.slice(0, 0), 10)]:
        d = tmp_path / name
        d.mkdir()
        pq.write_table(tab, str(d / "events.parquet"))
        mine = q_events_drift_psi(str(d)).to_pandas()
        con = duckdb.connect()
        con.execute(f"create view events as select * from "
                    f"read_parquet('{d}/events.parquet')")
        oracle = con.execute(ORACLE_SQL["events_drift_psi"]).fetchdf()
        assert len(mine) == len(oracle) == want_rows, name
        for c in mine.columns:
            assert (mine[c].astype(str).tolist()
                    == oracle[c].astype(str).tolist()), (name, c)
