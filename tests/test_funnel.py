"""Ordered funnel: hand-built sequences, strict-after semantics, DuckDB
parity on the real events table, bucket-count invariance."""

import duckdb
import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from cerberus_ray.pipelines.funnel import funnel_counts


def events():
    rows = [
        # u1 completes the funnel in order
        (1, "view", 10), (1, "click", 20), (1, "purchase", 30),
        # u2 clicks BEFORE viewing → reaches view only
        (2, "click", 5), (2, "view", 10),
        # u3 view+click, purchase exactly AT the click time → strict: no
        (3, "view", 1), (3, "click", 2), (3, "purchase", 2),
        # u4 completes via its SECOND click (first is pre-view)
        (4, "click", 1), (4, "view", 2), (4, "click", 3), (4, "purchase", 9),
        # u5 purchase only → no stage reached
        (5, "purchase", 1),
        # u6 view only
        (6, "view", 7),
    ]
    return pd.DataFrame(rows, columns=["user_id", "event_type", "ts"]) \
        .assign(ts=lambda d: pd.to_datetime(d["ts"], unit="s"))


def test_hand_funnel(ray_session):
    out = funnel_counts(rd.from_pandas(events(), override_num_blocks=3),
                        ["view", "click", "purchase"]).to_pandas()
    assert out["stage"].tolist() == ["view", "click", "purchase"]
    # view: u1,u2,u3,u4,u6 = 5; click-after-view: u1,u3,u4 = 3;
    # purchase-after-that: u1,u4 = 2 (u3 fails strict >)
    assert out["n_users"].tolist() == [5, 3, 2]


def test_bucket_invariance_and_validation(ray_session):
    ds = rd.from_pandas(events())
    a = funnel_counts(ds, ["view", "click"], n_buckets=2).to_pandas()
    b = funnel_counts(ds, ["view", "click"], n_buckets=17).to_pandas()
    pd.testing.assert_frame_equal(a, b)
    with pytest.raises(ValueError):
        funnel_counts(ds, [])
    with pytest.raises(ValueError):
        funnel_counts(ds, ["view", "view"])


def test_duckdb_parity_sf0001(ray_session):
    from cerberus_ray.pipelines.training_queries import q_funnel_report

    sf = "/root/testdata/sf0.001"
    mine = q_funnel_report(sf).to_pandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{sf}/events.parquet')")
    orc = con.execute("""
        WITH s0 AS (SELECT user_id, MIN(ts) t FROM events
                    WHERE event_type = 'view' GROUP BY user_id),
        s1 AS (SELECT e.user_id, MIN(e.ts) t FROM events e
               JOIN s0 USING (user_id)
               WHERE e.event_type = 'click' AND e.ts > s0.t
               GROUP BY e.user_id),
        s2 AS (SELECT e.user_id, MIN(e.ts) t FROM events e
               JOIN s1 USING (user_id)
               WHERE e.event_type = 'purchase' AND e.ts > s1.t
               GROUP BY e.user_id)
        SELECT * FROM (
          SELECT 'view' AS stage, CAST(COUNT(*) AS BIGINT) AS n_users FROM s0
          UNION ALL
          SELECT 'click', CAST(COUNT(*) AS BIGINT) FROM s1
          UNION ALL
          SELECT 'purchase', CAST(COUNT(*) AS BIGINT) FROM s2)
    """).fetch_df()
    pd.testing.assert_frame_equal(mine, orc, check_dtype=False)
    # funnel counts are non-increasing
    n = mine["n_users"].tolist()
    assert all(a >= b for a, b in zip(n, n[1:]))


# ---- retention cohorts ----------------------------------------------------


def test_retention_hand_case(ray_session):
    from cerberus_ray.pipelines.funnel import retention_cohorts

    base = pd.Timestamp("2024-01-01")  # a Monday, ISO 2024-W01
    rows = [
        # u1 active weeks 0, 1, 3
        (1, base), (1, base + pd.Timedelta(days=8)),
        (1, base + pd.Timedelta(days=22)),
        # u2 active week 0 only (two events, one distinct week)
        (2, base + pd.Timedelta(days=2)), (2, base + pd.Timedelta(days=3)),
        # u3 first seen week 1, returns week 2
        (3, base + pd.Timedelta(days=7)), (3, base + pd.Timedelta(days=14)),
    ]
    df = pd.DataFrame(rows, columns=["user_id", "ts"])
    out = retention_cohorts(rd.from_pandas(df, override_num_blocks=2)) \
        .to_pandas()
    rec = {(r.cohort_week, r.week_offset): r.n_users
           for r in out.itertuples()}
    assert rec == {(202401, 0): 2, (202401, 1): 1, (202401, 3): 1,
                   (202402, 0): 1, (202402, 1): 1}


def test_retention_duckdb_parity_sf0001(ray_session):
    from cerberus_ray.pipelines.training_queries import q_retention_report

    sf = "/root/testdata/sf0.001"
    mine = q_retention_report(sf).to_pandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{sf}/events.parquet')")
    orc = con.execute("""
        WITH w AS (
          SELECT DISTINCT user_id,
                 CAST(isoyear(ts)*100 + week(ts) AS BIGINT) AS wk,
                 CAST(floor(epoch(date_trunc('week', ts))/604800)
                      AS BIGINT) AS wi
          FROM events),
        f AS (SELECT user_id, MIN(wi) AS fwi, MIN(wk) AS fwk
              FROM w GROUP BY user_id)
        SELECT f.fwk AS cohort_week,
               CAST(w.wi - f.fwi AS BIGINT) AS week_offset,
               CAST(COUNT(DISTINCT w.user_id) AS BIGINT) AS n_users
        FROM w JOIN f USING (user_id)
        WHERE w.wi - f.fwi <= 8
        GROUP BY 1, 2 ORDER BY 1, 2
    """).fetch_df()
    pd.testing.assert_frame_equal(mine, orc, check_dtype=False)
    # cohort size (offset 0) is the max of each cohort's row
    for cw, g in mine.groupby("cohort_week"):
        assert g.loc[g["week_offset"] == 0, "n_users"].iloc[0] == \
            g["n_users"].max()


# ---- randomized-reference properties ---------------------------------------


def _funnel_reference(df, stages):
    """Per-user Python reference: sequential strict-after min scan."""
    counts = [0] * len(stages)
    for _, g in df.groupby("user_id"):
        g = g.sort_values("ts")
        prev = None
        for k, st in enumerate(stages):
            hits = g[(g["event_type"] == st)
                     & (g["ts"] > prev if prev is not None
                        else g["ts"] == g["ts"])]
            if not len(hits):
                break
            prev = hits["ts"].min()
            counts[k] += 1
    return counts


def test_funnel_matches_reference_on_random_streams(ray_session):
    rng = np.random.default_rng(33)
    stages = ["view", "click", "purchase"]
    for trial in range(3):
        n = 400
        df = pd.DataFrame({
            "user_id": rng.integers(0, 60, n),
            "event_type": rng.choice(
                ["view", "click", "purchase", "error"], n),
            "ts": pd.to_datetime(rng.integers(0, 10**6, n), unit="s")})
        df = df.drop_duplicates(["user_id", "ts"])  # unambiguous ordering
        out = funnel_counts(
            rd.from_pandas(df, override_num_blocks=4), stages,
            n_buckets=7).to_pandas()
        assert out["n_users"].tolist() == _funnel_reference(df, stages), trial


def test_retention_matches_reference_on_random_streams(ray_session):
    from cerberus_ray.pipelines.funnel import retention_cohorts

    rng = np.random.default_rng(44)
    n = 500
    df = pd.DataFrame({
        "user_id": rng.integers(0, 40, n),
        "ts": pd.to_datetime(rng.integers(0, 120, n), unit="D")})
    out = retention_cohorts(rd.from_pandas(df, override_num_blocks=4),
                            max_weeks=30).to_pandas()
    # reference: distinct (user, Monday-week) pairs
    ref_rows = {}
    for u, g in df.groupby("user_id"):
        mon = (g["ts"] - pd.to_timedelta(g["ts"].dt.weekday, unit="D")) \
            .dt.normalize()
        wi = sorted(set(mon.astype("int64") // (7 * 24 * 3600 * 10**9)))
        iso = g.loc[mon.idxmin(), "ts"].isocalendar()
        first_iso = g["ts"].min().isocalendar()
        cohort = first_iso.year * 100 + first_iso.week
        for w in wi:
            off = w - wi[0]
            if off <= 30:
                ref_rows[(cohort, off)] = ref_rows.get((cohort, off), 0) + 1
    got = {(r.cohort_week, r.week_offset): r.n_users
           for r in out.itertuples()}
    assert got == ref_rows
