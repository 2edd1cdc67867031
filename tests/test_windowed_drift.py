"""Week-over-week drift: a planted distribution shift (mean jump + new
category) in one week is flagged at exactly that boundary; stable weeks
stay below threshold; per-window profiles are block-layout-invariant."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from cerberus_ray.stages.drift import (consecutive_window_drift,
                                       profile_by_window)


def events(seed=3) -> pd.DataFrame:
    """4 weeks; weeks 1-3 N(10,2) with types {a,b}; week 4 N(25,2) and a
    new type c."""
    rng = np.random.default_rng(seed)
    rows = []
    for w in range(1, 5):
        n = 3000
        mu = 25.0 if w == 4 else 10.0
        vals = rng.normal(mu, 2.0, n)
        types = rng.choice(["a", "b"], n).astype(object)
        if w == 4:
            types[: n // 4] = "c"
        rows.append(pd.DataFrame({"week": f"2025-W{w:02d}",
                                  "value": vals, "event_type": types}))
    return pd.concat(rows, ignore_index=True)


def test_shift_flagged_only_at_week4(ray_session):
    ds = rd.from_pandas(events(), override_num_blocks=6).materialize()
    profs = profile_by_window(ds, "week", numeric=["value"],
                              categorical=["event_type"])
    assert sorted(profs) == [f"2025-W{w:02d}" for w in range(1, 5)]
    out = consecutive_window_drift(profs).to_pandas()
    flagged = out[out["drifted"]]
    # every flag is at the W03→W04 boundary
    assert (flagged["window_to"] == "2025-W04").all()
    # the numeric shift is seen by both psi and ks, the new type too
    got = set(zip(flagged["col"], flagged["metric"]))
    assert ("value", "psi") in got and ("value", "ks") in got
    assert ("event_type", "new-categories") in got
    # stable boundaries have no flags at all
    stable = out[out["window_to"] != "2025-W04"]
    assert not stable["drifted"].any()


def test_profiles_layout_invariant(ray_session):
    pdf = events(seed=9)
    p1 = profile_by_window(
        rd.from_pandas(pdf, override_num_blocks=1).materialize(),
        "week", numeric=["value"], categorical=["event_type"])
    p8 = profile_by_window(
        rd.from_pandas(pdf.sample(frac=1, random_state=2),
                       override_num_blocks=8).materialize(),
        "week", numeric=["value"], categorical=["event_type"])
    a = consecutive_window_drift(p1).to_pandas()
    b = consecutive_window_drift(p8).to_pandas()
    # categorical counts are exact → identical rows; numeric sketches are
    # merge-order-dependent only in digest centroids → same verdicts and
    # psi/ks within sketch tolerance
    key = ["window_from", "window_to", "col", "metric"]
    a = a.sort_values(key).reset_index(drop=True)
    b = b.sort_values(key).reset_index(drop=True)
    assert a[key + ["drifted"]].equals(b[key + ["drifted"]])
    assert np.allclose(a["value"], b["value"], atol=0.02)


def test_events_weekly_drift_on_real_table(ray_session):
    """The sf0.001 events table: profiles exist per ISO week and the
    report is deterministic (stable synthetic data → no drift flags on
    the value column at default thresholds is NOT asserted — only
    determinism and shape)."""
    import pyarrow.compute as pc

    from cerberus_ray.sources.io import read_table

    ds = read_table("/root/testdata/sf0.001/events.parquet",
                    columns=["ts", "value", "event_type"])

    def add_week(b: pa.Table) -> pa.Table:
        iso = pc.iso_week(b["ts"])
        yr = pc.iso_year(b["ts"])
        lab = pc.binary_join_element_wise(
            pc.cast(yr, pa.string()), pc.utf8_lpad(
                pc.cast(iso, pa.string()), 2, "0"), "-W")
        return b.append_column("week", lab)

    wk = ds.map_batches(add_week, batch_format="pyarrow",
                        zero_copy_batch=True).materialize()
    profs = profile_by_window(wk, "week", numeric=["value"],
                              categorical=["event_type"])
    assert len(profs) >= 2
    a = consecutive_window_drift(profs).to_pandas()
    b = consecutive_window_drift(profile_by_window(
        wk, "week", numeric=["value"],
        categorical=["event_type"])).to_pandas()
    assert a.equals(b)
