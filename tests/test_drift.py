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
