"""SPC charts: explicit-recursion reference parity for the closed-form
EWMA / CUSUM kernels, planted sustained-shift detection, warm-up
exemption, and block-layout invariance."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from cerberus_ray.stages.spc import cusum_chart, ewma_chart

LAM, L, K, H, W = 0.2, 3.0, 0.5, 5.0, 20


def _ref_ewma(x: np.ndarray, mu: float):
    z, out = mu, []
    for v in x:
        z = LAM * v + (1 - LAM) * z
        out.append(z)
    return np.array(out)


def _ref_cusum(z: np.ndarray):
    cp = cn = 0.0
    pos, neg = [], []
    for v in z:
        cp = max(0.0, cp + v - K)
        cn = max(0.0, cn - v - K)
        pos.append(cp)
        neg.append(cn)
    return np.array(pos), np.array(neg)


def _frame(shift_key="s", shift_at=60, shift_by=2.0, n=120, keys=3):
    rng = np.random.default_rng(11)
    rows = []
    for ki in range(keys):
        key = f"k{ki}" if f"k{ki}" != shift_key else shift_key
        x = rng.normal(10.0, 1.0, n)
        rows.append(pd.DataFrame({
            "key": key, "ts": np.arange(n), "value": x}))
    sh = pd.DataFrame({
        "key": shift_key, "ts": np.arange(n),
        "value": rng.normal(10.0, 1.0, n)})
    sh.loc[shift_at:, "value"] += shift_by
    rows.append(sh)
    return pd.concat(rows, ignore_index=True)


def test_ewma_matches_recursion_reference(ray_session):
    df = _frame()
    ds = rd.from_pandas(df, override_num_blocks=5).materialize()
    out = ewma_chart(ds, "key", "ts", "value", lam=LAM, L=L,
                     warmup=W).to_pandas()
    flagged = set()
    for key, sub in df.groupby("key"):
        x = sub.sort_values("ts")["value"].to_numpy()
        mu, sd = x[:W].mean(), x[:W].std(ddof=1)
        z = _ref_ewma(x, mu)
        t = np.arange(len(x))
        sig = sd * np.sqrt(LAM / (2 - LAM)
                           * (1 - (1 - LAM) ** (2 * (t + 1))))
        for i in np.flatnonzero((t >= W) & (np.abs(z - mu) > L * sig)):
            flagged.add((key, int(i)))
        # closed form == recursion (to float tolerance)
        mine = out[out["key"] == key].set_index("ts")["ewma"]
        for ts, v in mine.items():
            assert abs(v - z[int(ts)]) < 1e-9
    assert {(r.key, int(r.ts)) for r in out.itertuples()} == flagged
    assert len(out) > 0


def test_ewma_detects_planted_shift_and_respects_warmup(ray_session):
    df = _frame(shift_by=1.5)
    ds = rd.from_pandas(df, override_num_blocks=4).materialize()
    out = ewma_chart(ds, "key", "ts", "value").to_pandas()
    hit = out[out["key"] == "s"]
    assert len(hit) > 0 and (hit["side"] == "high").all()
    assert hit["ts"].min() >= 60          # not before the shift
    assert (out["ts"] >= W).all()         # warm-up never flags


def test_cusum_matches_recursion_reference(ray_session):
    df = _frame(shift_by=1.2)
    ds = rd.from_pandas(df, override_num_blocks=6).materialize()
    out = cusum_chart(ds, "key", "ts", "value", k=K, h=H,
                      warmup=W).to_pandas()
    flagged = set()
    for key, sub in df.groupby("key"):
        x = sub.sort_values("ts")["value"].to_numpy()
        mu, sd = x[:W].mean(), x[:W].std(ddof=1)
        z = (x - mu) / sd
        pos, neg = _ref_cusum(z)
        t = np.arange(len(x))
        for i in np.flatnonzero((t >= W) & ((pos > H) | (neg > H))):
            flagged.add((key, int(i)))
        mine = out[out["key"] == key].set_index("ts")
        for ts, row in mine.iterrows():
            assert abs(row["cusum_pos"] - pos[int(ts)]) < 1e-9
            assert abs(row["cusum_neg"] - neg[int(ts)]) < 1e-9
    assert {(r.key, int(r.ts)) for r in out.itertuples()} == flagged
    assert len(out) > 0


def test_cusum_detects_downward_shift(ray_session):
    df = _frame(shift_by=-1.5)
    ds = rd.from_pandas(df).materialize()
    out = cusum_chart(ds, "key", "ts", "value").to_pandas()
    hit = out[out["key"] == "s"]
    assert len(hit) > 0 and (hit["side"] == "low").all()


def test_spc_layout_invariance_and_guard(ray_session):
    df = _frame()
    a = ewma_chart(rd.from_pandas(df, override_num_blocks=1
                                  ).materialize(),
                   "key", "ts", "value").to_pandas()
    shuf = df.sample(frac=1.0, random_state=5)
    b = ewma_chart(rd.from_pandas(shuf, override_num_blocks=9
                                  ).materialize(),
                   "key", "ts", "value").to_pandas()
    key_a = a.sort_values(["key", "ts"]).reset_index(drop=True)
    key_b = b.sort_values(["key", "ts"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(key_a, key_b)
    with pytest.raises(ValueError):
        ewma_chart(rd.from_pandas(df), "key", "ts", "value", lam=0.0)
