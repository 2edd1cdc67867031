"""Winsorization: numpy clip parity, null preservation, DuckDB count
parity for the report, idempotence under fixed fences."""

import duckdb
import numpy as np
import pandas as pd
import ray.data as rd

from cerberus_ray.stages.outliers import (
    numeric_fences,
    winsorize,
    winsorize_report,
)

SF = "/root/testdata/sf0.001"


def _frame():
    rng = np.random.default_rng(13)
    v = rng.normal(50, 10, size=400)
    v[:6] = [500.0, -400.0, 200.0, -150.0, 120.0, -80.0]  # planted tails
    w = rng.integers(0, 100, size=400).astype("float64")
    w[10:13] = np.nan  # null band
    return pd.DataFrame({"doc_id": np.arange(400), "v": v, "w": w})


def test_clip_matches_numpy_and_preserves_nulls(ray_session):
    df = _frame()
    ds = rd.from_pandas(df, override_num_blocks=4)
    fen = numeric_fences(ds, ["v", "w"], method="zscore", k=2.0)
    out = (winsorize(ds, ["v", "w"], fences=fen).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    for c in ("v", "w"):
        lo, hi = fen[c]
        want = np.clip(df[c].to_numpy(), lo, hi)
        got = out[c].to_numpy()
        nn = ~np.isnan(df[c].to_numpy())
        np.testing.assert_allclose(got[nn], want[nn], atol=1e-12)
    assert np.isnan(out["w"].to_numpy()[10:13]).all()  # nulls stay null
    assert out["v"].max() <= fen["v"][1] + 1e-12
    assert out["v"].min() >= fen["v"][0] - 1e-12


def test_idempotent_under_fixed_fences(ray_session):
    df = _frame()
    ds = rd.from_pandas(df, override_num_blocks=3)
    fen = numeric_fences(ds, ["v"], method="iqr", k=1.5)
    once = winsorize(ds, ["v"], fences=fen).materialize()
    twice = winsorize(once, ["v"], fences=fen).to_pandas()
    pd.testing.assert_frame_equal(
        once.to_pandas().sort_values("doc_id").reset_index(drop=True),
        twice.sort_values("doc_id").reset_index(drop=True))


def test_report_counts_match_duckdb(ray_session):
    df = _frame()
    ds = rd.from_pandas(df, override_num_blocks=5)
    rep = winsorize_report(ds, ["v", "w"], method="zscore",
                           k=2.0).to_pandas().set_index("col")
    for c in ("v", "w"):
        lo, hi = float(rep.loc[c, "lo"]), float(rep.loc[c, "hi"])
        want = duckdb.sql(
            f"SELECT CAST(SUM(CASE WHEN {c} < {lo!r} THEN 1 ELSE 0 END) "
            f"AS BIGINT) nb, "
            f"CAST(SUM(CASE WHEN {c} > {hi!r} THEN 1 ELSE 0 END) "
            f"AS BIGINT) na FROM df WHERE {c} = {c}").fetchone()
        assert (int(rep.loc[c, "n_below"]),
                int(rep.loc[c, "n_above"])) == want
    # the planted ±tails inflate σ, so k=2 z-fences catch only the
    # extreme ones — but at least the ±400/500 pair must be outside
    assert int(rep.loc["v", "n_below"]) + int(rep.loc["v", "n_above"]) >= 2


def test_real_table(ray_session):
    from cerberus_ray.sources.io import read_table

    ds = read_table(f"{SF}/lineitem.parquet",
                    columns=["l_orderkey", "l_extendedprice"])
    fen = numeric_fences(ds, ["l_extendedprice"], method="iqr", k=1.5)
    out = winsorize(ds, ["l_extendedprice"], fences=fen)
    got = out.to_pandas()["l_extendedprice"].to_numpy()
    assert got.max() <= fen["l_extendedprice"][1] + 1e-9
    assert len(got) == ds.count()
