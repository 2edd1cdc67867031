"""WOE/IV: DuckDB width_bucket parity on shared edges, predictive vs
noise feature ranking, numpy reference, layout invariance, guards."""

import duckdb
import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from cerberus_ray.pipelines.gbdt import quantile_bin_edges
from cerberus_ray.stages.woe import woe_iv_report


def _frame(n=5000, seed=33):
    rng = np.random.default_rng(seed)
    x_good = rng.standard_normal(n)
    x_noise = rng.standard_normal(n)
    p = 1 / (1 + np.exp(-1.5 * x_good))
    return pd.DataFrame({"x_good": x_good, "x_noise": x_noise,
                         "y": (rng.random(n) < p).astype(np.int64)})


def test_ranks_predictive_over_noise(ray_session):
    df = _frame()
    out = woe_iv_report(rd.from_pandas(df, override_num_blocks=4),
                        ["x_good", "x_noise"], "y", n_bins=10)
    assert list(out["feature"]) == ["x_good", "x_noise"]
    assert out.iloc[0]["iv"] > 0.3          # strong predictor
    assert out.iloc[1]["iv"] < 0.05         # noise


def test_matches_duckdb_on_shared_edges(ray_session):
    df = _frame(n=1500, seed=4)
    ds = rd.from_pandas(df, override_num_blocks=3)
    edges = quantile_bin_edges(ds, ["x_good"], n_bins=6)
    detail = woe_iv_report(ds, ["x_good"], "y", bin_edges=edges,
                           eps=0.5, detail=True)
    con = duckdb.connect()
    con.register("t", df)
    elist = ", ".join(str(e) for e in edges[0])
    nb = len(edges[0]) + 1
    got = con.execute(f"""
        with fixed as (
          select (select count(*) from unnest([{elist}]) u(e)
                  where e <= x_good)::bigint as bin, y from t)
        select bin, sum(y)::bigint n_pos,
               sum(1-y)::bigint n_neg
        from fixed group by bin order by bin""").df()
    want = detail[["bin", "n_pos", "n_neg"]].reset_index(drop=True)
    got = got.astype({"bin": "int64"})
    pd.testing.assert_frame_equal(got, want.astype({"bin": "int64"}),
                                  check_dtype=False)
    # IV from the DuckDB census equals the engine's (same smoothing)
    pos, neg = got["n_pos"].to_numpy(np.float64), got[
        "n_neg"].to_numpy(np.float64)
    full_pos = np.zeros(nb); full_neg = np.zeros(nb)
    full_pos[got["bin"]] = pos; full_neg[got["bin"]] = neg
    ps = (full_pos + 0.5) / (full_pos.sum() + 0.5 * nb)
    ns = (full_neg + 0.5) / (full_neg.sum() + 0.5 * nb)
    iv_sql = float(((ps - ns) * np.log(ps / ns)).sum())
    iv_engine = woe_iv_report(ds, ["x_good"], "y",
                              bin_edges=edges).iloc[0]["iv"]
    assert abs(iv_sql - iv_engine) < 1e-6


def test_layout_invariance_with_fixed_edges(ray_session):
    df = _frame(n=1200, seed=9)
    edges = quantile_bin_edges(rd.from_pandas(df), ["x_good",
                                                    "x_noise"],
                               n_bins=8)
    a = woe_iv_report(rd.from_pandas(df, override_num_blocks=2),
                      ["x_good", "x_noise"], "y", bin_edges=edges)
    b = woe_iv_report(rd.from_pandas(df, override_num_blocks=9),
                      ["x_good", "x_noise"], "y", bin_edges=edges)
    pd.testing.assert_frame_equal(a, b)


def test_guards(ray_session):
    df = _frame(n=100)
    with pytest.raises(ValueError):
        woe_iv_report(rd.from_pandas(df), [], "y")
    with pytest.raises(Exception, match="binary"):
        woe_iv_report(rd.from_pandas(df.assign(y=df["y"] + 1)),
                      ["x_good"], "y")
    ones = df.assign(y=1)
    with pytest.raises(Exception, match="both classes"):
        woe_iv_report(rd.from_pandas(ones), ["x_good"], "y")
