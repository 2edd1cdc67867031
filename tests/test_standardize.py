"""Feature scaling: DuckDB zscore/minmax parity, robust-scaler sanity,
degenerate columns, null preservation."""

import duckdb
import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from cerberus_ray.stages.outliers import scaling_stats, standardize

SF = "/root/testdata/sf0.001"


def _frame():
    rng = np.random.default_rng(29)
    df = pd.DataFrame({
        "i": np.arange(300),
        "a": rng.normal(10, 4, 300),
        "b": rng.integers(-50, 200, 300).astype("float64"),
        "const": np.full(300, 7.0),
    })
    df.loc[5:9, "b"] = np.nan
    return df


def test_zscore_matches_duckdb(ray_session):
    df = _frame()
    ds = rd.from_pandas(df, override_num_blocks=4)
    out = (standardize(ds, ["a", "b"], method="zscore").to_pandas()
           .sort_values("i").reset_index(drop=True))
    want = duckdb.sql("""
        SELECT i, (a - AVG(a) OVER ()) / STDDEV_POP(a) OVER () AS a,
               (b - AVG(b) OVER ()) / STDDEV_POP(b) OVER () AS b
        FROM df ORDER BY i
    """).fetchdf()
    for c in ("a", "b"):
        np.testing.assert_allclose(out[c].to_numpy(),
                                   want[c].to_numpy(), rtol=1e-9,
                                   equal_nan=True)
    assert np.isnan(out["b"].to_numpy()[5:10]).all()


def test_minmax_matches_duckdb(ray_session):
    df = _frame()
    ds = rd.from_pandas(df, override_num_blocks=5)
    out = (standardize(ds, ["a", "b"], method="minmax").to_pandas()
           .sort_values("i").reset_index(drop=True))
    want = duckdb.sql("""
        SELECT i,
          (a - MIN(a) OVER ()) / (MAX(a) OVER () - MIN(a) OVER ()) AS a,
          (b - MIN(b) OVER ()) / (MAX(b) OVER () - MIN(b) OVER ()) AS b
        FROM df ORDER BY i
    """).fetchdf()
    for c in ("a", "b"):
        np.testing.assert_allclose(out[c].to_numpy(),
                                   want[c].to_numpy(), rtol=0, atol=1e-12,
                                   equal_nan=True)
    assert out["a"].min() >= 0 and out["a"].max() <= 1


def test_robust_and_degenerate(ray_session):
    df = _frame()
    ds = rd.from_pandas(df, override_num_blocks=3)
    st = scaling_stats(ds, ["a", "const"], method="robust")
    # median within 5% rank of true; IQR positive
    assert abs(st["a"][0] - np.median(df["a"])) < 0.5
    assert st["a"][1] > 0
    out = (standardize(ds, ["a", "const"], method="robust").to_pandas()
           .sort_values("i").reset_index(drop=True))
    # constant column: scale 0 → all zeros (sklearn convention)
    assert (out["const"] == 0.0).all()
    # robust scaling centers the median near 0
    assert abs(np.median(out["a"])) < 0.1


def test_bad_method_and_real_table(ray_session):
    from cerberus_ray.sources.io import read_table

    with pytest.raises(ValueError, match="unknown method"):
        scaling_stats(rd.from_pandas(_frame()), ["a"], method="nope")
    ds = read_table(f"{SF}/lineitem.parquet",
                    columns=["l_orderkey", "l_extendedprice"])
    out = standardize(ds, ["l_extendedprice"], method="zscore").to_pandas()
    x = out["l_extendedprice"].to_numpy()
    assert abs(float(np.mean(x))) < 1e-9
    assert abs(float(np.std(x)) - 1.0) < 1e-9
