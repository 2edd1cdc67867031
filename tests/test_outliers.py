"""Numeric outlier validation: DuckDB AVG/STDDEV_POP parity for z-score
fences and flag counts, IQR fence sanity on a known distribution, nulls
never flagged, and the sf0.001 extras pin."""

import duckdb
import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from cerberus_ray.stages.outliers import (numeric_fences,
                                          numeric_outlier_violations)


def frame(n=4000, seed=3) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    a = rng.normal(100.0, 10.0, n)
    a[:12] += 200.0                      # planted high outliers
    b = rng.exponential(5.0, n)
    b[5] = np.nan
    return pd.DataFrame({"doc_id": [f"r{i}" for i in range(n)],
                         "a": a, "b": b})


@pytest.fixture(scope="module")
def ds(ray_session):
    return rd.from_pandas(frame(), override_num_blocks=6).materialize()


def test_zscore_fences_match_duckdb(ds):
    df = frame()
    fences = numeric_fences(ds, ["a", "b"], method="zscore", k=3.0)
    con = duckdb.connect()
    con.register("t", df)
    for c in ("a", "b"):
        mean, sd = con.execute(
            f"SELECT AVG({c}), STDDEV_POP({c}) FROM t").fetchone()
        lo, hi = fences[c]
        assert lo == pytest.approx(mean - 3 * sd, rel=1e-9)
        assert hi == pytest.approx(mean + 3 * sd, rel=1e-9)
        n_out = con.execute(
            f"SELECT COUNT(*) FROM t WHERE {c} < {lo!r} OR {c} > {hi!r}"
        ).fetchone()[0]
        got = (numeric_outlier_violations(ds, [c], method="zscore", k=3.0)
               .to_pandas())
        assert len(got) == n_out
    with pytest.raises(ValueError):
        numeric_fences(ds, ["a"], method="bogus")


def test_planted_outliers_flagged_with_schema(ds):
    v = numeric_outlier_violations(ds, ["a"], method="zscore",
                                   k=3.0).to_pandas()
    assert set(v.columns) == {"doc_id", "rule", "path", "detail"}
    assert (v["rule"] == "numeric-outlier-zscore").all()
    assert (v["path"] == "a").all()
    flagged = set(v["doc_id"])
    assert {f"r{i}" for i in range(12)} <= flagged   # the planted dozen
    assert "outside [" in v["detail"].iloc[0]


def test_iqr_fences_and_null_handling(ds):
    fences = numeric_fences(ds, ["a"], method="iqr", k=1.5)
    lo, hi = fences["a"]
    df = frame()
    q1, q3 = np.quantile(df["a"], [0.25, 0.75])
    # t-digest quartiles: rank-accurate within a tight tolerance here
    assert lo == pytest.approx(q1 - 1.5 * (q3 - q1), abs=1.5)
    assert hi == pytest.approx(q3 + 1.5 * (q3 - q1), abs=1.5)
    v = numeric_outlier_violations(ds, ["b"], method="iqr",
                                   k=1.5).to_pandas()
    assert "r5" not in set(v["doc_id"])              # NaN is not an outlier


def test_sf0001_extras_pin(ray_session):
    from cerberus_ray.pipelines.training_queries import (
        q_numeric_outlier_report)
    t = q_numeric_outlier_report("/root/testdata/sf0.001").to_pydict()
    # n_zscore matches the exact numpy mean±3σ count; n_iqr matches the
    # exact Tukey-fence count (the digest quartiles land on the same side
    # of every point at this scale)
    assert t == {"n_rows": [1000], "n_zscore": [16], "n_iqr": [31]}
