"""ROC-AUC: DuckDB rank-sum (U statistic) parity — an independent
derivation from the per-score-count identity the stage uses — plus a
brute-force pairwise probe, grouped mode, ties, degenerate classes and
partition invariance."""

import duckdb
import numpy as np
import pandas as pd
import ray.data as rd

from cerberus_ray.stages.roc import roc_auc

# Mann-Whitney U from average ranks: a different derivation than the
# stage's per-score cumulative-count identity.
SQL = """
WITH r AS (
  SELECT y, AVG(rn) OVER (PARTITION BY s) AS ar
  FROM (SELECT s, y, ROW_NUMBER() OVER (ORDER BY s) AS rn FROM df)),
t AS (SELECT SUM(y) AS np, COUNT(*) - SUM(y) AS nn FROM df)
SELECT (SUM(CASE WHEN y = 1 THEN ar END) - np * (np + 1) / 2.0)
         / (np * nn) AS auc
FROM r, t GROUP BY np, nn
"""


def _frame(seed=7, n=4000):
    rng = np.random.default_rng(seed)
    y = (rng.random(n) < 0.3).astype(np.int64)
    # informative but noisy score with heavy ties (1 decimal)
    s = np.round(y * 0.8 + rng.normal(0, 0.7, n), 1)
    g = rng.choice(["a", "b", "c"], n)
    return pd.DataFrame({"s": s, "y": y, "g": g})


def _brute(df):
    sp = df.loc[df.y == 1, "s"].to_numpy()[:, None]
    sn = df.loc[df.y == 0, "s"].to_numpy()[None, :]
    return ((sp > sn).sum() + 0.5 * (sp == sn).sum()) / (sp.size * sn.size)


def test_duckdb_rank_parity(ray_session):
    df = _frame()
    got = roc_auc(rd.from_pandas(df, override_num_blocks=5), "s", "y")
    want = duckdb.sql(SQL).fetchone()[0]
    assert got.columns.tolist() == ["n_pos", "n_neg", "auc"]
    assert got["n_pos"].iloc[0] == int(df.y.sum())
    assert got["n_neg"].iloc[0] == int((1 - df.y).sum())
    np.testing.assert_allclose(got["auc"].iloc[0], want, atol=1e-6)


def test_brute_force_small(ray_session):
    df = _frame(seed=11, n=300)
    got = roc_auc(rd.from_pandas(df), "s", "y")["auc"].iloc[0]
    np.testing.assert_allclose(got, _brute(df), atol=1e-6)


def test_grouped(ray_session):
    df = _frame(seed=5)
    got = roc_auc(rd.from_pandas(df, override_num_blocks=4), "s", "y",
                  group_col="g").set_index("g")
    for g, sub in df.groupby("g"):
        np.testing.assert_allclose(got.loc[g, "auc"], _brute(sub),
                                   atol=1e-6)
        assert got.loc[g, "n_pos"] == int(sub.y.sum())


def test_perfect_and_degenerate(ray_session):
    df = pd.DataFrame({"s": [0.1, 0.2, 0.8, 0.9], "y": [0, 0, 1, 1]})
    assert roc_auc(rd.from_pandas(df), "s", "y")["auc"].iloc[0] == 1.0
    one_class = pd.DataFrame({"s": [0.1, 0.2], "y": [1, 1]})
    assert np.isnan(roc_auc(rd.from_pandas(one_class),
                            "s", "y")["auc"].iloc[0])


def test_quantize_and_partition_invariance(ray_session):
    df = _frame(seed=9)
    a = roc_auc(rd.from_pandas(df, override_num_blocks=1), "s", "y",
                quantize=2)
    b = roc_auc(rd.from_pandas(df, override_num_blocks=7), "s", "y",
                quantize=2)
    pd.testing.assert_frame_equal(a, b)


def test_isotonic_pava_reference(ray_session):
    import ray.data as rd

    from cerberus_ray.stages.roc import isotonic_calibration

    rng = np.random.default_rng(41)
    s = np.round(rng.random(2000), 2)
    y = (rng.random(2000) < np.clip(s + rng.normal(0, 0.3, 2000),
                                    0, 1)).astype(int)
    df = pd.DataFrame({"s": s, "y": y})
    got = isotonic_calibration(rd.from_pandas(df, override_num_blocks=4),
                               "s", "y", quantize=2)
    # monotone non-decreasing
    assert (np.diff(got["calibrated"]) >= -1e-12).all()
    # weighted mean preserved: Σ n·cal == Σ y
    np.testing.assert_allclose((got["n"] * got["calibrated"]).sum(),
                               y.sum(), rtol=1e-6)
    # squared error no worse than the best CONSTANT fit (sanity: the
    # isotonic fit nests the constant fit)
    raw = got["frac_pos"].to_numpy()
    w = got["n"].to_numpy()
    const = (raw * w).sum() / w.sum()
    err_iso = (w * (raw - got["calibrated"]) ** 2).sum()
    err_const = (w * (raw - const) ** 2).sum()
    assert err_iso <= err_const + 1e-9


def test_isotonic_hand_example(ray_session):
    import ray.data as rd

    from cerberus_ray.stages.roc import isotonic_calibration

    # scores 1,2,3 with frac_pos 0.8, 0.2, 0.9 and equal weight →
    # first two pool to 0.5, third stays
    df = pd.DataFrame({
        "s": [1.0] * 5 + [2.0] * 5 + [3.0] * 10,
        "y": [1, 1, 1, 1, 0] + [1, 0, 0, 0, 0] + [1] * 9 + [0]})
    got = isotonic_calibration(rd.from_pandas(df), "s", "y")
    np.testing.assert_allclose(got["calibrated"],
                               [0.5, 0.5, 0.9], atol=1e-9)
    np.testing.assert_allclose(got["frac_pos"], [0.8, 0.2, 0.9],
                               atol=1e-9)
    assert list(got["n"]) == [5, 5, 10]


def test_isotonic_layout_invariance(ray_session):
    import ray.data as rd

    from cerberus_ray.stages.roc import isotonic_calibration

    rng = np.random.default_rng(43)
    df = pd.DataFrame({"s": np.round(rng.random(3000), 2),
                       "y": rng.integers(0, 2, 3000)})
    a = isotonic_calibration(rd.from_pandas(df, override_num_blocks=1),
                             "s", "y")
    b = isotonic_calibration(rd.from_pandas(df, override_num_blocks=7),
                             "s", "y")
    pd.testing.assert_frame_equal(a, b)
