"""Single change-point detection: DuckDB window-sum parity, planted
shift recovered at the exact index, null of no-shift keys, partition
invariance."""

import duckdb
import numpy as np
import pandas as pd
import ray.data as rd

from cerberus_ray.stages.changepoint import single_changepoint

SQL = """
WITH s AS (
  SELECT k, v,
         ROW_NUMBER() OVER w AS i,
         SUM(v) OVER w AS pref,
         COUNT(*) OVER (PARTITION BY k) AS n,
         SUM(v) OVER (PARTITION BY k) AS tot
  FROM df
  WINDOW w AS (PARTITION BY k ORDER BY t
               ROWS UNBOUNDED PRECEDING)),
c AS (
  SELECT k, n, i AS cp_index,
         sqrt(i * (n - i) / n) *
           abs(pref / i - (tot - pref) / (n - i)) AS score,
         pref / i AS mean_left,
         (tot - pref) / (n - i) AS mean_right
  FROM s WHERE i < n AND n >= 2)
SELECT k, n, cp_index, score, mean_left, mean_right FROM c
QUALIFY ROW_NUMBER() OVER (PARTITION BY k
                           ORDER BY score DESC, cp_index) = 1
ORDER BY k
"""


def _frame(seed=3):
    rng = np.random.default_rng(seed)
    rows = []
    # key 'shift': mean 0 for 40 rows then mean 5 for 60
    v = np.r_[rng.normal(0, 0.5, 40), rng.normal(5, 0.5, 60)]
    rows += [("shift", t, x) for t, x in enumerate(v)]
    # key 'flat': pure noise
    rows += [("flat", t, x)
             for t, x in enumerate(rng.normal(1, 0.5, 80))]
    return pd.DataFrame(rows, columns=["k", "t", "v"])


def test_duckdb_parity(ray_session):
    df = _frame()
    got = (single_changepoint(rd.from_pandas(df, override_num_blocks=4),
                              "k", "t", "v").to_pandas()
           .sort_values("k").reset_index(drop=True))
    want = duckdb.sql(SQL).fetchdf()
    assert got["k"].tolist() == want["k"].tolist()
    assert got["cp_index"].tolist() == want["cp_index"].tolist()
    np.testing.assert_allclose(got["score"].to_numpy(),
                               want["score"].to_numpy(), atol=1e-6)
    np.testing.assert_allclose(got["mean_left"].to_numpy(),
                               want["mean_left"].to_numpy(), atol=1e-6)


def test_planted_shift_found(ray_session):
    got = (single_changepoint(rd.from_pandas(_frame()), "k", "t", "v")
           .to_pandas().set_index("k"))
    assert got.loc["shift", "cp_index"] == 40
    assert abs(got.loc["shift", "mean_left"]) < 0.3
    assert abs(got.loc["shift", "mean_right"] - 5) < 0.3
    # the flat key's best score is far below the genuine shift's
    assert got.loc["flat", "score"] < 0.2 * got.loc["shift", "score"]


def test_short_keys_skipped(ray_session):
    df = pd.DataFrame({"k": ["a", "b", "b"], "t": [0, 0, 1],
                       "v": [1.0, 2.0, 9.0]})
    got = single_changepoint(rd.from_pandas(df), "k", "t",
                             "v").to_pandas()
    assert set(got["k"]) == {"b"}
    assert got["cp_index"].tolist() == [1]


def test_partition_invariance(ray_session):
    df = _frame(seed=11)
    outs = [(single_changepoint(
        rd.from_pandas(df, override_num_blocks=b), "k", "t", "v",
        n_buckets=nb).to_pandas()
        .sort_values("k").reset_index(drop=True))
        for b, nb in ((1, 3), (7, 9))]
    pd.testing.assert_frame_equal(outs[0], outs[1])
