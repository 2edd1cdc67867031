"""k-anonymity / l-diversity census: DuckDB parity, driver/shuffle
agreement, hand-built violations, guards."""

import duckdb
import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from cerberus_ray.stages.privacy import k_anonymity_report

SF = "/root/testdata/sf0.001"


def test_duckdb_parity_events(ray_session):
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{SF}/events.parquet')")
    k = 5
    want = con.execute(f"""
        WITH g AS (SELECT user_id, event_type, COUNT(*) AS n
                   FROM events GROUP BY 1, 2)
        SELECT COUNT(*) AS n_groups,
               CAST(COALESCE(SUM(CASE WHEN n < {k} THEN 1 END), 0)
                    AS BIGINT) AS below,
               CAST(COALESCE(SUM(CASE WHEN n < {k} THEN n END), 0)
                    AS BIGINT) AS at_risk,
               MIN(n) AS mn, CAST(SUM(n) AS BIGINT) AS total
        FROM g""").fetchone()
    ev = rd.read_parquet(f"{SF}/events.parquet",
                         columns=["user_id", "event_type"])
    got = k_anonymity_report(ev, ["user_id", "event_type"],
                             k=k).to_pydict()
    assert got["n_groups"][0] == want[0]
    assert got["n_groups_below_k"][0] == want[1]
    assert got["n_rows_at_risk"][0] == want[2]
    assert got["min_group_size"][0] == want[3]
    assert got["n_rows"][0] == want[4]


def test_mode_agreement(ray_session):
    ev = rd.read_parquet(f"{SF}/events.parquet",
                         columns=["user_id", "event_type"])
    a = k_anonymity_report(ev, ["user_id", "event_type"], k=3,
                           mode="driver").to_pydict()
    b = k_anonymity_report(ev, ["user_id", "event_type"], k=3,
                           mode="shuffle").to_pydict()
    assert a == b


def test_l_diversity_hand_case(ray_session):
    # group (a): 3 rows, all sensitive 'x' → below l=2;
    # group (b): 3 rows, sensitive {x, y} → diverse enough
    df = pd.DataFrame({"q": list("aaabbb"),
                       "s": ["x", "x", "x", "x", "y", "y"]})
    got = k_anonymity_report(rd.from_pandas(df, override_num_blocks=2),
                             ["q"], k=2, l=2,
                             sensitive_col="s").to_pydict()
    assert got["n_groups"][0] == 2
    assert got["n_groups_below_k"][0] == 0
    assert got["n_groups_below_l"][0] == 1


def test_l_diversity_mode_agreement(ray_session):
    rng = np.random.default_rng(3)
    df = pd.DataFrame({"q": rng.choice(list("pqrs"), 300),
                       "s": rng.choice(list("uvw"), 300)})
    kw = dict(k=50, l=3, sensitive_col="s")
    a = k_anonymity_report(rd.from_pandas(df, override_num_blocks=4),
                           ["q"], mode="driver", **kw).to_pydict()
    b = k_anonymity_report(rd.from_pandas(df, override_num_blocks=4),
                           ["q"], mode="shuffle", **kw).to_pydict()
    assert a == b


def test_guards(ray_session):
    df = pd.DataFrame({"q": ["a"], "s": ["x"]})
    with pytest.raises(ValueError):
        k_anonymity_report(rd.from_pandas(df), ["q"], l=2)
    with pytest.raises(ValueError):
        k_anonymity_report(rd.from_pandas(df), ["q"], mode="nope")


def test_dp_counts_deterministic_and_layout_invariant(ray_session):
    import ray.data as rd

    from cerberus_ray.stages.privacy import dp_grouped_counts

    rng = np.random.default_rng(3)
    df = pd.DataFrame({"g": rng.integers(0, 40, 5000)})
    a = dp_grouped_counts(rd.from_pandas(df, override_num_blocks=1),
                          ["g"], epsilon=1.0, seed=7)
    b = dp_grouped_counts(rd.from_pandas(df, override_num_blocks=6),
                          ["g"], epsilon=1.0, seed=7)
    pd.testing.assert_frame_equal(a, b)       # same release every run
    c = dp_grouped_counts(rd.from_pandas(df), ["g"], epsilon=1.0,
                          seed=8)
    assert not np.allclose(a["n_noisy"], c["n_noisy"])  # seed matters


def test_dp_counts_noise_scale(ray_session):
    import ray.data as rd

    from cerberus_ray.stages.privacy import dp_grouped_counts

    # one row per group → true count 1 everywhere; noise = release − 1
    n = 4000
    df = pd.DataFrame({"g": np.arange(n)})
    for eps in [0.5, 2.0]:
        rel = dp_grouped_counts(rd.from_pandas(df), ["g"], epsilon=eps,
                                seed=11)
        noise = rel["n_noisy"].to_numpy() - 1.0
        # Laplace(1/eps): mean 0, E|X| = 1/eps, Var = 2/eps²
        assert abs(noise.mean()) < 4 / (eps * np.sqrt(n))
        np.testing.assert_allclose(np.abs(noise).mean(), 1 / eps,
                                   rtol=0.15)
        np.testing.assert_allclose(noise.var(), 2 / eps ** 2, rtol=0.3)


def test_dp_counts_guard_and_modes(ray_session):
    import pytest as _pytest
    import ray.data as rd

    from cerberus_ray.stages.privacy import dp_grouped_counts

    df = pd.DataFrame({"g": [1, 1, 2]})
    with _pytest.raises(ValueError):
        dp_grouped_counts(rd.from_pandas(df), ["g"], epsilon=0.0)
    d = dp_grouped_counts(rd.from_pandas(df), ["g"], mode="driver",
                          seed=5)
    s = dp_grouped_counts(rd.from_pandas(df), ["g"], mode="shuffle",
                          seed=5)
    pd.testing.assert_frame_equal(d, s)       # noise is key-based


def test_t_closeness_hand_computed(ray_session):
    import ray.data as rd

    from cerberus_ray.stages.privacy import t_closeness_report

    # group A: 4 of s=0, 0 of s=1 ; group B: 2 of each
    # global q = (6/8, 2/8); p_A = (1, 0) → TV = 0.25; p_B = (.5, .5)
    # → TV = 0.25 ; so at t=0.2 both groups violate, at t=0.3 none
    df = pd.DataFrame({"g": ["A"] * 4 + ["B"] * 4,
                       "s": [0, 0, 0, 0, 0, 0, 1, 1]})
    ds = rd.from_pandas(df)
    r = t_closeness_report(ds, ["g"], "s", t=0.2).to_pandas()
    assert r["n_groups"].iloc[0] == 2
    assert r["n_groups_above_t"].iloc[0] == 2
    assert abs(r["max_distance"].iloc[0] - 0.25) < 1e-9
    r2 = t_closeness_report(ds, ["g"], "s", t=0.3).to_pandas()
    assert r2["n_groups_above_t"].iloc[0] == 0


def test_t_closeness_ordered_vs_categorical(ray_session):
    import ray.data as rd

    from cerberus_ray.stages.privacy import t_closeness_report

    # adjacent-bucket shift vs far shift: same TV, different EMD
    near = pd.DataFrame({"g": ["A"] * 4 + ["B"] * 4,
                         "s": [0, 0, 1, 1, 1, 1, 2, 2]})
    far = pd.DataFrame({"g": ["A"] * 4 + ["B"] * 4,
                        "s": [0, 0, 2, 2, 2, 2, 4, 4]})
    tv_near = t_closeness_report(rd.from_pandas(near), ["g"], "s",
                                 ordered=False).to_pandas()
    tv_far = t_closeness_report(rd.from_pandas(far), ["g"], "s",
                                ordered=False).to_pandas()
    assert tv_near["max_distance"].iloc[0] == tv_far["max_distance"].iloc[0]
    emd_near = t_closeness_report(rd.from_pandas(near), ["g"], "s",
                                  ordered=True).to_pandas()
    emd_far = t_closeness_report(rd.from_pandas(far), ["g"], "s",
                                 ordered=True).to_pandas()
    # domain for 'far' is {0,2,4} → positions 0,1,2: same normalized EMD
    # shape as 'near' {0,1,2}; widen the far domain to force a difference
    far5 = pd.DataFrame({"g": ["A"] * 4 + ["B"] * 4,
                         "s": [0, 0, 4, 4, 4, 4, 2, 1]})
    emd_far5 = t_closeness_report(rd.from_pandas(far5), ["g"], "s",
                                  ordered=True).to_pandas()
    assert emd_near["measure"].iloc[0] == "emd"
    assert emd_far5["max_distance"].iloc[0] != emd_near["max_distance"].iloc[0]
    assert emd_far["n_groups"].iloc[0] == 2


def test_t_closeness_mode_agreement_and_empty(ray_session):
    import ray.data as rd

    from cerberus_ray.stages.privacy import t_closeness_report

    rng = np.random.default_rng(3)
    df = pd.DataFrame({"q1": rng.integers(0, 5, 400),
                       "q2": rng.integers(0, 3, 400),
                       "s": rng.integers(0, 4, 400)})
    d = t_closeness_report(rd.from_pandas(df), ["q1", "q2"], "s",
                           mode="driver")
    s = t_closeness_report(rd.from_pandas(df), ["q1", "q2"], "s",
                           mode="shuffle")
    assert d.equals(s)
    empty = rd.from_pandas(df.iloc[:0])
    e = t_closeness_report(empty, ["q1"], "s", mode="driver").to_pandas()
    assert e["n_groups"].iloc[0] == 0
