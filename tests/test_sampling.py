"""SQL-auditable hash sampling: the DuckDB predicate built from
hash_sql_predicate selects EXACTLY the engine's rows (bit-for-bit row
set), stratified CASE variant, edge fractions, partition invariance."""

import duckdb
import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from cerberus_ray.pipelines.sampling import (hash_sample,
                                             hash_sql_predicate,
                                             hash_threshold,
                                             key_hash_u32,
                                             stratified_sample)

SF = "/root/testdata/sf0.001"


def test_bernoulli_exact_row_set(ray_session):
    con = duckdb.connect()
    con.execute(f"CREATE VIEW orders AS SELECT * FROM "
                f"read_parquet('{SF}/orders.parquet')")
    pred = hash_sql_predicate("o_orderkey", 0.2)
    want = con.execute(
        f"SELECT o_orderkey FROM orders WHERE {pred} "
        f"ORDER BY o_orderkey").fetchdf()["o_orderkey"].tolist()
    ds = rd.read_parquet(f"{SF}/orders.parquet", columns=["o_orderkey"])
    got = sorted(hash_sample(ds, "o_orderkey", 0.2)
                 .to_pandas()["o_orderkey"].tolist())
    assert got == want
    n_total = con.execute("SELECT COUNT(*) FROM orders").fetchone()[0]
    assert 0 < len(got) < n_total


def test_stratified_exact_row_set(ray_session):
    con = duckdb.connect()
    con.execute(f"CREATE VIEW orders AS SELECT * FROM "
                f"read_parquet('{SF}/orders.parquet')")
    fracs = {"F": 0.2, "O": 0.1, "P": 0.5}
    case = " ".join(
        f"WHEN o_orderstatus = '{s}' THEN "
        f"({hash_sql_predicate('o_orderkey', f)})"
        for s, f in fracs.items())
    want = con.execute(
        f"SELECT o_orderkey FROM orders WHERE CASE {case} ELSE FALSE END "
        f"ORDER BY o_orderkey").fetchdf()["o_orderkey"].tolist()
    ds = rd.read_parquet(f"{SF}/orders.parquet",
                         columns=["o_orderkey", "o_orderstatus"])
    got = sorted(stratified_sample(ds, "o_orderkey", "o_orderstatus",
                                   fracs)
                 .to_pandas()["o_orderkey"].tolist())
    assert got == want and len(got) > 0


def test_default_frac_drops_unknown_strata(ray_session):
    df = pd.DataFrame({"k": np.arange(100, dtype=np.int64),
                       "s": ["a"] * 50 + ["zzz"] * 50})
    out = stratified_sample(rd.from_pandas(df), "k", "s",
                            {"a": 1.0}).to_pandas()
    assert set(out["s"]) == {"a"} and len(out) == 50


def test_edge_fractions(ray_session):
    df = pd.DataFrame({"k": np.arange(200, dtype=np.int64)})
    assert hash_sample(rd.from_pandas(df), "k", 0.0).count() == 0
    assert hash_sample(rd.from_pandas(df), "k", 1.0).count() == 200
    with pytest.raises(ValueError):
        hash_threshold(1.5)


def test_partition_invariance(ray_session):
    df = pd.DataFrame({"k": np.arange(5000, dtype=np.int64)})
    sets = []
    for b in (1, 13):
        out = hash_sample(rd.from_pandas(df, override_num_blocks=b),
                          "k", 0.3).to_pandas()
        sets.append(frozenset(out["k"].tolist()))
    assert sets[0] == sets[1]
    # binomial expectation sanity: within 5 sigma of 1500
    n = len(sets[0])
    assert abs(n - 1500) < 5 * np.sqrt(5000 * 0.3 * 0.7)


def test_weighted_sample_sql_parity(ray_session):
    from cerberus_ray.pipelines.sampling import (weighted_sample_sql,
                                                 weighted_sample_topk)

    con = duckdb.connect()
    con.execute(f"CREATE VIEW orders AS SELECT * FROM "
                f"read_parquet('{SF}/orders.parquet')")
    want = con.execute(weighted_sample_sql(
        "orders", "o_orderkey", "o_totalprice", 50)).fetchdf()
    ds = rd.read_parquet(f"{SF}/orders.parquet",
                         columns=["o_orderkey", "o_totalprice"])
    got = weighted_sample_topk(ds, "o_orderkey", "o_totalprice", 50)
    assert got["o_orderkey"].tolist() == want["o_orderkey"].tolist()
    np.testing.assert_allclose(got["score"].to_numpy(),
                               want["score"].to_numpy(), rtol=1e-12)


def test_weighted_sample_partition_invariance(ray_session):
    from cerberus_ray.pipelines.sampling import weighted_sample_topk

    rng = np.random.default_rng(31)
    df = pd.DataFrame({"k": np.arange(3000, dtype=np.int64),
                       "w": rng.uniform(0.1, 10.0, 3000)})
    outs = [weighted_sample_topk(rd.from_pandas(df, override_num_blocks=b),
                                 "k", "w", 40)
            for b in (1, 11)]
    pd.testing.assert_frame_equal(outs[0], outs[1])
    # weight bias sanity: selected mean weight ≫ population mean
    assert outs[0]["w"].mean() > df["w"].mean()


def test_weighted_sample_excludes_nonpositive(ray_session):
    from cerberus_ray.pipelines.sampling import weighted_sample_topk

    df = pd.DataFrame({"k": [1, 2, 3, 4], "w": [1.0, 0.0, -2.0, 3.0]})
    out = weighted_sample_topk(rd.from_pandas(df), "k", "w", 10)
    assert set(out["k"]) == {1, 4}
    with pytest.raises(ValueError):
        weighted_sample_topk(rd.from_pandas(df), "k", "w", 0)


def test_hash_matches_sql_formula():
    ks = np.array([0, 1, 2, 12345, 2**31, 2**32 - 1, 2**40 + 17],
                  dtype=np.int64)
    h = key_hash_u32(ks)
    want = [((int(k) % 2**32) * 2654435761) % 2**32 for k in ks]
    assert h.tolist() == want
