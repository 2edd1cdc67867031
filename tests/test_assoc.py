"""Association rules: DuckDB self-join parity on lineitem baskets,
hand-worked example, cap semantics, multi-block determinism."""

import duckdb
import numpy as np
import pandas as pd
import ray.data as rd

from cerberus_ray.sources.io import read_table
from cerberus_ray.stages.assoc import association_rules

SF = "/root/testdata/sf0.001"


def test_duckdb_parity_on_lineitem(ray_session):
    li = read_table(f"{SF}/lineitem.parquet",
                    columns=["l_orderkey", "l_partkey"])
    got = association_rules(li, "l_orderkey", "l_partkey",
                            min_pair_n=1, top_k=10**9)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW lineitem AS SELECT * FROM "
                f"read_parquet('{SF}/lineitem.parquet')")
    want = con.execute("""
        WITH d AS (SELECT DISTINCT l_orderkey AS b, l_partkey AS i
                   FROM lineitem),
        pairs AS (SELECT x.i AS a, y.i AS c,
                         CAST(COUNT(*) AS BIGINT) AS n
                  FROM d x JOIN d y ON x.b = y.b AND x.i < y.i
                  GROUP BY 1, 2),
        items AS (SELECT i, CAST(COUNT(*) AS BIGINT) AS n
                  FROM d GROUP BY 1),
        nb AS (SELECT COUNT(DISTINCT b) AS n FROM d)
        SELECT p.a, p.c, p.n,
               ia.n AS na, ic.n AS nc, nb.n AS nbask
        FROM pairs p, items ia, items ic, nb
        WHERE ia.i = p.a AND ic.i = p.c""").df()
    # both directions of every DuckDB pair, keyed lookup
    g = got.set_index(["antecedent", "consequent"])
    assert len(got) == 2 * len(want)
    for r in want.itertuples():
        for a, c in [(r.a, r.c), (r.c, r.a)]:
            row = g.loc[(a, c)]
            assert row["n_pair"] == r.n
            assert row["n_antecedent"] == (r.na if a == r.a else r.nc)
            assert row["n_baskets"] == r.nbask
            np.testing.assert_allclose(
                row["lift"], r.n * r.nbask / (r.na * r.nc), atol=1e-5)
    assert (got["n_capped"] == 0).all()
    con.close()


def test_hand_worked_example(ray_session):
    # baskets: {A,B,C}, {A,B}, {B,C}, {A}  → n(A,B)=2, n(B,C)=2, n(A,C)=1
    df = pd.DataFrame({
        "b": [1, 1, 1, 2, 2, 3, 3, 4],
        "i": ["A", "B", "C", "A", "B", "B", "C", "A"]})
    got = association_rules(rd.from_pandas(df, override_num_blocks=2),
                            "b", "i", min_pair_n=2, top_k=100)
    g = got.set_index(["antecedent", "consequent"])
    assert ("A", "C") not in g.index          # below min_pair_n
    ab = g.loc[("A", "B")]
    assert ab["n_pair"] == 2 and ab["n_antecedent"] == 3
    np.testing.assert_allclose(ab["support"], 2 / 4, atol=1e-6)
    np.testing.assert_allclose(ab["confidence"], 2 / 3, atol=1e-6)
    np.testing.assert_allclose(ab["lift"], (2 * 4) / (3 * 3), atol=1e-6)
    ba = g.loc[("B", "A")]
    np.testing.assert_allclose(ba["confidence"], 2 / 3, atol=1e-6)
    np.testing.assert_allclose(ba["lift"], ab["lift"])   # symmetric
    # item-item CF similarities: n_ab/sqrt(na·nb), n_ab/(na+nb−n_ab)
    np.testing.assert_allclose(ab["cosine"], 2 / np.sqrt(9), atol=1e-6)
    np.testing.assert_allclose(ab["jaccard"], 2 / 4, atol=1e-6)
    np.testing.assert_allclose(ba["cosine"], ab["cosine"])
    np.testing.assert_allclose(ba["jaccard"], ab["jaccard"])


def test_mega_basket_cap(ray_session):
    # one 50-item basket over the cap is counted in n_capped and
    # contributes NO pairs/supports; the small baskets still mine
    big = pd.DataFrame({"b": 99, "i": [f"x{j}" for j in range(50)]})
    small = pd.DataFrame({"b": [1, 1, 2, 2], "i": ["A", "B", "A", "B"]})
    df = pd.concat([big, small], ignore_index=True)
    got = association_rules(rd.from_pandas(df), "b", "i",
                            min_pair_n=1, max_basket=10)
    assert (got["n_capped"] == 1).all()
    assert (got["n_baskets"] == 2).all()
    assert set(zip(got["antecedent"], got["consequent"])) == {
        ("A", "B"), ("B", "A")}
    assert (got["n_pair"] == 2).all()
    np.testing.assert_allclose(got["confidence"], 1.0)


def test_multiblock_determinism(ray_session):
    rng = np.random.default_rng(11)
    df = pd.DataFrame({"b": rng.integers(0, 300, 4000),
                       "i": rng.integers(0, 40, 4000)})
    a = association_rules(rd.from_pandas(df, override_num_blocks=1),
                          "b", "i", top_k=30)
    b = association_rules(rd.from_pandas(df, override_num_blocks=6),
                          "b", "i", top_k=30, n_buckets=7)
    pd.testing.assert_frame_equal(a, b)


def test_itemsets_duckdb_parity(ray_session):
    from cerberus_ray.stages.assoc import frequent_itemsets

    li = read_table(f"{SF}/lineitem.parquet",
                    columns=["l_orderkey", "l_partkey"])
    got = frequent_itemsets(li, "l_orderkey", "l_partkey", size=3,
                            min_n=1, top_k=10**9)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW lineitem AS SELECT * FROM "
                f"read_parquet('{SF}/lineitem.parquet')")
    want = con.execute("""
        WITH d AS (SELECT DISTINCT l_orderkey AS b, l_partkey AS i
                   FROM lineitem)
        SELECT CAST(x.i AS VARCHAR) || '+' || CAST(y.i AS VARCHAR)
                 || '+' || CAST(z.i AS VARCHAR) AS items,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM d x JOIN d y ON x.b = y.b AND x.i < y.i
                 JOIN d z ON y.b = z.b AND y.i < z.i
        GROUP BY 1, x.i, y.i, z.i
        ORDER BY n DESC, x.i, y.i, z.i""").df()
    assert len(got) == len(want)
    pd.testing.assert_frame_equal(got[["items", "n"]], want)
    assert (got["n_capped"] == 0).all()
    con.close()


def test_itemsets_hand_example(ray_session):
    from cerberus_ray.stages.assoc import frequent_itemsets

    df = pd.DataFrame({
        "b": [1, 1, 1, 1, 2, 2, 2, 3, 3],
        "i": ["A", "B", "C", "D", "A", "B", "C", "A", "B"]})
    got = frequent_itemsets(rd.from_pandas(df, override_num_blocks=2),
                            "b", "i", size=3, min_n=2)
    # A+B+C appears in baskets 1 and 2; all other triples once
    assert list(got["items"]) == ["A+B+C"]
    assert list(got["n"]) == [2]
    np.testing.assert_allclose(got["support"], 2 / 3, atol=1e-6)
    import pytest as _pytest
    with _pytest.raises(ValueError):
        frequent_itemsets(rd.from_pandas(df), "b", "i", size=1)


def test_itemsets_layout_invariance(ray_session):
    from cerberus_ray.stages.assoc import frequent_itemsets

    rng = np.random.default_rng(19)
    df = pd.DataFrame({"b": rng.integers(0, 200, 3000),
                       "i": rng.integers(0, 25, 3000)})
    a = frequent_itemsets(rd.from_pandas(df, override_num_blocks=1),
                          "b", "i", size=3, top_k=40)
    b = frequent_itemsets(rd.from_pandas(df, override_num_blocks=6),
                          "b", "i", size=3, top_k=40, n_buckets=7)
    pd.testing.assert_frame_equal(a, b)
