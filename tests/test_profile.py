"""Profiling discovery: DuckDB parity for inclusion dependencies (FK
discovery) on real testdata relationships and for candidate-key mining,
NULL semantics, shuffle-mode agreement."""

import duckdb
import numpy as np
import pandas as pd
import ray.data as rd

from cerberus_ray.sources.io import read_table
from cerberus_ray.stages.profile import (MASK_COMPRESS_STEPS, MASK_STEPS,
                                         candidate_key_profile,
                                         fd_profile, inclusion_profile,
                                         inclusion_sketch_profile,
                                         pattern_profile)

SF = "/root/testdata/sf0.001"


def test_fk_discovery_on_testdata(ray_session):
    orders = read_table(f"{SF}/orders.parquet",
                        columns=["o_custkey", "o_orderkey"])
    customer = read_table(f"{SF}/customer.parquet",
                          columns=["c_custkey", "c_nationkey"])
    nation = read_table(f"{SF}/nation.parquet", columns=["n_nationkey"])
    got = inclusion_profile([
        ("orders.custkey⊆customer", orders, "o_custkey",
         customer, "c_custkey"),
        ("customer.nationkey⊆nation", customer, "c_nationkey",
         nation, "n_nationkey"),
        ("customer.custkey⊆orders", customer, "c_custkey",
         orders, "o_custkey"),
    ])
    con = duckdb.connect()
    for t in ("orders", "customer", "nation"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{SF}/{t}.parquet')")
    want_miss = con.execute(
        "SELECT COUNT(*) FROM (SELECT DISTINCT c_custkey FROM customer "
        "EXCEPT SELECT DISTINCT o_custkey FROM orders)").fetchone()[0]
    want_na = con.execute(
        "SELECT COUNT(DISTINCT c_custkey) FROM customer").fetchone()[0]
    g = got.set_index("pair")
    # generated FKs hold by construction
    assert bool(g.loc["orders.custkey⊆customer", "is_subset"])
    assert bool(g.loc["customer.nationkey⊆nation", "is_subset"])
    assert g.loc["orders.custkey⊆customer", "containment"] == 1.0
    # reverse direction: whatever DuckDB says (customer coverage of
    # orders is a data property, not a generator guarantee)
    rev = g.loc["customer.custkey⊆orders"]
    assert rev["n_missing"] == want_miss
    assert rev["n_distinct_a"] == want_na
    np.testing.assert_allclose(rev["containment"],
                               1 - want_miss / want_na, atol=1e-6)
    assert bool(rev["is_subset"]) == (want_miss == 0)
    con.close()


def test_fk_discovery_negative_direction(ray_session):
    # synthetic: half of A's keys are absent from B
    a = pd.DataFrame({"x": np.arange(100)})
    b = pd.DataFrame({"y": np.arange(0, 100, 2)})
    got = inclusion_profile(
        [("p", rd.from_pandas(a, override_num_blocks=3), "x",
          rd.from_pandas(b), "y")]).iloc[0]
    assert got["n_missing"] == 50
    assert got["containment"] == 0.5
    assert not bool(got["is_subset"])


def test_null_counts_as_missing(ray_session):
    a = pd.DataFrame({"x": [1, 2, 2, None]})
    b = pd.DataFrame({"y": [1, 2, 3]})
    got = inclusion_profile(
        [("p", rd.from_pandas(a), "x", rd.from_pandas(b), "y")])
    r = got.iloc[0]
    assert r["n_distinct_a"] == 3          # 1, 2, NULL
    assert r["n_missing"] == 1             # the NULL
    assert not bool(r["is_subset"])


def test_candidate_keys_on_testdata(ray_session):
    orders = read_table(f"{SF}/orders.parquet",
                        columns=["o_orderkey", "o_custkey",
                                 "o_orderstatus"])
    got = candidate_key_profile(
        orders, [["o_orderkey"], ["o_custkey"],
                 ["o_custkey", "o_orderstatus"]]).set_index("key")
    con = duckdb.connect()
    con.execute(f"CREATE VIEW orders AS SELECT * FROM "
                f"read_parquet('{SF}/orders.parquet')")
    n = con.execute("SELECT COUNT(*) FROM orders").fetchone()[0]
    for key, cols in [("o_orderkey", "o_orderkey"),
                      ("o_custkey", "o_custkey"),
                      ("o_custkey+o_orderstatus",
                       "o_custkey, o_orderstatus")]:
        nd, ndup = con.execute(
            f"SELECT COUNT(*), COUNT(*) FILTER (n > 1) FROM ("
            f"SELECT COUNT(*) AS n FROM orders GROUP BY {cols})"
        ).fetchone()
        assert got.loc[key, "n_distinct"] == nd, key
        assert got.loc[key, "n_dup_keys"] == ndup, key
        assert got.loc[key, "n_rows"] == n
        assert bool(got.loc[key, "is_key"]) == (nd == n)
    assert bool(got.loc["o_orderkey", "is_key"])
    assert not bool(got.loc["o_custkey", "is_key"])
    con.close()


def test_fd_profile_duckdb_parity(ray_session):
    orders = read_table(f"{SF}/orders.parquet",
                        columns=["o_custkey", "o_orderstatus",
                                 "o_orderpriority"])
    got = fd_profile(orders, [(["o_custkey"], "o_orderstatus"),
                              (["o_orderstatus"], "o_orderpriority")]
                     ).set_index("fd")
    con = duckdb.connect()
    con.execute(f"CREATE VIEW orders AS SELECT * FROM "
                f"read_parquet('{SF}/orders.parquet')")
    for fd, det, dep in [("o_custkey->o_orderstatus",
                          "o_custkey", "o_orderstatus"),
                         ("o_orderstatus->o_orderpriority",
                          "o_orderstatus", "o_orderpriority")]:
        nd, nv, mx = con.execute(
            # testdata columns are non-null, so COUNT(DISTINCT) matches
            # the engine's NULL-counts-as-a-value convention here
            f"SELECT COUNT(*), COUNT(*) FILTER (c > 1), MAX(c) FROM ("
            f"SELECT {det}, COUNT(DISTINCT {dep}) AS c FROM orders "
            f"GROUP BY {det})").fetchone()
        assert got.loc[fd, "n_det"] == nd, fd
        assert got.loc[fd, "n_violating_det"] == nv, fd
        assert got.loc[fd, "max_dep_per_det"] == mx, fd
        assert bool(got.loc[fd, "fd_holds"]) == (nv == 0), fd
    con.close()


def test_fd_holds_on_pk(ray_session):
    customer = read_table(f"{SF}/customer.parquet",
                          columns=["c_custkey", "c_nationkey"])
    got = fd_profile(customer, [(["c_custkey"], "c_nationkey")]).iloc[0]
    assert bool(got["fd_holds"]) and got["max_dep_per_det"] == 1


def test_fd_null_is_a_value(ray_session):
    df = pd.DataFrame({"d": [1, 1, 2, 2, 3],
                       "v": ["x", None, None, None, "y"]})
    got = fd_profile(rd.from_pandas(df, override_num_blocks=2),
                     [(["d"], "v")]).iloc[0]
    # det 1 maps to {x, NULL} → violation; det 2 maps to {NULL} → holds
    assert got["n_det"] == 3
    assert got["n_violating_det"] == 1
    assert got["max_dep_per_det"] == 2
    assert not bool(got["fd_holds"])


def test_fd_mode_agreement(ray_session):
    rng = np.random.default_rng(7)
    df = pd.DataFrame({"d": rng.integers(0, 200, 5000),
                       "v": rng.integers(0, 5, 5000)})
    ds = rd.from_pandas(df, override_num_blocks=4)
    cand = [(["d"], "v")]
    pd.testing.assert_frame_equal(fd_profile(ds, cand, mode="driver"),
                                  fd_profile(ds, cand, mode="shuffle"))


def _mask_sql(col: str, compress: bool) -> str:
    expr = f"CAST({col} AS VARCHAR)"
    steps = MASK_STEPS + (MASK_COMPRESS_STEPS if compress else ())
    for pat, rep in steps:
        expr = f"regexp_replace({expr}, '{pat}', '{rep}', 'g')"
    return expr


def test_pattern_profile_duckdb_parity(ray_session):
    customer = read_table(f"{SF}/customer.parquet",
                          columns=["c_name", "c_mktsegment"])
    got = pattern_profile(customer, ["c_name", "c_mktsegment"],
                          top_k=1000)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW customer AS SELECT * FROM "
                f"read_parquet('{SF}/customer.parquet')")
    for col in ["c_name", "c_mktsegment"]:
        want = con.execute(
            f"SELECT {_mask_sql(col, True)} AS mask, COUNT(*) AS n "
            f"FROM customer GROUP BY 1 ORDER BY n DESC, mask"
        ).df()
        sub = got[got["column"] == col].reset_index(drop=True)
        assert list(sub["mask"]) == list(want["mask"]), col
        assert list(sub["n"]) == list(want["n"]), col
        np.testing.assert_allclose(sub["frac"],
                                   want["n"] / want["n"].sum(),
                                   atol=1e-6)
    con.close()


def test_pattern_profile_shapes(ray_session):
    df = pd.DataFrame({"s": ["AB-12", "cd_34", "AB-99", None,
                             "Customer#0001"]})
    raw = pattern_profile(rd.from_pandas(df), ["s"], compress=False)
    cmp_ = pattern_profile(rd.from_pandas(df), ["s"], compress=True)
    assert set(raw["mask"].dropna()) == {"AA-99", "aa_99", "Aaaaaaaa#9999"}
    assert set(cmp_["mask"].dropna()) == {"A-9", "a_9", "Aa#9"}
    # NULL value profiles as NULL mask with its own count
    assert int(raw.loc[raw["mask"].isna(), "n"].iloc[0]) == 1
    assert int(cmp_.loc[cmp_["mask"] == "A-9", "n"].iloc[0]) == 2


def test_kmv_sketch_exact_band_matches_exact_profiler(ray_session):
    # testdata distinct counts fit in k → the sketch path must agree
    # with the exact profiler to rounding (NULL-free columns here, so
    # the NULL-semantics asymmetry is moot)
    orders = read_table(f"{SF}/orders.parquet", columns=["o_custkey"])
    customer = read_table(f"{SF}/customer.parquet",
                          columns=["c_custkey"])
    cand_x = [("fk", orders, "o_custkey", customer, "c_custkey"),
              ("rev", customer, "c_custkey", orders, "o_custkey")]
    exact = inclusion_profile(cand_x).set_index("pair")
    approx = inclusion_sketch_profile(cand_x).set_index("pair")
    assert approx["exact"].all()
    for p in ["fk", "rev"]:
        assert approx.loc[p, "est_distinct_a"] == \
            exact.loc[p, "n_distinct_a"]
        np.testing.assert_allclose(approx.loc[p, "est_containment"],
                                   exact.loc[p, "containment"],
                                   atol=1e-6)


def test_kmv_sketch_estimation_band(ray_session):
    # 60k distinct vs k=1024 → estimation band; true containment 0.5
    rng = np.random.default_rng(5)
    a = pd.DataFrame({"x": rng.permutation(60_000)})
    b = pd.DataFrame({"y": rng.permutation(60_000) * 2})  # evens only
    got = inclusion_sketch_profile(
        [("p", rd.from_pandas(a, override_num_blocks=4), "x",
          rd.from_pandas(b), "y")], k=1024).iloc[0]
    assert not bool(got["exact"])
    np.testing.assert_allclose(got["est_distinct_a"], 60_000, rtol=0.1)
    np.testing.assert_allclose(got["est_containment"], 0.5, atol=0.1)


def test_kmv_sketch_subset_estimates_high(ray_session):
    # A ⊆ B in the estimation band → containment estimate ≈ 1
    a = pd.DataFrame({"x": np.arange(30_000)})
    b = pd.DataFrame({"y": np.arange(90_000)})
    got = inclusion_sketch_profile(
        [("p", rd.from_pandas(a), "x", rd.from_pandas(b), "y")],
        k=512).iloc[0]
    assert got["est_containment"] > 0.9


def test_fd_violations_duckdb_parity(ray_session):
    from cerberus_ray.stages.profile import fd_violations

    orders = read_table(f"{SF}/orders.parquet",
                        columns=["o_custkey", "o_orderstatus"])
    got = fd_violations(orders, ["o_custkey"], "o_orderstatus",
                        top_k=10**9)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW orders AS SELECT * FROM "
                f"read_parquet('{SF}/orders.parquet')")
    want = con.execute("""
        WITH pc AS (SELECT o_custkey AS k, o_orderstatus AS v,
                           CAST(COUNT(*) AS BIGINT) AS c
                    FROM orders GROUP BY 1, 2),
        agg AS (SELECT k, CAST(COUNT(*) AS BIGINT) AS ndv,
                       CAST(SUM(c) AS BIGINT) AS n,
                       ANY_VALUE(t1) AS dep_top1,
                       ANY_VALUE(c1) AS n_top1
                FROM (SELECT *, FIRST_VALUE(v) OVER w AS t1,
                             FIRST_VALUE(c) OVER w AS c1
                      FROM pc WINDOW w AS (PARTITION BY k
                        ORDER BY c DESC, v))
                GROUP BY k HAVING COUNT(*) > 1)
        SELECT * FROM agg ORDER BY ndv DESC, n DESC, k""").df()
    assert len(got) == len(want)
    np.testing.assert_array_equal(got["o_custkey"], want["k"])
    np.testing.assert_array_equal(got["n_dep_values"], want["ndv"])
    np.testing.assert_array_equal(got["n_rows"], want["n"])
    np.testing.assert_array_equal(got["dep_top1"], want["dep_top1"])
    np.testing.assert_array_equal(got["n_top1"], want["n_top1"])
    con.close()


def test_fd_violations_hand_and_modes(ray_session):
    from cerberus_ray.stages.profile import fd_violations

    df = pd.DataFrame({
        "d": [1, 1, 1, 2, 2, 3],
        "v": ["a", "a", "b", "c", "c", "d"]})
    ds = rd.from_pandas(df, override_num_blocks=2)
    got = fd_violations(ds, ["d"], "v")
    assert len(got) == 1                      # only det 1 violates
    r = got.iloc[0]
    assert r["d"] == 1 and r["n_dep_values"] == 2 and r["n_rows"] == 3
    assert r["dep_top1"] == "a" and r["n_top1"] == 2
    assert r["dep_top2"] == "b" and r["n_top2"] == 1
    drv = fd_violations(ds, ["d"], "v", mode="driver")
    shf = fd_violations(ds, ["d"], "v", mode="shuffle")
    pd.testing.assert_frame_equal(drv, shf, check_dtype=False)


def test_join_size_estimate_brackets_exact(ray_session):
    from cerberus_ray.stages.profile import join_size_profile

    orders = read_table(f"{SF}/orders.parquet",
                        columns=["o_custkey", "o_orderkey"])
    customer = read_table(f"{SF}/customer.parquet",
                          columns=["c_custkey"])
    lineitem = read_table(f"{SF}/lineitem.parquet",
                          columns=["l_orderkey"])
    got = join_size_profile([
        ("oc", orders, "o_custkey", customer, "c_custkey"),
        ("lo", lineitem, "l_orderkey", orders, "o_orderkey"),
    ]).set_index("pair")
    con = duckdb.connect()
    for t in ("orders", "customer", "lineitem"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{SF}/{t}.parquet')")
    true_oc = con.execute(
        "SELECT COUNT(*) FROM orders JOIN customer "
        "ON o_custkey = c_custkey").fetchone()[0]
    true_lo = con.execute(
        "SELECT COUNT(*) FROM lineitem JOIN orders "
        "ON l_orderkey = o_orderkey").fetchone()[0]
    for pair, true in [("oc", true_oc), ("lo", true_lo)]:
        r = got.loc[pair]
        # one-sided: never undercounts, and within the CM bound
        assert true <= r["est_join_rows"] <= true + r["error_bound"], \
            pair
        # collision cross-terms add ≈ n_a·n_b/width per row — at these
        # cardinalities that's <10% over; assert a sane relative band
        assert r["est_join_rows"] <= true * 1.2, pair
    con.close()


def test_join_size_layout_invariance(ray_session):
    from cerberus_ray.stages.profile import join_size_profile

    rng = np.random.default_rng(17)
    a = pd.DataFrame({"x": rng.integers(0, 100, 3000)})
    b = pd.DataFrame({"y": rng.integers(50, 150, 2000)})
    one = join_size_profile(
        [("p", rd.from_pandas(a, override_num_blocks=1), "x",
          rd.from_pandas(b, override_num_blocks=1), "y")])
    many = join_size_profile(
        [("p", rd.from_pandas(a, override_num_blocks=7), "x",
          rd.from_pandas(b, override_num_blocks=5), "y")])
    pd.testing.assert_frame_equal(one, many)  # merge = add ⇒ invariant


def test_mode_agreement(ray_session):
    rng = np.random.default_rng(2)
    a = pd.DataFrame({"x": rng.integers(0, 500, 3000)})
    b = pd.DataFrame({"y": rng.integers(200, 600, 3000)})
    dsa, dsb = rd.from_pandas(a, override_num_blocks=4), rd.from_pandas(b)
    p_drv = inclusion_profile([("p", dsa, "x", dsb, "y")], mode="driver")
    p_shf = inclusion_profile([("p", dsa, "x", dsb, "y")], mode="shuffle")
    pd.testing.assert_frame_equal(p_drv, p_shf)
    k_drv = candidate_key_profile(dsa, [["x"]], mode="driver")
    k_shf = candidate_key_profile(dsa, [["x"]], mode="shuffle")
    pd.testing.assert_frame_equal(k_drv, k_shf)


def test_fd_repair_majority_and_idempotence(ray_session):
    """Majority-vote FD repair: violating determinants rewrite to
    their most frequent dependent (ties → smallest), the repair log
    lists exactly the changed rows, and re-checking the repaired
    dataset finds zero FD violations. Driver ≡ shuffle."""
    import ray.data as rd

    from cerberus_ray.stages.profile import fd_repair, fd_violations

    rows = []
    for i in range(60):
        det = f"g{i % 6}"
        dep = "major"
        if det == "g2" and i < 18:
            dep = "minor"                 # g2: 3 minor vs 7 major
        rows.append({"doc_id": f"r{i:03d}", "det": det, "dep": dep})
    df = pd.DataFrame(rows)
    counts = df[df["det"] == "g2"]["dep"].value_counts()
    assert counts["major"] > counts["minor"]
    ds = rd.from_pandas(df, override_num_blocks=4).materialize()
    repaired, log = fd_repair(ds, ["det"], "dep", key_col="doc_id",
                              mode="driver")
    rp = repaired.to_pandas()
    # every g2 row now holds the majority value
    assert (rp[rp["det"] == "g2"]["dep"] == "major").all()
    # other groups untouched
    assert (rp[rp["det"] != "g2"]["dep"] == "major").all()
    # the log lists exactly the rewritten rows
    assert len(log) == int(counts["minor"])
    assert (log["old"] == "minor").all() and (log["new"]
                                              == "major").all()
    # idempotent: the repaired table has no FD violations left
    rds = rd.from_pandas(rp).materialize()
    assert len(fd_violations(rds, ["det"], "dep", mode="driver")) == 0
    # shuffle mode agrees
    rep2, log2 = fd_repair(ds, ["det"], "dep", key_col="doc_id",
                           mode="shuffle")
    pd.testing.assert_frame_equal(
        rep2.to_pandas().sort_values("doc_id").reset_index(drop=True),
        rp.sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(log2, log)


def test_fd_repair_tie_breaks_smallest_and_guard(ray_session):
    import ray.data as rd

    from cerberus_ray.stages.profile import fd_repair

    df = pd.DataFrame({
        "doc_id": ["a", "b", "c", "d"],
        "det": ["g", "g", "g", "g"],
        "dep": ["zz", "zz", "aa", "aa"]})   # 2-2 tie → 'aa' kept
    ds = rd.from_pandas(df).materialize()
    repaired, log = fd_repair(ds, ["det"], "dep")
    assert set(repaired.to_pandas()["dep"]) == {"aa"}
    assert sorted(log["key"]) == ["a", "b"]
    import pytest as _pt
    with _pt.raises(ValueError):
        fd_repair(ds, ["det"], "dep", mode="bogus")


def test_fd_repair_integer_determinants_string_sort_regression(
        ray_session):
    """Numeric determinants: the broadcast map must sort by the
    composite STRING key (int order '99' < '100' diverges from string
    order) — all 101 violating groups repair, none missed."""
    import ray.data as rd

    from cerberus_ray.stages.profile import fd_repair, fd_violations

    rows = []
    for det in range(1, 102):            # spans 1..101: '100' < '99'
        for j in range(3):
            rows.append({"doc_id": f"r{det}_{j}", "det": det,
                         "dep": "maj" if j < 2 else "min"})
    df = pd.DataFrame(rows)
    ds = rd.from_pandas(df, override_num_blocks=5).materialize()
    repaired, log = fd_repair(ds, ["det"], "dep")
    assert len(log) == 101               # one 'min' per group
    rds = rd.from_pandas(repaired.to_pandas()).materialize()
    assert len(fd_violations(rds, ["det"], "dep",
                             top_k=1000)) == 0


def test_relationship_profile_classes_and_duckdb_parity(ray_session):
    """orders.o_custkey → customer.c_custkey is N:1 with zero orphans;
    the fanout maxima match DuckDB; planted frames cover 1:1, 1:N,
    N:M, orphans and NULL fks."""
    import duckdb
    import ray.data as rd

    from cerberus_ray.sources.io import read_table
    from cerberus_ray.stages.profile import relationship_profile

    sf = "/root/testdata/sf0.001"
    orders = read_table(f"{sf}/orders.parquet",
                        columns=["o_orderkey", "o_custkey"])
    cust = read_table(f"{sf}/customer.parquet", columns=["c_custkey"])
    p = relationship_profile(orders, "o_custkey", cust, "c_custkey")
    con = duckdb.connect()
    exp_fan = con.execute(
        f"SELECT MAX(n) FROM (SELECT COUNT(*) n FROM "
        f"read_parquet('{sf}/orders.parquet') GROUP BY o_custkey)"
    ).fetchone()[0]
    assert p["class"] == "N:1"
    assert p["max_children_per_parent"] == int(exp_fan)
    assert p["max_rows_per_parent_key"] == 1
    assert p["n_orphans"] == 0 and p["n_null_fk"] == 0

    def rel(child, parent):
        c = rd.from_pandas(pd.DataFrame(child)).materialize()
        pr = rd.from_pandas(pd.DataFrame(parent)).materialize()
        return relationship_profile(c, "fk", pr, "pk")

    one2one = rel({"fk": [1, 2, 3]}, {"pk": [1, 2, 3, 4]})
    assert one2one["class"] == "1:1"
    one2n = rel({"fk": [1, 2]}, {"pk": [1, 1, 2]})
    assert one2n["class"] == "1:N"
    n2m = rel({"fk": [1, 1, 2]}, {"pk": [1, 1, 2]})
    assert n2m["class"] == "N:M"
    orphaned = rel({"fk": [1, 9, None]}, {"pk": [1, 2]})
    assert orphaned["n_orphans"] == 1       # the 9; NULL never counts
    assert orphaned["n_null_fk"] == 1
    import pytest as _pt
    with _pt.raises(ValueError):
        relationship_profile(
            rd.from_pandas(pd.DataFrame({"fk": [1]})),
            "fk", rd.from_pandas(pd.DataFrame({"pk": [1]})), "pk",
            mode="bogus")
