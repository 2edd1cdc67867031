"""Information-theory stage: DuckDB parity for MI / grouped entropy /
CMH on the sf0.001 tables, closed-form sanity cases, null semantics,
multi-block invariance."""

import duckdb
import numpy as np
import pandas as pd
import ray.data as rd

from cerberus_ray.sources.io import read_table
from cerberus_ray.stages.infotheory import (cmh_odds, grouped_entropy,
                                            mutual_information)

SF = "/root/testdata/sf0.001"


def test_mi_duckdb_parity(ray_session):
    ds = read_table(f"{SF}/documents.parquet", columns=["lang", "source"])
    got = mutual_information(ds, "lang", "source").iloc[0]
    con = duckdb.connect()
    want = con.execute(f"""
        WITH j AS (SELECT lang a, source b, COUNT(*)::DOUBLE n
                   FROM read_parquet('{SF}/documents.parquet')
                   WHERE lang IS NOT NULL AND source IS NOT NULL
                   GROUP BY 1, 2),
        m AS (SELECT n, SUM(n) OVER (PARTITION BY a) na,
                     SUM(n) OVER (PARTITION BY b) nb,
                     SUM(n) OVER () tot FROM j)
        SELECT SUM(n / tot * LN(n * tot / (na * nb))) AS mi,
               -SUM(n / tot * LN(n / tot)) AS h_ab,
               CAST(SUM(n) AS BIGINT) AS n
        FROM m""").df().iloc[0]
    assert got["n"] == want["n"]
    np.testing.assert_allclose(got["mi"], want["mi"], atol=1e-9)
    np.testing.assert_allclose(got["h_ab"], want["h_ab"], atol=1e-9)
    # identities: MI = H(a)+H(b)−H(ab); 0 ≤ MI ≤ min(H(a), H(b))
    assert abs(got["h_a"] + got["h_b"] - got["h_ab"] - got["mi"]) < 1e-12
    assert -1e-12 <= got["mi"] <= min(got["h_a"], got["h_b"]) + 1e-12
    con.close()


def test_mi_extremes(ray_session):
    # deterministic copy → MI = H(a), NMI = 1; independence → MI ≈ 0
    a = np.repeat(["x", "y", "z"], 40)
    ds = rd.from_pandas(pd.DataFrame({"a": a, "b": a}),
                        override_num_blocks=4)
    r = mutual_information(ds, "a", "b").iloc[0]
    np.testing.assert_allclose(r["mi"], r["h_a"], atol=1e-12)
    np.testing.assert_allclose(r["nmi"], 1.0, atol=1e-12)

    # exactly balanced cross-product → MI = 0
    aa, bb = np.meshgrid(["x", "y"], ["u", "v", "w"])
    ds2 = rd.from_pandas(pd.DataFrame({
        "a": np.tile(aa.ravel(), 10), "b": np.tile(bb.ravel(), 10)}),
        override_num_blocks=3)
    r2 = mutual_information(ds2, "a", "b").iloc[0]
    np.testing.assert_allclose(r2["mi"], 0.0, atol=1e-12)
    np.testing.assert_allclose(r2["nmi"], 0.0, atol=1e-12)


def test_mi_null_rows_dropped(ray_session):
    df = pd.DataFrame({"a": ["x", "x", None, "y"],
                       "b": ["u", None, "u", "v"]})
    r = mutual_information(rd.from_pandas(df), "a", "b").iloc[0]
    assert r["n"] == 2  # only complete rows count


def test_grouped_entropy_duckdb_parity(ray_session):
    ds = read_table(f"{SF}/documents.parquet", columns=["lang", "source"])
    got = grouped_entropy(ds, "source", "lang")
    con = duckdb.connect()
    want = con.execute(f"""
        WITH j AS (SELECT source, lang, COUNT(*)::DOUBLE n
                   FROM read_parquet('{SF}/documents.parquet')
                   GROUP BY 1, 2),
        m AS (SELECT source, n, SUM(n) OVER (PARTITION BY source) tot
              FROM j)
        SELECT source, CAST(SUM(n) AS BIGINT) AS n,
               CAST(COUNT(*) AS BIGINT) AS n_levels,
               -SUM(n / tot * LN(n / tot)) AS entropy
        FROM m GROUP BY source ORDER BY source""").df()
    assert list(got["source"]) == list(want["source"])
    np.testing.assert_array_equal(got["n"], want["n"])
    np.testing.assert_array_equal(got["n_levels"], want["n_levels"])
    np.testing.assert_allclose(got["entropy"], want["entropy"],
                               atol=1e-9)
    # normalization bounds
    assert ((got["norm_entropy"] >= -1e-12)
            & (got["norm_entropy"] <= 1 + 1e-12)).all()
    con.close()


def test_grouped_entropy_degenerate(ray_session):
    df = pd.DataFrame({"g": ["a", "a", "b"], "v": ["one", "one", "solo"]})
    got = grouped_entropy(rd.from_pandas(df), "g", "v")
    assert list(got["entropy"]) == [0.0, 0.0]
    assert list(got["norm_entropy"]) == [0.0, 0.0]


def _cmh_reference(df: pd.DataFrame) -> dict:
    """Textbook CMH from per-stratum 2×2 counts (pandas reference)."""
    num = den = asum = esum = vsum = 0.0
    for _, s in df.groupby("k"):
        a = len(s[s.e & s.o])
        b = len(s[s.e & ~s.o])
        c = len(s[~s.e & s.o])
        d = len(s[~s.e & ~s.o])
        n = a + b + c + d
        num += a * d / n
        den += b * c / n
        asum += a
        esum += (a + b) * (a + c) / n
        if n > 1:
            vsum += ((a + b) * (c + d) * (a + c) * (b + d)
                     / (n * n * (n - 1)))
    return {"or_cmh": num / den,
            "chi2": (abs(asum - esum) - 0.5) ** 2 / vsum}


def test_cmh_reference_parity(ray_session):
    rng = np.random.default_rng(7)
    n = 4000
    k = rng.integers(0, 5, n)
    e = rng.random(n) < 0.3 + 0.1 * k / 4
    o = rng.random(n) < 0.2 + 0.15 * e + 0.08 * k / 4
    df = pd.DataFrame({"k": k.astype(str), "e": e, "o": o})
    got = cmh_odds(rd.from_pandas(df, override_num_blocks=5),
                   "k", "e", "o").iloc[0]
    want = _cmh_reference(df)
    np.testing.assert_allclose(got["or_cmh"], want["or_cmh"], atol=1e-12)
    np.testing.assert_allclose(got["chi2_cmh"], want["chi2"], atol=1e-10)
    assert got["n"] == n and got["n_strata"] == 5


def test_cmh_confounding_direction(ray_session):
    # construct: within every stratum OR = 1 (no effect), but exposure
    # and outcome both track the stratum → pooled OR > 1, CMH ≈ 1
    rows = []
    for k, (pe, po, n) in enumerate([(0.8, 0.8, 2000), (0.2, 0.2, 2000)]):
        rng = np.random.default_rng(k)
        e = rng.random(n) < pe
        o = rng.random(n) < po  # independent of e within stratum
        rows.append(pd.DataFrame({"k": str(k), "e": e, "o": o}))
    df = pd.concat(rows, ignore_index=True)
    got = cmh_odds(rd.from_pandas(df, override_num_blocks=4),
                   "k", "e", "o").iloc[0]
    assert got["or_pooled"] > 1.5       # confounded crude estimate
    assert 0.8 < got["or_cmh"] < 1.25   # stratified estimate ≈ null


def test_cmh_duckdb_parity_on_events(ray_session):
    from cerberus_ray.pipelines.training_queries import q_cmh_report

    got = q_cmh_report(SF).to_pandas().iloc[0]
    con = duckdb.connect()
    want = con.execute(f"""
        WITH f AS (SELECT event_type k, user_id % 2 = 0 AS e,
                          value > 50 AS o
                   FROM read_parquet('{SF}/events.parquet')),
        t AS (SELECT k,
                SUM(CASE WHEN e AND o THEN 1 ELSE 0 END)::DOUBLE a,
                SUM(CASE WHEN e AND NOT o THEN 1 ELSE 0 END)::DOUBLE b,
                SUM(CASE WHEN NOT e AND o THEN 1 ELSE 0 END)::DOUBLE c,
                SUM(CASE WHEN NOT e AND NOT o THEN 1 ELSE 0 END)::DOUBLE d
              FROM f GROUP BY k)
        SELECT SUM(a * d / (a+b+c+d)) / SUM(b * c / (a+b+c+d)) AS or_cmh,
               CAST(SUM(a+b+c+d) AS BIGINT) AS n
        FROM t""").df().iloc[0]
    np.testing.assert_allclose(got["or_cmh"], want["or_cmh"], atol=1e-9)
    assert got["n"] == want["n"]
    con.close()


def test_block_layout_invariance(ray_session):
    df = pd.DataFrame({"a": np.repeat(list("abcd"), 25),
                       "b": np.tile(list("uv"), 50)})
    r1 = mutual_information(rd.from_pandas(df, override_num_blocks=1),
                            "a", "b")
    r8 = mutual_information(rd.from_pandas(df, override_num_blocks=8),
                            "a", "b")
    pd.testing.assert_frame_equal(r1, r8)
