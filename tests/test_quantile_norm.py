"""Quantile normalization: integer-exact DuckDB parity for the census
mapping, identity/alignment closed forms, streamed apply guards."""

import duckdb
import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from cerberus_ray.sources.io import read_table
from cerberus_ray.stages.quantile_norm import (apply_quantile_map,
                                               quantile_normalize_map)

SF = "/root/testdata/sf0.001"


def test_mapping_duckdb_parity(ray_session):
    ev = read_table(f"{SF}/events.parquet",
                    columns=["event_type", "value"])
    got = quantile_normalize_map(ev, "event_type", "value")
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{SF}/events.parquet')")
    want = con.execute("""
        WITH c AS (SELECT event_type g,
                          CAST(ROUND(value * 100) AS BIGINT) v,
                          CAST(COUNT(*) AS BIGINT) t
                   FROM events GROUP BY 1, 2),
        wg AS (SELECT g, v, t,
                      SUM(t) OVER (PARTITION BY g ORDER BY v) - t
                        AS cb,
                      SUM(t) OVER (PARTITION BY g) AS n_g
               FROM c),
        pooled AS (SELECT v, SUM(t) t FROM c GROUP BY 1),
        pw AS (SELECT v, SUM(t) OVER (ORDER BY v) cw FROM pooled),
        tot AS (SELECT SUM(t) n FROM pooled),
        tgt AS (SELECT g, v,
                       ((2 * cb + t + 1) * n + 2 * n_g - 1)
                         // (2 * n_g) AS pos
                FROM wg, tot)
        SELECT tgt.g AS event_type, tgt.v / 100.0 AS value,
               pw.v / 100.0 AS norm_value
        FROM tgt JOIN pw ON pw.cw >= tgt.pos
        QUALIFY ROW_NUMBER() OVER (PARTITION BY tgt.g, tgt.v
                                   ORDER BY pw.cw) = 1
        ORDER BY 1, 2""").df()
    con.close()
    pd.testing.assert_frame_equal(got.reset_index(drop=True), want,
                                  check_dtype=False)


def test_identity_and_alignment(ray_session):
    # two groups with IDENTICAL distributions: mapping is the identity
    base = [1.0, 2.0, 2.0, 5.0]
    df = pd.DataFrame({"g": ["a"] * 4 + ["b"] * 4,
                       "v": base + base})
    m = quantile_normalize_map(rd.from_pandas(df), "g", "v")
    np.testing.assert_allclose(m["value"], m["norm_value"])
    # same-size groups with different values: normalized multisets
    # coincide after the transform
    df2 = pd.DataFrame({"g": ["a"] * 4 + ["b"] * 4,
                        "v": [1.0, 2.0, 3.0, 4.0,
                              10.0, 20.0, 30.0, 40.0]})
    ds2 = rd.from_pandas(df2, override_num_blocks=3)
    m2 = quantile_normalize_map(ds2, "g", "v")
    out = apply_quantile_map(ds2, m2, "g", "v",
                             out_col="nv").to_pandas()
    a = np.sort(out[out["g"] == "a"]["nv"].to_numpy())
    b = np.sort(out[out["g"] == "b"]["nv"].to_numpy())
    np.testing.assert_allclose(a, b)
    # every normalized value comes from the pooled domain
    assert set(out["nv"]) <= set(df2["v"])


def test_layout_invariance_and_guards(ray_session):
    rng = np.random.default_rng(3)
    df = pd.DataFrame({
        "g": rng.choice(list("abc"), 2000),
        "v": np.round(rng.normal(50, 10, 2000), 2)})
    m1 = quantile_normalize_map(
        rd.from_pandas(df, override_num_blocks=1), "g", "v")
    m7 = quantile_normalize_map(
        rd.from_pandas(df, override_num_blocks=7), "g", "v")
    pd.testing.assert_frame_equal(m1, m7)  # exact census => bitwise
    # unmapped group raises in the streamed apply
    other = rd.from_pandas(pd.DataFrame({"g": ["zz"], "v": [1.0]}))
    with pytest.raises(Exception, match="unmapped"):
        apply_quantile_map(other, m1, "g", "v").to_pandas()
    # empty input -> empty mapping with stable columns
    empty = quantile_normalize_map(
        rd.from_pandas(pd.DataFrame({"g": pd.Series([], dtype=str),
                                     "v": pd.Series([], dtype=float)
                                     })), "g", "v")
    assert list(empty.columns) == ["g", "value", "norm_value"]
