"""Global token-budget selection: DuckDB window-oracle parity (both
modes), exact prefix semantics under score ties, block-boundary cuts,
and edge budgets."""

import duckdb
import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from cerberus_ray.pipelines.budget import (sample_exact_k,
                                           sample_exact_k_per_group,
                                           select_token_budget,
                                           token_budget_cut,
                                           with_token_counts)

SQL = """
SELECT doc_id FROM (
  SELECT doc_id,
         SUM(n_tokens) OVER (ORDER BY score DESC, doc_id
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW) AS cum
  FROM t) WHERE cum <= {budget}
"""


def frame(n=400, seed=7, ties=False):
    rng = np.random.default_rng(seed)
    scores = (rng.integers(0, 12, n).astype(float) if ties
              else rng.random(n))
    return pd.DataFrame({
        "doc_id": [f"d{i:04d}" for i in range(n)],
        "score": scores,
        "n_tokens": rng.integers(0, 300, n)})


def oracle_ids(df, budget):
    con = duckdb.connect()
    con.register("t", df)
    return set(con.execute(SQL.format(budget=budget)).df()["doc_id"])


@pytest.mark.parametrize("mode", ["driver", "sort"])
@pytest.mark.parametrize("ties", [False, True])
def test_duckdb_window_parity(ray_session, mode, ties):
    df = frame(ties=ties)
    budget = int(df["n_tokens"].sum() * 0.35)
    ds = rd.from_pandas(df).repartition(5).materialize()
    got = select_token_budget(ds, budget, score_col="score",
                              mode=mode).to_pandas()
    assert set(got["doc_id"]) == oracle_ids(df, budget)
    assert list(got.columns) == list(df.columns)  # all columns preserved


def test_mode_agreement_and_boundary_cuts(ray_session):
    df = frame(n=60, seed=3)
    ds = rd.from_pandas(df).repartition(60).materialize()  # 1-row blocks
    for frac in (0.0, 0.1, 0.5, 0.9, 1.0):
        budget = int(df["n_tokens"].sum() * frac)
        a = token_budget_cut(ds, budget, score_col="score", mode="driver")
        b = token_budget_cut(ds, budget, score_col="score", mode="sort")
        assert a == b, (frac, a, b)
        sel = select_token_budget(ds, budget, score_col="score",
                                  mode="sort").to_pandas()
        got = set(sel["doc_id"]) if len(sel) else set()
        assert got == oracle_ids(df, budget), frac


def test_edge_budgets(ray_session):
    df = frame(n=50)
    ds = rd.from_pandas(df).repartition(3).materialize()
    # zero budget with min token count > 0 -> empty, schema preserved
    df2 = df.assign(n_tokens=df["n_tokens"] + 1)
    ds2 = rd.from_pandas(df2).repartition(3).materialize()
    empty = select_token_budget(ds2, 0, score_col="score").to_pandas()
    assert len(empty) == 0
    # budget >= total -> everything
    total = int(df["n_tokens"].sum())
    assert select_token_budget(ds, total, score_col="score").count() == 50
    with pytest.raises(ValueError):
        token_budget_cut(ds, -1, score_col="score")
    with pytest.raises(ValueError):
        token_budget_cut(ds, 10, score_col="score", mode="salted")


def test_zero_token_docs_inside_prefix(ray_session):
    """Zero-token docs sitting right after the cum==budget point are kept
    (cum stays <= budget) — exact SQL-window semantics."""
    df = pd.DataFrame({"doc_id": ["a", "b", "c", "d"],
                       "score": [9.0, 8.0, 7.0, 6.0],
                       "n_tokens": [5, 0, 0, 5]})
    ds = rd.from_pandas(df).materialize()
    got = set(select_token_budget(ds, 5, score_col="score")
              .to_pandas()["doc_id"])
    assert got == {"a", "b", "c"} == oracle_ids(df, 5)


def test_report_pin_sf0001(ray_session):
    """Driver-surface pin: the token_budget_report is deterministic —
    exact expected values on the sf0.001 documents table."""
    from cerberus_ray.pipelines.training_queries import q_token_budget_report

    t = q_token_budget_report("/root/testdata/sf0.001").to_pydict()
    assert t == {"n_input": [500], "n_selected": [91],
                 "selected_tokens": [8350], "budget": [8381]}


def test_sample_exact_k(ray_session):
    """Exactly-k size, determinism across partitionings, seed
    sensitivity, and without-replacement uniqueness."""
    df = pd.DataFrame({"doc_id": [f"d{i:04d}" for i in range(500)],
                       "payload": np.arange(500)})
    a = set(sample_exact_k(rd.from_pandas(df).repartition(3).materialize(),
                           100, seed=7).to_pandas()["doc_id"])
    b = set(sample_exact_k(rd.from_pandas(df).repartition(11).materialize(),
                           100, seed=7).to_pandas()["doc_id"])
    c = set(sample_exact_k(rd.from_pandas(df).repartition(3).materialize(),
                           100, seed=8).to_pandas()["doc_id"])
    assert len(a) == 100 and a == b          # exact size, partition-invariant
    assert a != c                             # seed moves the sample
    # int keys too, and k >= n keeps everything
    dfi = pd.DataFrame({"doc_id": np.arange(40), "x": np.arange(40)})
    dsi = rd.from_pandas(dfi).repartition(4).materialize()
    assert sample_exact_k(dsi, 10, seed=1).count() == 10
    assert sample_exact_k(dsi, 99, seed=1).count() == 40
    got = sample_exact_k(dsi, 10, seed=1).to_pandas()
    assert list(got.columns) == ["doc_id", "x"]  # helper columns dropped


def test_sample_exact_k_per_group(ray_session):
    """Stratified exact-k: exactly min(k, |group|) per stratum, equal to
    the ground-truth k-smallest-draw set, identical across modes and
    partitionings."""
    from cerberus_ray.determinism import hash_strings, uniform01

    rng = np.random.default_rng(2)
    df = pd.DataFrame({
        "doc_id": [f"d{i:04d}" for i in range(400)],
        "lang": rng.choice(["en", "de", "fr"], 400, p=[0.6, 0.3, 0.1]),
        "x": np.arange(400)})
    df.loc[df.index[:5], "lang"] = "tiny"   # a stratum smaller than k

    # ground truth: k smallest deterministic draws per group
    u = uniform01(hash_strings(df["doc_id"].to_numpy()), 9, salt=0xA5)
    exp = set(df.assign(u=u).sort_values(["u", "doc_id"])
              .groupby("lang").head(40)["doc_id"])

    ds3 = rd.from_pandas(df).repartition(3).materialize()
    ds9 = rd.from_pandas(df).repartition(9).materialize()
    a = set(sample_exact_k_per_group(ds3, 40, group_col="lang",
                                     seed=9, mode="driver")
            .to_pandas()["doc_id"])
    b = set(sample_exact_k_per_group(ds9, 40, group_col="lang",
                                     seed=9, mode="sort")
            .to_pandas()["doc_id"])
    assert a == exp == b
    got = sample_exact_k_per_group(ds3, 40, group_col="lang",
                                   seed=9).to_pandas()
    sizes = got.groupby("lang")["doc_id"].count().to_dict()
    full = df.groupby("lang")["doc_id"].count().to_dict()
    assert sizes == {g: min(40, n) for g, n in full.items()}
    assert list(got.columns) == ["doc_id", "lang", "x"]
    with pytest.raises(ValueError):
        sample_exact_k_per_group(ds3, 0, group_col="lang")


def test_sample_per_group_sort_boundaries(ray_session):
    """Tiny blocks force group runs to straddle many blocks — exercises
    the run-summary + cut-run resolution paths of sort mode."""
    df = pd.DataFrame({"doc_id": [f"d{i:03d}" for i in range(120)],
                       "g": ["a"] * 60 + ["b"] * 60})
    ds = rd.from_pandas(df).repartition(40).materialize()  # 3-row blocks
    for k in (1, 7, 59, 60, 61):
        a = set(sample_exact_k_per_group(ds, k, group_col="g", seed=4,
                                         mode="driver").to_pandas()["doc_id"])
        b = set(sample_exact_k_per_group(ds, k, group_col="g", seed=4,
                                         mode="sort").to_pandas()["doc_id"])
        assert a == b and len(a) == 2 * min(k, 60), k


def test_with_token_counts(ray_session):
    df = pd.DataFrame({"doc_id": ["a", "b", "c", "d"],
                       "text": ["one two  three", "", None, "  x  "]})
    out = (with_token_counts(rd.from_pandas(df)).to_pandas()
           .set_index("doc_id")["n_tokens"])
    assert list(out[["a", "b", "c", "d"]]) == [3, 0, 0, 1]
