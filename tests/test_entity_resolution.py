"""Entity resolution: planted-typo recovery, DuckDB levenshtein pair
parity, transitive clustering, normalization, row tagging."""

import duckdb
import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from cerberus_ray.pipelines.entity_resolution import (match_pairs,
                                                      normalize_identity,
                                                      resolve_entities)


def _dirty_frame():
    """Planted duplicate identities: each base name with 1-deletion /
    1-substitution typos and punctuation/case noise."""
    rows = [
        (1, "Acme Corp"), (2, "acme corp"), (3, "Acme  Corp."),
        (4, "Acme Crop"),          # substitution... dist 2 from base, skip
        (5, "Acme Cor"),           # deletion, dist 1
        (6, "Globex"), (7, "globex!"), (8, "Globx"),   # deletion
        (9, "Initech"), (10, "Wayne Enterprises"),
    ]
    return pd.DataFrame(rows, columns=["id", "name"])


def test_normalize_identity():
    v = normalize_identity(np.array(
        ["  Acme,  Corp. ", "ACME CORP", None], dtype=object))
    assert v.tolist() == ["acme corp", "acme corp", ""]


def test_match_pairs_duckdb_parity(ray_session):
    df = _dirty_frame()
    ds = rd.from_pandas(df, override_num_blocks=3)
    got = match_pairs(ds, "name", k=1)
    # oracle: exact levenshtein over distinct normalized values (ASCII
    # only — DuckDB's levenshtein is byte-level)
    norm = pd.DataFrame(
        {"v": pd.unique(normalize_identity(df["name"].to_numpy()))})
    want = duckdb.sql(
        "SELECT a.v AS a, b.v AS b, levenshtein(a.v, b.v) AS dist "
        "FROM norm a JOIN norm b ON a.v < b.v "
        "WHERE levenshtein(a.v, b.v) <= 1 ORDER BY a, b").fetchdf()
    assert got["a"].tolist() == want["a"].tolist()
    assert got["b"].tolist() == want["b"].tolist()
    assert got["dist"].astype("int64").tolist() == want["dist"].tolist()


def test_resolve_entities_clusters(ray_session):
    df = _dirty_frame()
    tagged, ents = resolve_entities(
        rd.from_pandas(df, override_num_blocks=3), "id", "name", k=1)
    out = tagged.to_pandas().sort_values("id")
    canon = dict(zip(out["id"], out["canonical"]))
    # acme corp / acme cor share an entity (deletion distance 1)
    assert canon[1] == canon[2] == canon[3] == canon[5] == "acme cor"
    # globex / globx cluster; '!' strips in normalization
    assert canon[6] == canon[7] == canon[8] == "globex"
    # singletons canonicalize to themselves
    assert canon[9] == "initech"
    assert canon[10] == "wayne enterprises"
    # the entity frame covers exactly the matched values
    assert set(ents["canonical"]) == {"acme cor", "globex"}


def test_transitive_chain(ray_session):
    # abc ~ abd? no (substitution = dist 1 but deletion blocking with
    # k=1 DOES cover substitutions: del 'c' -> 'ab' <- del 'd').
    # chain: abcd ~ abc ~ ab -> one entity even though d(abcd, ab) = 2
    df = pd.DataFrame({"id": [1, 2, 3],
                       "name": ["abcd", "abc", "ab"]})
    tagged, _ = resolve_entities(rd.from_pandas(df), "id", "name", k=1)
    out = tagged.to_pandas()
    assert set(out["canonical"]) == {"ab"}


def test_no_matches(ray_session):
    df = pd.DataFrame({"id": [1, 2], "name": ["alpha", "omega12345"]})
    tagged, ents = resolve_entities(rd.from_pandas(df), "id", "name")
    assert len(ents) == 0
    assert set(tagged.to_pandas()["canonical"]) == {"alpha", "omega12345"}


def test_cc_mode_agreement(ray_session):
    df = _dirty_frame()
    ds = rd.from_pandas(df, override_num_blocks=2)
    a = resolve_entities(ds, "id", "name", k=1,
                         cc_mode="driver")[0].to_pandas()
    b = resolve_entities(ds, "id", "name", k=1,
                         cc_mode="shuffle")[0].to_pandas()
    pd.testing.assert_frame_equal(
        a.sort_values("id").reset_index(drop=True),
        b.sort_values("id").reset_index(drop=True))


def test_sorted_neighborhood_matches_bruteforce(ray_session):
    """Distributed SN pairs == brute-force windowed pairs on the
    globally sorted normalized keys (incl. bucket-boundary pairs)."""
    import ray.data as rd

    from cerberus_ray.pipelines.entity_resolution import (
        normalize_identity, sorted_neighborhood_pairs)

    rng = np.random.default_rng(9)
    names = [f"Name {chr(65 + i % 24)}{i % 97:02d}" for i in range(400)]
    df = pd.DataFrame({"rid": [f"r{i}" for i in range(400)],
                       "name": rng.permutation(names)})
    W = 4
    out = sorted_neighborhood_pairs(
        rd.from_pandas(df, override_num_blocks=7).materialize(),
        "rid", "name", window=W)
    # brute force on the driver
    key = normalize_identity(df["name"].to_numpy())
    order = np.lexsort((df["rid"].to_numpy(dtype=object), key))
    sid = df["rid"].to_numpy(dtype=object)[order]
    exp = set()
    for j in range(len(sid)):
        for d in range(1, W):
            if j - d >= 0:
                exp.add((sid[j - d], sid[j]))
    got = {(r.a, r.b) for r in out.itertuples()}
    assert got == exp
    assert (out["rank_gap"] < W).all() and (out["rank_gap"] >= 1).all()


def test_sorted_neighborhood_layout_invariance_and_guard(ray_session):
    import ray.data as rd

    from cerberus_ray.pipelines.entity_resolution import (
        sorted_neighborhood_pairs)

    df = pd.DataFrame({"rid": [f"x{i}" for i in range(120)],
                       "name": [f"acme corp {i % 37}" for i in
                                range(120)]})
    a = sorted_neighborhood_pairs(
        rd.from_pandas(df, override_num_blocks=1).materialize(),
        "rid", "name", window=3)
    b = sorted_neighborhood_pairs(
        rd.from_pandas(df.sample(frac=1.0, random_state=3),
                       override_num_blocks=8).materialize(),
        "rid", "name", window=3)
    pd.testing.assert_frame_equal(a, b)
    with pytest.raises(ValueError):
        sorted_neighborhood_pairs(rd.from_pandas(df), "rid", "name",
                                  window=1)


def test_sorted_neighborhood_finds_typo_neighbors(ray_session):
    """Near-identical names land adjacent in sort order and pair even
    when hash blocking on whole tokens would separate them."""
    import ray.data as rd

    from cerberus_ray.pipelines.entity_resolution import (
        sorted_neighborhood_pairs)

    df = pd.DataFrame({
        "rid": ["a", "b", "c", "d"],
        "name": ["Jonathan Smith", "Jonathan Smyth",
                 "Zebra Inc", "Aardvark LLC"]})
    out = sorted_neighborhood_pairs(
        rd.from_pandas(df).materialize(), "rid", "name", window=2)
    assert ("a", "b") in {(r.a, r.b) for r in out.itertuples()}
