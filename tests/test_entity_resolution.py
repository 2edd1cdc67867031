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


def _fs_pairs_frame(n=30_000, seed=13):
    """Synthetic candidate pairs with KNOWN generative (lambda, m, u)."""
    rng = np.random.default_rng(seed)
    lam, m, u = 0.15, np.array([0.95, 0.85, 0.7]), \
        np.array([0.08, 0.2, 0.35])
    is_match = rng.random(n) < lam
    G = np.where(is_match[:, None],
                 rng.random((n, 3)) < m,
                 rng.random((n, 3)) < u).astype("int64")
    return pd.DataFrame({"f_name": G[:, 0], "f_city": G[:, 1],
                         "f_year": G[:, 2]}), lam, m, u, is_match


def test_fs_em_recovers_generative_params(ray_session):
    import ray.data as rd

    from cerberus_ray.pipelines.entity_resolution import fs_em_weights

    df, lam, m, u, _ = _fs_pairs_frame()
    ds = rd.from_pandas(df, override_num_blocks=6).materialize()
    cols = ["f_name", "f_city", "f_year"]
    p = fs_em_weights(ds, cols)
    assert p["converged"] and p["n_pairs"] == len(df)
    assert abs(p["lambda"] - lam) < 0.03
    for i, c in enumerate(cols):
        assert abs(p["m"][c] - m[i]) < 0.06
        assert abs(p["u"][c] - u[i]) < 0.03
    # agreement on a strong field must carry positive log2 weight
    assert p["log2_weights"]["f_name"][0] > 1.0
    assert p["log2_weights"]["f_name"][1] < 0.0


def test_fs_em_matches_full_reference_and_is_layout_invariant(
        ray_session):
    """Pattern-census EM == an explicit EM over every pair (numpy),
    and the census makes the result block-layout invariant."""
    import ray.data as rd

    from cerberus_ray.pipelines.entity_resolution import fs_em_weights

    df, *_ = _fs_pairs_frame(n=4000, seed=7)
    cols = ["f_name", "f_city", "f_year"]
    p1 = fs_em_weights(
        rd.from_pandas(df, override_num_blocks=1).materialize(), cols)
    p2 = fs_em_weights(
        rd.from_pandas(df.sample(frac=1.0, random_state=1),
                       override_num_blocks=9).materialize(), cols)
    assert p1 == p2
    # reference: EM iterating over raw pairs
    G = df[cols].to_numpy(dtype="float64")
    lam, m, u = 0.1, np.full(3, 0.9), np.full(3, 0.1)
    for _ in range(p1["n_iter"]):
        pm = np.exp(G @ np.log(m) + (1 - G) @ np.log1p(-m))
        pu = np.exp(G @ np.log(u) + (1 - G) @ np.log1p(-u))
        w = lam * pm / (lam * pm + (1 - lam) * pu)
        lam = w.mean()
        m = np.clip(G.T @ w / w.sum(), 1e-9, 1 - 1e-9)
        u = np.clip(G.T @ (1 - w) / (1 - w).sum(), 1e-9, 1 - 1e-9)
    assert abs(p1["lambda"] - lam) < 1e-6
    for i, c in enumerate(cols):
        assert abs(p1["m"][c] - m[i]) < 1e-6
        assert abs(p1["u"][c] - u[i]) < 1e-6


def test_fs_score_separates_matches(ray_session):
    import ray.data as rd

    from cerberus_ray.pipelines.entity_resolution import (
        fs_em_weights, fs_score_pairs)

    df, _, _, _, is_match = _fs_pairs_frame(n=20_000, seed=3)
    ds = rd.from_pandas(df, override_num_blocks=4).materialize()
    cols = ["f_name", "f_city", "f_year"]
    p = fs_em_weights(ds, cols)
    scored = fs_score_pairs(ds, cols, p).to_pandas()
    hi = scored["match_weight"].to_numpy()[is_match].mean()
    lo = scored["match_weight"].to_numpy()[~is_match].mean()
    assert hi > lo + 2.0          # clear separation in FS weight units
    with pytest.raises(ValueError):
        fs_em_weights(ds, [])


def test_soundex_canonical_vectors():
    from cerberus_ray.pipelines.entity_resolution import soundex

    vec = {"Robert": "R163", "Rupert": "R163", "Ashcraft": "A261",
           "Ashcroft": "A261", "Tymczak": "T522", "Pfister": "P236",
           "Honeyman": "H555", "Jackson": "J250",
           "Washington": "W252", "Lee": "L000", "Gutierrez": "G362",
           "O'Brien": "O165", "": "", "123": ""}
    got = soundex(np.array(list(vec), dtype=object))
    assert list(got) == list(vec.values())


def test_jaro_winkler_matches_duckdb_exactly(ray_session):
    """Bit-exact parity with DuckDB's jaro_winkler_similarity on a
    fuzzed ASCII corpus (same p=0.1 scaling, 0.7 boost threshold,
    4-char prefix cap, and the both-empty→0 convention)."""
    import duckdb

    from cerberus_ray.pipelines.entity_resolution import jaro_winkler

    rng = np.random.default_rng(21)
    alpha = np.array(list("abcdefgh "))
    def rnd():
        return "".join(rng.choice(alpha, rng.integers(0, 12)))
    a = [rnd() for _ in range(300)] + ["", "martha", "dixon"]
    b = [rnd() for _ in range(300)] + ["", "marhta", "dicksonx"]
    mine = jaro_winkler(a, b)
    con = duckdb.connect()
    theirs = [con.execute(
        "select jaro_winkler_similarity(?, ?)", [x, y]).fetchone()[0]
        for x, y in zip(a, b)]
    assert np.max(np.abs(mine - np.array(theirs))) < 1e-12


def test_soundex_blocking_pairs_finds_phonetic_matches(ray_session):
    import ray.data as rd

    from cerberus_ray.pipelines.entity_resolution import (
        soundex_blocking_pairs)

    df = pd.DataFrame({
        "rid": range(8),
        "name": ["Robert Smith", "Rupert Smith", "Robert Smith",
                 "Catherine Jones", "Katherine Jones",
                 "Ashcraft Ltd", "Ashcroft Ltd", "Zzyzx Corp"]})
    out = soundex_blocking_pairs(
        rd.from_pandas(df, override_num_blocks=3).materialize(),
        "rid", "name", jw_threshold=0.8)
    got = {(r.a, r.b) for r in out.itertuples()}
    assert ("ashcraft ltd", "ashcroft ltd") in got
    assert ("robert smith", "rupert smith") in got
    # different soundex block (C/K) never pairs even though similar
    assert not any("catherine" in a and "katherine" in b
                   for a, b in got)
    assert (out["sim"] >= 0.8).all()


def test_jaro_single_char_parity(ray_session):
    """Equal 1-char strings are identical — sim 1.0, matching DuckDB's
    jaro_similarity (the unclamped match window used to score 0.0)."""
    import duckdb

    from cerberus_ray.pipelines.entity_resolution import jaro_winkler

    a = np.array(["a", "a", "x", "ab"], dtype=object)
    b = np.array(["a", "b", "x", "ab"], dtype=object)
    sim = jaro_winkler(a, b)
    assert sim[0] == 1.0 and sim[2] == 1.0 and sim[3] == 1.0
    assert sim[1] == 0.0
    con = duckdb.connect()
    for x, y, s in zip(a, b, sim):
        ref = con.execute(
            "SELECT jaro_winkler_similarity(?, ?)", [x, y]).fetchone()[0]
        assert s == ref, (x, y, s, ref)


def test_fuzzy_self_join_agrees_with_two_sided(ray_session):
    import ray.data as rd

    from cerberus_ray.pipelines.fuzzyjoin import fuzzy_join

    df = pd.DataFrame({"v": ["smith", "smyth", "smithe", "jones",
                             "jonas", "unique"]})
    ds = rd.from_pandas(df, override_num_blocks=2).materialize()
    two = fuzzy_join(ds, ds, "v", k=1)
    lo = np.minimum(two["left"], two["right"])
    hi = np.maximum(two["left"], two["right"])
    two_set = {(a, b) for a, b in zip(lo, hi) if a != b}
    one = fuzzy_join(ds, None, "v", k=1, self_join=True)
    one_set = set(zip(one["left"], one["right"]))
    assert one_set == two_set and len(one_set) >= 2


def test_fuzzy_join_overlong_policy(ray_session):
    import pytest
    import ray.data as rd

    from cerberus_ray.pipelines.fuzzyjoin import fuzzy_join

    long = "x" * 300
    df = pd.DataFrame({"v": ["abc", "abd", long, long + "y"]})
    ds = rd.from_pandas(df).materialize()
    out = fuzzy_join(ds, None, "v", k=1, self_join=True,
                     overlong="skip")
    assert set(zip(out["left"], out["right"])) == {("abc", "abd")}
    with pytest.raises(ValueError, match="max_len"):
        fuzzy_join(ds, None, "v", k=1, self_join=True)


def test_soundex_hot_bucket_capped_not_dropped(ray_session):
    """A phonetic code with more members than max_bucket keeps its
    (truncated) pairs and flags them capped — it used to drop the whole
    bucket silently."""
    import ray.data as rd

    from cerberus_ray.pipelines.entity_resolution import (
        soundex_blocking_pairs)

    names = [f"smith clone{i}" for i in range(10)]
    df = pd.DataFrame({"rid": range(10), "name": names})
    out = soundex_blocking_pairs(
        rd.from_pandas(df).materialize(), "rid", "name",
        jw_threshold=0.5, max_bucket=4)
    assert len(out) > 0
    assert out["capped"].all()
    # uncapped corpus: flag False
    out2 = soundex_blocking_pairs(
        rd.from_pandas(df).materialize(), "rid", "name",
        jw_threshold=0.5, max_bucket=2000)
    assert not out2["capped"].any()
    assert len(out2) >= len(out)
