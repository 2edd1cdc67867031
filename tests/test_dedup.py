"""Dedup operators on a synthetic corpus with KNOWN duplicates: exact
copies, near-copies (small edits), and unrelated docs."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from cerberus_ray.pipelines import dedup as DD

BASE = ("the quick brown fox jumps over the lazy dog while the rain "
        "falls gently on the quiet village roofs every single evening")


def corpus():
    rng = np.random.default_rng(42)
    words = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
             "lambda mu nu xi omicron pi rho sigma tau upsilon").split()
    rows = []
    # 20 unrelated random docs
    for i in range(20):
        text = " ".join(rng.choice(words, size=30))
        rows.append({"doc_id": f"r{i:03d}", "text": text})
    # exact duplicate pair
    rows.append({"doc_id": "x001", "text": BASE})
    rows.append({"doc_id": "x002", "text": BASE})
    # near duplicates: one word changed / appended
    rows.append({"doc_id": "n001", "text": BASE.replace("quiet", "noisy")})
    rows.append({"doc_id": "n002", "text": BASE + " indeed"})
    return pd.DataFrame(rows)


@pytest.fixture(scope="module")
def ds(ray_session):
    return rd.from_pandas(corpus())


def test_exact_dedup_keeps_one_of_pair(ds):
    kept = DD.exact_dedup_keep_first(ds).to_pandas()
    ids = set(kept["doc_id"])
    assert "x001" in ids and "x002" not in ids  # min doc_id wins
    assert len(ids) == 23  # 24 docs - 1 duplicate


def test_exact_dup_stats(ds):
    t = DD.exact_dup_stats(ds).to_pandas()
    assert t["n_docs"][0] == 24 and t["n_unique"][0] == 23


def test_minhash_finds_near_dups(ds):
    pairs = DD.minhash_near_dup_pairs(ds, threshold=0.5).to_pandas()
    got = set(map(tuple, pairs[["doc_id_a", "doc_id_b"]].values))
    # the exact pair estimates jaccard 1.0; near pairs high
    assert ("x001", "x002") in got
    assert any(a.startswith(("x", "n")) and b.startswith(("x", "n"))
               for a, b in got)
    # no random-doc false positives at this threshold
    assert not any(a.startswith("r") or b.startswith("r") for a, b in got)
    exact = pairs[(pairs.doc_id_a == "x001") & (pairs.doc_id_b == "x002")]
    assert exact["jaccard_est"].iloc[0] == 1.0


def test_minhash_signature_estimates_jaccard():
    texts = np.array([BASE, BASE.replace("quiet", "noisy"),
                      "completely different words here entirely"], dtype=object)
    sigs = DD.minhash_signatures(texts, k=256)
    est_close = (sigs[0] == sigs[1]).mean()
    true_j = DD.ngram_jaccard(texts[0], texts[1])
    assert abs(est_close - true_j) < 0.15
    assert (sigs[0] == sigs[2]).mean() < 0.1


def test_simhash_near_dups(ds):
    pairs = DD.simhash_near_dup_pairs(ds, max_hamming=3).to_pandas()
    got = set(map(tuple, pairs[["doc_id_a", "doc_id_b"]].values))
    assert ("x001", "x002") in got
    ham = pairs[(pairs.doc_id_a == "x001") & (pairs.doc_id_b == "x002")]
    assert ham["hamming"].iloc[0] == 0


def test_simhash64_deterministic_and_locality():
    a = DD.simhash64(np.array([BASE], dtype=object))[0]
    b = DD.simhash64(np.array([BASE.replace("quiet", "noisy")], dtype=object))[0]
    c = DD.simhash64(np.array(["zzz yyy xxx www vvv uuu"], dtype=object))[0]
    assert DD.hamming64(np.array([a]), np.array([b]))[0] <= 8
    assert DD.hamming64(np.array([a]), np.array([c]))[0] > 16


def test_ngram_jaccard_bounds():
    assert DD.ngram_jaccard(BASE, BASE) == 1.0
    assert DD.ngram_jaccard(BASE, "totally unrelated text") == 0.0
    assert DD.ngram_jaccard("", "") == 1.0
    j = DD.ngram_jaccard(BASE, BASE.replace("quiet", "noisy"))
    assert 0.5 < j < 1.0


def test_verify_pairs_exact(ds):
    cand = pa.Table.from_pydict({
        "doc_id_a": ["x001", "x001"],
        "doc_id_b": ["x002", "r000"],
        "jaccard_est": [1.0, 0.9]})
    verified = DD.verify_pairs_exact(cand, ds, threshold=0.8).to_pandas()
    assert list(verified["doc_id_b"]) == ["x002"]  # false candidate killed
    assert verified["jaccard"].iloc[0] == 1.0


def test_minhash_mode_agreement(ds):
    """driver vs shuffle pass-1 merge must be output-identical (the
    planner's contract — same gate as uniqueness/order_totalprice)."""
    drv = DD.minhash_near_dup_pairs(ds, threshold=0.5, mode="driver")
    shf = DD.minhash_near_dup_pairs(ds, threshold=0.5, mode="shuffle")
    assert drv.equals(shf)
    assert drv.num_rows > 0
    with pytest.raises(ValueError):
        DD.minhash_near_dup_pairs(ds, mode="bogus")


def test_simhash_hot_bucket_recall_and_scale(ray_session):
    """A hot bucket (thousands of docs sharing chunk 0 but unrelated
    elsewhere) must not go O(n²): the recursive pigeonhole refinement
    splits it, while planted near-dup pairs are still all found."""
    rng = np.random.default_rng(7)
    words = [f"w{i}" for i in range(500)]
    rows = []
    for i in range(2000):
        rows.append({"doc_id": f"h{i:05d}",
                     "text": " ".join(rng.choice(words, size=40))})
    # planted near-identical pair (1 word appended to 200 → hamming ≤ 3)
    base = " ".join(rng.choice(words, size=200).tolist())
    rows.append({"doc_id": "p0001", "text": base})
    rows.append({"doc_id": "p0002", "text": base + " w999"})
    df = pd.DataFrame(rows)
    got = DD.simhash_near_dup_pairs(
        rd.from_pandas(df), max_hamming=3, hot_bucket_cap=64).to_pandas()
    found = set(map(tuple, got[["doc_id_a", "doc_id_b"]].values))
    assert ("p0001", "p0002") in found

    # exact recall check vs brute force over the whole corpus
    sh = DD.simhash64(df["text"].to_numpy())
    ids = df["doc_id"].to_numpy()
    expect = set()
    for i in range(len(ids)):
        d = DD.hamming64(sh[i + 1:], np.repeat(sh[i], len(ids) - i - 1))
        for j in np.flatnonzero(d <= 3):
            a, b = sorted((ids[i], ids[i + 1 + j]))
            expect.add((a, b))
    assert found == expect


def test_simhash_identical_flood_emits_all_pairs(ray_session):
    """> cap identical fingerprints: the true answer is all pairs; the
    blockwise emitter must return exactly C(n,2) at hamming 0."""
    n = 40
    df = pd.DataFrame({"doc_id": [f"i{i:03d}" for i in range(n)],
                       "text": ["same text for everyone here"] * n})
    got = DD.simhash_near_dup_pairs(rd.from_pandas(df), max_hamming=3,
                                    hot_bucket_cap=8).to_pandas()
    assert len(got) == n * (n - 1) // 2
    assert (got["hamming"] == 0).all()


def test_exact_keep_first_mode_agreement(ds):
    """driver (broadcast winner map) vs join (hash-partitioned) keep-first
    must select identical rows."""
    drv = (DD.exact_dedup_keep_first(ds, mode="driver").to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    jn = (DD.exact_dedup_keep_first(ds, mode="join").to_pandas()
          .sort_values("doc_id").reset_index(drop=True))
    assert list(drv["doc_id"]) == list(jn["doc_id"])
    assert len(drv) == 23
    with pytest.raises(ValueError):
        DD.exact_dedup_keep_first(ds, mode="bogus")


def test_exact_dup_stats_mode_agreement(ds):
    drv = DD.exact_dup_stats(ds, mode="driver").to_pandas()
    shf = DD.exact_dup_stats(ds, mode="shuffle").to_pandas()
    assert drv.equals(shf)
    with pytest.raises(ValueError):
        DD.exact_dup_stats(ds, mode="bogus")


def test_rec_pairs_property_matches_bruteforce():
    """The recursive pigeonhole refinement must find EXACTLY the brute
    force pair set for any fingerprint multiset, any cap — including
    adversarial mixes of identical values, near pairs and random noise."""
    rng = np.random.default_rng(123)
    for trial in range(25):
        n = int(rng.integers(2, 120))
        sh = rng.integers(0, 2**63, size=n).astype(np.uint64)
        # plant identical runs and near pairs
        for _ in range(int(rng.integers(0, 4))):
            i, j = rng.integers(0, n, size=2)
            sh[j] = sh[i]
        for _ in range(int(rng.integers(0, 4))):
            i, j = rng.integers(0, n, size=2)
            flips = rng.integers(0, 64, size=int(rng.integers(1, 4)))
            v = sh[i]
            for f in flips:
                v ^= np.uint64(1) << np.uint64(f)
            sh[j] = v
        keys = np.array([f"k{i:04d}" for i in range(n)], dtype=object)
        max_h = int(rng.integers(0, 5))
        cap = int(rng.integers(2, 20))
        positions = np.arange(64, dtype=np.int64)
        A, B, H = [], [], []
        DD._rec_pairs(keys, sh, positions, max_h, cap, A, B, H)
        got = set(zip(A, B))
        # brute force reference
        expect = set()
        for i in range(n):
            d = DD.hamming64(sh[i + 1:], np.repeat(sh[i], n - i - 1))
            for j in np.flatnonzero(d <= max_h):
                expect.add((keys[i], keys[i + 1 + j]))
        assert got == expect, (trial, n, max_h, cap)
        # emitted distances must be true hamming distances
        for a, b, h in zip(A, B, H):
            ia = int(a[1:]); ib = int(b[1:])
            assert DD.hamming64(sh[ia:ia+1], sh[ib:ib+1])[0] == h


def test_minhash_shuffle_mode_at_sf001(ray_session):
    """Shuffle pass-1 agreement on a real table (500 docs, sf0.01) — the
    tiny-fixture agreement test can't exercise multi-block bucket
    merges."""
    import ray.data as rd

    ds = rd.read_parquet("/root/testdata/sf0.01/documents.parquet",
                         columns=["doc_id", "text"],
                         override_num_blocks=8)
    drv = DD.minhash_near_dup_pairs(ds, threshold=0.8, mode="driver")
    shf = DD.minhash_near_dup_pairs(ds, threshold=0.8, mode="shuffle")
    assert drv.equals(shf)


def test_keep_best_picks_max_score(ray_session):
    """keep-best winner = argmax score per near-dup cluster (ties: min
    key; null score = -inf); kept set = winners + all non-members."""
    pdf = corpus()
    # scores: make n001 the best of the x/n cluster; null on x001
    score = {r: 0.1 for r in pdf["doc_id"]}
    score["x001"] = None
    score["x002"] = 0.4
    score["n001"] = 0.9
    score["n002"] = 0.4
    pdf["quality"] = pdf["doc_id"].map(score)
    d = rd.from_pandas(pdf, override_num_blocks=3).materialize()
    kept, winners = DD.dedup_near_keep_best(
        d, score_col="quality", threshold=0.5)
    kp = kept.to_pandas()
    w = winners.to_pandas()
    members = {"x001", "x002", "n001", "n002"}
    # the known cluster resolves to its best-scoring member
    assert set(w["doc_id"]) & members == {"n001"}
    assert "n001" in set(kp["doc_id"])
    assert not (members - {"n001"}) & set(kp["doc_id"])
    # non-members all kept
    assert set(kp["doc_id"]) >= set(pdf["doc_id"]) - members
    # same cluster count as keep-first, different winner
    kept_f, clusters = DD.dedup_near_keep_first(d, threshold=0.5)
    assert len(w) == clusters.to_pandas()["cluster_id"].nunique()
    assert len(kp) == len(kept_f.to_pandas())


def test_keep_best_tie_breaks_min_key(ray_session):
    pdf = corpus()
    pdf["quality"] = 0.5  # all tied → min doc_id wins per cluster
    d = rd.from_pandas(pdf, override_num_blocks=2).materialize()
    kept_b, w = DD.dedup_near_keep_best(d, score_col="quality",
                                        threshold=0.5)
    kept_f, _ = DD.dedup_near_keep_first(d, threshold=0.5)
    a = sorted(kept_b.to_pandas()["doc_id"])
    b = sorted(kept_f.to_pandas()["doc_id"])
    assert a == b  # all-tied keep-best degenerates to keep-first


# ---- cross-corpus exact dedup -------------------------------------------


def _cross_fixture():
    ref = pd.DataFrame({
        "doc_id": [f"r{i}" for i in range(40)],
        "text": [f"reference doc {i}" for i in range(40)]})
    rows = []
    for i in range(100):
        if i % 5 == 0:  # 20 rows collide with the reference
            txt = f"reference doc {i % 40}"
        else:
            txt = f"fresh doc {i}"
        rows.append({"doc_id": f"n{i:03d}", "text": txt})
    # an internal duplicate pair that does NOT hit the reference: cross
    # dedup must keep BOTH (it is not an intra-corpus dedup)
    rows.append({"doc_id": "n900", "text": "fresh doc 1"})
    return ref, pd.DataFrame(rows)


def test_cross_dedup_drops_exactly_the_hits(ray_session):
    from cerberus_ray.pipelines.dedup import exact_dedup_against

    ref, new = _cross_fixture()
    out = exact_dedup_against(
        rd.from_pandas(new, override_num_blocks=4),
        rd.from_pandas(ref, override_num_blocks=3),
        mode="broadcast").to_pandas()
    expected = new[~new["text"].isin(set(ref["text"]))]
    assert sorted(out["doc_id"]) == sorted(expected["doc_id"])
    assert list(out.columns) == list(new.columns)  # schema preserved
    assert "n900" in set(out["doc_id"])  # internal dup survives


def test_cross_dedup_mode_agreement(ray_session):
    from cerberus_ray.pipelines.dedup import exact_dedup_against

    ref, new = _cross_fixture()
    a = exact_dedup_against(rd.from_pandas(new, override_num_blocks=4),
                            rd.from_pandas(ref, override_num_blocks=3),
                            mode="broadcast").to_pandas()
    b = exact_dedup_against(rd.from_pandas(new, override_num_blocks=4),
                            rd.from_pandas(ref, override_num_blocks=3),
                            mode="join").to_pandas()
    pd.testing.assert_frame_equal(
        a.sort_values("doc_id").reset_index(drop=True),
        b.sort_values("doc_id").reset_index(drop=True))
    with pytest.raises(ValueError):
        exact_dedup_against(rd.from_pandas(new), rd.from_pandas(ref),
                            mode="bogus")


def test_cross_dedup_empty_reference_keeps_all(ray_session):
    from cerberus_ray.pipelines.dedup import exact_dedup_against

    _, new = _cross_fixture()
    empty = pd.DataFrame({"doc_id": pd.Series([], dtype=object),
                          "text": pd.Series([], dtype=object)})
    out = exact_dedup_against(rd.from_pandas(new),
                              rd.from_pandas(empty),
                              mode="broadcast").to_pandas()
    assert len(out) == len(new)


def test_cross_dedup_duckdb_parity_sf0001(ray_session):
    """Anti-join on md5(text) vs DuckDB over the real sf0.001 table:
    reference = the 'web' source, corpus = everything else."""
    import duckdb

    from cerberus_ray.pipelines.training_queries import q_cross_dedup_report

    sf = "/root/testdata/sf0.001"
    mine = q_cross_dedup_report(sf).to_pandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf}/documents.parquet')")
    orc = con.execute("""
        WITH ref AS (SELECT DISTINCT md5(COALESCE(text,'')) AS h
                     FROM documents WHERE source = 'web'),
        rest AS (SELECT doc_id, md5(COALESCE(text,'')) AS h
                 FROM documents WHERE source <> 'web')
        SELECT CAST((SELECT COUNT(*) FROM rest) AS BIGINT) AS n_input,
               CAST((SELECT COUNT(*) FROM ref) AS BIGINT)  AS n_ref_distinct,
               CAST((SELECT COUNT(*) FROM rest
                     WHERE h NOT IN (SELECT h FROM ref)) AS BIGINT) AS n_kept
    """).fetch_df()
    assert int(mine["n_input"].iloc[0]) == int(orc["n_input"].iloc[0])
    assert int(mine["n_ref_distinct"].iloc[0]) == int(orc["n_ref_distinct"].iloc[0])
    assert int(mine["n_kept"].iloc[0]) == int(orc["n_kept"].iloc[0])


def test_simhash_mode_agreement(ds):
    """driver vs shuffle bucket grouping must be output-identical (the
    planner's contract, mirroring minhash pass-1)."""
    drv = DD.simhash_near_dup_pairs(ds, max_hamming=3, mode="driver")
    shf = DD.simhash_near_dup_pairs(ds, max_hamming=3, mode="shuffle")
    assert drv.equals(shf)
    assert drv.num_rows > 0
    with pytest.raises(ValueError):
        DD.simhash_near_dup_pairs(ds, mode="bogus")


def _bigger_corpus(n_extra: int = 120):
    """corpus() plus mutated BASE clones — denser near-dup structure so
    the brute-force references exercise multi-member buckets."""
    rng = np.random.default_rng(7)
    base_words = BASE.split()
    rows = [dict(r) for r in corpus().to_dict("records")]
    for i in range(n_extra):
        w = list(base_words)
        for _ in range(int(rng.integers(0, 3))):  # 0-2 word edits
            w[int(rng.integers(0, len(w)))] = f"tok{int(rng.integers(100))}"
        rows.append({"doc_id": f"m{i:03d}", "text": " ".join(w)})
    return pd.DataFrame(rows)


def test_simhash_matches_bruteforce_reference(ray_session):
    """Independent O(n²) oracle for the vectorized bucket-pairing tail:
    4-chunk pigeonhole at max_hamming ≤ 3 guarantees every qualifying
    pair shares a chunk, and the verify step keeps exactly hamming ≤ h —
    so the engine output must EQUAL all-pairs brute force."""
    df = _bigger_corpus()
    sh = DD.simhash64(df["text"].to_numpy(dtype=object))
    keys = df["doc_id"].to_numpy()
    expected = set()
    for i in range(len(keys)):
        x = sh[i] ^ sh[i + 1:]
        d = np.unpackbits(x.view(np.uint8).reshape(len(x), 8),
                          axis=1).sum(axis=1)
        for j in np.nonzero(d <= 3)[0]:
            a, b = sorted((keys[i], keys[i + 1 + j]))
            expected.add((a, b, int(d[j])))
    got = DD.simhash_near_dup_pairs(rd.from_pandas(df), max_hamming=3)
    got_set = set(zip(got["doc_id_a"].to_pylist(),
                      got["doc_id_b"].to_pylist(),
                      got["hamming"].to_pylist()))
    assert got_set == expected
    assert len(expected) > 50  # the fixture exercises real bucket fanout


def test_minhash_matches_bruteforce_reference(ray_session):
    """Independent O(n²) oracle: expected pairs = (share ≥1 of the 16
    band hashes) AND (signature-estimated jaccard ≥ threshold), computed
    directly from minhash_signatures/band_hashes."""
    df = _bigger_corpus()
    texts = df["text"].to_numpy(dtype=object)
    keys = df["doc_id"].to_numpy()
    sigs = DD.minhash_signatures(texts)
    bh = DD.band_hashes(sigs)
    expected = {}
    for i in range(len(keys)):
        share = (bh[i + 1:] == bh[i]).any(axis=1)
        jac = (sigs[i + 1:] == sigs[i]).mean(axis=1)
        for j in np.nonzero(share & (jac >= 0.5))[0]:
            a, b = sorted((keys[i], keys[i + 1 + j]))
            expected[(a, b)] = round(float(jac[j]), 4)
    got = DD.minhash_near_dup_pairs(rd.from_pandas(df), threshold=0.5)
    got_map = {(a, b): j for a, b, j in zip(got["doc_id_a"].to_pylist(),
                                            got["doc_id_b"].to_pylist(),
                                            got["jaccard_est"].to_pylist())}
    assert got_map == expected
    assert len(expected) > 20


# ---------------------------------------------------------------------------
# Weighted MinHash (ICWS)
# ---------------------------------------------------------------------------

def test_weighted_jaccard_bounds_and_tf_sensitivity():
    assert DD.weighted_jaccard(BASE, BASE) == 1.0
    assert DD.weighted_jaccard("", "") == 1.0
    assert DD.weighted_jaccard("a b", "c d") == 0.0
    # tf structure (unigram features): "a a a b" vs "a b" → min/max =
    # (1+1)/(3+1) = 0.5, while SET jaccard would be 1.0
    assert DD.weighted_jaccard("a a a b", "a b", w=1) == 0.5
    # bigram features (the default): shared shingle mass
    # ca={aa:2, ab:1}, cb={ab:1} → 1/3
    assert abs(DD.weighted_jaccard("a a a b", "a b") - 1 / 3) < 1e-12


def test_icws_estimates_weighted_jaccard():
    t1 = ("buy now " * 20) + "offer ends tuesday"
    t2 = ("buy now " * 20) + "offer ends friday"
    t3 = "completely different words here entirely now what"
    texts = np.array([t1, t2, t3, t1], dtype=object)
    sigs = DD.icws_signatures(texts, k=1024, w=1)
    assert sigs.shape == (4, 1024) and sigs.dtype == np.uint64
    # determinism across calls (counter-based draws, no RNG state)
    assert np.array_equal(sigs, DD.icws_signatures(texts, k=1024, w=1))
    est = (sigs[0] == sigs[1]).mean()
    true_w = DD.weighted_jaccard(t1, t2, w=1)     # 42/44 ≈ 0.955
    assert abs(est - true_w) < 0.05
    # the weighted estimator must SEE the tf mass: set jaccard is 4/6
    assert est > 0.85 > 4 / 6
    # bigram (default) estimator agrees with bigram weighted jaccard
    sb = DD.icws_signatures(texts, k=1024)
    est_b = (sb[0] == sb[1]).mean()
    assert abs(est_b - DD.weighted_jaccard(t1, t2)) < 0.05
    assert (sigs[0] == sigs[2]).mean() < 0.1      # unrelated
    assert (sigs[0] == sigs[3]).mean() == 1.0     # identical doc


def test_wminhash_finds_template_spam_pairs(ray_session):
    """Template spam (high-tf shared boilerplate, differing tails) has
    weighted jaccard ≫ set jaccard — the pair ICWS catches at a
    threshold where unweighted minhash (3-shingle) misses it."""
    rng = np.random.default_rng(7)
    words = ("alpha beta gamma delta epsilon zeta eta theta iota "
             "kappa lambda mu").split()
    rows = [{"doc_id": f"r{i:03d}",
             "text": " ".join(rng.choice(words, size=30))}
            for i in range(20)]
    rows.append({"doc_id": "s001",
                 "text": ("buy now " * 20) + "offer ends tuesday"})
    rows.append({"doc_id": "s002",
                 "text": ("buy now " * 20) + "offer ends friday"})
    rows.append({"doc_id": "x001", "text": BASE})
    rows.append({"doc_id": "x002", "text": BASE})
    ds2 = rd.from_pandas(pd.DataFrame(rows))
    pairs = DD.wminhash_near_dup_pairs(ds2, threshold=0.8).to_pandas()
    got = set(map(tuple, pairs[["doc_id_a", "doc_id_b"]].values))
    assert ("s001", "s002") in got
    assert ("x001", "x002") in got
    assert not any(a.startswith("r") or b.startswith("r") for a, b in got)
    exact = pairs[(pairs.doc_id_a == "x001") & (pairs.doc_id_b == "x002")]
    assert exact["wjaccard_est"].iloc[0] == 1.0
    # driver vs shuffle pass-1 plans stay output-identical (the planner
    # contract inherited from the unweighted path)
    shf = DD.wminhash_near_dup_pairs(ds2, threshold=0.8, mode="shuffle")
    drv = DD.wminhash_near_dup_pairs(ds2, threshold=0.8, mode="driver")
    assert drv.equals(shf)
    # exact-weighted verification keeps the true pairs, kills planted fakes
    cand = pa.Table.from_pydict({
        "doc_id_a": ["s001", "x001", "r000"],
        "doc_id_b": ["s002", "x002", "r001"],
        "wjaccard_est": [0.95, 1.0, 0.9]})
    ver = DD.verify_pairs_weighted(cand, ds2, threshold=0.8).to_pandas()
    assert list(ver["doc_id_a"]) == ["s001", "x001"]
    assert ver["wjaccard"].iloc[1] == 1.0


def test_md5_token_hash64_matches_duckdb():
    """The md5-simhash token hash must equal DuckDB's md5_number_lower
    bit-for-bit — the contract the dedup_simhash SQL oracle rests on."""
    import duckdb

    toks = ["the", "quick", "brown", "", "naïve", "a b", "123"]
    got = DD.md5_token_hash64(np.array(toks, dtype=object))
    con = duckdb.connect()
    for t, g in zip(toks, got):
        want = con.execute("select md5_number_lower(?)", [t]).fetchone()[0]
        assert int(g) == int(want), t


def test_simhash64_md5_matches_scalar_reference():
    """Vectorized md5-simhash vs a per-doc scalar recomputation
    (tokenize → ±1 bit accumulation → sign fingerprint)."""
    import hashlib

    texts = np.array(["the quick brown fox", "the quick brown fox",
                      "lorem ipsum dolor sit amet", "", "one"],
                     dtype=object)
    got = DD.simhash64_md5(texts)

    def scalar(text):
        toks = (text or "").lower().split() or [""]
        acc = np.zeros(64, dtype=np.int64)
        for tok in toks:
            h = int.from_bytes(
                hashlib.md5(tok.encode()).digest()[8:16], "little")
            for b in range(64):
                acc[b] += 2 * ((h >> b) & 1) - 1
        return sum(1 << b for b in range(64) if acc[b] > 0)

    for t, g in zip(texts, got):
        assert int(g) == scalar(t)
    # identical texts → identical fingerprints; distance 0 pair survives
    assert got[0] == got[1]


def _ssjoin_brute(texts, ids, t, w=3):
    ref = []
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            a, b = sorted([str(ids[i]), str(ids[j])])
            ai, bi = (i, j) if str(ids[i]) == a else (j, i)
            jv = DD.ngram_jaccard(texts[ai], texts[bi], w=w)
            if jv >= t:
                ref.append((a, b))
    return sorted(ref)


def test_ssjoin_matches_bruteforce(ray_session):
    """Prefix-filter self-join must equal the O(n²) exact answer —
    recall AND precision 1 (unlike MinHash candidates)."""
    rng = np.random.default_rng(7)
    vocab = [f"w{i}" for i in range(30)]
    texts, ids = [], []
    for i in range(60):
        n = rng.integers(0, 12)
        texts.append(" ".join(rng.choice(vocab, size=n)))
        ids.append(f"d{i:03d}")
    # planted near-identical pairs + two empty docs (J=1 by convention)
    texts[10] = texts[11] = "a b c d e f g h"
    texts[12] = "a b c d e f g x"
    texts[20] = texts[21] = ""
    ds = rd.from_pandas(pd.DataFrame({"doc_id": ids, "text": texts}),
                        override_num_blocks=4)
    got = DD.ssjoin_pairs(ds, threshold=0.5).to_pandas()
    got_pairs = sorted(zip(got["doc_id_a"], got["doc_id_b"]))
    assert got_pairs == _ssjoin_brute(texts, ids, 0.5)
    assert ("d010", "d011") in got_pairs
    assert ("d020", "d021") in got_pairs  # empty docs pair at J=1


def test_ssjoin_mode_agreement(ray_session):
    rng = np.random.default_rng(3)
    vocab = [f"tok{i}" for i in range(40)]
    texts = [" ".join(rng.choice(vocab, size=int(rng.integers(3, 15))))
             for _ in range(80)]
    texts[5] = texts[6]
    ids = [f"x{i:03d}" for i in range(80)]
    ds = rd.from_pandas(pd.DataFrame({"doc_id": ids, "text": texts}),
                        override_num_blocks=5)
    drv = DD.ssjoin_pairs(ds, threshold=0.6, mode="driver").to_pandas()
    shf = DD.ssjoin_pairs(ds, threshold=0.6, mode="shuffle",
                          shuffle_buckets=7).to_pandas()
    pd.testing.assert_frame_equal(drv, shf)
    assert len(drv) >= 1


def test_ssjoin_identical_flood(ray_session):
    """Degenerate all-identical corpus: the TRUE answer is all C(n,2)
    pairs — no cap may drop any."""
    n = 40
    ds = rd.from_pandas(pd.DataFrame(
        {"doc_id": [f"p{i:02d}" for i in range(n)],
         "text": ["same text again and again"] * n}))
    got = DD.ssjoin_pairs(ds, threshold=0.9).to_pandas()
    assert len(got) == n * (n - 1) // 2
    assert (got["jaccard"] == 1.0).all()


from hypothesis import given, settings
from hypothesis import strategies as st


@st.composite
def _corpus(draw):
    vocab = ["aa", "bb", "cc", "dd", "ee", "ff"]
    n = draw(st.integers(min_value=2, max_value=25))
    texts = []
    for i in range(n):
        k = draw(st.integers(min_value=0, max_value=8))
        toks = [vocab[draw(st.integers(0, len(vocab) - 1))]
                for _ in range(k)]
        texts.append(" ".join(toks))
    return texts


@settings(max_examples=15, deadline=None, derandomize=True)
@given(_corpus(), st.sampled_from([0.3, 0.5, 0.8]))
def test_ssjoin_property_bruteforce(ray_session, texts, thr):
    """Arbitrary tiny-vocab corpora (dense overlap, duplicates, empties)
    against the O(n²) reference at several thresholds — the prefix
    bound, sentinel handling and hash-Jaccard cut must never lose or
    invent a pair."""
    ids = [f"h{i:03d}" for i in range(len(texts))]
    ds = rd.from_pandas(pd.DataFrame({"doc_id": ids, "text": texts}),
                        override_num_blocks=3)
    got = DD.ssjoin_pairs(ds, threshold=thr).to_pandas()
    assert sorted(zip(got["doc_id_a"], got["doc_id_b"])) == \
        _ssjoin_brute(texts, ids, thr)


def test_ssjoin_layout_invariance(ray_session):
    rng = np.random.default_rng(11)
    vocab = [f"v{i}" for i in range(25)]
    texts = [" ".join(rng.choice(vocab, size=int(rng.integers(2, 10))))
             for _ in range(70)]
    ids = [f"z{i:03d}" for i in range(70)]
    outs = []
    for nb in (1, 4, 9):
        ds = rd.from_pandas(pd.DataFrame({"doc_id": ids, "text": texts}),
                            override_num_blocks=nb)
        outs.append(DD.ssjoin_pairs(ds, threshold=0.5).to_pandas())
    pd.testing.assert_frame_equal(outs[0], outs[1])
    pd.testing.assert_frame_equal(outs[0], outs[2])


def test_ssjoin_hot_shingle_mask_path(ray_session):
    """A shingle shared by > _COOC_DF_CAP docs must route through the
    membership-mask counting path and still yield exact answers."""
    n = 300  # df of the shared shingle > 256 cap
    rng = np.random.default_rng(13)
    vocab = [f"u{i}" for i in range(400)]
    texts = []
    for i in range(n):
        tail = " ".join(rng.choice(vocab, size=6, replace=False))
        texts.append(f"common head shingle {tail}")
    texts[50] = texts[51]  # one exact pair
    ids = [f"q{i:03d}" for i in range(n)]
    ds = rd.from_pandas(pd.DataFrame({"doc_id": ids, "text": texts}),
                        override_num_blocks=4)
    got = DD.ssjoin_pairs(ds, threshold=0.8).to_pandas()
    pairs = sorted(zip(got["doc_id_a"], got["doc_id_b"]))
    assert pairs == _ssjoin_brute(texts, ids, 0.8)
    assert ("q050", "q051") in pairs


def test_ssjoin_threshold_validation(ray_session):
    ds = rd.from_pandas(pd.DataFrame({"doc_id": ["a"], "text": ["x"]}))
    with pytest.raises(ValueError, match="threshold"):
        DD.ssjoin_pairs(ds, threshold=0.0)
    with pytest.raises(ValueError, match="threshold"):
        DD.ssjoin_pairs(ds, threshold=1.5)


def test_ssjoin_hot_shingle_shuffle_mode(ray_session):
    """The shuffle path's candidate-doc hash-cut must agree with driver
    mode on a hot-shingle corpus (df > _COOC_DF_CAP)."""
    n = 280
    rng = np.random.default_rng(17)
    vocab = [f"w{i}" for i in range(300)]
    texts = [f"shared lead tokens " + " ".join(
        rng.choice(vocab, size=5, replace=False)) for _ in range(n)]
    texts[7] = texts[8]
    ids = [f"s{i:03d}" for i in range(n)]
    ds = rd.from_pandas(pd.DataFrame({"doc_id": ids, "text": texts}),
                        override_num_blocks=4)
    drv = DD.ssjoin_pairs(ds, threshold=0.8, mode="driver").to_pandas()
    shf = DD.ssjoin_pairs(ds, threshold=0.8, mode="shuffle",
                          shuffle_buckets=5).to_pandas()
    pd.testing.assert_frame_equal(drv, shf)
    assert (("s007", "s008") in list(zip(drv["doc_id_a"],
                                         drv["doc_id_b"])))


def test_keep_first_exact_pair_method_agrees_with_minhash(ray_session):
    """Planner-seam agreement for dedup_near_keep_first's new
    pair_method: on a corpus whose near-dups are unambiguous (identical
    or ≥0.9-Jaccard copies — the regime where MinHash recall ≈ 1) the
    exact ssjoin pair stage and the probabilistic MinHash stage must
    keep exactly the same rows; unknown kwargs in the exact path fail
    loudly instead of silently dropping a typo."""
    import pytest

    pdf = corpus()
    d = rd.from_pandas(pdf, override_num_blocks=3).materialize()
    kept_mh, cl_mh = DD.dedup_near_keep_first(d, threshold=0.5)
    kept_ex, cl_ex = DD.dedup_near_keep_first(d, threshold=0.5,
                                              pair_method="exact",
                                              n_rows_hint=len(pdf))
    a = sorted(kept_mh.to_pandas()["doc_id"])
    b = sorted(kept_ex.to_pandas()["doc_id"])
    assert a == b
    assert (cl_mh.to_pandas()["cluster_id"].nunique()
            == cl_ex.to_pandas()["cluster_id"].nunique())
    with pytest.raises(TypeError, match="unknown"):
        DD.dedup_near_keep_first(d, threshold=0.5, pair_method="exact",
                                 n_rows_hnt=3)
    with pytest.raises(ValueError, match="pair_method"):
        DD.dedup_near_keep_first(d, threshold=0.5, pair_method="bogus")
