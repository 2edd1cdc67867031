"""Fuzzy join: batch-Levenshtein exactness vs a slow reference, DuckDB
levenshtein() brute-force parity (full recall of FastSS blocking),
unicode, k validation."""

import duckdb
import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from cerberus_ray.pipelines.fuzzyjoin import fuzzy_join, levenshtein_batch


def _lev_ref(a, b):
    la, lb = len(a), len(b)
    d = list(range(lb + 1))
    for i in range(1, la + 1):
        prev = d[0]
        d[0] = i
        for j in range(1, lb + 1):
            cur = min(prev + (a[i - 1] != b[j - 1]), d[j] + 1,
                      d[j - 1] + 1)
            prev, d[j] = d[j], cur
    return d[lb]


def test_levenshtein_batch_reference():
    rng = np.random.default_rng(17)
    letters = list("abcde")
    pairs = []
    for _ in range(300):
        la, lb = rng.integers(0, 9, size=2)
        pairs.append(("".join(rng.choice(letters, la)),
                      "".join(rng.choice(letters, lb))))
    a = np.array([p[0] for p in pairs], dtype=object)
    b = np.array([p[1] for p in pairs], dtype=object)
    got = levenshtein_batch(a, b)
    want = np.array([_lev_ref(x, y) for x, y in pairs])
    np.testing.assert_array_equal(got, want)


def test_levenshtein_unicode_and_guard():
    got = levenshtein_batch(np.array(["caffè", "naïve"], dtype=object),
                            np.array(["caffe", "naive"], dtype=object))
    np.testing.assert_array_equal(got, [1, 1])
    with pytest.raises(ValueError, match="max_len"):
        levenshtein_batch(np.array(["x" * 10], dtype=object),
                          np.array(["y"], dtype=object), max_len=5)


#: ASCII-only: DuckDB's levenshtein() counts BYTES (a 2-byte umlaut
#: substitution costs 2), ours counts CODEPOINTS — the unicode
#: difference is asserted separately below.
NAMES_L = ["smith", "johnson", "wiliams", "brown", "jones", "garcia",
           "miller", "davis", "rodrigez", "martinez"]
NAMES_R = ["smyth", "jonson", "williams", "braun", "jones", "garcya",
           "miler", "davies", "rodriguez", "martinez"]


@pytest.mark.parametrize("k", [1, 2])
def test_duckdb_bruteforce_parity(ray_session, k):
    left = rd.from_pandas(pd.DataFrame({"name": NAMES_L}),
                          override_num_blocks=3)
    right = rd.from_pandas(pd.DataFrame({"name": NAMES_R}),
                           override_num_blocks=2)
    got = fuzzy_join(left, right, "name", k=k, n_buckets=7)
    la, ra = pd.DataFrame({"name": NAMES_L}), pd.DataFrame({"name": NAMES_R})
    want = duckdb.sql(f"""
        SELECT DISTINCT la.name AS "left", ra.name AS "right",
               CAST(levenshtein(la.name, ra.name) AS BIGINT) AS dist
        FROM la, ra
        WHERE levenshtein(la.name, ra.name) <= {k}
        ORDER BY "left", "right"
    """).fetchdf()
    pd.testing.assert_frame_equal(got, want)
    assert len(got) > 0


def test_unicode_codepoint_semantics(ray_session):
    """ours: ü→u is ONE codepoint edit (found at k=1); DuckDB's
    byte-level levenshtein('müller','muller') = 2."""
    left = rd.from_pandas(pd.DataFrame({"name": ["müller"]}))
    right = rd.from_pandas(pd.DataFrame({"name": ["muller"]}))
    got = fuzzy_join(left, right, "name", k=1)
    assert got["dist"].tolist() == [1]
    assert int(duckdb.sql(
        "SELECT levenshtein('müller', 'muller')").fetchone()[0]) == 2


def test_k_validation(ray_session):
    ds = rd.from_pandas(pd.DataFrame({"name": ["a"]}))
    with pytest.raises(ValueError, match="k must be 1 or 2"):
        fuzzy_join(ds, ds, "name", k=3)
