"""Sketch unit tests: exact-vs-sketch agreement at small scale
(SURVEY.md §7 step 4) + merge = commutative/associative determinism."""

import numpy as np

from cerberus_ray.state import BloomFilter, CountMinSketch, HyperLogLog, TDigest


def test_hll_estimate_accuracy():
    h = HyperLogLog(p=14)
    n = 50_000
    h.update_ints(np.arange(n))
    est = h.estimate()
    assert abs(est - n) / n < 0.03


def test_hll_merge_equals_union():
    a, b, c = HyperLogLog(), HyperLogLog(), HyperLogLog()
    a.update_ints(np.arange(0, 10_000))
    b.update_ints(np.arange(5_000, 20_000))
    c.update_ints(np.arange(0, 20_000))
    merged = HyperLogLog.from_bytes(a.to_bytes()).merge(b)
    assert np.array_equal(merged.registers, c.registers)
    # commutative
    m2 = HyperLogLog.from_bytes(b.to_bytes()).merge(a)
    assert np.array_equal(m2.registers, merged.registers)


def test_hll_strings_duplicates_dont_change():
    h1, h2 = HyperLogLog(), HyperLogLog()
    keys = [f"k{i}" for i in range(1000)]
    h1.update_strings(np.array(keys, dtype=object))
    h2.update_strings(np.array(keys * 3, dtype=object))
    assert h1.estimate() == h2.estimate()


def test_bloom_no_false_negatives():
    bf = BloomFilter(n_bits=BloomFilter.size_for(10_000), k=5)
    keys = np.array([f"key-{i}" for i in range(10_000)], dtype=object)
    bf.add(keys)
    assert bf.contains(keys).all()


def test_bloom_low_false_positive_rate():
    bf = BloomFilter(n_bits=BloomFilter.size_for(10_000, 0.01), k=5)
    bf.add(np.array([f"key-{i}" for i in range(10_000)], dtype=object))
    other = np.array([f"other-{i}" for i in range(10_000)], dtype=object)
    fpp = bf.contains(other).mean()
    assert fpp < 0.03


def test_bloom_merge_or():
    a = BloomFilter(n_bits=1 << 12)
    b = BloomFilter(n_bits=1 << 12)
    a.add(np.array(["x", "y"], dtype=object))
    b.add(np.array(["z"], dtype=object))
    a.merge(BloomFilter.from_bytes(b.to_bytes()))
    assert a.contains(np.array(["x", "y", "z"], dtype=object)).all()


def test_countmin_never_undercounts():
    cm = CountMinSketch(width=1 << 12, depth=4)
    keys = np.array([f"k{i % 100}" for i in range(5000)], dtype=object)
    cm.add(keys)
    uniq = np.array([f"k{i}" for i in range(100)], dtype=object)
    est = cm.query(uniq)
    assert (est >= 50).all()
    assert est.sum() >= 5000


def test_countmin_merge():
    a, b = CountMinSketch(width=256, depth=3), CountMinSketch(width=256, depth=3)
    a.add(np.array(["x"] * 10, dtype=object))
    b.add(np.array(["x"] * 5, dtype=object))
    a.merge(CountMinSketch.from_bytes(b.to_bytes()))
    assert a.query(np.array(["x"], dtype=object))[0] >= 15


def test_tdigest_quantiles_close_to_exact():
    rng = np.random.default_rng(42)
    v = rng.normal(100, 15, size=200_000)
    td = TDigest(compression=200)
    for chunk in np.array_split(v, 20):
        td.update(chunk)
    for q in (0.01, 0.25, 0.5, 0.75, 0.99):
        exact = np.quantile(v, q)
        approx = td.quantile(q)
        assert abs(approx - exact) < 1.0, (q, exact, approx)


def test_tdigest_merge_matches_single():
    rng = np.random.default_rng(7)
    v = rng.exponential(10, size=100_000)
    parts = np.array_split(v, 8)
    digests = []
    for p in parts:
        td = TDigest(compression=100)
        td.update(p)
        digests.append(td)
    acc = TDigest.from_bytes(digests[0].to_bytes())
    for d in digests[1:]:
        acc.merge(d)
    assert abs(acc.count - len(v)) < 1e-6
    for q in (0.1, 0.5, 0.9):
        assert abs(acc.quantile(q) - np.quantile(v, q)) / np.quantile(v, q) < 0.05


def test_tdigest_cdf_roundtrip():
    td = TDigest()
    td.update(np.linspace(0, 100, 10_000))
    assert abs(td.cdf(50.0) - 0.5) < 0.01
    assert td.cdf(-1) == 0.0 and td.cdf(1000) == 1.0
