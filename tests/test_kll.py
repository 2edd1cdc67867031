"""KLL streaming-quantiles sketch: rank-error bounds, mergeability,
determinism, serialization, and the per-block partial pattern."""

import numpy as np
import pyarrow as pa
import pytest

from cerberus_ray.state.kll import KLL

QS = (0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99)


def rank_error(sketch, data, q):
    est = sketch.quantile(q)
    return abs(np.searchsorted(np.sort(data), est) / len(data) - q)


@pytest.mark.parametrize("dist", ["uniform", "normal", "lognormal"])
def test_rank_accuracy(dist):
    rng = np.random.default_rng(5)
    x = getattr(rng, dist)(size=50_000)
    s = KLL(k=200)
    s.update(x)
    for q in QS:
        assert rank_error(s, x, q) <= 0.02, (dist, q)


def test_merge_matches_single_sketch_accuracy():
    rng = np.random.default_rng(9)
    x = rng.normal(size=60_000)
    parts = np.array_split(x, 13)
    merged = KLL(k=200)
    for p in parts:
        s = KLL(k=200)
        s.update(p)
        merged = merged.merge(s)
    assert merged.n == len(x)
    for q in QS:
        assert rank_error(merged, x, q) <= 0.025, q


def test_deterministic_and_serializable():
    rng = np.random.default_rng(3)
    x = rng.uniform(size=30_000)
    a, b = KLL(k=128), KLL(k=128)
    a.update(x)
    b.update(x)
    assert a.to_bytes() == b.to_bytes()
    c = KLL.from_bytes(a.to_bytes())
    assert c.n == a.n
    for q in QS:
        assert c.quantile(q) == a.quantile(q)


def test_rank_and_edges():
    s = KLL()
    assert np.isnan(s.quantile(0.5)) and np.isnan(s.rank(0.0))
    s.update([1.0, 2.0, 3.0, np.nan])
    assert s.n == 3  # nan filtered
    assert s.quantile(0.0) == 1.0 and s.quantile(1.0) == 3.0
    assert s.rank(2.0) == pytest.approx(2 / 3)
    with pytest.raises(ValueError):
        s.quantile(1.5)
    with pytest.raises(ValueError):
        KLL(k=2)


def test_per_block_partials_via_ray(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(17)
    x = rng.normal(size=40_000)
    ds = rd.from_arrow(pa.table({"v": x})).repartition(8)

    def partial(b: pa.Table) -> pa.Table:
        s = KLL(k=200)
        s.update(b["v"].to_numpy(zero_copy_only=False))
        return pa.Table.from_pydict(
            {"sk": pa.array([s.to_bytes().hex()], pa.string())})

    pdf = ds.map_batches(partial, batch_format="pyarrow",
                         zero_copy_batch=True).to_pandas()
    merged = KLL(k=200)
    for h in pdf["sk"]:
        merged = merged.merge(KLL.from_bytes(bytes.fromhex(h)))
    assert merged.n == len(x)
    for q in QS:
        assert rank_error(merged, x, q) <= 0.025, q


def test_rank_correct_on_unsorted_level0_buffer():
    """Level-0 buffers are unsorted between compactions; rank must use
    an order-independent count (a searchsorted there returned garbage)."""
    s = KLL(k=200)
    s.update([5.0, 1.0, 9.0, 2.0])
    assert s.rank(6.0) == 0.75
    assert s.rank(1.5) == 0.25
    assert s.rank(9.0) == 1.0


def test_compaction_conserves_total_weight():
    """Σ level weights must equal n (classical KLL retains the unpaired
    item of an odd-sized level; promoting it drifted weight by ±2^j,
    eating the rank-error budget)."""
    rng = np.random.default_rng(0)
    for k in (64, 200):
        s = KLL(k=k)
        for _ in range(20):
            s.update(rng.uniform(size=50_000))
        total = sum((1 << j) * len(lvl) for j, lvl in enumerate(s.levels))
        assert total == s.n == 1_000_000, (k, total, s.n)


def test_merge_is_in_place_like_sibling_sketches():
    rng = np.random.default_rng(1)
    x = rng.normal(size=20_000)
    acc = KLL(k=200)
    for chunk in np.array_split(x, 7):
        part = KLL(k=200)
        part.update(chunk)
        acc.merge(part)          # no reassignment — must still absorb
    assert acc.n == len(x)
    assert abs(acc.rank(float(np.quantile(x, 0.5))) - 0.5) <= 0.025
