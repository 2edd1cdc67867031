"""round_away must be bit-exact against DuckDB ROUND — the whole point
of replacing pc.round (tests need no Ray session)."""

import duckdb
import numpy as np

from cerberus_ray.determinism import round_away


def test_round_away_matches_duckdb_bitexact():
    rng = np.random.default_rng(42)
    # mix of magnitudes, signs, near-tie values, and exact 2-dp money
    vals = np.concatenate([
        rng.uniform(-1e6, 1e6, 40000),
        np.round(rng.uniform(0, 1e5, 30000), 2),
        rng.uniform(-1, 1, 20000),
        np.arange(10000) * 0.005 - 25.0,      # tie-adjacent grid
    ])
    con = duckdb.connect()
    con.register("t", __import__("pandas").DataFrame({"x": vals}))
    for nd in (2, 4):
        got = round_away(vals, nd)
        want = con.execute(f"select round(x, {nd}) r from t").fetchnumpy()["r"]
        same = got.view(np.uint64) == want.view(np.uint64)
        assert same.all(), (
            f"ndigits={nd}: {(~same).sum()} bit-diffs, first at "
            f"x={vals[~same][0]!r}: {got[~same][0]!r} vs {want[~same][0]!r}")


def test_round_away_scalar_properties():
    assert round_away([1.005], 2)[0] in (1.0, 1.01)  # binary 1.005 < 1.005
    assert round_away([2.675], 2)[0] in (2.67, 2.68)
    out = round_away([657.5500000000001], 2)[0]
    assert repr(out) == "657.55"
    assert round_away([-1.5], 0)[0] == -2.0          # half away from zero
    assert round_away([1.5], 0)[0] == 2.0
