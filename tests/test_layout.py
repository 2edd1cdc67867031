"""Z-order layout: Morton interleave, sort invariants, and the payoff —
footer-stat pruning of multi-column range scans (fewer row groups read
than the natural layout) with DuckDB-parity on the scan result."""

import os

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from cerberus_ray.stages.layout import (
    fit_zorder_boundaries,
    interleave_bits,
    range_count,
    rowgroups_overlapping,
    zorder_sort,
)

SF_DIR = "/root/testdata/sf0.001"


def test_interleave_known_values():
    # col0 owns the MSB of each bit round: (a=0b10, b=0b01), bits=2
    # bit layout (msb..lsb): a1 b1 a0 b0 = 1 0 0 1 = 9
    z = interleave_bits([np.array([0b10]), np.array([0b01])], bits=2)
    assert z.tolist() == [9]
    # leading column dominates: a=1,b=0 sorts after a=0,b=1
    z2 = interleave_bits([np.array([0, 1]), np.array([1, 0])], bits=1)
    assert z2[0] < z2[1]


def test_interleave_rejects_overflow():
    with pytest.raises(ValueError):
        interleave_bits([np.zeros(1)] * 4, bits=16)


def _grid_ds(ray_session, n=4096, seed=7):
    import ray.data as rd

    rng = np.random.default_rng(seed)
    df = pd.DataFrame({
        "x": rng.permutation(n).astype(np.int64),
        "y": rng.integers(0, n, n, dtype=np.int64),
        "payload": np.arange(n, dtype=np.int64),
    })
    return rd.from_pandas(df).repartition(8), df


def test_zorder_sort_preserves_rows_and_orders_by_z(ray_session):
    ds, df = _grid_ds(ray_session, n=2048)
    out = zorder_sort(ds, ["x", "y"], bits=8).to_pandas()
    assert sorted(out.columns) == ["payload", "x", "y"]
    pd.testing.assert_frame_equal(
        out.sort_values("payload").reset_index(drop=True),
        df.sort_values("payload").reset_index(drop=True),
        check_like=True)
    # rerun determinism: same input blocks → bit-identical output order
    out2 = zorder_sort(ds, ["x", "y"], bits=8).to_pandas()
    pd.testing.assert_frame_equal(out, out2)
    # a different block layout may move boundary-edge rows, but the row
    # SET is invariant
    import ray.data as rd

    out3 = zorder_sort(rd.from_pandas(df.iloc[::-1].reset_index(drop=True))
                       .repartition(3), ["x", "y"], bits=8).to_pandas()
    pd.testing.assert_frame_equal(
        out3.sort_values("payload").reset_index(drop=True),
        df.sort_values("payload").reset_index(drop=True), check_like=True)


def test_boundaries_are_equi_depth(ray_session):
    ds, df = _grid_ds(ray_session, n=4096)
    b = fit_zorder_boundaries(ds, ["x"], bits=4)["x"]
    assert len(b) == 15 and np.all(np.diff(b) >= 0)
    # x is a permutation of arange(n): equi-depth cuts ≈ n * k/16
    expect = 4096 * (np.arange(1, 16) / 16.0)
    assert np.all(np.abs(b - expect) < 4096 * 0.05)


def test_zorder_handles_nulls(ray_session):
    import ray.data as rd

    df = pd.DataFrame({"x": [1.0, None, 3.0, None], "y": [4, 3, 2, 1]})
    out = zorder_sort(rd.from_pandas(df), ["x", "y"], bits=4).to_pandas()
    # nulls survive the layout pass (they share the TOP rank bucket with
    # max values rather than scattering — no positional guarantee beyond
    # that)
    assert len(out) == 4 and out["x"].isna().sum() == 2


def test_pruning_beats_natural_layout(ray_session, tmp_path):
    ds, df = _grid_ds(ray_session, n=8192)
    nat, zod = str(tmp_path / "nat"), str(tmp_path / "zod")
    ds.repartition(16).write_parquet(nat)
    zorder_sort(ds, ["x", "y"], bits=8).repartition(16).write_parquet(zod)

    preds = {"x": (3000.0, 3800.0), "y": (3000.0, 3800.0)}
    exact = int(((df.x >= 3000) & (df.x <= 3800)
                 & (df.y >= 3000) & (df.y <= 3800)).sum())
    assert range_count(nat, preds) == exact
    assert range_count(zod, preds) == exact

    tot_n, hit_n = rowgroups_overlapping(nat, preds)
    tot_z, hit_z = rowgroups_overlapping(zod, preds)
    # natural layout: both columns scattered → ~every row group overlaps
    assert tot_n >= 8 and hit_n / tot_n > 0.9, (hit_n, tot_n)
    # z-order: the 2-D band lives in a small fraction of the row groups
    assert tot_z >= 8 and hit_z / tot_z < 0.5 * hit_n / tot_n, (
        hit_z, tot_z, hit_n, tot_n)


def test_zorder_layout_report(ray_session):
    from cerberus_ray.pipelines.training_queries import q_zorder_layout_report

    r = q_zorder_layout_report(SF_DIR).to_pydict()
    # the scan count matches the oracle over the ORIGINAL table
    path = os.path.join(SF_DIR, "events.parquet")
    exact = duckdb.sql(
        f"SELECT count(*) FROM read_parquet('{path}') WHERE "
        f"user_id BETWEEN {r['user_lo'][0]} AND {r['user_hi'][0]} AND "
        f"value BETWEEN {r['value_lo'][0]} AND {r['value_hi'][0]}"
    ).fetchone()[0]
    assert r["n_match"][0] == exact
    # the z-order layout prunes strictly better than natural order
    frac_n = r["rg_hit_natural"][0] / r["rg_total_natural"][0]
    frac_z = r["chunks_hit_zorder"][0] / r["chunks_total_zorder"][0]
    assert frac_z < frac_n, r
    # deterministic (the old file-based metric wobbled with Ray sort's
    # sampled range boundaries — the reason for the chunk formulation)
    assert q_zorder_layout_report(SF_DIR).to_pydict() == r


def test_range_count_matches_duckdb_on_events(ray_session):
    path = os.path.join(SF_DIR, "events.parquet")
    preds = {"user_id": (100.0, 300.0), "value": (10.0, 60.0)}
    mine = range_count(path, preds)
    theirs = duckdb.sql(
        f"SELECT count(*) FROM read_parquet('{path}') WHERE "
        "user_id BETWEEN 100 AND 300 AND value BETWEEN 10 AND 60"
    ).fetchone()[0]
    assert mine == theirs
