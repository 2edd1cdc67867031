"""MERGE/upsert: DuckDB anti-join+union parity, delete tombstones,
version resolution, mode agreement, error paths."""

import duckdb
import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from cerberus_ray.pipelines.merge import merge_upsert


def _base():
    return pd.DataFrame({
        "id": np.arange(20),
        "val": [f"v{i}" for i in range(20)],
        "score": np.arange(20) * 1.0})


def _changes():
    return pd.DataFrame({
        "id": [3, 7, 25, 11, 7],
        "val": ["V3", "V7-old", "V25", "V11", "V7-new"],
        "score": [30.0, 70.0, 250.0, 110.0, 71.0],
        "op": ["upsert", "upsert", "upsert", "delete", "upsert"],
        "ver": [1, 1, 1, 1, 2]})


def _norm(df):
    return (df.sort_values("id").reset_index(drop=True)
            [["id", "val", "score"]].astype({"id": "int64"}))


@pytest.mark.parametrize("mode", ["broadcast", "shuffle"])
def test_merge_semantics_and_duckdb_parity(ray_session, mode):
    base, ch = _base(), _changes()
    got = _norm(merge_upsert(
        rd.from_pandas(base, override_num_blocks=3),
        rd.from_pandas(ch, override_num_blocks=2),
        "id", op_col="op", version_col="ver", mode=mode).to_pandas())
    want = _norm(duckdb.sql("""
        WITH win AS (
          SELECT * FROM ch QUALIFY ver = MAX(ver) OVER (PARTITION BY id)
        )
        SELECT id, val, score FROM base
        WHERE id NOT IN (SELECT id FROM win)
        UNION ALL
        SELECT id, val, score FROM win WHERE op <> 'delete'
    """).fetchdf())
    pd.testing.assert_frame_equal(got, want)
    assert 11 not in got["id"].tolist()                 # deleted
    assert got.loc[got["id"] == 7, "val"].iloc[0] == "V7-new"  # version
    assert 25 in got["id"].tolist()                     # insert


def test_no_opcol_upsert_only(ray_session):
    base = rd.from_pandas(_base())
    ch = rd.from_pandas(pd.DataFrame({
        "id": [1, 99], "val": ["X", "Y"], "score": [0.0, 9.0]}))
    got = _norm(merge_upsert(base, ch, "id").to_pandas())
    assert len(got) == 21
    assert got.loc[got["id"] == 1, "val"].iloc[0] == "X"


@pytest.mark.parametrize("mode", ["broadcast", "shuffle"])
def test_duplicate_keys_raise(ray_session, mode):
    base = rd.from_pandas(_base())
    ch = rd.from_pandas(pd.DataFrame({
        "id": [1, 1], "val": ["A", "B"], "score": [0.0, 1.0]}))
    with pytest.raises((ValueError, Exception),
                       match="repeats keys|version"):
        merge_upsert(base, ch, "id", mode=mode).to_pandas()


def test_version_tie_raises(ray_session):
    base = rd.from_pandas(_base())
    ch = rd.from_pandas(pd.DataFrame({
        "id": [1, 1], "val": ["A", "B"], "score": [0.0, 1.0],
        "ver": [5, 5]}))
    with pytest.raises(Exception, match="tie"):
        merge_upsert(base, ch, "id", version_col="ver",
                     mode="broadcast").to_pandas()


def test_empty_changes(ray_session):
    base = rd.from_pandas(_base())
    ch = rd.from_pandas(pd.DataFrame({
        "id": pd.Series([], dtype="int64"),
        "val": pd.Series([], dtype="object"),
        "score": pd.Series([], dtype="float64")}))
    got = _norm(merge_upsert(base, ch, "id",
                             mode="broadcast").to_pandas())
    pd.testing.assert_frame_equal(got, _norm(_base()))


def test_all_null_version_single_row_wins(ray_session):
    base = rd.from_pandas(_base())
    ch = rd.from_pandas(pd.DataFrame({
        "id": [1], "val": ["ONLY"], "score": [1.0],
        "ver": [np.nan]}))
    got = _norm(merge_upsert(base, ch, "id", version_col="ver",
                             mode="broadcast").to_pandas())
    assert got.loc[got["id"] == 1, "val"].iloc[0] == "ONLY"
    # several all-null-version rows for one key: unresolvable
    ch2 = rd.from_pandas(pd.DataFrame({
        "id": [1, 1], "val": ["A", "B"], "score": [0.0, 1.0],
        "ver": [np.nan, np.nan]}))
    with pytest.raises(Exception, match="tie"):
        merge_upsert(base, ch2, "id", version_col="ver",
                     mode="broadcast").to_pandas()
