"""Versioned table: append/overwrite snapshots, time travel, snapshot
isolation against uncommitted writers, concurrent-claim failure, and
vacuum safety."""

import json
import os

import pandas as pd
import pytest

from cerberus_ray.sources.versioned import VersionedTable


def _df(lo, hi):
    return pd.DataFrame({"k": range(lo, hi), "v": [i * 2.0
                                                   for i in range(lo, hi)]})


@pytest.fixture()
def table(ray_session, tmp_path):
    import ray.data as rd

    t = VersionedTable(str(tmp_path / "tbl"))
    v0 = t.commit(rd.from_pandas(_df(0, 100)).repartition(3))
    v1 = t.commit(rd.from_pandas(_df(100, 150)).repartition(2))
    assert (v0, v1) == (0, 1)
    return t


def test_append_and_time_travel(table):
    assert table.read(0).count() == 100
    assert table.read(1).count() == 150
    assert table.read().count() == 150  # latest
    got = sorted(table.read().to_pandas()["k"])
    assert got == list(range(150))


def test_overwrite_resets_snapshot(table, ray_session):
    import ray.data as rd

    v2 = table.commit(rd.from_pandas(_df(500, 510)), mode="overwrite")
    assert v2 == 2
    assert sorted(table.read().to_pandas()["k"]) == list(range(500, 510))
    # history intact: old snapshots still readable
    assert table.read(1).count() == 150
    h = table.history().to_pandas()
    assert h["version"].tolist() == [0, 1, 2]
    assert h["rows"].tolist() == [100, 150, 10]


def test_uncommitted_writer_is_invisible(table, ray_session):
    import ray.data as rd

    # simulate a crashed writer: data directory, no manifest
    rd.from_pandas(_df(900, 950)).write_parquet(
        os.path.join(table.root, "data", "v99"))
    assert table.read().count() == 150
    assert table.latest_version() == 1


def test_concurrent_claim_fails_loudly(table, ray_session, monkeypatch):
    import ray.data as rd

    # a racing writer lands v2 AFTER this writer resolved latest=1 —
    # pin latest_version to simulate the window
    monkeypatch.setattr(VersionedTable, "latest_version", lambda self: 1)
    with open(os.path.join(table.root, "_manifests", "v2.json"), "x") as f:
        json.dump({"version": 2, "mode": "append", "files": [],
                   "rows": 0}, f)
    with pytest.raises(RuntimeError, match="committed concurrently"):
        table.commit(rd.from_pandas(_df(0, 5)))
    monkeypatch.undo()
    # history is uncorrupted: v2 is the racing writer's manifest
    assert table.latest_version() == 2


def test_vacuum_keeps_reachable_files_only(table, ray_session):
    import ray.data as rd

    table.commit(rd.from_pandas(_df(0, 10)), mode="overwrite")  # v2
    deleted = table.vacuum(keep_last=1)
    # v0/v1 files are unreachable from v2 (overwrite) → deleted
    assert deleted and all(d.startswith("data/v0") or d.startswith("data/v1")
                           for d in deleted)
    assert table.read().count() == 10
    with pytest.raises(ValueError):
        table.read(1)
    # append chains retain shared files: rebuild and vacuum keep_last=1
    t2 = VersionedTable(table.root + "_2")
    t2.commit(rd.from_pandas(_df(0, 10)))
    t2.commit(rd.from_pandas(_df(10, 20)))           # append → refs v0 files
    assert t2.vacuum(keep_last=1) == []              # everything reachable
    assert t2.read().count() == 20


def test_diff_between_versions(ray_session, tmp_path):
    import ray.data as rd

    t = VersionedTable(str(tmp_path / "d"))
    a = pd.DataFrame({"k": ["a", "b", "c"], "body": ["1", "2", "3"]})
    b = pd.DataFrame({"k": ["b", "c", "d"], "body": ["2", "CHANGED", "4"]})
    t.commit(rd.from_pandas(a))
    t.commit(rd.from_pandas(b), mode="overwrite")
    d = (t.diff(0, 1, key_col="k", content_col="body").to_pandas()
         .set_index("key")["status"])
    assert d.to_dict() == {"a": "removed", "b": "unchanged",
                           "c": "changed", "d": "added"}


def test_merge_commit(ray_session, tmp_path):
    import ray.data as rd

    t = VersionedTable(str(tmp_path / "m"))
    t.commit(rd.from_pandas(pd.DataFrame(
        {"k": [1, 2, 3], "v": [10.0, 20.0, 30.0]})))
    changes = rd.from_pandas(pd.DataFrame(
        {"k": [2, 4], "v": [99.0, 40.0]}))
    v = t.merge_commit(changes, "k")
    got = (t.read(v).to_pandas().sort_values("k")
           .reset_index(drop=True))
    assert got["k"].tolist() == [1, 2, 3, 4]
    assert got["v"].tolist() == [10.0, 99.0, 30.0, 40.0]
    # pre-merge snapshot still reachable
    assert sorted(t.read(0).to_pandas()["v"]) == [10.0, 20.0, 30.0]


def test_microbatch_stream_ingestion(ray_session, tmp_path):
    """Lakehouse loop: streaming micro-batches land as append commits —
    each version is a consistent prefix of the stream, time travel
    reaches every prior prefix, and a reader holding version v is
    isolated from later appends."""
    import ray.data as rd

    t = VersionedTable(str(tmp_path / "stream"))
    batches = [pd.DataFrame({"k": range(i * 10, (i + 1) * 10),
                             "v": [float(i)] * 10}) for i in range(5)]
    versions = [t.commit(rd.from_pandas(b)) for b in batches]
    assert versions == [0, 1, 2, 3, 4]
    # every snapshot = the exact stream prefix
    for i, ver in enumerate(versions):
        snap = t.read(ver).to_pandas()
        assert len(snap) == (i + 1) * 10
        assert set(snap["k"]) == set(range((i + 1) * 10))
    # snapshot isolation: a reader pinned at v2 does not see batch 5
    pinned = t.read(2)
    t.commit(rd.from_pandas(pd.DataFrame({"k": [999], "v": [9.9]})))
    assert pinned.count() == 30
    assert t.read().count() == 51


def test_read_pushdown(table):
    cols = table.read(columns=["k"]).schema().names
    assert cols == ["k"]
