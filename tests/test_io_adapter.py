"""Storage-adapter routing (S1): .lance paths go to the Lance reader /
writer when the library is importable, everything else to Parquet. The
sandbox has no pylance, so the Lance branch is exercised with a stubbed
reader — the routing logic is what this repo owns."""

import pytest

import cerberus_ray.sources.io as io


def test_read_routes_lance_when_available(monkeypatch):
    calls = {}
    monkeypatch.setattr(io, "HAVE_LANCE", True)
    monkeypatch.setattr(
        io.rd, "read_lance",
        lambda path, columns=None, **kw: calls.setdefault(
            "lance", (path, columns)),
        raising=False)
    monkeypatch.setattr(
        io.rd, "read_parquet",
        lambda path, columns=None, **kw: calls.setdefault(
            "parquet", (path, columns)))
    io.read_table("/data/docs.lance", columns=["doc_id"])
    assert calls == {"lance": ("/data/docs.lance", ["doc_id"])}
    io.read_table("/data/docs.parquet", columns=["doc_id"])
    assert calls["parquet"] == ("/data/docs.parquet", ["doc_id"])


def test_read_falls_back_without_lance(monkeypatch):
    calls = {}
    monkeypatch.setattr(io, "HAVE_LANCE", False)
    monkeypatch.setattr(
        io.rd, "read_parquet",
        lambda path, columns=None, **kw: calls.setdefault("parquet", path))
    io.read_table("/data/docs.lance")
    assert calls == {"parquet": "/data/docs.lance"}


def test_write_routing(monkeypatch):
    class DS:
        def __init__(self):
            self.calls = []

        def write_lance(self, path, **kw):
            self.calls.append(("lance", path))

        def write_parquet(self, path, **kw):
            self.calls.append(("parquet", path))

    monkeypatch.setattr(io, "HAVE_LANCE", True)
    ds = DS()
    io.write_table(ds, "/out/t.lance")
    io.write_table(ds, "/out/t")
    assert ds.calls == [("lance", "/out/t.lance"), ("parquet", "/out/t")]


@pytest.mark.skipif(not io.HAVE_LANCE, reason="pylance not installed")
def test_lance_roundtrip_when_available(ray_session, tmp_path):
    """Real Lance round-trip (runs the day pylance lands in the env):
    write a Dataset to .lance, read it back with column pruning, and
    check row/value parity with the parquet path."""
    import pandas as pd
    import ray.data as rd

    df = pd.DataFrame({"k": [1, 2, 3], "v": ["a", "b", "c"],
                       "w": [0.5, 1.5, 2.5]})
    p = str(tmp_path / "t.lance")
    io.write_table(rd.from_pandas(df), p)
    back = io.read_table(p, columns=["k", "v"]).to_pandas()
    assert sorted(back.columns) == ["k", "v"]
    assert (back.sort_values("k").reset_index(drop=True)
            .equals(df[["k", "v"]]))
