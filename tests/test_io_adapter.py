"""Storage-adapter routing (S1): .lance paths go to the Lance reader /
writer when the library is importable, everything else to Parquet. The
sandbox has no pylance, so the Lance branch is exercised with a stubbed
reader — the routing logic is what this repo owns."""

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
