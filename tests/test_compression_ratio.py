"""Compression-ratio quality signal: exact zlib reference parity,
redundant-vs-natural ordering, empty/null conventions, sf0.001 rollup
determinism."""

import zlib

import pandas as pd
import ray.data as rd

from cerberus_ray.pipelines.text import compression_ratio

SF = "/root/testdata/sf0.001"


def test_reference_parity_and_ordering(ray_session):
    docs = pd.DataFrame({
        "doc_id": ["rep", "nat", "empty", "null"],
        "text": ["spam " * 200,
                 "A quiet fox wanders past the old mill while church bells "
                 "ring across the frosted valley and children trade stories.",
                 "", None]})
    out = (compression_ratio(rd.from_pandas(docs)).to_pandas()
           .set_index("doc_id"))
    for d, t in zip(docs["doc_id"], docs["text"]):
        enc = (t or "").encode()
        assert out.loc[d, "n_bytes"] == len(enc)
        want = len(zlib.compress(enc, 6)) if enc else 0
        assert out.loc[d, "n_compressed"] == want
    # machine-repetitive text compresses far better than prose
    assert out.loc["rep", "ratio"] < 0.1 < out.loc["nat", "ratio"]
    assert out.loc["empty", "ratio"] == 1.0
    assert out.loc["null", "ratio"] == 1.0


def test_sf0001_deterministic(ray_session):
    from cerberus_ray.sources.io import read_table

    ds = read_table(f"{SF}/documents.parquet",
                    columns=["doc_id", "text"]).materialize()
    a = compression_ratio(ds).to_pandas().sort_values(
        "doc_id").reset_index(drop=True)
    b = compression_ratio(ds).to_pandas().sort_values(
        "doc_id").reset_index(drop=True)
    assert a.equals(b)
    assert (a["ratio"] > 0).all() and (a["ratio"] <= 1.5).all()
