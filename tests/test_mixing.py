"""Data mixing + chunking: deterministic weighted sampling proportions
and exact chunk reconstruction."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from cerberus_ray.pipelines.mixing import chunk_documents, sample_by_source


def corpus(n=3000):
    rng = np.random.default_rng(5)
    srcs = rng.choice(["web", "books", "code"], size=n, p=[0.6, 0.3, 0.1])
    return pd.DataFrame({
        "doc_id": [f"d{i:05d}" for i in range(n)],
        "source": srcs,
        "text": [f"document number {i} body" for i in range(n)]})


def test_sampling_proportions_and_determinism(ray_session):
    df = corpus()
    w = {"web": 0.25, "books": 1.0, "code": 0.0}
    a = sample_by_source(rd.from_pandas(df), w).to_pandas()
    b = sample_by_source(rd.from_pandas(df), w).to_pandas()
    assert sorted(a["doc_id"]) == sorted(b["doc_id"])  # pure in (seed, key)
    by_src = a.groupby("source").size()
    n_web = (df["source"] == "web").sum()
    assert "code" not in by_src.index               # weight 0 drops all
    assert by_src.get("books", 0) == (df["source"] == "books").sum()
    assert abs(by_src.get("web", 0) / n_web - 0.25) < 0.05
    # a different seed selects a different subset
    c = sample_by_source(rd.from_pandas(df), w, seed=7).to_pandas()
    assert sorted(c["doc_id"]) != sorted(a["doc_id"])
    with pytest.raises(ValueError):
        sample_by_source(rd.from_pandas(df), {"web": 1.5})


def test_chunking_reconstructs_tokens(ray_session):
    rng = np.random.default_rng(9)
    rows = []
    for i in range(40):
        n_tok = int(rng.integers(0, 300))
        rows.append({"doc_id": f"c{i:03d}",
                     "text": " ".join(f"t{j}" for j in range(n_tok))})
    df = pd.DataFrame(rows)
    out = (chunk_documents(rd.from_pandas(df), max_tokens=64, overlap=8)
           .to_pandas().sort_values(["doc_id", "chunk_idx"]))
    step = 64 - 8
    for doc_id, g in out.groupby("doc_id"):
        orig = df.loc[df["doc_id"] == doc_id, "text"].iloc[0].split()
        rebuilt = []
        for ci, text in zip(g["chunk_idx"], g["text"]):
            toks = text.split()
            rebuilt.extend(toks if ci == 0 else toks[8:])
        assert rebuilt == orig, doc_id
        assert (g["n_tokens"] <= 64).all()
        # every chunk but the last starts at i*step
        assert list(g["chunk_idx"]) == list(range(len(g)))
    # empty docs emit nothing
    chunked_ids = set(out["doc_id"])
    empty_ids = {r["doc_id"] for _, r in df.iterrows()
                 if not r["text"].split()}
    assert chunked_ids.isdisjoint(empty_ids)
    assert chunked_ids | empty_ids == set(df["doc_id"])
    with pytest.raises(ValueError):
        chunk_documents(rd.from_pandas(df), max_tokens=8, overlap=8)


# ---- length-bucketed batching stats --------------------------------------


def _len_reference(df, min_cap=16):
    import numpy as np
    n = (df["text"].fillna("").str.lower().str.split().apply(len)
         .to_numpy(dtype=np.int64))
    cap = np.maximum(
        min_cap, 1 << np.ceil(np.log2(np.maximum(n, 1))).astype(np.int64))
    g = (pd.DataFrame({"bucket_cap": cap, "n": n, "pad": cap - n})
         .groupby("bucket_cap", as_index=False)
         .agg(n_docs=("n", "size"), n_tokens=("n", "sum"),
              pad_tokens=("pad", "sum"))
         .sort_values("bucket_cap").reset_index(drop=True))
    g["pad_frac"] = (g["pad_tokens"] / (g["bucket_cap"] * g["n_docs"])).round(4)
    return g


def test_length_buckets_match_pandas(ray_session):
    import numpy as np

    from cerberus_ray.pipelines.mixing import length_bucket_stats

    rng = np.random.default_rng(5)
    df = pd.DataFrame({
        "doc_id": range(300),
        "text": [" ".join("tok" for _ in range(int(rng.integers(0, 300))))
                 for _ in range(300)]})
    df.loc[0, "text"] = ""          # empty → min_cap bucket, 0 tokens
    df.loc[1, "text"] = None        # null → same convention
    out = length_bucket_stats(
        rd.from_pandas(df, override_num_blocks=5)).to_pandas()
    ref = _len_reference(df)
    pd.testing.assert_frame_equal(out, ref, check_dtype=False)
    # exact power-of-two boundary: a 64-token doc pads by 0 into cap 64
    df2 = pd.DataFrame({"doc_id": [0], "text": [" ".join(["x"] * 64)]})
    o2 = length_bucket_stats(rd.from_pandas(df2)).to_pandas()
    assert o2["bucket_cap"].tolist() == [64]
    assert o2["pad_tokens"].tolist() == [0]


def test_length_buckets_duckdb_token_parity(ray_session):
    """Token totals per bucket vs DuckDB on the real sf0.001 table (the
    bucket rounding itself is pinned by the pandas reference above)."""
    import duckdb

    from cerberus_ray.pipelines.training_queries import q_length_bucket_report

    sf = "/root/testdata/sf0.001"
    mine = q_length_bucket_report(sf).to_pandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf}/documents.parquet')")
    orc = con.execute(r"""
        SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n) AS BIGINT) AS n_tokens
        FROM (SELECT len(list_filter(string_split_regex(
                  lower(COALESCE(text,'')), '\s+'), t -> t <> '')) AS n
              FROM documents)
    """).fetch_df()
    assert int(mine["n_docs"].sum()) == int(orc["n_docs"].iloc[0])
    assert int(mine["n_tokens"].sum()) == int(orc["n_tokens"].iloc[0])
    # deterministic rerun
    again = q_length_bucket_report(sf).to_pandas()
    pd.testing.assert_frame_equal(mine, again)


# --- temperature mixing (exponential smoothing, XLM-R recipe) ---------

def test_temperature_weights_math():
    from cerberus_ray.pipelines.mixing import temperature_weights

    counts = {"web": 800, "books": 100, "code": 100}
    # alpha=1 → natural distribution → all rates 1
    r1 = temperature_weights(counts, alpha=1.0)
    assert all(abs(v - 1.0) < 1e-12 for v in r1.values())
    # alpha=0 → uniform target: rate ∝ 1/p, scarce sources keep all
    r0 = temperature_weights(counts, alpha=0.0)
    assert abs(r0["books"] - 1.0) < 1e-12 and abs(r0["code"] - 1.0) < 1e-12
    assert abs(r0["web"] - 100 / 800) < 1e-12
    # alpha=0.5: rate_i ∝ p_i^-0.5 → web keeps sqrt(0.1/0.8)
    r5 = temperature_weights(counts, alpha=0.5)
    assert abs(r5["web"] - (0.1 / 0.8) ** 0.5) < 1e-12
    import pytest as _pt
    with _pt.raises(ValueError):
        temperature_weights(counts, alpha=1.5)
    with _pt.raises(ValueError):
        temperature_weights({"a": 0}, alpha=0.5)


def test_source_counts_partition_invariant(ray_session):
    from cerberus_ray.pipelines.mixing import source_counts

    df = corpus()
    expect = df.groupby("source").size().to_dict()
    for blocks in (1, 7):
        got = source_counts(rd.from_pandas(df, override_num_blocks=blocks))
        assert got == {str(k): int(v) for k, v in expect.items()}


def test_sample_by_temperature_downsample(ray_session):
    from cerberus_ray.pipelines.mixing import sample_by_temperature

    df = corpus(6000)
    out, rates = sample_by_temperature(rd.from_pandas(df), alpha=0.3)
    kept = out.to_pandas().groupby("source").size()
    n_by = df.groupby("source").size()
    # scarcest source keeps everything (rate normalized to max=1)
    assert rates["code"] == 1.0 and kept["code"] == n_by["code"]
    # realized keep fractions track the computed rates
    for s in ("web", "books"):
        assert abs(kept[s] / n_by[s] - rates[s]) < 0.05
    # smoothing flattens: web share shrinks vs natural, code share grows
    assert kept["web"] / kept.sum() < n_by["web"] / n_by.sum()
    assert kept["code"] / kept.sum() > n_by["code"] / n_by.sum()


def test_resample_upsample_replicates(ray_session):
    from cerberus_ray.pipelines.mixing import resample_by_rate

    df = corpus(2000)
    out = resample_by_rate(rd.from_pandas(df, override_num_blocks=5),
                           {"code": 2.5, "web": 1.0, "books": 1.0}
                           ).to_pandas()
    code = out[out["source"] == "code"]
    n_code = (df["source"] == "code").sum()
    # every code row appears 2 or 3 times; expectation 2.5
    per = code.groupby("doc_id").size()
    assert set(per.unique()) <= {2, 3}
    assert abs(len(code) / n_code - 2.5) < 0.2
    # copy_ix makes (doc_id, copy_ix) unique across the whole output
    assert not out.duplicated(["doc_id", "copy_ix"]).any()
    # deterministic + partition-invariant
    out2 = resample_by_rate(rd.from_pandas(df, override_num_blocks=1),
                            {"code": 2.5, "web": 1.0, "books": 1.0}
                            ).to_pandas()
    a = out.sort_values(["doc_id", "copy_ix"]).reset_index(drop=True)
    b = out2.sort_values(["doc_id", "copy_ix"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_sample_by_temperature_upsample_mode(ray_session):
    from cerberus_ray.pipelines.mixing import sample_by_temperature

    df = corpus(6000)
    out, rates = sample_by_temperature(
        rd.from_pandas(df), alpha=0.3, upsample=True)
    kept = out.to_pandas().groupby("source").size()
    n_by = df.groupby("source").size()
    # the LARGEST source keeps everything; scarce sources replicate >1×
    assert abs(rates["web"] - 1.0) < 1e-12
    assert kept["web"] == n_by["web"]
    assert rates["code"] > 1.0 and kept["code"] > n_by["code"]


def test_chunk_documents_rejects_negative_overlap(ray_session):
    import pytest

    from cerberus_ray.pipelines.mixing import chunk_documents

    df = pd.DataFrame({"doc_id": [1], "text": ["a b c d e f"]})
    with pytest.raises(ValueError, match="non-negative"):
        chunk_documents(rd.from_pandas(df), max_tokens=4, overlap=-2)
