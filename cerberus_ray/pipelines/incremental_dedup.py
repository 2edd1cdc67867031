"""Incremental near-dedup — probe NEW documents against a persisted
MinHash bucket index of the existing corpus.

The continual-ingestion story at 100 TB: re-running full-corpus MinHash
per daily batch re-hashes 10^12 docs to dedup 10^7 arrivals. Instead the
corpus's (bucket, key, sig) band rows persist once as a parquet index
SORTED BY BUCKET (so row-group statistics prune the probe scan), and a
new batch dedups by:

1. one streamed pass over the NEW batch → its (bucket, key, sig) rows
   (a new batch is ≪ corpus, all its band rows fit the driver);
2. the new batch's distinct bucket set broadcast once (``ray.put``,
   sorted int64 array);
3. one streamed, bucket-pruned pass over the INDEX: each index block
   keeps only rows whose bucket is in the broadcast set (searchsorted) —
   index rows for non-colliding buckets never leave the scan, and the
   sorted layout means most row groups are skipped entirely;
4. in-bucket pairs on the driver, REQUIRING ≥ 1 new member (old-old
   pairs were already reported when the index was built), with the same
   signature-estimated Jaccard accept as the batch path.

Matches the batch `minhash_near_dup_pairs` exactly on the pairs that
involve a new document (agreement-tested), because both sides share
``minhash_signatures``/``band_hashes`` and the index manifest pins
(k, w, bands, seed) — a probe with different parameters raises.
"""

from __future__ import annotations

import json
import os
from typing import Optional

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray

from .dedup import band_hashes, minhash_signatures

__all__ = ["build_minhash_index", "probe_minhash_index",
           "IndexParamsMismatch"]

_MANIFEST = "_MINHASH_INDEX.json"


class IndexParamsMismatch(ValueError):
    """Probe parameters differ from the ones the index was built with."""


def _band_rows(batch: pa.Table, text_col: str, key_col: str,
               k: int, w: int, bands: int, seed: int) -> pa.Table:
    texts = batch[text_col].to_numpy(zero_copy_only=False)
    keys = pc.cast(batch[key_col], pa.string()).to_numpy(
        zero_copy_only=False)
    sigs = minhash_signatures(texts, k=k, w=w, seed=seed)
    bh = band_hashes(sigs, bands=bands)
    n = len(texts)
    bucket = (np.ascontiguousarray(bh.reshape(-1)).view(np.int64)
              ^ (np.tile(np.arange(bands, dtype=np.int64), n)
                 << np.int64(56)))
    doc_idx = np.repeat(np.arange(n), bands)
    return pa.Table.from_pydict({
        "bucket": pa.array(bucket, pa.int64()),
        "key": pa.array(keys[doc_idx], pa.string()),
        "sig": pa.array([sigs[i].tobytes() for i in doc_idx],
                        pa.binary())})


def build_minhash_index(ds, out_dir: str, *, text_col: str = "text",
                        key_col: str = "doc_id", k: int = 128, w: int = 3,
                        bands: int = 16, seed: int = 42) -> str:
    """Persist the corpus's MinHash band rows as a bucket-sorted parquet
    index + a parameter manifest. One streamed signature pass + one
    range sort (the only all-to-all — it buys row-group pruning for
    every future probe). Returns ``out_dir``."""
    os.makedirs(out_dir, exist_ok=True)
    rows = ds.map_batches(
        lambda b: _band_rows(b, text_col, key_col, k, w, bands, seed),
        batch_format="pyarrow", zero_copy_batch=True)
    rows.sort("bucket").write_parquet(out_dir)
    with open(os.path.join(out_dir, _MANIFEST), "w") as f:
        json.dump({"k": k, "w": w, "bands": bands, "seed": seed,
                   "text_col": text_col, "key_col": key_col}, f)
    return out_dir


def probe_minhash_index(new_ds, index_dir: str, *,
                        text_col: str = "text", key_col: str = "doc_id",
                        k: int = 128, w: int = 3, bands: int = 16,
                        seed: int = 42,
                        threshold: float = 0.8) -> pa.Table:
    """→ (doc_id_a, doc_id_b, jaccard_est, pair_kind) for pairs with a
    NEW member: pair_kind ∈ {'new-old', 'new-new'}; within a pair kind
    ids are sorted (a < b). Old-old pairs are never re-reported."""
    import ray.data as rd

    with open(os.path.join(index_dir, _MANIFEST)) as f:
        man = json.load(f)
    got = {"k": k, "w": w, "bands": bands, "seed": seed}
    want = {x: man[x] for x in got}
    if got != want:
        raise IndexParamsMismatch(f"index built with {want}, probe uses {got}")

    new_rows = new_ds.map_batches(
        lambda b: _band_rows(b, text_col, key_col, k, w, bands, seed),
        batch_format="pyarrow", zero_copy_batch=True).to_pandas()
    empty = pa.Table.from_pydict({
        "doc_id_a": pa.array([], pa.string()),
        "doc_id_b": pa.array([], pa.string()),
        "jaccard_est": pa.array([], pa.float64()),
        "pair_kind": pa.array([], pa.string())})
    if not len(new_rows):
        return empty
    probe_buckets = np.sort(new_rows["bucket"].unique().astype(np.int64))
    bref = ray.put(probe_buckets)

    def hits(b: pa.Table) -> pa.Table:
        pb = ray.get(bref)
        buck = b["bucket"].to_numpy(zero_copy_only=False)
        pos = np.clip(np.searchsorted(pb, buck), 0, len(pb) - 1)
        return b.filter(pa.array(pb[pos] == buck))

    old_rows = (rd.read_parquet(index_dir)
                .map_batches(hits, batch_format="pyarrow",
                             zero_copy_batch=True).to_pandas())

    new_keys = set(new_rows["key"])
    both = pd.concat([new_rows, old_rows], ignore_index=True)
    sig_lookup = dict(zip(both["key"], both["sig"]))
    A, B = [], []
    for _, grp in both.groupby("bucket"):
        grp = grp.sort_values("key").drop_duplicates("key")
        ks = grp["key"].tolist()
        if len(ks) < 2:
            continue
        news = [x in new_keys for x in ks]
        for i in range(len(ks)):
            for j in range(i + 1, len(ks)):
                if news[i] or news[j]:
                    A.append(ks[i]); B.append(ks[j])
    if not A:
        return empty
    pdf = pd.DataFrame({"a": A, "b": B}).drop_duplicates(["a", "b"])
    sa = np.stack([np.frombuffer(sig_lookup[x], dtype=np.uint64)
                   for x in pdf["a"]])
    sb = np.stack([np.frombuffer(sig_lookup[x], dtype=np.uint64)
                   for x in pdf["b"]])
    jac = (sa == sb).mean(axis=1)
    keep = jac >= threshold
    a = pdf["a"].to_numpy()[keep]
    b_ = pdf["b"].to_numpy()[keep]
    kind = np.where([(x in new_keys) and (y in new_keys)
                     for x, y in zip(a, b_)], "new-new", "new-old")
    out = (pd.DataFrame({"doc_id_a": a, "doc_id_b": b_,
                         "jaccard_est": jac[keep].round(4),
                         "pair_kind": kind})
           .sort_values(["doc_id_a", "doc_id_b"]).reset_index(drop=True))
    return pa.Table.from_pandas(out, preserve_index=False)
