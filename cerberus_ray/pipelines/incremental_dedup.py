"""Incremental near-dedup — probe NEW documents against a persisted
MinHash bucket index of the existing corpus.

The continual-ingestion story at 100 TB: re-running full-corpus MinHash
per daily batch re-hashes 10^12 docs to dedup 10^7 arrivals. Instead the
corpus persists ONCE as a two-table parquet index (layout 2):

- ``bands/`` — (bucket, key) band rows SORTED BY BUCKET (row-group
  statistics prune the probe scan to colliding buckets). No signature
  payload: the old single-table layout duplicated each doc's k×8-byte
  signature once per band row, inflating the index ~bands-fold.
- ``sigs/`` — (key, sig) ONE row per doc, SORTED BY KEY, so a probe's
  candidate-key fetch prunes to the row groups containing its (few)
  candidates — point-lookup I/O, never a corpus scan.

A new batch dedups by:

1. one streamed pass over the NEW batch → its (bucket, key, sig) rows
   (a new batch is ≪ corpus, all its band rows fit the driver);
2. the new batch's distinct bucket set broadcast once (``ray.put``,
   sorted int64 array);
3. one streamed, bucket-pruned pass over ``bands/`` → colliding
   (bucket, key) rows;
4. VECTORIZED in-bucket pair expansion on the driver (the shared
   ``bucket_runs``/``bucket_pair_indices`` kernels — no Python pair
   loops), REQUIRING ≥ 1 new member (old-old pairs were already
   reported when the index was built). Buckets beyond ``hot_bucket``
   members switch to a linear new×all expansion instead of the C(n,2)
   blow-up — the ssjoin hot-shingle strategy, exact for this probe
   because every wanted pair has a new member;
5. one key-pruned pass over ``sigs/`` fetches the old candidates'
   signatures; the signature-estimated Jaccard accept matches the
   batch path.

Matches the batch `minhash_near_dup_pairs` exactly on the pairs that
involve a new document (agreement-tested), because both sides share
``minhash_signatures``/``band_hashes`` and the index manifest pins
(k, w, bands, seed) — a probe with different parameters raises, as
does probing a pre-layout-2 index (rebuild it).
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray

from .dedup import band_hashes, minhash_signatures

__all__ = ["build_minhash_index", "probe_minhash_index",
           "IndexParamsMismatch"]

_MANIFEST = "_MINHASH_INDEX.json"
_LAYOUT = 2


class IndexParamsMismatch(ValueError):
    """Probe parameters differ from the ones the index was built with."""


def _band_rows(batch: pa.Table, text_col: str, key_col: str,
               k: int, w: int, bands: int, seed: int,
               include_sig: bool) -> pa.Table:
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
    cols = {
        "bucket": pa.array(bucket, pa.int64()),
        "key": pa.array(keys[doc_idx], pa.string())}
    if include_sig:
        cols["sig"] = pa.array([sigs[i].tobytes() for i in doc_idx],
                               pa.binary())
    return pa.Table.from_pydict(cols)


def _sig_rows(batch: pa.Table, text_col: str, key_col: str,
              k: int, w: int, seed: int) -> pa.Table:
    texts = batch[text_col].to_numpy(zero_copy_only=False)
    keys = pc.cast(batch[key_col], pa.string()).to_numpy(
        zero_copy_only=False)
    sigs = minhash_signatures(texts, k=k, w=w, seed=seed)
    return pa.Table.from_pydict({
        "key": pa.array(keys, pa.string()),
        "sig": pa.array([s.tobytes() for s in sigs], pa.binary())})


def build_minhash_index(ds, out_dir: str, *, text_col: str = "text",
                        key_col: str = "doc_id", k: int = 128, w: int = 3,
                        bands: int = 16, seed: int = 42) -> str:
    """Persist the corpus as the two-table index described in the module
    docstring (bucket-sorted sig-free band rows + key-sorted one-per-doc
    signatures) + a parameter manifest. Two streamed signature passes +
    two range sorts (the only all-to-alls — they buy row-group pruning
    for every future probe). Returns ``out_dir``."""
    os.makedirs(out_dir, exist_ok=True)
    rows = ds.map_batches(
        lambda b: _band_rows(b, text_col, key_col, k, w, bands, seed,
                             include_sig=False),
        batch_format="pyarrow", zero_copy_batch=True)
    rows.sort("bucket").write_parquet(os.path.join(out_dir, "bands"))
    sigs = ds.map_batches(
        lambda b: _sig_rows(b, text_col, key_col, k, w, seed),
        batch_format="pyarrow", zero_copy_batch=True)
    sigs.sort("key").write_parquet(os.path.join(out_dir, "sigs"))
    with open(os.path.join(out_dir, _MANIFEST), "w") as f:
        json.dump({"k": k, "w": w, "bands": bands, "seed": seed,
                   "text_col": text_col, "key_col": key_col,
                   "layout": _LAYOUT}, f)
    return out_dir


def probe_minhash_index(new_ds, index_dir: str, *,
                        text_col: str = "text", key_col: str = "doc_id",
                        k: int = 128, w: int = 3, bands: int = 16,
                        seed: int = 42,
                        threshold: float = 0.8,
                        hot_bucket: int = 256) -> pa.Table:
    """→ (doc_id_a, doc_id_b, jaccard_est, pair_kind) for pairs with a
    NEW member: pair_kind ∈ {'new-old', 'new-new'}; within a pair kind
    ids are sorted (a < b). Old-old pairs are never re-reported."""
    import ray.data as rd

    from ..stages.keyed_window import bucket_pair_indices, bucket_runs

    with open(os.path.join(index_dir, _MANIFEST)) as f:
        man = json.load(f)
    got = {"k": k, "w": w, "bands": bands, "seed": seed}
    want = {x: man.get(x) for x in got}
    if got != want:
        raise IndexParamsMismatch(f"index built with {want}, probe uses {got}")
    if man.get("layout") != _LAYOUT:
        raise IndexParamsMismatch(
            f"index layout {man.get('layout')} != {_LAYOUT} — rebuild "
            f"the index with build_minhash_index")

    new_rows = new_ds.map_batches(
        lambda b: _band_rows(b, text_col, key_col, k, w, bands, seed,
                             include_sig=True),
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

    old_rows = (rd.read_parquet(os.path.join(index_dir, "bands"))
                .map_batches(hits, batch_format="pyarrow",
                             zero_copy_batch=True).to_pandas())
    if "bucket" not in old_rows.columns:   # zero collisions, no schema
        old_rows = pd.DataFrame({"bucket": pd.Series(dtype="int64"),
                                 "key": pd.Series(dtype=object)})

    new_keys = set(new_rows["key"])
    both = pd.concat([new_rows[["bucket", "key"]], old_rows],
                     ignore_index=True)
    # vectorized pair expansion: lexsort + dedup (bucket, key) rows,
    # C(size,2) index pairs for buckets ≤ hot_bucket via the shared
    # per-size kernel, linear new×all expansion beyond (every wanted
    # pair has a new member, so the linear path loses nothing)
    bucket = both["bucket"].to_numpy(dtype=np.int64)
    key = both["key"].to_numpy(dtype=object)
    key_s, _, starts, counts = bucket_runs(bucket, key)
    if not len(key_s):
        return empty
    new_s = np.asarray(pd.Index(key_s).isin(list(new_keys)))
    ii, jj = bucket_pair_indices(starts, counts, hot_bucket)
    m = new_s[ii] | new_s[jj]
    A = [key_s[ii[m]]]
    B = [key_s[jj[m]]]
    for hb in np.flatnonzero(counts > hot_bucket):
        lo = int(starts[hb])
        hi = lo + int(counts[hb])
        ks, nw = key_s[lo:hi], new_s[lo:hi]
        for t in np.flatnonzero(nw):
            # keys ascend within the bucket → (smaller, larger) direct
            A.append(ks[:t])
            B.append(np.full(t, ks[t], dtype=object))
            A.append(np.full(len(ks) - t - 1, ks[t], dtype=object))
            B.append(ks[t + 1:])
    A = np.concatenate(A) if A else np.array([], dtype=object)
    if not len(A):
        return empty
    B = np.concatenate(B)
    pdf = pd.DataFrame({"a": A, "b": B}).drop_duplicates(["a", "b"])

    # fetch the OLD candidates' signatures from the key-sorted sig
    # table — row-group pruned point lookups, never a corpus scan
    cand_old = np.array(
        sorted((set(pdf["a"]) | set(pdf["b"])) - new_keys), dtype=object)
    sig_lookup = dict(
        zip(new_rows["key"], new_rows["sig"]))
    if len(cand_old):
        kref = ray.put(cand_old)

        def fetch(b: pa.Table) -> pa.Table:
            wanted = ray.get(kref)
            kk = b["key"].to_numpy(zero_copy_only=False).astype(object)
            pos = np.clip(np.searchsorted(wanted, kk), 0,
                          len(wanted) - 1)
            return b.filter(pa.array(wanted[pos] == kk))

        fetched = (rd.read_parquet(os.path.join(index_dir, "sigs"))
                   .map_batches(fetch, batch_format="pyarrow",
                                zero_copy_batch=True).to_pandas())
        if "key" in fetched.columns:
            sig_lookup.update(zip(fetched["key"], fetched["sig"]))
    missing = [x for x in cand_old if x not in sig_lookup]
    if missing:
        raise IndexParamsMismatch(
            f"index sigs/ table is missing {len(missing)} candidate "
            f"keys (e.g. {missing[:3]}) — bands/ and sigs/ are out of "
            f"sync; rebuild the index")
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
