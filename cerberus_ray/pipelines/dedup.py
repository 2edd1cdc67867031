"""Deduplication operators for large-scale training-data pipelines.

The reference has only exact dedup (unique BookingSlot get-or-create,
cerberus/models/booking.py:50,57-64); the near-dup family is the standard
public corpus-dedup stack (Broder 1997 MinHash/shingling; Charikar 2002
SimHash; Leskovec/Rajaraman/Ullman MMDS ch.3 LSH banding):

- exact: content hash → hash-partitioned groupby → keep first
- MinHash + LSH: word shingles → k permutations → banded buckets →
  candidate pairs → signature-estimated Jaccard verify
- SimHash: 64-bit sign fingerprint → 4×16-bit chunk buckets (pigeonhole:
  hamming ≤ 3 ⇒ ≥ 1 chunk equal) → hamming verify
- n-gram Jaccard: exact set similarity for candidate verification

Scale design: every discovery step shuffles only (bucket key, doc_id)
rows — never text. Signature lookup for the verify step ships only the
candidate ids' signatures (broadcast of a small set).
"""

from __future__ import annotations

import hashlib
from typing import List, Sequence, Tuple

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..determinism import hash_strings, splitmix64
from ..scale import dataset_rows_hint as _dataset_rows_hint
from ..scale import join_partitions as _join_partitions

_MERSENNE = (1 << 61) - 1


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

def add_md5(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Content hash column (md5 hex — matches DuckDB's md5() for oracles)."""
    texts = batch[text_col].to_numpy(zero_copy_only=False)
    h = np.array([hashlib.md5((t or "").encode()).hexdigest() for t in texts],
                 dtype=object)
    return batch.append_column("text_md5", pa.array(h, type=pa.string()))


def exact_dedup_keep_first(ds, *, text_col: str = "text",
                           key_col: str = "doc_id", mode: str = "auto",
                           n_rows_hint: int = 0):
    """Keep the min-key row per distinct content hash (deterministic winner,
    independent of block order).

    Mode planner (mirrors duplicate_key_counts):

    - 'driver' (≤ ~2M rows): per-block min-key partials (pyarrow hash
      aggregate — one (hash, key) row per distinct content per block)
      merge on the driver; the winner map broadcasts once (ray.put) and
      the stream filters against it. No Ray shuffle at all — the fixed
      all-to-all cost dominates wall-time at benchmark scales.
    - 'join' (beyond): hash-partitioned ``groupby(hash).min(key)`` →
      hash-partitioned inner ``Dataset.join`` back against the stream —
      driver memory stays O(1). No per-group Python callable in either
      plan (a ``map_groups`` here would pay one pandas invocation per
      DISTINCT document) . Output-identical (agreement-tested)."""
    import ray

    # count only when the planner or the join sizing actually needs it
    n = n_rows_hint or (ds.count() if mode in ("auto", "join") else 0)
    if mode == "auto":
        mode = "driver" if n <= 2_000_000 else "join"
    if mode not in ("driver", "join"):
        raise ValueError(f"unknown keep-first mode: {mode!r}")

    hashed = ds.map_batches(lambda b: add_md5(b, text_col),
                            batch_format="pyarrow", zero_copy_batch=True)

    def partial_min(b: pa.Table) -> pa.Table:
        g = (b.select(["text_md5", key_col]).group_by("text_md5")
              .aggregate([(key_col, "min")]))
        return pa.Table.from_arrays([g["text_md5"], g[f"{key_col}_min"]],
                                    names=["text_md5", "_keep_key"])

    partials = hashed.map_batches(partial_min, batch_format="pyarrow",
                                  zero_copy_batch=True)

    if mode == "driver":
        pdf = partials.to_pandas()
        if "text_md5" not in pdf.columns or not len(pdf):
            return hashed
        winners = pdf.groupby("text_md5")["_keep_key"].min()
        ref = ray.put(winners)

        def filt(b: pa.Table) -> pa.Table:
            lut = ray.get(ref)
            md5 = b["text_md5"].to_numpy(zero_copy_only=False)
            keys = b[key_col].to_numpy(zero_copy_only=False)
            keep = lut.reindex(md5).to_numpy() == keys
            return b.filter(pa.array(keep))

        return hashed.map_batches(filt, batch_format="pyarrow",
                                  zero_copy_batch=True)

    keepers = partials.groupby("text_md5").min("_keep_key")

    def tidy(b: pa.Table) -> pa.Table:
        return pa.Table.from_arrays([b["text_md5"], b["min(_keep_key)"]],
                                    names=["_keep_md5", "_keep_key"])

    keepers = keepers.map_batches(tidy, batch_format="pyarrow")
    joined = hashed.join(keepers, join_type="inner",
                         num_partitions=_join_partitions(n),
                         on=("text_md5", key_col),
                         right_on=("_keep_md5", "_keep_key"))

    def drop_helpers(b: pa.Table) -> pa.Table:
        return b.select([c for c in b.column_names
                         if not c.startswith("_keep_")])

    return joined.map_batches(drop_helpers, batch_format="pyarrow")


def exact_dup_stats(ds, *, text_col: str = "text",
                    mode: str = "auto") -> pa.Table:
    """(n_docs, n_unique).

    - 'driver' (≤ ~2M rows): per-block DISTINCT full 16-byte md5 digests
      (as two uint64 columns) merge on the driver via numpy row-unique —
      no shuffle, no truncated-hash collision window (16 B × distinct on
      the driver bounds the band).
    - 'shuffle': distributed grouped count over full hashes — the count
      of grouped rows IS the distinct count (no driver key list)."""
    n_docs = ds.count()
    if mode == "auto":
        mode = "driver" if n_docs <= 2_000_000 else "shuffle"
    if mode not in ("driver", "shuffle"):
        raise ValueError(f"unknown dup-stats mode: {mode!r}")
    if mode == "driver":
        def distinct128(b: pa.Table) -> pa.Table:
            texts = b[text_col].to_numpy(zero_copy_only=False)
            raw = b"".join(hashlib.md5((t or "").encode()).digest()
                           for t in texts)
            a = np.frombuffer(raw, dtype=np.uint64).reshape(-1, 2)
            u = np.unique(a, axis=0)
            return pa.Table.from_pydict({"h1": pa.array(u[:, 0]),
                                         "h2": pa.array(u[:, 1])})

        parts = ds.map_batches(distinct128, batch_format="pyarrow",
                               zero_copy_batch=True).to_pandas()
        if "h1" not in parts.columns or not len(parts):
            n_unique = 0
        else:
            allh = np.stack([parts["h1"].to_numpy(),
                             parts["h2"].to_numpy()], axis=1)
            n_unique = int(len(np.unique(allh, axis=0)))
        return pa.Table.from_pydict({"n_docs": [n_docs],
                                     "n_unique": [n_unique]})
    hashed = ds.map_batches(
        lambda b: pa.Table.from_arrays([add_md5(b, text_col)["text_md5"]],
                                       names=["text_md5"]),
        batch_format="pyarrow", zero_copy_batch=True)
    n_unique = hashed.groupby("text_md5").count().count()
    return pa.Table.from_pydict({"n_docs": [n_docs], "n_unique": [n_unique]})


def exact_dedup_against(ds, reference_ds, *, text_col: str = "text",
                        ref_text_col: str | None = None,
                        mode: str = "auto", n_ref_hint: int = 0,
                        n_left_hint: int = 0):
    """Cross-corpus exact dedup: drop every row of ``ds`` whose content
    hash appears in ``reference_ds`` (dedup a new crawl against a prior
    corpus release / a benchmark suite — the cross-snapshot analogue of
    exact_dedup_keep_first; reference `invoice.py:92-108`'s frozen-prior
    semantics applied to content).

    Modes (standard planner shape, output-identical):

    - 'broadcast' (reference distinct-content count fits the driver —
      the common case: references are releases/benchmarks ≪ the crawl):
      per-block DISTINCT md5 partials of the reference merge on the
      driver, the sorted hash array broadcasts once (``ray.put``), and
      one streamed searchsorted anti-filter pass drops the hits. No
      shuffle anywhere.
    - 'join' (both sides huge): distinct reference hashes stay
      distributed (``groupby(md5).count``) and the stream anti-joins via
      a hash-partitioned ``left_outer`` ``Dataset.join`` + null-marker
      filter — driver memory O(1).

    Returns a Dataset with the input schema (helper columns dropped).
    """
    import ray

    # count only when the planner or the join sizing actually needs it
    n = n_ref_hint or (reference_ds.count()
                       if mode in ("auto", "join") else 0)
    if mode == "auto":
        mode = "broadcast" if n <= 2_000_000 else "join"
    if mode not in ("broadcast", "join"):
        raise ValueError(f"unknown cross-dedup mode: {mode!r}")
    rcol = ref_text_col or text_col

    hashed = ds.map_batches(lambda b: add_md5(b, text_col),
                            batch_format="pyarrow", zero_copy_batch=True)

    def ref_hashes(b: pa.Table) -> pa.Table:
        h = add_md5(b, rcol)["text_md5"]
        return pa.Table.from_arrays([pc.unique(h)], names=["text_md5"])

    ref_h = reference_ds.map_batches(ref_hashes, batch_format="pyarrow",
                                     zero_copy_batch=True)

    if mode == "broadcast":
        pdf = ref_h.to_pandas()
        seen = (np.sort(pdf["text_md5"].unique().astype(object))
                if "text_md5" in pdf.columns and len(pdf)
                else np.array([], dtype=object))
        ref = ray.put(seen)

        def anti(b: pa.Table) -> pa.Table:
            lut = ray.get(ref)
            h = b["text_md5"].to_numpy(zero_copy_only=False)
            if len(lut):
                pos = np.clip(np.searchsorted(lut, h), 0, len(lut) - 1)
                hit = lut[pos] == h
            else:
                hit = np.zeros(len(h), dtype=bool)
            return b.filter(pa.array(~hit)).drop_columns(["text_md5"])

        return hashed.map_batches(anti, batch_format="pyarrow",
                                  zero_copy_batch=True)

    # ---- join mode: distributed anti-join on the content hash ----
    # size by the LARGER side: the reference gates the planner, but the
    # probe stream (the crawl) is usually the big one — sizing from the
    # reference alone would funnel it through the 8-partition floor
    nparts = _join_partitions(max(
        n, n_left_hint or _dataset_rows_hint(ds)))
    distinct_ref = (ref_h.groupby("text_md5").count()
                    .repartition(nparts))  # coalesce schema-less empties

    def mark(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "text_md5" not in b.column_names:
            return pa.Table.from_pydict(
                {"_ref_md5": pa.array([], pa.string()),
                 "_in_ref": pa.array([], pa.int8())})
        return pa.Table.from_arrays(
            [b["text_md5"],
             pa.array(np.ones(b.num_rows, dtype=np.int8))],
            names=["_ref_md5", "_in_ref"])

    marked = distinct_ref.map_batches(mark, batch_format="pyarrow")
    joined = hashed.join(marked, join_type="left_outer",
                         num_partitions=nparts,
                         on=("text_md5",), right_on=("_ref_md5",))

    def keep_misses(b: pa.Table) -> pa.Table:
        out = b.filter(pc.is_null(b["_in_ref"]))
        return out.select([c for c in out.column_names
                           if c not in ("text_md5", "_ref_md5", "_in_ref")])

    return joined.map_batches(keep_misses, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# shingling + MinHash
# ---------------------------------------------------------------------------

def _tokenize(texts: np.ndarray) -> List[List[str]]:
    return [(t or "").lower().split() for t in texts]


def _word_shingles(tokens: Sequence[str], w: int) -> List[str]:
    if len(tokens) < w:
        return [" ".join(tokens)] if tokens else []
    return [" ".join(tokens[i:i + w]) for i in range(len(tokens) - w + 1)]


def _perm_params(k: int, seed: int = 42) -> Tuple[np.ndarray, np.ndarray]:
    idx = np.arange(k, dtype=np.uint64)
    a = splitmix64(idx + np.uint64(seed)) | np.uint64(1)  # odd multiplier
    b = splitmix64(idx + np.uint64(seed + 7919))
    return a, b


def minhash_signatures(texts: np.ndarray, *, k: int = 128, w: int = 3,
                       seed: int = 42) -> np.ndarray:
    """(n_docs, k) uint64 MinHash signatures, fully vectorized via reduceat.

    Permutations are multiply-shift hashes a*h+b over Z/2^64 (odd a) —
    wrapping uint64 arithmetic, no Python-int modmul in the hot path."""
    shingle_lists = [_word_shingles(t, w) for t in _tokenize(texts)]
    counts = np.array([max(len(s), 1) for s in shingle_lists], dtype=np.int64)
    flat = [s for lst in shingle_lists for s in (lst or [""])]
    h = hash_strings(np.array(flat, dtype=object))
    a, b = _perm_params(k, seed)
    starts = np.zeros(len(counts), dtype=np.int64)
    np.cumsum(counts[:-1], out=starts[1:])
    sigs = np.empty((len(counts), k), dtype=np.uint64)
    with np.errstate(over="ignore"):
        for i in range(k):
            ph = h * a[i] + b[i]  # wraps mod 2^64
            sigs[:, i] = np.minimum.reduceat(ph, starts)
    return sigs


def band_hashes(sigs: np.ndarray, *, bands: int = 16) -> np.ndarray:
    """(n_docs, bands) uint64 — hash of each band's signature rows."""
    n, k = sigs.shape
    r = k // bands
    out = np.empty((n, bands), dtype=np.uint64)
    for b in range(bands):
        chunk = sigs[:, b * r:(b + 1) * r]
        acc = np.zeros(n, dtype=np.uint64)
        for j in range(r):
            acc = splitmix64(acc ^ chunk[:, j])
        out[:, b] = acc
    return out


def minhash_near_dup_pairs(ds, *, text_col: str = "text",
                           key_col: str = "doc_id", k: int = 128,
                           w: int = 3, bands: int = 16,
                           threshold: float = 0.8, seed: int = 42,
                           mode: str = "auto",
                           n_rows_hint: int = 0,
                           sig_fn=None) -> pa.Table:
    """→ (doc_id_a, doc_id_b, jaccard_est) pairs with est. Jaccard ≥ threshold.

    In-bucket pairs + signature-estimated Jaccard finish on the driver
    in both modes (candidate pairs are rare by construction). The
    planner (mirroring duplicate_key_counts) picks how the LSH bucket
    structure is built:

    - 'driver' (≤ ~1M docs): signatures are computed ONCE in a single
      distributed pass whose per-doc (key, sig, buckets) rows stream to
      the driver — n × ~(8k + 16·bands) bytes, ~1.2 GB at the band edge
      — where bucket counting and member selection are vectorized
      numpy. One dataset execution total: at small/medium inputs the
      fixed cost of each extra Ray execution dominates the compute.
    - 'shuffle' (beyond): two streaming passes, nothing leaves the
      workers but partials. Pass 1 fuses shingle→minhash→band-hash with
      a per-block distinct bucket count and a distributed
      ``groupby(bucket).sum`` so only DUPLICATED buckets (rare) reach
      the driver; pass 2 recomputes signatures and emits (bucket, key,
      sig) rows ONLY for members of duplicated buckets. Driver memory
      is O(duplicate buckets + candidate members), never
      O(docs × bands). The 10^9+ path.
    Both modes are output-identical (agreement-tested).

    ``sig_fn`` (texts → (n, k) uint64) swaps the signature kernel while
    keeping the whole LSH/bucket/pair plan — the seam the weighted
    ICWS variant (:func:`wminhash_near_dup_pairs`) plugs into.
    """
    import ray

    expected_rows = 0
    if mode == "auto":
        expected_rows = n_rows_hint or ds.count()
        mode = "driver" if expected_rows <= 1_000_000 else "shuffle"
    if mode not in ("driver", "shuffle"):
        raise ValueError(f"unknown minhash pass-1 mode: {mode!r}")

    def _sig_buckets(batch: pa.Table):
        texts = batch[text_col].to_numpy(zero_copy_only=False)
        keys = pc.cast(batch[key_col], pa.string()).to_numpy(zero_copy_only=False)
        sigs = (sig_fn(texts) if sig_fn is not None
                else minhash_signatures(texts, k=k, w=w, seed=seed))
        bh = band_hashes(sigs, bands=bands)
        n = len(texts)
        bucket = (np.ascontiguousarray(bh.reshape(-1)).view(np.int64)
                  ^ (np.tile(np.arange(bands, dtype=np.int64), n) << np.int64(56)))
        return keys, sigs, bucket  # bucket is flat (n*bands,) row-major

    empty = pa.Table.from_pydict(
        {"doc_id_a": pa.array([], pa.string()),
         "doc_id_b": pa.array([], pa.string()),
         "jaccard_est": pa.array([], pa.float64())})

    if mode == "driver":
        # ONE Ray execution: per-doc (key, sig, buckets) rows stream to
        # the driver; bucket counting, member selection and pair
        # estimation are local vectorized numpy from here. At small-to-
        # medium inputs each extra dataset execution costs far more than
        # this compute, and at the 1M-doc band edge the table is ~1.2 GB
        # — well inside driver memory. Beyond lives 'shuffle'.
        def sig_table(batch: pa.Table) -> pa.Table:
            keys, sigs, bucket = _sig_buckets(batch)
            return pa.Table.from_pydict({
                "key": pa.array(keys, pa.string()),
                "sig": pa.array([s.tobytes() for s in sigs], pa.binary()),
                "buckets": pa.FixedSizeListArray.from_arrays(
                    pa.array(bucket, pa.int64()), bands)})

        refs = ds.map_batches(sig_table, batch_format="pyarrow",
                              zero_copy_batch=True).to_arrow_refs()
        tables = [t for t in ray.get(refs) if t.num_rows]
        if not tables:
            return empty
        tbl = pa.concat_tables(tables)
        if expected_rows and tbl.num_rows != expected_rows:
            raise RuntimeError(
                f"minhash driver plan collected {tbl.num_rows} signature "
                f"rows for {expected_rows} input docs — a block was lost")
        keys_np = tbl["key"].to_numpy(zero_copy_only=False)
        sig_list = tbl["sig"].to_pylist()
        bucket_flat = pc.list_flatten(tbl["buckets"]).to_numpy(
            zero_copy_only=False)
        uniq, cnt = np.unique(bucket_flat, return_counts=True)
        dup_buckets = uniq[cnt > 1]
        if not len(dup_buckets):
            return empty
        pos = np.clip(np.searchsorted(dup_buckets, bucket_flat),
                      0, len(dup_buckets) - 1)
        hit = dup_buckets[pos] == bucket_flat
        doc_idx = np.repeat(np.arange(len(keys_np)), bands)[hit]
        mem = pd.DataFrame({"bucket": bucket_flat[hit],
                            "key": keys_np[doc_idx],
                            "sig": [sig_list[i] for i in doc_idx]})
    else:
        # pass 1: per-block distinct bucket counts, fused with the
        # signature computation — no intermediate leaves the worker
        def bucket_counts(batch: pa.Table) -> pa.Table:
            _, _, bucket = _sig_buckets(batch)
            t = pa.Table.from_pydict({"bucket": pa.array(bucket)})
            return t.group_by("bucket").aggregate([([], "count_all")])

        bc_ds = ds.map_batches(bucket_counts, batch_format="pyarrow",
                               zero_copy_batch=True)
        merged = bc_ds.groupby("bucket").sum("count_all")

        def dup_only(t: pa.Table) -> pa.Table:
            # the hash aggregate can emit SCHEMA-LESS empty blocks for
            # unoccupied partitions — normalize them away
            if "sum(count_all)" not in t.column_names:
                return pa.Table.from_pydict({"bucket": pa.array([], pa.int64())})
            return t.filter(pc.greater(t["sum(count_all)"], 1)).select(["bucket"])

        dup = merged.map_batches(dup_only, batch_format="pyarrow").to_pandas()
        if "bucket" not in dup.columns or not len(dup):
            return empty
        dup_buckets = np.sort(dup["bucket"].to_numpy().astype(np.int64))
        if len(dup_buckets) == 0:
            return empty
        bref = ray.put(dup_buckets)

        # pass 2: (bucket, key, sig) for members of duplicated buckets
        def members(batch: pa.Table) -> pa.Table:
            db = ray.get(bref)
            keys, sigs, bucket = _sig_buckets(batch)
            pos = np.clip(np.searchsorted(db, bucket), 0, len(db) - 1)
            hit = db[pos] == bucket
            if not hit.any():
                return pa.Table.from_pydict(
                    {"bucket": pa.array([], pa.int64()),
                     "key": pa.array([], pa.string()),
                     "sig": pa.array([], pa.binary())})
            doc_idx = np.repeat(np.arange(len(keys)), bands)[hit]
            return pa.Table.from_pydict({
                "bucket": pa.array(bucket[hit]),
                "key": pa.array(keys[doc_idx], type=pa.string()),
                "sig": pa.array([sigs[i].tobytes() for i in doc_idx],
                                type=pa.binary())})

        mem = ds.map_batches(members, batch_format="pyarrow",
                             zero_copy_batch=True).to_pandas()

    # in-bucket pairs — fully vectorized: one lexsort + np.unique builds
    # the bucket index, pair indices expand per distinct bucket SIZE
    # (Python iterates over sizes, not buckets), and signatures gather
    # from one (n, k) matrix. Replaces a per-bucket pandas loop that
    # cost ~0.7 ms × #duplicated buckets.
    if len(mem) == 0:
        return empty
    from ..stages.keyed_window import bucket_pair_indices, bucket_runs

    key_np = mem["key"].to_numpy()
    bucket_np = mem["bucket"].to_numpy().astype(np.int64)
    sig_bytes = np.array(list(mem["sig"]), dtype=object)
    key_np, (sig_bytes,), starts, counts = bucket_runs(
        bucket_np, key_np, sig_bytes)
    sig_mat = np.frombuffer(b"".join(sig_bytes), dtype=np.uint64).reshape(
        len(sig_bytes), k)
    ii, jj = bucket_pair_indices(starts, counts, cap=int(counts.max()))
    if not len(ii):
        return empty
    # dedupe pairs on key identity (a pair surfaces once per shared band)
    ukeys, kid = np.unique(key_np, return_inverse=True)
    pid = kid[ii].astype(np.int64) * np.int64(len(ukeys)) + kid[jj]
    _, sel = np.unique(pid, return_index=True)
    ii, jj = ii[sel], jj[sel]
    jac = (sig_mat[ii] == sig_mat[jj]).mean(axis=1)
    keepj = jac >= threshold
    if not keepj.any():
        return empty
    out = pd.DataFrame({"doc_id_a": key_np[ii[keepj]],
                        "doc_id_b": key_np[jj[keepj]],
                        "jaccard_est": jac[keepj].round(4)})
    out = out.sort_values(["doc_id_a", "doc_id_b"]).reset_index(drop=True)
    return pa.Table.from_pandas(out, preserve_index=False)


# ---------------------------------------------------------------------------
# Weighted MinHash (ICWS)
# ---------------------------------------------------------------------------

def _unit_uniform(x: np.ndarray, salt: np.uint64) -> np.ndarray:
    """Deterministic uniform draws in strict (0, 1) from uint64 keys:
    splitmix64(x ^ salt) → top 53 bits → (h + 0.5) · 2⁻⁵³. Never 0 or 1,
    so every log/division downstream is finite."""
    h = splitmix64(x ^ salt) >> np.uint64(11)
    return (h.astype(np.float64) + 0.5) * (2.0 ** -53)


def _doc_token_weights(texts: np.ndarray, w: int = 2):
    """Flatten a text batch into per-document distinct-feature tf
    weights, features = ``w``-word shingles (w=1 → unigrams).

    Shingling matters for the WEIGHTED family even more than for plain
    MinHash: unigram tf VECTORS are similar across any same-domain
    corpus (everything shares the stopword/vocabulary distribution), so
    unigram ICWS buckets go hot on non-duplicates — measured 68k
    candidates for 528 true pairs at sf0.1. Bigram multisets
    decorrelate unrelated docs while template spam still repeats whole
    shingles, which is the signal this operator exists for.

    → (fh, wts, starts, counts): feature-hash uint64, tf weight
    float64, and the per-document segment index over the flat arrays
    (every doc owns ≥ 1 row — empty docs get the hash of "" with
    weight 1, mirroring :func:`minhash_signatures`'s convention)."""
    if w <= 1:
        token_lists = [t or [""] for t in _tokenize(texts)]
    else:
        token_lists = [_word_shingles(t, w) or [""]
                       for t in _tokenize(texts)]
    n_tok = np.array([len(t) for t in token_lists], dtype=np.int64)
    flat = np.array([tok for lst in token_lists for tok in lst],
                    dtype=object)
    fh_all = hash_strings(flat)
    doc_all = np.repeat(np.arange(len(token_lists), dtype=np.int64), n_tok)
    # distinct (doc, token) with multiplicity = tf: sort by (doc, fh),
    # run-length-encode equal runs
    order = np.lexsort((fh_all, doc_all))
    doc_s, fh_s = doc_all[order], fh_all[order]
    new = np.ones(len(doc_s), dtype=bool)
    new[1:] = (doc_s[1:] != doc_s[:-1]) | (fh_s[1:] != fh_s[:-1])
    run_starts = np.flatnonzero(new)
    tf = np.diff(np.append(run_starts, len(doc_s))).astype(np.float64)
    fh = fh_s[run_starts]
    doc = doc_s[run_starts]
    counts = np.bincount(doc, minlength=len(token_lists)).astype(np.int64)
    starts = np.zeros(len(counts), dtype=np.int64)
    np.cumsum(counts[:-1], out=starts[1:])
    return fh, tf, starts, counts


def icws_signatures(texts: np.ndarray, *, k: int = 64,
                    seed: int = 42, w: int = 2) -> np.ndarray:
    """(n_docs, k) uint64 Improved Consistent Weighted Sampling
    signatures (Ioffe 2010) over unigram tf weights.

    Per hash slot i and feature f, the ICWS draws r, c ~ Gamma(2, 1)
    and β ~ U(0, 1) come from counter-based splitmix64 streams keyed on
    (feature hash, i) — no RNG state, so signatures are deterministic
    across runs, block layouts and workers (the engine contract). With
    t = ⌊ln w / r + β⌋, ln y = r (t − β), ln a = ln c − ln y − r, the
    slot emits hash(argmin_f a, t*): two docs collide on a slot with
    probability equal to their WEIGHTED Jaccard Σ min(w) / Σ max(w) —
    the quantity plain MinHash cannot see (it treats tf 1 and tf 40
    alike, so template spam with repeated tokens under-matches).

    Fully vectorized: the per-slot loop runs k segmented-argmin passes
    over the flat (doc, feature) arrays — no per-doc Python.
    """
    fh, wts, starts, counts = _doc_token_weights(texts, w)
    n = len(counts)
    sigs = np.empty((n, k), dtype=np.uint64)
    lnw = np.log(wts)
    seg_doc = np.repeat(np.arange(n, dtype=np.int64), counts)
    base = splitmix64(np.full(1, seed, dtype=np.uint64))[0]
    for i in range(k):
        salts = splitmix64(np.arange(6, dtype=np.uint64)
                           + np.uint64(i * 6) + base)
        u1 = _unit_uniform(fh, salts[0])
        u2 = _unit_uniform(fh, salts[1])
        u3 = _unit_uniform(fh, salts[2])
        u4 = _unit_uniform(fh, salts[3])
        beta = _unit_uniform(fh, salts[4])
        r = -np.log(u1 * u2)           # Gamma(2,1) via sum of two exps
        lnc = np.log(-np.log(u3 * u4))
        t = np.floor(lnw / r + beta)
        lna = lnc - r * (t - beta) - r
        seg_min = np.minimum.reduceat(lna, starts)
        is_min = lna == np.repeat(seg_min, counts)
        cand = np.flatnonzero(is_min)
        first = cand[np.unique(seg_doc[cand], return_index=True)[1]]
        t_u = t[first].astype(np.int64).view(np.uint64)
        sigs[:, i] = splitmix64(fh[first] ^ splitmix64(t_u ^ salts[5]))
    return sigs


def weighted_jaccard(text_a: str, text_b: str, *, w: int = 2) -> float:
    """Exact weighted (tf) Jaccard Σ_f min(tf_a, tf_b) / Σ_f max(tf_a,
    tf_b) over ``w``-word shingles (w=1 → unigrams) — the verification
    kernel for ICWS candidates (generalized Jaccard; equals set Jaccard
    on 0/1 tfs). Must use the same ``w`` as the signatures."""
    from collections import Counter

    ca = Counter(_word_shingles((text_a or "").lower().split(), w)
                 if w > 1 else (text_a or "").lower().split())
    cb = Counter(_word_shingles((text_b or "").lower().split(), w)
                 if w > 1 else (text_b or "").lower().split())
    if not ca and not cb:
        return 1.0
    num = sum(min(ca[f], cb[f]) for f in ca.keys() & cb.keys())
    den = sum((ca | cb).values())
    return num / den if den else 1.0


def wminhash_near_dup_pairs(ds, *, text_col: str = "text",
                            key_col: str = "doc_id", k: int = 64,
                            bands: int = 16, threshold: float = 0.7,
                            seed: int = 42, w: int = 2,
                            mode: str = "auto",
                            n_rows_hint: int = 0) -> pa.Table:
    """Weighted near-dup pairs: ICWS signatures through the SAME
    LSH/bucket/pair plan as :func:`minhash_near_dup_pairs` (both
    driver/shuffle modes, vectorized pair kernel, O(candidates) driver
    memory) — only the signature kernel differs, so every scale
    property of the unweighted path carries over.

    → (doc_id_a, doc_id_b, wjaccard_est) with estimated WEIGHTED
    Jaccard ≥ threshold (slot-collision probability is exactly the
    weighted Jaccard, so the equal-slot fraction is its unbiased
    estimator)."""
    out = minhash_near_dup_pairs(
        ds, text_col=text_col, key_col=key_col, k=k, bands=bands,
        threshold=threshold, seed=seed, mode=mode,
        n_rows_hint=n_rows_hint,
        sig_fn=lambda texts: icws_signatures(texts, k=k, seed=seed, w=w))
    return out.rename_columns(["doc_id_a", "doc_id_b", "wjaccard_est"])


def verify_pairs_weighted(pairs_table: pa.Table, ds, *,
                          text_col: str = "text",
                          key_col: str = "doc_id",
                          threshold: float = 0.7,
                          w: int = 2) -> pa.Table:
    """Exact weighted-Jaccard verification of ICWS candidate pairs —
    same candidate-only broadcast semi-join shape as
    :func:`verify_pairs_exact`. → (doc_id_a, doc_id_b, wjaccard)."""
    import ray

    a = pairs_table["doc_id_a"].to_pylist()
    b = pairs_table["doc_id_b"].to_pylist()
    wanted = sorted(set(a) | set(b))
    ref = ray.put(np.array(wanted, dtype=object))

    def grab(batch: pa.Table) -> pa.Table:
        ids = ray.get(ref)
        keys = pc.cast(batch[key_col], pa.string()).to_numpy(
            zero_copy_only=False)
        mask = np.isin(keys.astype(str), ids.astype(str))
        return pa.Table.from_arrays(
            [pa.array(keys[mask], type=pa.string()),
             batch[text_col].filter(pa.array(mask))],
            names=["key", "text"])

    texts = ds.map_batches(grab, batch_format="pyarrow",
                           zero_copy_batch=True).to_pandas()
    lookup = dict(zip(texts.get("key", []), texts.get("text", [])))
    wj = np.array([weighted_jaccard(lookup.get(x, ""), lookup.get(y, ""),
                                    w=w)
                   for x, y in zip(a, b)])
    keep = wj >= threshold
    out = pd.DataFrame({"doc_id_a": np.array(a, dtype=object)[keep],
                        "doc_id_b": np.array(b, dtype=object)[keep],
                        "wjaccard": wj[keep].round(4)})
    out = out.sort_values(["doc_id_a", "doc_id_b"]).reset_index(drop=True)
    return pa.Table.from_pandas(out, preserve_index=False)


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def _simhash_accumulate(h: np.ndarray, counts: np.ndarray) -> np.ndarray:
    """Sign-accumulate per-token uint64 hashes into 64-bit fingerprints
    (``counts[i]`` consecutive hashes belong to text i), vectorized."""
    bits = np.unpackbits(h.view(np.uint8).reshape(-1, 8), axis=1,
                         bitorder="little").astype(np.int32) * 2 - 1
    starts = np.zeros(len(counts), dtype=np.int64)
    np.cumsum(counts[:-1], out=starts[1:])
    acc = np.add.reduceat(bits, starts, axis=0)
    out_bits = (acc > 0).astype(np.uint8)
    return np.packbits(out_bits, axis=1, bitorder="little").view(np.uint64).ravel()


def _flat_tokens(texts: np.ndarray):
    token_lists = _tokenize(texts)
    counts = np.array([max(len(t), 1) for t in token_lists], dtype=np.int64)
    flat = [t for lst in token_lists for t in (lst or [""])]
    return flat, counts


def simhash64(texts: np.ndarray) -> np.ndarray:
    """64-bit SimHash per text (token sign accumulation), vectorized.

    Token hash is the polars 64-bit hash (fast, the scale default); for
    a DuckDB-oracle-reproducible fingerprint use :func:`simhash64_md5`."""
    flat, counts = _flat_tokens(texts)
    h = hash_strings(np.array(flat, dtype=object))
    return _simhash_accumulate(h, counts)


def md5_token_hash64(tokens: np.ndarray) -> np.ndarray:
    """uint64 per token — EXACTLY DuckDB's ``md5_number_lower``: bytes
    8:16 of the md5 digest, little-endian. The SQL-reproducible token
    hash (dual-path oracle pattern, cf. the reference's recompute-both-
    ways invoice test, cerberus/tests/test_invoices.py:107-131)."""
    import hashlib

    out = np.empty(len(tokens), dtype=np.uint64)
    for i, t in enumerate(tokens):
        out[i] = int.from_bytes(
            hashlib.md5(t.encode("utf-8")).digest()[8:16], "little")
    return out


def simhash64_md5(texts: np.ndarray) -> np.ndarray:
    """SimHash with the md5 token hash — bit-identical to a pure-SQL
    DuckDB recomputation (md5_number_lower + bit ops), so pair outputs
    can be oracle-checked exactly. md5 runs once per DISTINCT token
    (vocabulary-bounded), not per occurrence."""
    flat, counts = _flat_tokens(texts)
    # factorize (C hashtable) beats np.unique's object-array sort ~15×
    codes, uniq = pd.factorize(np.array(flat, dtype=object))
    h = md5_token_hash64(np.asarray(uniq, dtype=object))[codes]
    return _simhash_accumulate(h, counts)


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    x = np.bitwise_xor(a, b)
    return np.unpackbits(x.view(np.uint8).reshape(len(x), 8), axis=1).sum(axis=1)


#: byte-popcount lookup for the vectorized pair kernel
_POP8 = np.array([bin(i).count("1") for i in range(256)], dtype=np.uint8)


def _brute_pairs(keys: np.ndarray, sh: np.ndarray, max_hamming: int,
                 out_a: list, out_b: list, out_h: list) -> None:
    """All-pairs hamming ≤ max_hamming via an XOR + byte-popcount matrix
    (no Python pair loop). keys are pre-sorted ascending so emitted pairs
    satisfy a < b. O(m²) ints for m ≤ the recursion cap — bounded."""
    m = len(keys)
    if m < 2:
        return
    x = sh[:, None] ^ sh[None, :]
    d = _POP8[x.view(np.uint8)].reshape(m, m, 8).sum(axis=2, dtype=np.int64)
    ii, jj = np.triu_indices(m, 1)
    hit = d[ii, jj] <= max_hamming
    if hit.any():
        out_a.extend(keys[ii[hit]])
        out_b.extend(keys[jj[hit]])
        out_h.extend(d[ii[hit], jj[hit]].tolist())


def _rec_pairs(keys: np.ndarray, sh: np.ndarray, positions: np.ndarray,
               max_hamming: int, cap: int,
               out_a: list, out_b: list, out_h: list) -> None:
    """Recall-preserving recursive refinement for hot buckets.

    Pigeonhole: a pair with ≤ max_hamming differing bits among the
    still-free ``positions`` keeps ≥ 1 of (max_hamming + 1) position
    blocks fully intact, so bucketing on each block's value and recursing
    inside every bucket finds the pair at least once (duplicates dropped
    by the caller). Uninformative blocks (value identical across the
    whole set) are removed WITHOUT fanout and the remaining positions
    re-split — otherwise a flood of identical fingerprints multiplies the
    recursion by (h+1) per level without shrinking anything. Every kept
    block yields proper-subset groups, so each recursion strictly shrinks;
    a set identical on every bit short-circuits to the all-pairs answer
    (distance 0), emitted blockwise to bound memory."""
    while True:
        m = len(keys)
        if m < 2:
            return
        if (sh == sh[0]).all():
            # identical fingerprints: the TRUE answer is all C(m,2) pairs
            # at distance 0 — emit row-blockwise, no popcount matrix
            for i in range(m - 1):
                out_a.extend(np.repeat(keys[i], m - 1 - i))
                out_b.extend(keys[i + 1:])
                out_h.extend([0] * (m - 1 - i))
            return
        if m <= cap or len(positions) == 0:
            _brute_pairs(keys, sh, max_hamming, out_a, out_b, out_h)
            return
        blocks = [b for b in np.array_split(positions, max_hamming + 1)
                  if len(b)]
        masks, vals_per_block, dropped = [], [], False
        for blk in blocks:
            mask = np.uint64(0)
            for p in blk:
                mask |= np.uint64(1) << np.uint64(p)
            vals = sh & mask
            if vals[0] == vals[-1] and (vals == vals[0]).all():
                # all-equal block: zero information — drop it from the
                # free set and RE-SPLIT (pigeonhole needs a fresh h+1
                # partition of what remains), no recursion fanout
                positions = positions[~np.isin(positions, blk)]
                dropped = True
            else:
                masks.append(blk)
                vals_per_block.append(vals)
        if dropped:
            continue
        for blk, vals in zip(masks, vals_per_block):
            order = np.argsort(vals, kind="stable")  # stable keeps key order
            vs = vals[order]
            bounds = np.flatnonzero(np.r_[True, vs[1:] != vs[:-1], True])
            rest = positions[~np.isin(positions, blk)]
            for s, e in zip(bounds[:-1], bounds[1:]):
                if e - s >= 2:  # proper subset: vals not all equal
                    idx = order[s:e]
                    _rec_pairs(keys[idx], sh[idx], rest, max_hamming, cap,
                               out_a, out_b, out_h)
        return


def simhash_near_dup_pairs(ds, *, text_col: str = "text",
                           key_col: str = "doc_id",
                           max_hamming: int = 3,
                           hot_bucket_cap: int = 256,
                           mode: str = "auto",
                           n_rows_hint: int = 0,
                           shuffle_buckets: int = 64,
                           hash_col: str = None) -> pa.Table:
    """→ (doc_id_a, doc_id_b, hamming) pairs with distance ≤ max_hamming.

    4 chunk tables of (chunk16, key, simhash) → groupby chunk value →
    pair + verify. max_hamming ≤ 3 guarantees recall (pigeonhole over
    4 chunks).

    Bucket-grouping mode (planner, mirroring minhash_near_dup_pairs):

    - 'driver' (≤ ~250k docs): the 4n (key, chunk, sim) rows — 28 B each
      — stream to the driver in one execution; multi-member buckets are
      grouped and paired locally. Band edge keeps the per-bucket kernel
      call count well under the 4×65536 bucket universe.
    - 'shuffle' (beyond): whole (chunk_id, chunk) buckets co-locate by
      hash (keyed_apply) and the SAME vectorized kernel runs once per
      hash bucket — the 10^9 path pays O(n_buckets) Python calls, not
      O(#LSH buckets); the driver sees only candidate pairs.
      ``shuffle_buckets`` sizes the partitions (one bucket = one kernel
      call AND one worker-heap residency: pick ≈ total_rows /
      rows-per-heap; a 100-TB run raises it proportionally).
    Output-identical (agreement-tested). ``n_rows_hint`` skips the
    planner's ``ds.count()`` — thread it when the count is known, since
    count() on a non-metadata-backed (computed) Dataset re-executes the
    upstream pipeline.

    Hot buckets: a 16-bit chunk universe caps the bucket count at 4×65536,
    so bucket occupancy grows linearly with corpus size. Buckets larger
    than ``hot_bucket_cap`` are recursively refined in-process on the
    remaining 48 bits — (max_hamming + 1) sub-blocks per level, pigeonhole
    again, so recall is EXACTLY preserved (unlike a lossy sub-hash split)
    — and the pair kernel is a vectorized XOR byte-popcount matrix, never
    a Python pair loop. Worst case (many identical fingerprints) emits
    the true all-pairs answer blockwise."""
    if mode == "auto":
        n = n_rows_hint or ds.count()
        mode = "driver" if n <= 250_000 else "shuffle"
    if mode not in ("driver", "shuffle"):
        raise ValueError(f"unknown simhash mode: {mode!r}")

    def rows(batch: pa.Table) -> pa.Table:
        keys = pc.cast(batch[key_col], pa.string()).to_numpy(zero_copy_only=False)
        if hash_col is not None:
            # precomputed 64-bit fingerprints (int64 bit-pattern) — the
            # generic entry point: image dHash (pipelines/image_dedup)
            # or any other 64-bit locality hash rides the same
            # band/pigeonhole/verify machinery
            sh = batch[hash_col].to_numpy(
                zero_copy_only=False).view(np.uint64)
        else:
            sh = simhash64(batch[text_col].to_numpy(
                zero_copy_only=False))
        n = len(keys)
        chunk_id = np.tile(np.arange(4, dtype=np.int32), n)
        chunks = np.empty(4 * n, dtype=np.int64)
        for c in range(4):
            chunks[c::4] = ((sh >> np.uint64(16 * c)) & np.uint64(0xFFFF)).astype(np.int64)
        return pa.Table.from_pydict({
            "key": pa.array(np.repeat(keys, 4), type=pa.string()),
            "chunk_id": pa.array(chunk_id),
            "chunk": pa.array(chunks),
            "sim": pa.array(np.repeat(sh.view(np.int64), 4)),
        })

    r = ds.map_batches(rows, batch_format="pyarrow", zero_copy_batch=True)

    def pair_frame(rows_pdf: pd.DataFrame) -> pd.DataFrame:
        """Vectorized bucket pairing over a (key, chunk_id, chunk, sim)
        frame holding WHOLE buckets: one lexsort + np.unique builds the
        bucket index, candidate pairs from all buckets of one SIZE are
        hamming-tested in one XOR-popcount pass (Python iterates only
        over distinct bucket sizes plus rare hot buckets). Replaces a
        per-bucket pandas loop that cost ~1 ms × #buckets."""
        from ..stages.keyed_window import bucket_pair_indices, bucket_runs

        key_arr = rows_pdf["key"].to_numpy()
        cid = rows_pdf["chunk_id"].to_numpy().astype(np.int64)
        sim_arr = rows_pdf["sim"].to_numpy().view(np.uint64)
        bucket = cid * np.int64(65536) + rows_pdf["chunk"].to_numpy()
        key_arr, (sim_arr, cid), starts, counts = bucket_runs(
            bucket, key_arr, sim_arr, cid)
        A: list = []
        B: list = []
        H: list = []
        ii, jj = bucket_pair_indices(starts, counts, cap=hot_bucket_cap)
        if len(ii):
            x = sim_arr[ii] ^ sim_arr[jj]
            d = _POP8[x.view(np.uint8).reshape(-1, 8)].sum(
                axis=1, dtype=np.int64)
            hit = d <= max_hamming
            A.extend(key_arr[ii[hit]])
            B.extend(key_arr[jj[hit]])
            H.extend(d[hit].tolist())
        for bi in np.nonzero(counts > hot_bucket_cap)[0]:
            o, s = int(starts[bi]), int(counts[bi])
            c = int(cid[o])
            free = np.array([p for p in range(64)
                             if not 16 * c <= p < 16 * (c + 1)],
                            dtype=np.int64)
            _rec_pairs(key_arr[o:o + s], sim_arr[o:o + s], free,
                       max_hamming, hot_bucket_cap, A, B, H)
        return pd.DataFrame({"a": np.array(A, dtype=object),
                             "b": np.array(B, dtype=object),
                             "ha": np.array(H, dtype="int64")})

    if mode == "driver":
        rows_pdf = r.to_pandas()
        if len(rows_pdf) == 0:  # empty Dataset drops its schema
            rows_pdf = pd.DataFrame({"key": pd.Series(dtype=object),
                                     "chunk_id": pd.Series(dtype="int32"),
                                     "chunk": pd.Series(dtype="int64"),
                                     "sim": pd.Series(dtype="int64")})
        pdf = pair_frame(rows_pdf)
    else:
        # distributed: co-locate whole (chunk_id, chunk) buckets by hash
        # and run the SAME vectorized kernel once per hash bucket —
        # Python invocations drop from O(#LSH buckets) to O(n_buckets)
        # (keyed_apply; the keyed-window execution shape)
        from ..stages.keyed_window import keyed_apply

        def add_bucket64(b: pa.Table) -> pa.Table:
            bk = (pc.cast(b["chunk_id"], pa.int64()).to_numpy(
                      zero_copy_only=False) * np.int64(65536)
                  + b["chunk"].to_numpy(zero_copy_only=False))
            return b.append_column("bucket64", pa.array(bk, pa.int64()))

        rb = r.map_batches(add_bucket64, batch_format="pyarrow",
                           zero_copy_batch=True)
        cand = keyed_apply(rb, "bucket64",
                           lambda g: pair_frame(g.drop(columns=["bucket64"])),
                           n_buckets=shuffle_buckets)
        pdf = cand.to_pandas()
    if len(pdf) == 0:
        return pa.Table.from_pydict(
            {"doc_id_a": pa.array([], pa.string()),
             "doc_id_b": pa.array([], pa.string()),
             "hamming": pa.array([], pa.int64())})
    pdf = (pdf.sort_values(["a", "b", "ha"], kind="stable")
              .drop_duplicates(["a", "b"])
              .rename(columns={"a": "doc_id_a", "b": "doc_id_b", "ha": "hamming"})
              .reset_index(drop=True))
    pdf["hamming"] = pdf["hamming"].astype("int64")
    return pa.Table.from_pandas(pdf, preserve_index=False)


# ---------------------------------------------------------------------------
# exact set-similarity self-join (prefix filtering)
# ---------------------------------------------------------------------------

def _doc_shingle_hashes(texts: np.ndarray, w: int):
    """Per doc: DISTINCT w-shingle uint64 hashes (sorted ascending).
    Zero-shingle docs (empty text) get the sentinel hash of '' so empty
    docs still pair with each other (Jaccard('','') = 1 by convention).
    → (flat_hashes, counts) with counts[i] = #distinct shingles of doc i
    (≥ 1)."""
    shingle_lists = [_word_shingles(t, w) for t in _tokenize(texts)]
    flat = [s for lst in shingle_lists for s in (lst or [""])]
    counts = np.array([max(len(lst), 1) for lst in shingle_lists],
                      dtype=np.int64)
    h = hash_strings(np.array(flat, dtype=object))
    # distinct within each doc
    doc_of = np.repeat(np.arange(len(counts)), counts)
    order = np.lexsort((h, doc_of))
    doc_s, h_s = doc_of[order], h[order]
    keep = np.ones(len(h_s), dtype=bool)
    keep[1:] = ~((doc_s[1:] == doc_s[:-1]) & (h_s[1:] == h_s[:-1]))
    doc_s, h_s = doc_s[keep], h_s[keep]
    new_counts = np.bincount(doc_s, minlength=len(counts)).astype(np.int64)
    return h_s, new_counts


def _prefix_lengths(m: np.ndarray, threshold: float) -> np.ndarray:
    """AllPairs prefix bound for Jaccard ≥ t: a qualifying pair shares
    ≥ ⌈t·m⌉ elements, so its globally-smallest shared element lies in
    the first m − ⌈t·m⌉ + 1 canonical elements of BOTH sets."""
    return m - np.ceil(threshold * m).astype(np.int64) + 1


def _prefix_postings(h_s: np.ndarray, counts: np.ndarray,
                     keys: np.ndarray, threshold: float,
                     df_of) -> Tuple[np.ndarray, np.ndarray]:
    """Canonically order each doc's distinct shingle hashes by
    (df, hash) ascending — rare shingles first, so prefix postings stay
    short — and emit the prefix entries. → (posting_hash, doc_key)."""
    df = df_of(h_s)
    doc_of = np.repeat(np.arange(len(counts)), counts)
    order = np.lexsort((h_s, df, doc_of))
    h_c = h_s[order]
    p = _prefix_lengths(counts, threshold)
    starts = np.zeros(len(counts), dtype=np.int64)
    np.cumsum(counts[:-1], out=starts[1:])
    # vectorized prefix take (positions [starts[i], starts[i]+p[i])):
    # offsets within each doc's run via the cumsum-of-lengths idiom —
    # no per-doc Python loop
    total = int(p.sum())
    cs = np.cumsum(p)
    offs = np.arange(total) - np.repeat(cs - p, p)
    idx = np.repeat(starts, p) + offs
    return h_c[idx], np.repeat(keys, p)


#: co-occurrence expansion cap: shingles with df beyond this switch to
#: the membership-mask path (O(n + |cand|) per shingle) instead of
#: materializing C(df, 2) pair events — a single boilerplate shingle
#: shared by 500k docs would otherwise allocate ~10^11 index pairs
_COOC_DF_CAP = 256


def _hash_jaccard_filter(cand: pd.DataFrame, keys: np.ndarray,
                         h_sorted: np.ndarray, counts: np.ndarray,
                         threshold: float,
                         slack: float = 0.005) -> pd.DataFrame:
    """Vectorized EXACT hash-set Jaccard for candidate pairs:
    |A∩B| = pair-event count across postings, |A∪B| = m_a + m_b −
    |A∩B|. Keeps hash-J ≥ threshold − slack; the downstream STRING
    verify stays authoritative — the slack absorbs the ~2⁻⁶⁴ shingle-
    hash collision band, so a collision can only cost extra verify
    work, never a wrong answer.

    Cost model: shingles with df ≤ _COOC_DF_CAP (256) expand C(df, 2)
    pair events (cheap, the common case); hotter shingles instead mark
    a doc-membership mask and test the candidate endpoints against it —
    O(n + |cand|) per hot shingle, so template boilerplate degrades
    linearly instead of quadratically (and never loses a count)."""
    from ..stages.keyed_window import bucket_pair_indices, bucket_runs

    n = len(keys)
    ai = np.searchsorted(keys, cand["a"].to_numpy())
    bi = np.searchsorted(keys, cand["b"].to_numpy())
    cand_packed = ai.astype(np.int64) * n + bi
    order = np.argsort(cand_packed)
    cand_sorted = cand_packed[order]
    ai_s, bi_s = ai[order], bi[order]

    doc_idx = np.repeat(np.arange(n, dtype=np.int64), counts)
    d_col, _, starts, cnts = bucket_runs(h_sorted.view(np.int64), doc_idx)
    inter = np.zeros(len(cand_sorted), dtype=np.int64)
    ii, jj = bucket_pair_indices(starts, cnts, cap=_COOC_DF_CAP)
    if len(ii):
        ev = d_col[ii] * np.int64(n) + d_col[jj]
        pos = np.clip(np.searchsorted(cand_sorted, ev),
                      0, len(cand_sorted) - 1)
        hit = cand_sorted[pos] == ev
        inter += np.bincount(pos[hit], minlength=len(cand_sorted))
    hot = np.nonzero(cnts > _COOC_DF_CAP)[0]
    if len(hot):
        mask = np.zeros(n, dtype=bool)
        for hb in hot:
            o, c = int(starts[hb]), int(cnts[hb])
            members = d_col[o:o + c]
            mask[members] = True
            inter += mask[ai_s] & mask[bi_s]
            mask[members] = False
    m_a = counts[ai_s]
    m_b = counts[bi_s]
    jac = inter / (m_a + m_b - inter)
    keep_sorted = jac >= threshold - slack
    keep = np.zeros(len(cand_packed), dtype=bool)
    keep[order] = keep_sorted
    return cand.loc[keep].reset_index(drop=True)


def _posting_pairs(post_h: np.ndarray, post_key: np.ndarray) -> pd.DataFrame:
    """All (a < b) key pairs co-occurring in a posting — NO cap: unlike
    an LSH bucket, dropping a posting pair here would lose recall. The
    df-ascending canonical order keeps postings short (frequent shingles
    sort out of prefixes); a degenerate all-identical corpus emits its
    true O(n²) answer blockwise via the size-grouped expansion."""
    from ..stages.keyed_window import bucket_pair_indices, bucket_runs

    key_arr, _, starts, counts = bucket_runs(
        post_h.view(np.int64), post_key.astype(object))
    ii, jj = bucket_pair_indices(starts, counts, cap=len(key_arr) or 1)
    if not len(ii):
        return pd.DataFrame({"a": pd.Series(dtype=object),
                             "b": pd.Series(dtype=object)})
    return (pd.DataFrame({"a": key_arr[ii], "b": key_arr[jj]})
            .drop_duplicates())


def ssjoin_pairs(ds, *, text_col: str = "text", key_col: str = "doc_id",
                 w: int = 3, threshold: float = 0.5, mode: str = "auto",
                 n_rows_hint: int = 0,
                 shuffle_buckets: int | None = None) -> pa.Table:
    """EXACT set-similarity self-join: ALL pairs with w-shingle Jaccard
    ≥ ``threshold`` — recall 1 by construction (prefix filtering,
    AllPairs/PPJoin family: Bayardo, Ma & Srikant, WWW 2007; Chaudhuri,
    Ganti & Kaushik, ICDE 2006), unlike the probabilistic MinHash band
    recall. → (doc_id_a, doc_id_b, jaccard), keys string-sorted.

    Plan: distinct shingle hashes per doc → global document frequency →
    per-doc canonical (df, hash) order → index only each doc's PREFIX
    (m − ⌈t·m⌉ + 1 rarest shingles) → pairs sharing a posting →
    exact-Jaccard verify (ships only candidate texts). The df order is
    the pruning lever: frequent shingles sort out of every prefix, so
    postings stay short; candidates are a superset of the answer and
    the verify step is exact, so precision is also 1.

    Modes (planner convention; output-identical, agreement-tested):

    - 'driver' (≤ ~500k docs): one distributed pass emits per-doc
      distinct hashes; df, prefixes, postings and pairing are local
      vectorized numpy.
    - 'shuffle': df via distributed groupby(hash); doc-shingle rows
      attach df on a keyed exchange, regroup by doc for prefixes,
      regroup by posting for pairs (three keyed_apply exchanges, each
      ∝ corpus shingles, driver sees only candidate pairs).
    """
    import ray

    if not 0.0 < threshold <= 1.0:
        # t=0 would make every prefix m+1 elements (index past the set);
        # 'all pairs' is threshold→0+, which is a cross join, not a join
        raise ValueError(f"threshold must be in (0, 1]: {threshold}")
    if mode == "auto":
        n = n_rows_hint or ds.count()
        mode = "driver" if n <= 500_000 else "shuffle"
    if mode not in ("driver", "shuffle"):
        raise ValueError(f"unknown ssjoin mode: {mode!r}")

    def doc_rows(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].to_numpy(zero_copy_only=False)
        keys = pc.cast(batch[key_col], pa.string()).to_numpy(
            zero_copy_only=False)
        h_s, counts = _doc_shingle_hashes(texts, w)
        return pa.Table.from_pydict({
            "h": pa.array(h_s.view(np.int64)),
            "key": pa.array(np.repeat(keys, counts), pa.string())})

    rows = ds.map_batches(doc_rows, batch_format="pyarrow",
                          zero_copy_batch=True)

    if mode == "driver":
        pdf = rows.to_pandas()
        if not len(pdf):
            return pa.Table.from_pydict(
                {"doc_id_a": pa.array([], pa.string()),
                 "doc_id_b": pa.array([], pa.string()),
                 "jaccard": pa.array([], pa.float64())})
        h_all = pdf["h"].to_numpy().view(np.uint64)
        key_of_row = pdf["key"].to_numpy()
        # rows arrive grouped per doc (doc_rows emits contiguous runs,
        # block order unknown but runs stay whole) — rebuild counts
        keys, starts_u, counts = np.unique(key_of_row,
                                           return_index=True,
                                           return_counts=True)
        # np.unique sorts by key; reorder hashes into that key order
        order = np.argsort(key_of_row, kind="stable")
        h_sorted = h_all[order]
        uniq_h, df_cnt = np.unique(h_sorted, return_counts=True)

        def df_of(hs):
            return df_cnt[np.searchsorted(uniq_h, hs)]

        post_h, post_key = _prefix_postings(h_sorted, counts, keys,
                                            threshold, df_of)
        cand = _posting_pairs(post_h, post_key)
        if len(cand):
            # vectorized hash-Jaccard cut: the string verify below then
            # touches ~|answer| pairs, not ~|candidates| (409k → 256 at
            # sf0.1; each string verify is a Python shingle-set build)
            cand = _hash_jaccard_filter(cand, keys, h_sorted, counts,
                                        threshold)
    else:
        from ..stages.keyed_window import auto_buckets, keyed_apply

        # rows feeds the df aggregate AND the tagged union — pin it so
        # the shingle pass doesn't execute twice through lazy lineage
        rows = rows.materialize()
        # the exchanges carry SHINGLE rows (~10-100× the doc count) —
        # size buckets from the materialized (metadata-free) row count,
        # not the document count
        nb = shuffle_buckets or auto_buckets(rows.count())
        # exchange 1: attach df — tagged union on the shingle hash
        dft = (rows.groupby("h").count())

        def tag_df(t: pa.Table) -> pa.Table:
            if t.num_rows == 0 or "count()" not in t.column_names:
                return pa.Table.from_pydict(
                    {"h": pa.array([], pa.int64()),
                     "key": pa.array([], pa.string()),
                     "df": pa.array([], pa.int64())})
            return pa.Table.from_pydict(
                {"h": t["h"],
                 "key": pa.nulls(t.num_rows, pa.string()),
                 "df": t["count()"]})

        def tag_row(t: pa.Table) -> pa.Table:
            return pa.Table.from_pydict(
                {"h": t["h"], "key": t["key"],
                 "df": pa.nulls(t.num_rows, pa.int64())})

        tagged = (dft.map_batches(tag_df, batch_format="pyarrow")
                  .union(rows.map_batches(tag_row,
                                          batch_format="pyarrow")))

        def attach(g: pd.DataFrame) -> pd.DataFrame:
            dfm = (g.loc[g["df"].notna()]
                   .drop_duplicates("h").set_index("h")["df"])
            r = g.loc[g["df"].isna(), ["h", "key"]].copy()
            r["df"] = r["h"].map(dfm).astype("int64")
            return r

        with_df = keyed_apply(tagged, "h", attach, n_buckets=nb)

        # exchange 2: per-doc canonical order → prefix emission
        def prefixes(g: pd.DataFrame) -> pd.DataFrame:
            g = g.sort_values(["key", "df", "h"], kind="stable")
            m = g.groupby("key", sort=False)["h"].transform("size")
            pos = g.groupby("key", sort=False).cumcount()
            plen = (m - np.ceil(threshold * m).astype("int64") + 1)
            keep = pos < plen
            return g.loc[keep, ["h", "key"]]

        pref = keyed_apply(with_df, "key", prefixes, n_buckets=nb)

        # exchange 3: posting pairs
        def pairs(g: pd.DataFrame) -> pd.DataFrame:
            return _posting_pairs(g["h"].to_numpy().view(np.uint64),
                                  g["key"].to_numpy())

        cand = keyed_apply(pref, "h", pairs, n_buckets=nb).to_pandas()
        if len(cand):
            cand = cand.drop_duplicates()
        if len(cand):
            # hash-Jaccard cut before the per-pair string verify, same
            # as driver mode: fetch ONLY the candidate docs' shingle
            # rows (semi-join via broadcast id set — ∝ candidates, not
            # corpus) and reuse the vectorized kernel
            wanted = np.unique(np.concatenate(
                [cand["a"].to_numpy(), cand["b"].to_numpy()]))
            wref = ray.put(wanted)

            def grab_rows(b: pa.Table) -> pa.Table:
                ids = ray.get(wref)
                k = b["key"].to_numpy(zero_copy_only=False)
                m = np.isin(k.astype(str), ids.astype(str))
                return pa.Table.from_arrays(
                    [b["h"].filter(pa.array(m)),
                     b["key"].filter(pa.array(m))], names=["h", "key"])

            sub = rows.map_batches(grab_rows, batch_format="pyarrow",
                                   zero_copy_batch=True).to_pandas()
            k2 = sub["key"].to_numpy()
            keys2, cnt2 = np.unique(k2, return_counts=True)
            h2 = sub["h"].to_numpy().view(np.uint64)[
                np.argsort(k2, kind="stable")]
            cand = _hash_jaccard_filter(cand, keys2, h2, cnt2, threshold)

    if not len(cand):
        return pa.Table.from_pydict(
            {"doc_id_a": pa.array([], pa.string()),
             "doc_id_b": pa.array([], pa.string()),
             "jaccard": pa.array([], pa.float64())})
    pairs_t = pa.Table.from_pydict({
        "doc_id_a": pa.array(cand["a"].to_numpy(), pa.string()),
        "doc_id_b": pa.array(cand["b"].to_numpy(), pa.string())})
    return verify_pairs_exact(pairs_t, ds, text_col=text_col,
                              key_col=key_col, w=w, threshold=threshold)


# ---------------------------------------------------------------------------
# exact n-gram Jaccard (verification kernel)
# ---------------------------------------------------------------------------

def ngram_jaccard(text_a: str, text_b: str, *, w: int = 3) -> float:
    sa = set(_word_shingles((text_a or "").lower().split(), w))
    sb = set(_word_shingles((text_b or "").lower().split(), w))
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / len(sa | sb)


def connected_components_shuffle(pairs_table: pa.Table, *,
                                 a_col: str = "doc_id_a",
                                 b_col: str = "doc_id_b",
                                 max_rounds: int = 20,
                                 num_partitions: int | None = None) -> pa.Table:
    """Distributed min-label propagation: each round is one
    hash-partitioned ``groupby(node).min(label)`` over (neighbour-label
    messages ∪ current labels) — the 10^9-edge path where the candidate
    graph outgrows the driver. Labels and edges live in Datasets
    end-to-end; the driver sees only a per-round convergence checksum
    (sum of label hashes) and the final result. Converges in
    O(component diameter) rounds (near-dup clusters are shallow).
    Output-identical to :func:`connected_components` (agreement test).
    """
    import ray.data as rd
    from ray.data.aggregate import Min, Sum

    from ..determinism import hash_strings

    a = pa.array(pairs_table[a_col].to_pylist(), type=pa.string())
    b = pa.array(pairs_table[b_col].to_pylist(), type=pa.string())
    if len(a) == 0:
        return pa.Table.from_pydict({"doc_id": pa.array([], pa.string()),
                                     "cluster_id": pa.array([], pa.string())})
    if num_partitions is None:
        # parallelism ∝ edge count (directed edges = 2×pairs): a 10⁹-edge
        # graph must not serialize through a fixed 8-partition exchange
        num_partitions = int(min(1024, max(8, (2 * len(a)) // 250_000 + 1)))
    # both directions so a label can flow either way along an edge
    edges = rd.from_arrow(pa.Table.from_pydict({
        "src": pa.concat_arrays([a, b]), "dst": pa.concat_arrays([b, a])}))
    nodes = rd.from_arrow(pa.Table.from_pydict(
        {"node": pa.concat_arrays([a, b])})).groupby("node").count()
    labels = nodes.map_batches(
        lambda t: pa.Table.from_arrays([t["node"], t["node"]],
                                       names=["node", "label"]),
        batch_format="pyarrow")

    def _checksum(lbl_ds) -> int:
        def h(t: pa.Table) -> pa.Table:
            hv = hash_strings(pc.binary_join_element_wise(
                t["node"], t["label"], "|")).view(np.int64)
            return pa.Table.from_pydict(
                {"s": [int(hv.sum() & 0x7FFFFFFFFFFFFFFF)]})

        return int(lbl_ds.map_batches(h, batch_format="pyarrow")
                   .sum("s") or 0)

    converged = False
    prev = _checksum(labels)
    for _ in range(max_rounds):
        msgs = (edges.join(labels, join_type="inner",
                           num_partitions=num_partitions,
                           on=("src",), right_on=("node",))
                .map_batches(lambda t: pa.Table.from_arrays(
                    [t["dst"], t["label"]], names=["node", "label"]),
                    batch_format="pyarrow"))
        # materialize each round's label table: truncates the lazy lineage
        # so round N doesn't re-execute rounds 1..N-1. The repartition is
        # load-bearing: the hash aggregate emits empty SCHEMA-LESS blocks
        # for unoccupied partitions, which poison the next round's join
        # ("no match for FieldRef node"); coalescing drops them.
        labels = (labels.union(msgs).groupby("node")
                  .aggregate(Min("label", alias_name="label"))
                  .repartition(num_partitions).materialize())
        cur = _checksum(labels)
        if cur == prev:
            converged = True
            break
        prev = cur
    if not converged:
        # a silent fall-through would return partially-propagated labels
        # (wrong clusters) for components deeper than max_rounds
        raise RuntimeError(
            f"connected_components_shuffle did not converge within "
            f"{max_rounds} rounds — raise max_rounds (component diameter "
            f"exceeds it)")

    out = labels.to_pandas().rename(
        columns={"node": "doc_id", "label": "cluster_id"})
    out = out.sort_values(["cluster_id", "doc_id"]).reset_index(drop=True)
    return pa.Table.from_pandas(out[["doc_id", "cluster_id"]],
                                preserve_index=False)


def connected_components(pairs_table: pa.Table, *, a_col: str = "doc_id_a",
                         b_col: str = "doc_id_b",
                         max_rounds: int = 50) -> pa.Table:
    """Cluster near-dup pairs into groups: iterative min-label propagation
    (each node adopts the minimum label among its neighbours until a fixed
    point) → (doc_id, cluster_id = min doc_id of the component).

    The candidate-pair graph is small by construction (pairs survive
    LSH + verification), so rounds run on the driver in numpy;
    :func:`connected_components_shuffle` is the wired keyed-groupby
    variant for graphs that outgrow the driver. Deterministic.
    """
    a = np.asarray(pairs_table[a_col].to_pylist(), dtype=object)
    b = np.asarray(pairs_table[b_col].to_pylist(), dtype=object)
    nodes = np.unique(np.concatenate([a, b]).astype(str))
    label = {n: n for n in nodes}
    for _ in range(max_rounds):
        changed = False
        for x, y in zip(a.astype(str), b.astype(str)):
            lo = min(label[x], label[y])
            if label[x] != lo:
                label[x] = lo
                changed = True
            if label[y] != lo:
                label[y] = lo
                changed = True
        # path-compress toward roots
        for n in nodes:
            while label[n] != label[label[n]]:
                label[n] = label[label[n]]
        if not changed:
            break
    out = pd.DataFrame({"doc_id": nodes,
                        "cluster_id": [label[n] for n in nodes]})
    out = out.sort_values(["cluster_id", "doc_id"]).reset_index(drop=True)
    return pa.Table.from_pandas(out, preserve_index=False)


def dedup_near_keep_first(ds, *, text_col: str = "text",
                          key_col: str = "doc_id", threshold: float = 0.8,
                          pair_method: str = "minhash",
                          **minhash_kwargs):
    """Full near-dedup pipeline: near-dup pairs → components → drop all
    but the min-key member of each cluster. Returns (kept_ds, clusters).

    ``pair_method`` picks the pair stage: ``"minhash"`` (default — the
    probabilistic LSH scale path) or ``"exact"`` (:func:`ssjoin_pairs`,
    recall/precision 1 by construction — the verifiable path the
    training_corpus_report driver oracle rides; Ω(candidates), use where
    the corpus fits the ssjoin bands)."""
    import ray

    if pair_method == "exact":
        # forward every ssjoin-relevant knob; minhash-only knobs
        # (k/bands/seed/sig_fn) are meaningless here and tolerated so a
        # caller can flip pair_method without rewriting the call, but
        # anything else (e.g. a typo'd kwarg) fails loudly
        kw = dict(minhash_kwargs)
        ss = {k: kw.pop(k) for k in
              ("w", "mode", "n_rows_hint", "shuffle_buckets") if k in kw}
        unknown = set(kw) - {"k", "bands", "seed", "sig_fn"}
        if unknown:
            raise TypeError(
                f"unknown dedup_near_keep_first kwargs: {sorted(unknown)}")
        pairs = ssjoin_pairs(ds, text_col=text_col, key_col=key_col,
                             threshold=threshold, **ss)
    elif pair_method == "minhash":
        pairs = minhash_near_dup_pairs(ds, text_col=text_col,
                                       key_col=key_col,
                                       threshold=threshold,
                                       **minhash_kwargs)
    else:
        raise ValueError(f"unknown pair_method: {pair_method!r}")
    clusters = connected_components(pairs)
    drop = {r["doc_id"] for r in clusters.to_pylist()
            if r["doc_id"] != r["cluster_id"]}
    ref = ray.put(np.array(sorted(drop), dtype=object))

    def keep(batch: pa.Table) -> pa.Table:
        dropped = ray.get(ref)
        keys = pc.cast(batch[key_col], pa.string()).to_numpy(zero_copy_only=False)
        mask = ~np.isin(keys.astype(str), dropped.astype(str))
        return batch.filter(pa.array(mask))

    return ds.map_batches(keep, batch_format="pyarrow",
                          zero_copy_batch=True), clusters


def verify_pairs_exact(pairs_table: pa.Table, ds, *, text_col: str = "text",
                       key_col: str = "doc_id", w: int = 3,
                       threshold: float = 0.8) -> pa.Table:
    """Exact-Jaccard verification of candidate pairs: ships only the
    candidate ids' texts (semi-join via broadcast id set)."""
    import ray

    a = pairs_table["doc_id_a"].to_pylist()
    b = pairs_table["doc_id_b"].to_pylist()
    wanted = sorted(set(a) | set(b))
    ref = ray.put(np.array(wanted, dtype=object))

    def grab(batch: pa.Table) -> pa.Table:
        ids = ray.get(ref)
        keys = pc.cast(batch[key_col], pa.string()).to_numpy(zero_copy_only=False)
        mask = np.isin(keys.astype(str), ids.astype(str))
        return pa.Table.from_arrays(
            [pa.array(keys[mask], type=pa.string()),
             batch[text_col].filter(pa.array(mask))],
            names=["key", "text"])

    texts = ds.map_batches(grab, batch_format="pyarrow",
                           zero_copy_batch=True).to_pandas()
    lookup = dict(zip(texts.get("key", []), texts.get("text", [])))
    jac = np.array([ngram_jaccard(lookup.get(x, ""), lookup.get(y, ""), w=w)
                    for x, y in zip(a, b)])
    keep = jac >= threshold
    from ..determinism import round_away

    # half-away-from-zero like SQL ROUND (not numpy banker's) so the
    # jaccard column is bit-identical to the DuckDB oracle's
    out = pd.DataFrame({"doc_id_a": np.array(a, dtype=object)[keep],
                        "doc_id_b": np.array(b, dtype=object)[keep],
                        "jaccard": round_away(jac[keep], 4)})
    out = out.sort_values(["doc_id_a", "doc_id_b"]).reset_index(drop=True)
    return pa.Table.from_pandas(out, preserve_index=False)


def dedup_near_keep_best(ds, *, score_col: str, text_col: str = "text",
                         key_col: str = "doc_id", threshold: float = 0.8,
                         **minhash_kwargs):
    """Near-dedup keeping the BEST-scoring member of each cluster
    (quality-aware winner selection — the corpus-construction refinement
    of :func:`dedup_near_keep_first`): MinHash-LSH pairs → components →
    per-cluster winner = max ``score_col`` (ties: min key;
    null score = -inf) → drop the rest.

    Scale shape: cluster members are ∝ the true duplicate rate; their
    (key, score) rows are gathered with ONE streamed semi-join pass
    (member-id set broadcast once), the winner argmax runs on that small
    table, and the final cut is the same broadcast-drop-set filter as
    keep-first. Returns (kept_ds, winners) where winners =
    (cluster_id, doc_id, score) one row per cluster."""
    import ray

    pairs = minhash_near_dup_pairs(ds, text_col=text_col, key_col=key_col,
                                   threshold=threshold, **minhash_kwargs)
    clusters = connected_components(pairs)
    cl = clusters.to_pandas()
    if len(cl) == 0:
        winners = pa.Table.from_pydict({
            "cluster_id": pa.array([], pa.string()),
            "doc_id": pa.array([], pa.string()),
            "score": pa.array([], pa.float64())})
        return ds, winners
    member_ids = np.array(sorted(cl["doc_id"].astype(str)), dtype=object)
    mref = ray.put(member_ids)

    def member_scores(batch: pa.Table) -> pa.Table:
        ids = ray.get(mref)
        keys = pc.cast(batch[key_col], pa.string()).to_numpy(
            zero_copy_only=False).astype(str)
        mask = np.isin(keys, ids.astype(str))
        sc = pc.cast(batch[score_col], pa.float64()).to_numpy(
            zero_copy_only=False)
        return pa.Table.from_pydict({
            "doc_id": pa.array(keys[mask], pa.string()),
            "score": pa.array(sc[mask], pa.float64())})

    scores = ds.map_batches(member_scores, batch_format="pyarrow",
                            zero_copy_batch=True).to_pandas()
    m = cl.assign(doc_id=cl["doc_id"].astype(str)).merge(
        scores.drop_duplicates("doc_id"), on="doc_id", how="left")
    m["score"] = m["score"].fillna(float("-inf"))
    # winner per cluster: max score, ties broken by min doc_id
    m = m.sort_values(["cluster_id", "score", "doc_id"],
                      ascending=[True, False, True])
    winners = m.groupby("cluster_id", as_index=False).first()
    drop = set(m["doc_id"]) - set(winners["doc_id"])
    dref = ray.put(np.array(sorted(drop), dtype=object))

    def keep(batch: pa.Table) -> pa.Table:
        dropped = ray.get(dref)
        keys = pc.cast(batch[key_col], pa.string()).to_numpy(
            zero_copy_only=False)
        mask = ~np.isin(keys.astype(str), dropped.astype(str))
        return batch.filter(pa.array(mask))

    kept = ds.map_batches(keep, batch_format="pyarrow",
                          zero_copy_batch=True)
    wt = pa.Table.from_pandas(
        winners[["cluster_id", "doc_id", "score"]].sort_values("cluster_id")
        .reset_index(drop=True), preserve_index=False)
    return kept, wt
