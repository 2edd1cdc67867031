"""Similarity search over an embedding column (list<float>).

- Brute-force cosine top-k: numpy matmul per batch against a broadcast
  (ray.put once) query matrix — the exact baseline. Per-batch partial
  top-k → driver merge of (#blocks × k) rows only.
- LSH-bucketed ANN (random hyperplanes): scale path — candidates share a
  signature bucket; recall is tested against brute force on clustered
  synthetic data.
- Embedding near-dup (cosine ≥ τ): LSH buckets → in-bucket pairwise
  verify; the embedding analogue of MinHash near-dup.

No reference analogue (the CRM has no vectors); grounded in public ANN
practice (random hyperplane LSH: Charikar 2002; IVF: Jégou et al. 2011).
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray

from ..determinism import splitmix64


def _mat(batch_col) -> np.ndarray:
    """list<float> column → (n, d) float64 matrix (zero-copy flatten).
    Empty column → (0, 0): reshape(0, -1) is illegal on size-0 arrays,
    and Ray Data legitimately delivers empty blocks."""
    arr = batch_col
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    n = len(arr)
    if n == 0:
        return np.empty((0, 0), dtype=np.float64)
    flat = arr.flatten().to_numpy(zero_copy_only=False)
    return flat.reshape(n, -1).astype(np.float64)


def _unit(m: np.ndarray) -> np.ndarray:
    norm = np.linalg.norm(m, axis=1, keepdims=True)
    norm[norm == 0] = 1.0
    return m / norm


def _empty_topk() -> pa.Table:
    return pa.Table.from_pydict({"query_id": pa.array([], pa.int64()),
                                 "vec_id": pa.array([], pa.int64()),
                                 "sim": pa.array([], pa.float64())})


def _topk_rows(ids: np.ndarray, sims: np.ndarray, k: int, qi: int,
               round_digits: int = 4) -> pd.DataFrame:
    """One query's per-block partial top-k, CLOSED under the driver's
    (sim desc, vec_id asc) merge: select by the ROUNDED similarity with
    the id tie-break. Selecting by unrounded sims (the old argpartition)
    made membership at rounded-tie boundaries depend on which block a
    row landed in — a block-layout-dependent result. The lexsort is
    O(n log n) per query per block, minor next to the O(n·d) scoring
    that produced ``sims``. ``round_away`` (half away from zero) is the
    DuckDB ROUND the oracles compare against."""
    from ..determinism import round_away

    r = round_away(sims, round_digits)
    order = np.lexsort((ids, -r))[:min(k, len(ids))]
    return pd.DataFrame({"query_id": qi, "vec_id": ids[order],
                         "sim": r[order]})


def brute_force_topk(ds, query_vecs: np.ndarray, *, k: int = 10,
                     id_col: str = "vec_id", vec_col: str = "embedding",
                     exclude_ids: Optional[np.ndarray] = None,
                     round_digits: int = 4) -> pa.Table:
    """→ (query_id, vec_id, sim): top-k cosine neighbours per query row.

    Partial top-k per block (matmul) → merge of the tiny partials on the
    driver. Ties broken by (sim desc, vec_id asc) AFTER rounding, so the
    result is engine-independent."""
    q = _unit(np.atleast_2d(np.asarray(query_vecs, dtype=np.float64)))
    qref = ray.put(q)
    excl = set() if exclude_ids is None else set(np.asarray(exclude_ids).tolist())

    def partial(batch: pa.Table) -> pa.Table:
        qm = ray.get(qref)  # (nq, d)
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        if len(ids) == 0:
            return _empty_topk()
        keep = ~np.isin(ids, list(excl)) if excl else np.ones(len(ids), bool)
        e = _unit(_mat(batch[vec_col]))[keep]
        ids = ids[keep]
        if len(ids) == 0:
            return _empty_topk()
        sims = e @ qm.T  # (n, nq)
        rows = [_topk_rows(ids, sims[:, qi], k, qi, round_digits)
                for qi in range(qm.shape[0])]
        return pa.Table.from_pandas(pd.concat(rows), preserve_index=False)

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True).to_pandas()
    if len(parts) == 0:
        return _empty_topk()
    out = (parts.sort_values(["query_id", "sim", "vec_id"],
                             ascending=[True, False, True])
                .groupby("query_id", as_index=False).head(k)
                .reset_index(drop=True))
    return pa.Table.from_pandas(out, preserve_index=False)


# ---------------------------------------------------------------------------
# LSH-bucketed ANN (random hyperplanes)
# ---------------------------------------------------------------------------

def _hyperplanes(dim: int, n_bits: int, seed: int = 42) -> np.ndarray:
    # deterministic Gaussian-ish planes from hashed uniforms (Box-Muller)
    n = dim * n_bits
    u1 = (splitmix64(np.arange(n, dtype=np.uint64) + np.uint64(seed)).astype(np.float64)
          + 1.0) / 2.0**64
    u2 = (splitmix64(np.arange(n, 2 * n, dtype=np.uint64) + np.uint64(seed)).astype(np.float64)
          + 1.0) / 2.0**64
    z = np.sqrt(-2 * np.log(u1)) * np.cos(2 * np.pi * u2)
    return z.reshape(n_bits, dim)


def lsh_signatures(m: np.ndarray, planes: np.ndarray) -> np.ndarray:
    bits = (m @ planes.T) > 0
    n_bits = bits.shape[1]
    assert n_bits <= 32
    padded = np.zeros((bits.shape[0], 32), dtype=np.uint8)
    padded[:, :n_bits] = bits
    return np.packbits(padded, axis=1, bitorder="little").view(np.uint32).ravel()


def lsh_topk(ds, query_vecs: np.ndarray, *, k: int = 10, n_bits: int = 12,
             id_col: str = "vec_id", vec_col: str = "embedding",
             seed: int = 42, probes: int = 1, n_tables: int = 4) -> pa.Table:
    """ANN top-k: only rows sharing an LSH bucket with the query in ANY of
    the n_tables hash tables (multi-probe: 1-bit-flip neighbour buckets
    too when probes > 1) are scored. Approximate — recall measured against
    brute_force_topk in tests; raise n_tables / probes (or lower n_bits)
    to trade compute for recall."""
    q = _unit(np.atleast_2d(np.asarray(query_vecs, dtype=np.float64)))
    dim = q.shape[1]
    tables = [_hyperplanes(dim, n_bits, seed + 131 * t) for t in range(n_tables)]
    buckets_per_table = []
    for pl in tables:
        qsig = lsh_signatures(q, pl)
        wanted = set(qsig.tolist())
        if probes > 1:
            for s in qsig.tolist():
                for b in range(n_bits):
                    wanted.add(s ^ (1 << b))
        buckets_per_table.append(np.array(sorted(wanted), dtype=np.uint32))
    qref = ray.put((q, tables, buckets_per_table))

    def partial(batch: pa.Table) -> pa.Table:
        qm, tbls, bkts = ray.get(qref)
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        if len(ids) == 0:
            return _empty_topk()
        e = _unit(_mat(batch[vec_col]))
        m = np.zeros(len(ids), dtype=bool)
        for pl, bk in zip(tbls, bkts):
            m |= np.isin(lsh_signatures(e, pl), bk)
        ids, e = ids[m], e[m]
        if len(ids) == 0:
            return _empty_topk()
        sims = e @ qm.T
        rows = [_topk_rows(ids, sims[:, qi], k, qi)
                for qi in range(qm.shape[0])]
        return pa.Table.from_pandas(pd.concat(rows), preserve_index=False)

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True).to_pandas()
    if len(parts) == 0:
        return _empty_topk()
    out = (parts.sort_values(["query_id", "sim", "vec_id"],
                             ascending=[True, False, True])
                .groupby("query_id", as_index=False).head(k)
                .reset_index(drop=True))
    return pa.Table.from_pandas(out, preserve_index=False)


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN — k-means coarse quantizer
# ---------------------------------------------------------------------------

def train_ivf_centroids(ds, *, n_lists: int = 16, vec_col: str = "embedding",
                        sample_rows: int = 4096, iters: int = 10,
                        seed: int = 42) -> np.ndarray:
    """Deterministic mini k-means on a seeded random sample → (n_lists,
    dim) unit centroids. The sample is drawn with ``ds.random_sample``
    (seeded — unbiased across the whole table, unlike a head ``limit``);
    training cost is O(sample × lists × iters)."""
    n = ds.count()
    if n > sample_rows:
        frac = min(1.0, (sample_rows * 1.25) / n)  # slight over-draw
        sample = (ds.random_sample(frac, seed=seed)
                    .limit(sample_rows).to_pandas())
        if len(sample) < max(n_lists, sample_rows // 4):  # tiny-ds fallback
            sample = ds.limit(sample_rows).to_pandas()
    else:
        sample = ds.limit(sample_rows).to_pandas()
    if len(sample) == 0 or vec_col not in sample.columns:
        # empty corpus (a fully-empty to_pandas also loses the schema):
        # no centroids to train — callers treat (0, 0) as "no lists"
        return np.empty((0, 0), dtype=np.float64)
    x = _unit(np.stack(sample[vec_col].to_numpy()).astype(np.float64))
    # lexsort the sample rows: limit()/to_pandas deliver blocks in
    # ARRIVAL order, so without this the strided init (and every
    # downstream centroid consumer) varies run to run on multi-block
    # inputs. With the full-table sample (n ≤ sample_rows — every test
    # and driver path) this makes the fit fully order-independent.
    x = x[np.lexsort(x.T[::-1])]
    # deterministic init: evenly strided sample rows
    stride = max(len(x) // n_lists, 1)
    c = x[::stride][:n_lists].copy()
    for _ in range(iters):
        assign = np.argmax(x @ c.T, axis=1)
        for j in range(len(c)):
            members = x[assign == j]
            if len(members):
                c[j] = members.mean(axis=0)
        c = _unit(c)
    return c


def ivf_topk(ds, query_vecs: np.ndarray, *, k: int = 10, n_lists: int = 16,
             n_probe: int = 4, id_col: str = "vec_id",
             vec_col: str = "embedding", seed: int = 42) -> pa.Table:
    """IVF ANN top-k: vectors are bucketed by nearest coarse centroid;
    each query scores only the n_probe nearest lists. Approximate —
    recall vs brute force measured in tests; n_probe/n_lists trade
    compute for recall (Jégou et al. 2011)."""
    q = _unit(np.atleast_2d(np.asarray(query_vecs, dtype=np.float64)))
    cents = train_ivf_centroids(ds, n_lists=n_lists, vec_col=vec_col,
                                seed=seed)
    if cents.size == 0:  # empty corpus → no lists, no neighbours
        return _empty_topk()
    probe_lists = np.argsort(-(q @ cents.T), axis=1)[:, :n_probe]  # (nq, p)
    wanted = np.unique(probe_lists)
    qref = ray.put((q, cents, probe_lists, wanted))

    def partial(batch: pa.Table) -> pa.Table:
        qm, cs, probes, keep_lists = ray.get(qref)
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        if len(ids) == 0:
            return _empty_topk()
        e = _unit(_mat(batch[vec_col]))
        assign = np.argmax(e @ cs.T, axis=1)
        m = np.isin(assign, keep_lists)
        ids, e, assign = ids[m], e[m], assign[m]
        if len(ids) == 0:
            return _empty_topk()
        rows = []
        for qi in range(qm.shape[0]):
            mask = np.isin(assign, probes[qi])
            if not mask.any():
                continue
            rows.append(_topk_rows(ids[mask], e[mask] @ qm[qi], k, qi))
        if not rows:
            return _empty_topk()
        return pa.Table.from_pandas(pd.concat(rows), preserve_index=False)

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True).to_pandas()
    if len(parts) == 0:
        return _empty_topk()
    out = (parts.sort_values(["query_id", "sim", "vec_id"],
                             ascending=[True, False, True])
                .groupby("query_id", as_index=False).head(k)
                .reset_index(drop=True))
    return pa.Table.from_pandas(out, preserve_index=False)


# ---------------------------------------------------------------------------
# embedding near-dup
# ---------------------------------------------------------------------------

def embedding_near_dup_pairs(ds, *, threshold: float = 0.9, n_bits: int = 10,
                             id_col: str = "vec_id", vec_col: str = "embedding",
                             seed: int = 42, dim: Optional[int] = None,
                             n_tables: int = 3,
                             max_bucket: int = 2048,
                             shuffle_buckets: int = 64) -> pa.Table:
    """→ (id_a, id_b, sim) pairs with cosine ≥ threshold.

    n_tables independent LSH tables; each vector lands in one bucket per
    table; in-bucket pairwise verify; pairs deduped across tables. Recall
    for a pair at angle θ is 1-(1-(1-θ/π)^n_bits)^n_tables — raise
    n_tables for higher recall (approximation documented for scale).

    Hot-bucket guard: a bucket over ``max_bucket`` members (e.g. many
    near-zero or duplicate vectors collapsing to one signature) is
    recursively SUB-BUCKETED with fresh hyperplanes instead of paying an
    O(n²) in-bucket matmul; pairs split across sub-buckets may be missed
    in that table (the other tables can still catch them) — the standard
    LSH hot-key mitigation, documented approximation."""
    if dim is None:
        first = ds.take(1)[0][vec_col]
        dim = len(first)
    tables = [_hyperplanes(dim, n_bits, seed + 131 * t) for t in range(n_tables)]
    pref = ray.put(tables)

    def rows(batch: pa.Table) -> pa.Table:
        tbls = ray.get(pref)
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        if len(ids) == 0:
            return pa.Table.from_pydict({
                "bucket": pa.array([], pa.int64()),
                "id": pa.array([], pa.int64()),
                "vec": pa.array([], pa.list_(pa.float32()))})
        e = _unit(_mat(batch[vec_col]))
        sigs = np.concatenate([
            lsh_signatures(e, pl).astype(np.int64) + (t << 40)
            for t, pl in enumerate(tbls)])
        return pa.Table.from_pydict({
            "bucket": pa.array(sigs),
            "id": pa.array(np.tile(ids.astype(np.int64), len(tbls))),
            "vec": pa.array(list(e.astype(np.float32)) * len(tbls)),
        })

    r = ds.map_batches(rows, batch_format="pyarrow", zero_copy_batch=True)

    def _verify(ids: np.ndarray, e: np.ndarray, depth: int) -> list:
        """→ list of (id_a[], id_b[], sim[]) array triples (vectorized)."""
        if len(ids) < 2:
            return []
        if len(ids) > max_bucket and depth < 4:
            # hot bucket: split with fresh planes, recurse per sub-bucket
            planes = _hyperplanes(e.shape[1], n_bits, seed + 7919 * (depth + 1))
            sub = lsh_signatures(e, planes)
            out = []
            for sv in np.unique(sub):
                m = sub == sv
                if m.sum() >= 2:
                    out.extend(_verify(ids[m], e[m], depth + 1))
            return out
        if len(ids) > max_bucket:  # degenerate (identical sigs at depth 4)
            order = np.argsort(ids)
            ids, e = ids[order], e[order]
            return [t for i in range(0, len(ids), max_bucket)
                    for t in _verify(ids[i:i + max_bucket],
                                     e[i:i + max_bucket], depth + 1)]
        s = e @ e.T
        iu = np.triu_indices(len(ids), 1)
        sv = s[iu]
        m = sv >= threshold
        if not m.any():
            return []
        return [(ids[iu[0][m]], ids[iu[1][m]], np.round(sv[m], 4))]

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        """Vectorized multi-bucket kernel: lexsort + np.unique bucket
        index; Python touches only multi-member buckets (rare), each a
        numpy slice into the verify matmul. Runs once per HASH bucket
        via keyed_apply — O(n_buckets) interpreter calls, not O(#LSH
        buckets) map_groups invocations (the 10^9 path)."""
        empty_f = pd.DataFrame({"id_a": pd.Series(dtype="int64"),
                                "id_b": pd.Series(dtype="int64"),
                                "sim": pd.Series(dtype="float64")})
        if len(g) < 2:
            return empty_f
        from ..stages.keyed_window import bucket_runs

        bk = g["bucket"].to_numpy()
        ids = g["id"].to_numpy()
        vecs = g["vec"].to_numpy()
        ids, (vecs,), starts, counts = bucket_runs(bk, ids, vecs)
        found = []
        for bi in np.nonzero(counts >= 2)[0]:
            o, s = int(starts[bi]), int(counts[bi])
            e = np.stack(vecs[o:o + s]).astype(np.float64)
            found.extend(_verify(ids[o:o + s], e, 0))
        if not found:
            return empty_f
        return pd.DataFrame({
            "id_a": np.concatenate([t[0] for t in found]),
            "id_b": np.concatenate([t[1] for t in found]),
            "sim": np.concatenate([t[2] for t in found])})

    from ..stages.keyed_window import keyed_apply

    # shuffle_buckets sizes the keyed partitions (one bucket = one kernel
    # call and one worker-heap residency; raise proportionally at scale)
    out = keyed_apply(r, "bucket", bucket_pairs,
                      n_buckets=shuffle_buckets).to_pandas()
    if len(out) == 0:
        return pa.Table.from_pydict({"id_a": pa.array([], pa.int64()),
                                     "id_b": pa.array([], pa.int64()),
                                     "sim": pa.array([], pa.float64())})
    out = (out.drop_duplicates(["id_a", "id_b"])
              .sort_values(["id_a", "id_b"]).reset_index(drop=True))
    out["id_a"] = out["id_a"].astype("int64")
    out["id_b"] = out["id_b"].astype("int64")
    return pa.Table.from_pandas(out, preserve_index=False)


def exact_cosine_threshold_pairs(ds, *, threshold: float,
                                 id_col: str = "vec_id",
                                 vec_col: str = "embedding",
                                 mode: str = "auto",
                                 n_rows_hint: int = 0,
                                 round_digits: int = 4) -> pa.Table:
    """EXACT cosine-threshold self-join: ALL (id_a < id_b, sim) pairs
    with cosine ≥ ``threshold`` — the dense-vector analogue of
    ``dedup.ssjoin_pairs`` (no prefix filter exists for continuous
    angles, so the exact path is a blocked matmul; the LSH operator
    :func:`embedding_near_dup_pairs` remains the approximate path whose
    recall the angle regime dictates — at θ ≈ 63° hyperplane LSH cannot
    prune without losing recall, which is WHY this exact operator
    exists). sim computed as dot/( |a|·|b| ) in float64 — the same
    formula DuckDB's list_cosine_similarity(CAST AS DOUBLE) evaluates —
    then rounded half-away, so the pair table is oracle-comparable
    bit-for-bit. (Known residual: BLAS summation order differs from
    DuckDB's sequential sum, so a sim within 1 ulp of the threshold or
    of a 0.00005 rounding boundary could diverge — the same last-ulp
    band every float oracle in this repo carries; on the driver corpora
    the nearest sim sits 1e-4 from the threshold, verified EXACT at
    sf0.001/0.01/0.1.)

    Modes:

    - 'driver' (≤ ~100k vectors): collect (id, vec) once, one chunked
      local matmul. n·d floats on the driver — 51 MB at the band edge
      (d=64).
    - 'broadcast' (≤ ~5M vectors): the full matrix broadcasts ONCE
      (ray.put) and every block computes block × matrixᵀ — n² compare
      work distributed over blocks, nothing but pairs leaves a task.
    Beyond: this join is inherently Ω(n²) compare — use the IVF/LSH
    approximate family and document the recall, or pre-cluster.
    Output-identical across modes (agreement-tested)."""
    from ..determinism import round_away

    if mode == "auto":
        n = n_rows_hint or ds.count()
        mode = "driver" if n <= 100_000 else "broadcast"
    if mode not in ("driver", "broadcast"):
        raise ValueError(f"unknown exact-pairs mode: {mode!r}")

    def grab(b: pa.Table) -> pa.Table:
        return pa.Table.from_arrays([b[id_col], b[vec_col]],
                                    names=["id", "vec"])

    parts = [t for t in ray.get(ds.map_batches(
        grab, batch_format="pyarrow",
        zero_copy_batch=True).to_arrow_refs()) if t.num_rows]
    if not parts:  # all blocks empty — typed empty result, not a crash
        return pa.Table.from_pydict(
            {"id_a": pa.array([], pa.int64()),
             "id_b": pa.array([], pa.int64()),
             "sim": pa.array([], pa.float64())})
    tbl = pa.concat_tables(parts)
    ids = tbl["id"].to_numpy(zero_copy_only=False)
    V = _mat(tbl["vec"])
    order = np.argsort(ids)
    ids, V = ids[order], V[order]
    norms = np.linalg.norm(V, axis=1)
    # cosine is undefined for the zero vector; DuckDB's
    # list_cosine_similarity divides by a zero magnitude (NaN) where the
    # old norms==0→1 trick yielded sim=0 — either way such a row can
    # never be a ≥-threshold near-dup, so drop it up front and the
    # engine and oracle agree on exactly the defined pairs
    nz = norms > 0
    if not nz.all():
        ids, V, norms = ids[nz], V[nz], norms[nz]
        if not len(ids):
            return pa.Table.from_pydict(
                {"id_a": pa.array([], pa.int64()),
                 "id_b": pa.array([], pa.int64()),
                 "sim": pa.array([], pa.float64())})

    def block_pairs(i0: int, i1: int, Vg, ng, idsg):
        """Pairs between rows [i0, i1) and ALL rows with larger index —
        sim = dot / (norm·norm), the oracle's op order; one matmul and
        one 2-D mask per block, no per-row Python."""
        S = Vg[i0:i1] @ Vg.T
        S /= ng[i0:i1][:, None]
        S /= ng[None, :]
        col = np.arange(len(idsg))
        mask = (S >= threshold) & (col[None, :]
                                   > np.arange(i0, i1)[:, None])
        rr, cc = np.nonzero(mask)
        if not len(rr):
            return []
        return [(idsg[i0 + rr], idsg[cc], S[rr, cc])]

    # block size targets a fixed per-task COMPARE budget (step × n ≈
    # 2·10⁸ score entries ≈ 1.6 GB of transient float64) — sizing by
    # rows would collapse to 1-row tasks at large n
    step = int(min(len(ids), max(256, 200_000_000 // max(len(ids), 1))))
    if mode == "driver":
        chunks = []
        for i0 in range(0, len(ids), step):
            chunks.extend(block_pairs(i0, min(i0 + step, len(ids)),
                                      V, norms, ids))
    else:
        ref = ray.put((V, norms, ids))

        @ray.remote
        def block_task(i0: int, i1: int):
            Vg, ng, idsg = ray.get(ref)
            return block_pairs(i0, i1, Vg, ng, idsg)

        futs = [block_task.remote(i0, min(i0 + step, len(ids)))
                for i0 in range(0, len(ids), step)]
        chunks = [c for f in ray.get(futs) for c in f]

    if not chunks:
        return pa.Table.from_pydict(
            {"id_a": pa.array([], pa.int64()),
             "id_b": pa.array([], pa.int64()),
             "sim": pa.array([], pa.float64())})
    a = np.concatenate([c[0] for c in chunks])
    b = np.concatenate([c[1] for c in chunks])
    s = round_away(np.concatenate([c[2] for c in chunks]), round_digits)
    out = (pd.DataFrame({"id_a": a, "id_b": b, "sim": s})
           .sort_values(["id_a", "id_b"]).reset_index(drop=True))
    return pa.Table.from_pandas(out, preserve_index=False)


def emb_threshold_calibration(ds, *, target_fpr: float = 1e-3,
                              n_pairs: int = 20_000, seed: int = 42,
                              id_col: str = "vec_id",
                              vec_col: str = "embedding",
                              round_digits: int = 6) -> pd.DataFrame:
    """Calibrate the near-dup cosine threshold against the corpus's
    OWN null distribution: sample seeded random (non-identical) vector
    pairs, take the (1 − target_fpr) quantile of their cosine — using
    a threshold below it would flag ≥ target_fpr of unrelated pairs as
    duplicates. The principled way to pick `emb_near_dup`'s threshold
    per embedding model/corpus instead of folklore constants.

    Execution: ONE pass collects only the sampled ids' vectors
    (candidate-only semi-join, 2·n_pairs vectors max); pair cosines
    are a single driver matmul over that sample. Counter-based pair
    sampling → rerun/layout invariant. The id LIST is one distinct
    pass (O(#vectors) driver ints — inside the engine's broadcast
    band; beyond it, draw ids from a seeded `sampling.py` pre-sample
    instead, the same seam as dedup_eval's control pairs).

    → one-row frame (n_pairs, target_fpr, threshold, mean_cos,
    p99_cos)."""
    from ..determinism import randint

    ids = np.sort(ds.map_batches(
        lambda b: pa.Table.from_arrays(
            [pc.cast(b[id_col], pa.int64()).unique()], names=["i"]),
        batch_format="pyarrow",
        zero_copy_batch=True).to_pandas()["i"].unique())
    n = len(ids)
    if n < 2:
        # one distinct id → every sampled pair is (i, i) and the null
        # distribution is undefined; fail with the reason instead of a
        # bare np.stack/IndexError downstream
        raise ValueError(
            f"threshold calibration needs ≥2 distinct {id_col} values, "
            f"got {n}")
    idx = np.arange(n_pairs, dtype=np.int64)
    ia = randint(idx, seed, 11, 0, n)
    ib = randint(idx, seed, 12, 0, n)
    ok = ia != ib
    ia, ib = ia[ok], ib[ok]
    wanted = np.unique(np.concatenate([ids[ia], ids[ib]]))
    ref = ray.put(pa.array(wanted))

    def grab(b: pa.Table) -> pa.Table:
        want = ray.get(ref)
        m = pc.is_in(pc.cast(b[id_col], pa.int64()), value_set=want)
        return pa.Table.from_arrays(
            [pc.cast(b[id_col], pa.int64()).filter(m),
             b[vec_col].filter(m)], names=["i", "v"])

    sub = ds.map_batches(grab, batch_format="pyarrow",
                         zero_copy_batch=True).to_pandas()
    sub = sub.drop_duplicates("i").set_index("i")
    V = _unit(np.stack([np.asarray(v, dtype=np.float64)
                        for v in sub["v"]]))
    pos = {int(i): j for j, i in enumerate(sub.index)}
    ja = np.array([pos[int(x)] for x in ids[ia]])
    jb = np.array([pos[int(x)] for x in ids[ib]])
    cos = np.einsum("ij,ij->i", V[ja], V[jb])
    thr = float(np.quantile(cos, 1.0 - target_fpr,
                            method="higher"))
    return pd.DataFrame([{
        "n_pairs": int(len(cos)),
        "target_fpr": target_fpr,
        "threshold": round(thr, round_digits),
        "mean_cos": round(float(cos.mean()), round_digits),
        "p99_cos": round(float(np.quantile(cos, 0.99)),
                         round_digits)}])
