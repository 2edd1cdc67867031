"""Persisted IVF ANN index — fit once, probe many times.

The batch `similarity.ivf_topk` refits its coarse quantizer on every
call; a production similarity service builds the index ONCE and answers
query batches against it (the Faiss on-disk IVF usage, Jégou et al.
2011). Same persistence contract as the incremental MinHash index
(`incremental_dedup.py`):

- ``build_ivf_index``: train the deterministic k-means quantizer on a
  seeded sample → one streamed assign pass over the vectors → rows
  ``(list_id, vec_id, embedding float32)`` range-sorted by ``list_id``
  and written as parquet (the sort buys row-group locality for every
  probe) + centroids parquet + a parameter manifest.
- ``probe_ivf_index``: load centroids (O(n_lists × dim), driver) →
  choose each query's ``n_probe`` nearest lists → ONE index scan with
  the wanted-list set broadcast and filtered per block → per-block
  partial top-k → tiny driver merge. Probe cost tracks the probed
  lists, never the corpus; a parameter mismatch raises (stale-index
  guard, same as IndexParamsMismatch in the MinHash index).

Results agree with ``ivf_topk`` run with the same parameters on the
same data (agreement-tested) — persistence changes WHEN work happens,
not what is computed — up to the documented storage precision: vectors
and centroids persist as float32 (the standard on-disk ANN trade), so
a sim within ~1e-7 of a rounding boundary or a centroid-argsort tie
can differ from the all-float64 in-memory path.
"""

from __future__ import annotations

import json
import os
from typing import Tuple

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from .similarity import (_mat, _topk_rows, _unit,
                         train_ivf_centroids)

_MANIFEST = "ivf_manifest.json"


class IndexParamsMismatch(ValueError):
    pass


def build_ivf_index(ds, out_dir: str, *, n_lists: int = 16,
                    id_col: str = "vec_id", vec_col: str = "embedding",
                    seed: int = 42, pq_m: int | None = None,
                    pq_codes: int = 256) -> str:
    """Fit the quantizer and persist (list_id-sorted rows + centroids +
    manifest) under ``out_dir``. With ``pq_m`` set this is an IVF-PQ
    index (Jégou et al. 2011): rows store ``pq_m`` uint8 codes instead
    of the float vector — the 100-TB storage path — plus a codebooks
    parquet; probes then score by asymmetric distance. Returns
    ``out_dir``."""
    import shutil

    import pyarrow.parquet as pq
    import ray.data as rd

    if pq_m and pq_codes > 256:
        raise ValueError(
            f"pq_codes={pq_codes} exceeds the uint8 code range (256); "
            f"larger codebooks would silently wrap to wrong codewords")
    cents = train_ivf_centroids(ds, n_lists=n_lists, vec_col=vec_col,
                                seed=seed)
    # a corpus smaller than n_lists trains fewer centroids — persist the
    # EFFECTIVE count (the manifest is the probe-side contract)
    if cents.size == 0:
        raise ValueError("cannot build an IVF index over an empty corpus")
    n_lists = int(len(cents))
    books = (train_pq_codebooks(ds, m=pq_m, n_codes=pq_codes,
                                vec_col=vec_col, seed=seed)
             if pq_m else None)
    cref = ray.put((cents, books))

    def assign(b: pa.Table) -> pa.Table:
        cs, bk = ray.get(cref)
        ids = b[id_col].to_numpy(zero_copy_only=False)
        e = _unit(_mat(b[vec_col]))
        lid = np.argmax(e @ cs.T, axis=1).astype(np.int32)
        cols = {"list_id": pa.array(lid, pa.int32()),
                "vec_id": pa.array(ids, pa.int64())}
        if bk is None:
            cols["vec"] = pa.array([v.astype(np.float32) for v in e],
                                   pa.list_(pa.float32()))
        else:
            m_, k_, sub = bk.shape
            codes = np.empty((len(e), m_), dtype=np.uint8)
            bkd = bk.astype(np.float64)
            for j in range(m_):
                xs = e[:, j * sub:(j + 1) * sub]
                c = bkd[j]
                d2 = ((xs ** 2).sum(1)[:, None] - 2 * xs @ c.T
                      + (c ** 2).sum(1)[None, :])
                codes[:, j] = np.argmin(d2, axis=1).astype(np.uint8)
            cols["code"] = pa.array([row.tobytes() for row in codes],
                                    pa.binary())
        return pa.Table.from_pydict(cols)

    rows = ds.map_batches(assign, batch_format="pyarrow",
                          zero_copy_batch=True)
    os.makedirs(out_dir, exist_ok=True)
    lists_dir = os.path.join(out_dir, "lists")
    # a rebuild into an existing dir must REPLACE the rows: write_parquet
    # adds new uuid-named files, so stale files from a previous build
    # would silently mix two generations under the fresh manifest
    if os.path.isdir(lists_dir):
        shutil.rmtree(lists_dir)
    stale_books = os.path.join(out_dir, "pq_codebooks.npy")
    if books is None and os.path.exists(stale_books):
        os.remove(stale_books)
    rows.sort("list_id").write_parquet(lists_dir)
    dim = cents.shape[1]
    pq.write_table(
        pa.table({"list_id": pa.array(range(n_lists), pa.int32()),
                  "centroid": pa.array([c.astype(np.float32) for c in cents],
                                       pa.list_(pa.float32()))}),
        os.path.join(out_dir, "centroids.parquet"))
    if books is not None:
        np.save(os.path.join(out_dir, "pq_codebooks.npy"), books)
    with open(os.path.join(out_dir, _MANIFEST), "w") as f:
        json.dump({"n_lists": n_lists, "seed": seed, "dim": int(dim),
                   "id_col": id_col, "vec_col": vec_col,
                   "pq_m": pq_m, "pq_codes": pq_codes if pq_m else None}, f)
    return out_dir


def probe_ivf_index(index_dir: str, query_vecs: np.ndarray, *,
                    k: int = 10, n_probe: int = 4,
                    expect: dict | None = None) -> pa.Table:
    """→ (query_id, vec_id, sim) top-k per query against the persisted
    index. ``expect`` (e.g. ``{'n_lists': 16, 'seed': 42}``) guards
    against probing a stale/mismatched index."""
    import pyarrow.parquet as pq
    import ray.data as rd

    with open(os.path.join(index_dir, _MANIFEST)) as f:
        man = json.load(f)
    if expect:
        got = {x: man.get(x) for x in expect}
        if got != dict(expect):
            raise IndexParamsMismatch(
                f"index built with {got}, probe expects {dict(expect)}")

    ct = pq.read_table(os.path.join(index_dir, "centroids.parquet"))
    cents = np.stack(ct["centroid"].to_pylist()).astype(np.float64)
    q = _unit(np.atleast_2d(np.asarray(query_vecs, dtype=np.float64)))
    probe_lists = np.argsort(-(q @ cents.T), axis=1)[:, :n_probe]
    wanted = np.unique(probe_lists)
    lut = None
    if man.get("pq_m"):
        books = np.load(os.path.join(index_dir, "pq_codebooks.npy"))
        m_, k_, sub = books.shape
        lut = np.einsum("qjs,jcs->qjc", q.reshape(len(q), m_, sub),
                        books.astype(np.float64))
    qref = ray.put((q, probe_lists, np.sort(wanted), lut))

    def partial(b: pa.Table) -> pa.Table:
        qm, probes, keep, tables = ray.get(qref)
        lid = b["list_id"].to_numpy(zero_copy_only=False)
        pos = np.clip(np.searchsorted(keep, lid), 0, len(keep) - 1)
        m = keep[pos] == lid
        empty = pa.Table.from_pydict({
            "query_id": pa.array([], pa.int64()),
            "vec_id": pa.array([], pa.int64()),
            "sim": pa.array([], pa.float64())})
        if not m.any():
            return empty
        sub = b.filter(pa.array(m))
        ids = sub["vec_id"].to_numpy(zero_copy_only=False)
        assign = sub["list_id"].to_numpy(zero_copy_only=False)
        if tables is None:
            e = _mat(sub["vec"])  # stored unit-normalized
        else:
            raw = sub["code"].to_numpy(zero_copy_only=False)
            codes = (np.frombuffer(b"".join(raw), dtype=np.uint8)
                     .reshape(len(ids), -1) if len(ids) else
                     np.empty((0, tables.shape[1]), dtype=np.uint8))
        rows = []
        for qi in range(qm.shape[0]):
            mask = np.isin(assign, probes[qi])
            if not mask.any():
                continue
            if tables is None:
                sims = e[mask] @ qm[qi]
            else:
                cm = codes[mask]
                sims = tables[qi, np.arange(cm.shape[1])[None, :],
                              cm].sum(axis=1)
            rows.append(_topk_rows(ids[mask], sims, k, qi))
        if not rows:
            return empty
        return pa.Table.from_pandas(pd.concat(rows), preserve_index=False)

    parts = (rd.read_parquet(os.path.join(index_dir, "lists"))
             .map_batches(partial, batch_format="pyarrow",
                          zero_copy_batch=True).to_pandas())
    if not len(parts):
        return pa.Table.from_pydict({"query_id": pa.array([], pa.int64()),
                                     "vec_id": pa.array([], pa.int64()),
                                     "sim": pa.array([], pa.float64())})
    out = (parts.sort_values(["query_id", "sim", "vec_id"],
                             ascending=[True, False, True])
                .groupby("query_id", as_index=False).head(k)
                .reset_index(drop=True))
    return pa.Table.from_pandas(out, preserve_index=False)


# ---------------------------------------------------------------------------
# product quantization — the 100-TB storage path for the vector payload
# ---------------------------------------------------------------------------

def train_pq_codebooks(ds, *, m: int = 4, n_codes: int = 256,
                       vec_col: str = "embedding", seed: int = 42,
                       sample_rows: int = 20_000, iters: int = 10
                       ) -> np.ndarray:
    """Product-quantization codebooks (Jégou, Douze & Schmid 2011): the
    unit-normalized vector splits into ``m`` subspaces, each k-means'd to
    ``n_codes`` centroids on a seeded sample. → (m, n_codes, d/m)
    float32. Deterministic: strided init + fixed iteration count, same
    contract as ``train_ivf_centroids``."""
    from .similarity import _mat, _unit

    if n_codes > 256:
        raise ValueError(
            f"n_codes={n_codes} exceeds the uint8 code range (256)")
    n = ds.count()
    if n > sample_rows:
        frac = min(1.0, (sample_rows * 1.25) / n)
        sample = (ds.random_sample(frac, seed=seed)
                  .limit(sample_rows).to_pandas())
        if len(sample) < max(n_codes, sample_rows // 4):
            sample = ds.limit(sample_rows).to_pandas()
    else:
        sample = ds.limit(sample_rows).to_pandas()
    x = _unit(np.stack(sample[vec_col].to_numpy()).astype(np.float64))
    d = x.shape[1]
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    sub = d // m
    books = np.empty((m, n_codes, sub), dtype=np.float64)
    for j in range(m):
        xs = x[:, j * sub:(j + 1) * sub]
        k = min(n_codes, len(xs))
        stride = max(len(xs) // k, 1)
        c = xs[::stride][:k].copy()
        if k < n_codes:  # tiny sample: pad by repeating
            c = np.concatenate([c] * (n_codes // k + 1))[:n_codes]
        for _ in range(iters):
            # squared-L2 assignment, vectorized
            d2 = ((xs ** 2).sum(1)[:, None] - 2 * xs @ c.T
                  + (c ** 2).sum(1)[None, :])
            assign = np.argmin(d2, axis=1)
            for ci in range(n_codes):
                members = xs[assign == ci]
                if len(members):
                    c[ci] = members.mean(axis=0)
        books[j] = c
    return books.astype(np.float32)


def pq_encode(ds, codebooks: np.ndarray, *, id_col: str = "vec_id",
              vec_col: str = "embedding"):
    """→ Dataset (vec_id, code: list<uint8> of length m) — ~d×4/m-fold
    smaller than the float payload. One streamed pass, codebooks
    broadcast once."""
    import ray

    from .similarity import _mat, _unit

    if codebooks.shape[1] > 256:
        raise ValueError(
            f"codebooks carry {codebooks.shape[1]} codes per subspace — "
            f"uint8 codes cap at 256")
    bref = ray.put(codebooks.astype(np.float64))

    def enc(b: pa.Table) -> pa.Table:
        books = ray.get(bref)
        m_, k_, sub = books.shape
        e = _unit(_mat(b[vec_col]))
        codes = np.empty((len(e), m_), dtype=np.uint8)
        for j in range(m_):
            xs = e[:, j * sub:(j + 1) * sub]
            c = books[j]
            d2 = ((xs ** 2).sum(1)[:, None] - 2 * xs @ c.T
                  + (c ** 2).sum(1)[None, :])
            codes[:, j] = np.argmin(d2, axis=1).astype(np.uint8)
        return pa.Table.from_pydict({
            "vec_id": b[id_col],
            "code": pa.array([row.tobytes() for row in codes],
                             pa.binary())})

    return ds.map_batches(enc, batch_format="pyarrow", zero_copy_batch=True)


def pq_topk(codes_ds, codebooks: np.ndarray, query_vecs: np.ndarray, *,
            k: int = 10) -> pa.Table:
    """Asymmetric-distance top-k over PQ codes: per query, an (m ×
    n_codes) inner-product lookup table against the UNQUANTIZED query;
    per code, the score is m table gathers + a sum — no float vectors
    ever leave storage. Per-block partial top-k → tiny driver merge.
    → (query_id, vec_id, sim) with sim = approximate cosine."""
    import ray

    from .similarity import _unit

    q = _unit(np.atleast_2d(np.asarray(query_vecs, dtype=np.float64)))
    m_, k_, sub = codebooks.shape
    # lut[qi, j, code] = <q_sub, codeword>
    lut = np.einsum("qjs,jcs->qjc",
                    q.reshape(len(q), m_, sub),
                    codebooks.astype(np.float64))
    qref = ray.put(lut)

    def partial(b: pa.Table) -> pa.Table:
        tables = ray.get(qref)  # (nq, m, n_codes)
        ids = b["vec_id"].to_numpy(zero_copy_only=False)
        raw = b["code"].to_numpy(zero_copy_only=False)
        if not len(ids):
            return pa.Table.from_pydict({
                "query_id": pa.array([], pa.int64()),
                "vec_id": pa.array([], pa.int64()),
                "sim": pa.array([], pa.float64())})
        codes = np.frombuffer(b"".join(raw), dtype=np.uint8) \
            .reshape(len(ids), -1)
        rows = []
        for qi in range(tables.shape[0]):
            # gather per subspace: sum_j lut[qi, j, codes[:, j]]
            sims = tables[qi, np.arange(codes.shape[1])[None, :],
                          codes].sum(axis=1)
            rows.append(_topk_rows(ids, sims, k, qi))
        return pa.Table.from_pandas(pd.concat(rows), preserve_index=False)

    parts = codes_ds.map_batches(partial, batch_format="pyarrow",
                                 zero_copy_batch=True).to_pandas()
    if not len(parts):
        return pa.Table.from_pydict({"query_id": pa.array([], pa.int64()),
                                     "vec_id": pa.array([], pa.int64()),
                                     "sim": pa.array([], pa.float64())})
    out = (parts.sort_values(["query_id", "sim", "vec_id"],
                             ascending=[True, False, True])
                .groupby("query_id", as_index=False).head(k)
                .reset_index(drop=True))
    return pa.Table.from_pandas(out, preserve_index=False)


def sq8_fit(ds, *, vec_col: str = "embedding") -> np.ndarray:
    """Scalar-quantization bounds: per-dimension (min, max) over the
    UNIT-NORMALIZED vectors — one streamed pass of (2, d) per-block
    partials, driver keeps elementwise extremes. → (2, d) float64
    [mins; maxs]. The uniform-int8 companion of the PQ path: 4× smaller
    than float32 with near-exact recall at moderate d, no training."""
    from .similarity import _mat, _unit

    def part(b: pa.Table) -> pa.Table:
        e = _unit(_mat(b[vec_col]))
        return pa.Table.from_pydict({
            "lo": pa.array([e.min(axis=0).tobytes()], pa.binary()),
            "hi": pa.array([e.max(axis=0).tobytes()], pa.binary())})

    pdf = ds.map_batches(part, batch_format="pyarrow",
                         zero_copy_batch=True).to_pandas()
    lo = np.min([np.frombuffer(x, dtype=np.float64) for x in pdf["lo"]],
                axis=0)
    hi = np.max([np.frombuffer(x, dtype=np.float64) for x in pdf["hi"]],
                axis=0)
    return np.stack([lo, hi])


def sq8_encode(ds, bounds: np.ndarray, *, id_col: str = "vec_id",
               vec_col: str = "embedding"):
    """→ Dataset (vec_id, code: binary of d uint8 lattice points).
    Degenerate dimensions (max == min) encode as 0 and reconstruct to
    the shared value exactly."""
    import ray

    from .similarity import _mat, _unit

    lo, hi = bounds[0], bounds[1]
    span = np.where(hi > lo, hi - lo, 1.0)
    bref = ray.put((lo, span))

    def enc(b: pa.Table) -> pa.Table:
        lo_, span_ = ray.get(bref)
        e = _unit(_mat(b[vec_col]))
        q = np.clip(np.rint((e - lo_) / span_ * 255.0), 0, 255)
        codes = q.astype(np.uint8)
        return pa.Table.from_pydict({
            "vec_id": b[id_col],
            "code": pa.array([row.tobytes() for row in codes],
                             pa.binary())})

    return ds.map_batches(enc, batch_format="pyarrow",
                          zero_copy_batch=True)


def sq8_topk(codes_ds, bounds: np.ndarray, query_vecs: np.ndarray, *,
             k: int = 10) -> pa.Table:
    """Asymmetric top-k over SQ8 codes: blocks reconstruct
    v̂ = lo + code·span/255 and matmul against the UNQUANTIZED unit
    queries — one gemm per block, per-block partial top-k, tiny driver
    merge (same contract as ``pq_topk``). → (query_id, vec_id, sim)."""
    import ray

    from .similarity import _unit

    q = _unit(np.atleast_2d(np.asarray(query_vecs, dtype=np.float64)))
    lo, hi = bounds[0], bounds[1]
    span = np.where(hi > lo, hi - lo, 1.0)
    qref = ray.put((q, lo, span / 255.0))

    def partial(b: pa.Table) -> pa.Table:
        qm, lo_, step = ray.get(qref)
        ids = b["vec_id"].to_numpy(zero_copy_only=False)
        if not len(ids):
            return pa.Table.from_pydict({
                "query_id": pa.array([], pa.int64()),
                "vec_id": pa.array([], pa.int64()),
                "sim": pa.array([], pa.float64())})
        raw = b["code"].to_numpy(zero_copy_only=False)
        codes = np.frombuffer(b"".join(raw), dtype=np.uint8) \
            .reshape(len(ids), -1).astype(np.float64)
        recon = lo_[None, :] + codes * step[None, :]
        sims = recon @ qm.T                      # (n, nq)
        rows = [_topk_rows(ids, sims[:, qi], k, qi)
                for qi in range(qm.shape[0])]
        return pa.Table.from_pandas(pd.concat(rows), preserve_index=False)

    parts = codes_ds.map_batches(partial, batch_format="pyarrow",
                                 zero_copy_batch=True).to_pandas()
    if not len(parts):
        return pa.Table.from_pydict({"query_id": pa.array([], pa.int64()),
                                     "vec_id": pa.array([], pa.int64()),
                                     "sim": pa.array([], pa.float64())})
    out = (parts.sort_values(["query_id", "sim", "vec_id"],
                             ascending=[True, False, True])
                .groupby("query_id", as_index=False).head(k)
                .reset_index(drop=True))
    return pa.Table.from_pandas(out, preserve_index=False)
