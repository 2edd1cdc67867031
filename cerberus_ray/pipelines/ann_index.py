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

Results are identical to ``ivf_topk`` run with the same parameters on
the same data (agreement-tested) — persistence changes WHEN work
happens, not what is computed.
"""

from __future__ import annotations

import json
import os
from typing import Tuple

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from .similarity import _mat, _unit, train_ivf_centroids

_MANIFEST = "ivf_manifest.json"


class IndexParamsMismatch(ValueError):
    pass


def build_ivf_index(ds, out_dir: str, *, n_lists: int = 16,
                    id_col: str = "vec_id", vec_col: str = "embedding",
                    seed: int = 42) -> str:
    """Fit the quantizer and persist (list_id-sorted rows + centroids +
    manifest) under ``out_dir``. Returns ``out_dir``."""
    import ray.data as rd

    cents = train_ivf_centroids(ds, n_lists=n_lists, vec_col=vec_col,
                                seed=seed)
    cref = ray.put(cents)

    def assign(b: pa.Table) -> pa.Table:
        cs = ray.get(cref)
        ids = b[id_col].to_numpy(zero_copy_only=False)
        e = _unit(_mat(b[vec_col]))
        lid = np.argmax(e @ cs.T, axis=1).astype(np.int32)
        return pa.Table.from_pydict({
            "list_id": pa.array(lid, pa.int32()),
            "vec_id": pa.array(ids, pa.int64()),
            "vec": pa.array([v.astype(np.float32) for v in e],
                            pa.list_(pa.float32()))})

    rows = ds.map_batches(assign, batch_format="pyarrow",
                          zero_copy_batch=True)
    os.makedirs(out_dir, exist_ok=True)
    import pyarrow.parquet as pq

    rows.sort("list_id").write_parquet(os.path.join(out_dir, "lists"))
    dim = cents.shape[1]
    pq.write_table(
        pa.table({"list_id": pa.array(range(n_lists), pa.int32()),
                  "centroid": pa.array([c.astype(np.float32) for c in cents],
                                       pa.list_(pa.float32()))}),
        os.path.join(out_dir, "centroids.parquet"))
    with open(os.path.join(out_dir, _MANIFEST), "w") as f:
        json.dump({"n_lists": n_lists, "seed": seed, "dim": int(dim),
                   "id_col": id_col, "vec_col": vec_col}, f)
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
    qref = ray.put((q, probe_lists, np.sort(wanted)))

    def partial(b: pa.Table) -> pa.Table:
        qm, probes, keep = ray.get(qref)
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
        e = _mat(sub["vec"])  # stored unit-normalized
        rows = []
        for qi in range(qm.shape[0]):
            mask = np.isin(assign, probes[qi])
            if not mask.any():
                continue
            sims = e[mask] @ qm[qi]
            sel = ids[mask]
            kk = min(k, len(sel))
            top = np.argpartition(-sims, kk - 1)[:kk]
            rows.append(pd.DataFrame({"query_id": qi, "vec_id": sel[top],
                                      "sim": np.round(sims[top], 4)}))
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
