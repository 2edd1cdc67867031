"""Semantic deduplication (SemDeDup-style, Abbas et al. 2023).

Embedding-space near-duplicate PRUNING: cluster the corpus with a
deterministic k-means coarse quantizer (the IVF machinery,
``similarity.train_ivf_centroids``), then within each cluster connect
vectors whose pairwise cosine ≥ ``threshold`` into duplicate groups and
KEEP, per group, the member LEAST similar to its cluster centroid
(the paper's keep-the-outlier rule — it preserves diversity), pruning
the rest.

Ray-Data-first shape:

1. centroid fit — driver-side mini k-means over a seeded
   ``random_sample`` (O(sample × k × iters), corpus-size-independent);
2. assign pass — one streamed ``map_batches`` computing (cluster,
   cent_cos) per vector with the centroid matrix broadcast via
   ``ray.put`` once;
3. one keyed exchange — ``groupby(cluster)`` so each semantic
   neighbourhood lands in one task; per-cluster pairwise verify is a
   vectorized matmul with a hot-cluster guard (recursive LSH
   sub-bucketing on fresh hyperplanes, same mitigation as
   ``similarity.embedding_near_dup_pairs``) so no task ever pays an
   unbounded O(n²);
4. duplicate groups = connected components of the ≥ threshold graph
   WITHIN a cluster (the paper's formulation; cross-cluster pairs are
   the method's documented approximation — raise ``n_clusters`` with
   corpus size, k ∝ n, to keep clusters bounded).

At 10^12 docs: the exchange ships (cluster, id, cos, float32 vec) rows
— one row per vector, hash-partitioned on cluster; the driver holds the
(k, d) centroid matrix and the pruned-id result (∝ semantic-dup rate),
never the corpus.

No reference analogue (the CRM has no vectors); the keep-one-per-group
semantics mirror the exact-dedup keep rule (reference slot dedupe,
cerberus/models/booking.py:50,57-64) lifted to embedding space.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from .similarity import _hyperplanes, _mat, _unit, lsh_signatures, \
    train_ivf_centroids

__all__ = ["semantic_dedup_pruned", "semantic_dedup_report"]


def _components(n: int, ia: np.ndarray, ib: np.ndarray) -> np.ndarray:
    """Connected components over n nodes from edge arrays → label per
    node (union-find with path halving; edge count ∝ dup rate)."""
    parent = np.arange(n)

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(ia.tolist(), ib.tolist()):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return np.array([find(i) for i in range(n)])


def _prune_group(ids: np.ndarray, cos: np.ndarray, e: np.ndarray,
                 threshold: float, max_cluster: int, seed: int,
                 depth: int) -> list:
    """→ list of pruned-id arrays for one (sub-)cluster.

    Over ``max_cluster`` members: recursively sub-bucket on fresh LSH
    planes instead of an O(n²) matmul — pairs split across sub-buckets
    may be missed (documented approximation, recall restored by raising
    n_clusters so real clusters stay under the cap)."""
    n = len(ids)
    if n < 2:
        return []
    if n > max_cluster and depth < 4:
        planes = _hyperplanes(e.shape[1], 10, seed + 7919 * (depth + 1))
        sub = lsh_signatures(e, planes)
        out = []
        for sv in np.unique(sub):
            m = sub == sv
            if m.sum() >= 2:
                out.extend(_prune_group(ids[m], cos[m], e[m], threshold,
                                        max_cluster, seed, depth + 1))
        return out
    if n > max_cluster:  # degenerate: identical signatures at max depth
        order = np.argsort(ids)
        ids, cos, e = ids[order], cos[order], e[order]
        return [p for i in range(0, n, max_cluster)
                for p in _prune_group(ids[i:i + max_cluster],
                                      cos[i:i + max_cluster],
                                      e[i:i + max_cluster],
                                      threshold, max_cluster, seed,
                                      depth + 1)]
    sims = e @ e.T
    iu = np.triu_indices(n, 1)
    m = sims[iu] >= threshold
    if not m.any():
        return []
    labels = _components(n, iu[0][m], iu[1][m])
    pruned = []
    for lab in np.unique(labels):
        members = np.flatnonzero(labels == lab)
        if len(members) < 2:
            continue
        # keep the member LEAST similar to the centroid (ties: lowest id)
        order = np.lexsort((ids[members], cos[members]))
        keep = members[order[0]]
        pruned.append(ids[members[members != keep]])
    return pruned


def semantic_dedup_pruned(ds, *, threshold: float = 0.95,
                          n_clusters: int = 16,
                          id_col: str = "vec_id",
                          vec_col: str = "embedding",
                          seed: int = 42,
                          max_cluster: int = 4096,
                          centroids: Optional[np.ndarray] = None
                          ) -> pa.Table:
    """→ one-column table ``pruned_id`` (sorted): ids removed by
    SemDeDup pruning at the given cosine threshold. The kept set is the
    complement; callers drop pruned ids with a broadcast semi-join
    (``pc.is_in``) exactly like the exact-dedup cut passes."""
    if centroids is None:
        centroids = train_ivf_centroids(ds, n_lists=n_clusters,
                                        vec_col=vec_col, seed=seed)
    cref = ray.put(np.asarray(centroids, dtype=np.float64))

    def assign(batch: pa.Table) -> pa.Table:
        c = ray.get(cref)
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        e = _unit(_mat(batch[vec_col]))
        sims = e @ c.T
        cl = np.argmax(sims, axis=1)
        return pa.Table.from_pydict({
            "cluster": pa.array(cl.astype(np.int64)),
            "id": pa.array(ids),
            "cent_cos": pa.array(np.round(sims[np.arange(len(ids)), cl], 6)),
            "vec": pa.array(list(e.astype(np.float32))),
        })

    assigned = ds.map_batches(assign, batch_format="pyarrow",
                              zero_copy_batch=True)

    def per_cluster(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame({"pruned_id": pd.Series(dtype="int64")})
        g = g.sort_values("id").drop_duplicates("id")
        ids = g["id"].to_numpy()
        cos = g["cent_cos"].to_numpy()
        e = np.stack(g["vec"].to_numpy()).astype(np.float64)
        pruned = _prune_group(ids, cos, e, threshold, max_cluster, seed, 0)
        if not pruned:
            return pd.DataFrame({"pruned_id": pd.Series(dtype="int64")})
        return pd.DataFrame({"pruned_id": np.concatenate(pruned)})

    out = (assigned.groupby("cluster")
           .map_groups(per_cluster, batch_format="pandas").to_pandas())
    if len(out) == 0:
        return pa.Table.from_pydict({"pruned_id": pa.array([], pa.int64())})
    vals = np.unique(out["pruned_id"].to_numpy().astype(np.int64))
    return pa.Table.from_pydict({"pruned_id": pa.array(vals, pa.int64())})


def semantic_dedup_report(ds, *, threshold: float = 0.95,
                          n_clusters: int = 16, id_col: str = "vec_id",
                          vec_col: str = "embedding",
                          seed: int = 42) -> pa.Table:
    """One-row funnel report: input size, pruned count, kept count."""
    n = int(ds.count())
    pruned = semantic_dedup_pruned(ds, threshold=threshold,
                                   n_clusters=n_clusters, id_col=id_col,
                                   vec_col=vec_col, seed=seed)
    k = int(pruned.num_rows)
    return pa.Table.from_pydict({
        "n_input": pa.array([n], pa.int64()),
        "n_pruned": pa.array([k], pa.int64()),
        "n_kept": pa.array([n - k], pa.int64()),
        "threshold": pa.array([threshold], pa.float64())})
