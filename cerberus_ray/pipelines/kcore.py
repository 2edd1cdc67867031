"""Distributed k-core decomposition via iterative h-index propagation.

Core number of a node = the largest k such that the node survives in
the k-core (the maximal subgraph of minimum degree ≥ k) — the standard
graph-density screen for community cores / spam farms / influence
tiers. Public method: every node starts at its degree and repeatedly
updates to the H-INDEX of its neighbors' current estimates; the fixed
point is exactly the core number (Lü et al. 2016, "The H-index of a
network node"; the distributed formulation is Montresor, De Pellegrini
& Miorandi 2013, "Distributed k-core decomposition"). Updates are
monotone non-increasing from the degree, so convergence is guaranteed;
rounds needed in practice ≈ graph diameter.

Two wired modes, planner convention as elsewhere (triangles,
uniqueness):

- ``driver``: block-local canonical edge-dedup partials → driver numpy
  (distinct edges only, O(E) driver memory — the documented bound);
  per-round h-index is ONE lexsort + segmented reduceat over the whole
  adjacency, run to convergence.
- ``shuffle``: adjacency and estimates stay Datasets end-to-end; each
  round is two ``keyed_apply`` exchanges — (1) key by neighbor to
  attach its current estimate to every directed edge, (2) key by node
  to compute the h-index over whole buckets — with a convergence
  checksum and a hard ``max_rounds`` guard that RAISES when
  unconverged (never returns silently-partial labels).

Modes are agreement-tested (tests/test_kcore.py) against a pure-Python
peeling reference (Batagelj & Zaveršnik 2003 semantics).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..stages.keyed_window import keyed_apply
from .triangles import _canon_dedup_block

#: above this many distinct edges the auto planner switches to shuffle
DRIVER_EDGE_LIMIT = 5_000_000

__all__ = ["core_decomposition", "DRIVER_EDGE_LIMIT"]


def _h_index_runs(keys_sorted: np.ndarray, est_desc: np.ndarray):
    """Per-run h-index: rows sorted by key with estimates DESCENDING
    within each run → (run_keys, h) where h = max i such that at least
    i estimates are ≥ i. One pass, segmented reduceat."""
    starts = np.flatnonzero(
        np.r_[True, keys_sorted[1:] != keys_sorted[:-1]])
    counts = np.diff(np.r_[starts, len(keys_sorted)])
    pos = (np.arange(len(keys_sorted))
           - np.repeat(starts, counts) + 1)
    posok = np.where(est_desc >= pos, pos, 0)
    return keys_sorted[starts], np.maximum.reduceat(posok, starts)


def _driver_core(edges: np.ndarray) -> pd.DataFrame:
    """Exact core numbers from a distinct canonical edge array (E×2)."""
    if not len(edges):
        return pd.DataFrame({"node": pd.Series([], dtype=np.int64),
                             "core": pd.Series([], dtype=np.int64)})
    nodes, inv = np.unique(edges.ravel(), return_inverse=True)
    pairs = inv.reshape(-1, 2)
    srcs = np.concatenate([pairs[:, 0], pairs[:, 1]])
    dsts = np.concatenate([pairs[:, 1], pairs[:, 0]])
    est = np.bincount(srcs, minlength=len(nodes)).astype(np.int64)
    while True:
        ne = est[dsts]
        order = np.lexsort((-ne, srcs))
        ks, h = _h_index_runs(srcs[order], ne[order])
        new = est.copy()
        new[ks] = np.minimum(est[ks], h)
        if np.array_equal(new, est):
            break
        est = new
    return pd.DataFrame({"node": nodes.astype(np.int64), "core": est})


def core_decomposition(ds, src: str = "src", dst: str = "dst", *,
                       mode: str = "auto", max_rounds: int = 50,
                       n_buckets: int = 32) -> pd.DataFrame:
    """Core number per node of the undirected graph given as an edge
    Dataset (self-loops dropped, duplicate edges collapsed) → DataFrame
    ``(node, core)`` sorted by node. ``mode`` ∈ {auto, driver,
    shuffle}; shuffle keeps all row-proportional state in Datasets and
    raises RuntimeError if estimates haven't stabilized after
    ``max_rounds`` exchanges (they converge within the peeling depth in
    practice)."""
    # materialize ONCE: count() for the auto planner would execute the
    # dedup lineage and the consuming path would re-execute it — a
    # doubled scan of the largest input exactly where auto matters
    dd = ds.map_batches(lambda b: _canon_dedup_block(b, src, dst),
                        batch_format="pyarrow",
                        zero_copy_batch=True).materialize()
    n_edges = dd.count()
    if mode == "auto":
        mode = "driver" if n_edges <= DRIVER_EDGE_LIMIT else "shuffle"
    if n_edges == 0:
        # self-loop-only / empty input: both modes agree on the typed
        # empty frame (the shuffle loop's None == None sum comparison
        # used to crash astype on a schema-less frame)
        return pd.DataFrame({"node": pd.Series(dtype=np.int64),
                             "core": pd.Series(dtype=np.int64)})
    if mode == "driver":
        parts = dd.to_pandas()
        e = np.unique(parts.to_numpy(dtype=np.int64), axis=0)
        return _driver_core(e)
    if mode != "shuffle":
        raise ValueError(f"unknown mode {mode!r}")
    return _shuffle_core(dd, max_rounds=max_rounds, n_buckets=n_buckets)


def _shuffle_core(dd, *, max_rounds: int, n_buckets: int) -> pd.DataFrame:
    """Keyed-exchange h-index rounds; adjacency/estimates stay Datasets
    (the beyond-driver-memory path). The per-round reduce to the
    convergence checksum is a sum aggregate, not a collect."""
    import ray.data as rd

    # globally-exact adjacency dedup: both directions of (u,v) hash to
    # the node's bucket, so bucket-local drop_duplicates is exact
    def both_dirs(b: pa.Table) -> pa.Table:
        u = b["u"].to_numpy(zero_copy_only=False)
        v = b["v"].to_numpy(zero_copy_only=False)
        return pa.Table.from_pydict({
            "node": pa.array(np.concatenate([u, v]), pa.int64()),
            "nbr": pa.array(np.concatenate([v, u]), pa.int64())})

    adj = keyed_apply(
        dd.map_batches(both_dirs, batch_format="pyarrow",
                       zero_copy_batch=True),
        "node", lambda g: g.drop_duplicates(["node", "nbr"]),
        n_buckets=n_buckets).materialize()

    def degrees(g: pd.DataFrame) -> pd.DataFrame:
        r = g.groupby("node", as_index=False, sort=False).size()
        return pd.DataFrame({"node": r["node"],
                             "est": r["size"].astype(np.int64)})

    est = keyed_apply(adj, "node", degrees,
                      n_buckets=n_buckets).materialize()

    def attach(g: pd.DataFrame) -> pd.DataFrame:
        # key column is "nbr"-side node: est rows carry its estimate,
        # edge rows carry the node that wants it
        s = g[g["tag"] == 1]
        e = g[g["tag"] == 0]
        if not len(e):
            return pd.DataFrame({"node": pd.Series([], dtype=np.int64),
                                 "nb_est": pd.Series([], dtype=np.int64),
                                 "tag": pd.Series([], dtype=np.int8)})
        lut = pd.Series(s["est"].to_numpy(np.int64),
                        index=s["k"].to_numpy(np.int64))
        return pd.DataFrame({
            "node": e["node"].astype(np.int64),
            "nb_est": lut.reindex(e["k"].to_numpy(np.int64))
                        .to_numpy(np.int64),
            "tag": np.zeros(len(e), dtype=np.int8)})

    def hindex(g: pd.DataFrame) -> pd.DataFrame:
        d = g.sort_values(["node", "nb_est"],
                          ascending=[True, False], kind="mergesort")
        nb = d[d["tag"] == 0]
        ks, h = (_h_index_runs(nb["node"].to_numpy(np.int64),
                               nb["nb_est"].to_numpy(np.int64))
                 if len(nb) else (np.empty(0, np.int64),
                                  np.empty(0, np.int64)))
        hs = pd.Series(h, index=ks)
        own = g[g["tag"] == 1]
        cur = own["nb_est"].to_numpy(np.int64)
        upd = np.minimum(cur, hs.reindex(own["node"].to_numpy(np.int64))
                         .fillna(0).to_numpy(np.int64))
        return pd.DataFrame({"node": own["node"].astype(np.int64),
                             "est": upd})

    def tag_edges(b: pa.Table) -> pa.Table:
        return pa.Table.from_pydict({
            "k": b["nbr"], "node": b["node"],
            "est": pa.array(np.zeros(b.num_rows, np.int64)),
            "tag": pa.array(np.zeros(b.num_rows, np.int8))})

    def tag_est(b: pa.Table) -> pa.Table:
        return pa.Table.from_pydict({
            "k": b["node"], "node": b["node"], "est": b["est"],
            "tag": pa.array(np.ones(b.num_rows, np.int8))})

    def tag_self(b: pa.Table) -> pa.Table:
        return pa.Table.from_pydict({
            "node": b["node"], "nb_est": b["est"],
            "tag": pa.array(np.ones(b.num_rows, np.int8))})

    edges_tagged = adj.map_batches(tag_edges, batch_format="pyarrow",
                                   zero_copy_batch=True).materialize()
    prev_sum = None
    for _ in range(max_rounds):
        union1 = edges_tagged.union(
            est.map_batches(tag_est, batch_format="pyarrow",
                            zero_copy_batch=True))
        nbest = keyed_apply(union1, "k", attach, n_buckets=n_buckets)
        union2 = nbest.union(
            est.map_batches(tag_self, batch_format="pyarrow",
                            zero_copy_batch=True))
        est = (keyed_apply(union2, "node", hindex, n_buckets=n_buckets)
               .repartition(n_buckets).materialize())
        s = est.sum("est")
        if s == prev_sum:
            out = est.to_pandas()
            return (out.astype({"node": np.int64, "est": np.int64})
                    .rename(columns={"est": "core"})
                    .sort_values("node", ignore_index=True))
        prev_sum = s
    raise RuntimeError(
        f"core_decomposition(mode='shuffle') did not converge within "
        f"max_rounds={max_rounds}; raise max_rounds")
