"""Distributed triangle counting via degree-ordered wedge checking.

The classic scalable plan (node-iterator++ / Schank 2007; the
MapReduce form is Suri & Vassilvitskii 2011, "Counting Triangles and
the Curse of the Last Reducer" — public method): orient every distinct
undirected edge from its lower-(degree, id) endpoint to the higher one;
each triangle then has EXACTLY ONE node with two out-edges inside it,
so triangles = wedges (out-neighbor pairs) that close into an edge.
Degree orientation bounds every node's out-degree by O(√m), which is
what kills the hub blow-up a naive id-orientation has at web scale.

Two wired modes, planner convention as elsewhere (uniqueness,
duplicate_key_counts):

- ``driver``: block-local canonical dedup partials → driver numpy
  (distinct edges only — O(E) driver memory, the documented bound);
  degrees, orientation, per-size triu wedge expansion and the closing-
  edge membership test all vectorized. Right below the threshold.
- ``shuffle``: everything keyed — ``keyed_apply`` dedup (all copies of
  (u,v) hash to u's bucket, so bucket-local dedup is globally exact),
  keyed degree sum, two hash joins to attach endpoint degrees, bucketed
  wedge expansion, and a composite-key ``Dataset.join`` of wedges
  against the edge set. No O(E) driver structure.

Modes are agreement-tested (tests/test_triangles.py) and both match the
DuckDB three-way self-join oracle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

#: above this many distinct edges the auto planner switches to shuffle
DRIVER_EDGE_LIMIT = 5_000_000


def _canon_dedup_block(b: pa.Table, src: str, dst: str) -> pa.Table:
    # drop null endpoints FIRST: a null int64 reaches numpy as NaN and
    # astype would mint the phantom node INT64_MIN connected to every
    # null-FK row (pagerank's dropna convention)
    t = b.select([src, dst]).drop_null()
    a = t[src].to_numpy(zero_copy_only=False).astype(np.int64)
    c = t[dst].to_numpy(zero_copy_only=False).astype(np.int64)
    keep = a != c                      # self-loops close no triangle
    u = np.minimum(a[keep], c[keep])
    v = np.maximum(a[keep], c[keep])
    uv = np.unique(np.stack([u, v], axis=1), axis=0)
    return pa.Table.from_pydict({"u": pa.array(uv[:, 0], pa.int64()),
                                 "v": pa.array(uv[:, 1], pa.int64())})


def _wedges_of_runs(a: np.ndarray, b: np.ndarray):
    """Rows sorted by (a, b): all out-neighbor pairs per run of ``a``,
    expanded per distinct run SIZE with triu indices (the vectorized
    bucket-pair pattern shared with the dedup kernels). b ascending
    within a run ⇒ emitted pairs are already canonical (p < q)."""
    if not len(a):
        return np.empty(0, np.int64), np.empty(0, np.int64)
    starts = np.flatnonzero(np.r_[True, a[1:] != a[:-1]])
    counts = np.diff(np.r_[starts, len(a)])
    ps, qs = [], []
    for s in np.unique(counts):
        if s < 2:
            continue
        idx = starts[counts == s]
        i, j = np.triu_indices(s, k=1)
        block = b[idx[:, None] + np.arange(s)[None, :]]
        ps.append(block[:, i].ravel())
        qs.append(block[:, j].ravel())
    if not ps:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    return np.concatenate(ps), np.concatenate(qs)


def _orient(u, v, deg_u, deg_v):
    """source = lower (degree, id) endpoint (total order, so exactly one
    orientation per edge)."""
    u_first = (deg_u < deg_v) | ((deg_u == deg_v) & (u < v))
    a = np.where(u_first, u, v)
    b = np.where(u_first, v, u)
    return a, b


def _count_driver(edges_ds, src, dst) -> dict:
    parts = (edges_ds.map_batches(
        lambda b: _canon_dedup_block(b, src, dst),
        batch_format="pyarrow", zero_copy_batch=True).to_pandas())
    if not len(parts):
        return {"n_nodes": 0, "n_edges": 0, "n_triangles": 0}
    uv = np.unique(parts[["u", "v"]].to_numpy(), axis=0)
    u, v = uv[:, 0], uv[:, 1]
    nodes, inv = np.unique(uv.ravel(), return_inverse=True)
    deg = np.bincount(inv, minlength=len(nodes))
    du, dv = deg[inv[0::2]], deg[inv[1::2]]
    a, b = _orient(u, v, du, dv)
    order = np.lexsort((b, a))
    p, q = _wedges_of_runs(a[order], b[order])
    # closing-edge membership over COMPACT RANKS: packing raw int64
    # ids into 32-bit halves collided for ids >= 2^32 (and wrapped
    # negatives), producing wrong counts; node ranks always fit 32
    # bits in driver mode and keep the packed keys sorted
    ru = np.searchsorted(nodes, u).astype(np.uint64)
    rv = np.searchsorted(nodes, v).astype(np.uint64)
    rp = np.searchsorted(nodes, p).astype(np.uint64)
    rq = np.searchsorted(nodes, q).astype(np.uint64)
    key_e = ru << np.uint64(32) | rv
    key_w = rp << np.uint64(32) | rq
    pos = np.searchsorted(key_e, key_w)
    pos = np.clip(pos, 0, max(len(key_e) - 1, 0))
    n_tri = int((key_e[pos] == key_w).sum()) if len(key_w) else 0
    return {"n_nodes": int(len(nodes)), "n_edges": int(len(uv)),
            "n_triangles": n_tri}


def _count_shuffle(edges_ds, src, dst, n_buckets, num_partitions) -> dict:
    from ..stages.keyed_window import keyed_apply

    canon = edges_ds.map_batches(
        lambda b: _canon_dedup_block(b, src, dst),
        batch_format="pyarrow", zero_copy_batch=True)
    # global distinct: every copy of (u,v) hashes to u's bucket
    edges = keyed_apply(canon, "u",
                        lambda g: g.drop_duplicates(["u", "v"]),
                        n_buckets=n_buckets).materialize()
    n_edges = edges.count()
    if not n_edges:
        return {"n_nodes": 0, "n_edges": 0, "n_triangles": 0}

    def endpoint_partials(b: pa.Table) -> pa.Table:
        n = np.concatenate([b["u"].to_numpy(zero_copy_only=False),
                            b["v"].to_numpy(zero_copy_only=False)])
        nodes, cnt = np.unique(n, return_counts=True)
        return pa.Table.from_pydict({
            "node": pa.array(nodes, pa.int64()),
            "d": pa.array(cnt.astype(np.int64), pa.int64())})

    deg = keyed_apply(
        edges.map_batches(endpoint_partials, batch_format="pyarrow",
                          zero_copy_batch=True),
        "node",
        lambda g: g.groupby("node", as_index=False)["d"].sum(),
        n_buckets=n_buckets).materialize()
    n_nodes = deg.count()

    with_du = edges.join(deg, join_type="inner",
                         num_partitions=num_partitions,
                         on=("u",), right_on=("node",))
    # Ray's join coalesces the right key into the left one, so the
    # joined block is (u, v, d) — only the degree column needs renaming
    with_du = with_du.map_batches(
        lambda b: b.rename_columns(["u", "v", "deg_u"]),
        batch_format="pyarrow")
    with_dv = with_du.join(deg, join_type="inner",
                           num_partitions=num_partitions,
                           on=("v",), right_on=("node",))
    with_dv = with_dv.map_batches(
        lambda b: b.rename_columns(["u", "v", "deg_u", "deg_v"]),
        batch_format="pyarrow")

    def orient_block(b: pa.Table) -> pa.Table:
        u = b["u"].to_numpy(zero_copy_only=False)
        v = b["v"].to_numpy(zero_copy_only=False)
        a, c = _orient(u, v,
                       b["deg_u"].to_numpy(zero_copy_only=False),
                       b["deg_v"].to_numpy(zero_copy_only=False))
        return pa.Table.from_pydict({"a": pa.array(a, pa.int64()),
                                     "b": pa.array(c, pa.int64())})

    oriented = with_dv.map_batches(orient_block, batch_format="pyarrow")

    def wedge_kernel(g: pd.DataFrame) -> pd.DataFrame:
        d = g.sort_values(["a", "b"])
        p, q = _wedges_of_runs(d["a"].to_numpy(), d["b"].to_numpy())
        return pd.DataFrame({"p": p, "q": q})

    wedges = keyed_apply(oriented, "a", wedge_kernel, n_buckets=n_buckets)
    closed = wedges.join(edges, join_type="inner",
                         num_partitions=num_partitions,
                         on=("p", "q"), right_on=("u", "v"))
    return {"n_nodes": int(n_nodes), "n_edges": int(n_edges),
            "n_triangles": int(closed.count())}


def triangle_count(edges_ds, *, src: str = "src", dst: str = "dst",
                   mode: str = "auto", n_buckets: int = 32,
                   num_partitions: int = 8) -> dict:
    """→ ``{"n_nodes", "n_edges", "n_triangles"}`` over the undirected
    simple graph induced by the edge list (self-loops dropped, parallel
    edges collapsed). ``mode`` ∈ {auto, driver, shuffle}."""
    if mode == "auto":
        # cheap upper bound on distinct edges: raw row count
        mode = ("driver" if edges_ds.count() <= DRIVER_EDGE_LIMIT
                else "shuffle")
    if mode == "driver":
        return _count_driver(edges_ds, src, dst)
    if mode == "shuffle":
        return _count_shuffle(edges_ds, src, dst, n_buckets,
                              num_partitions)
    raise ValueError(f"unknown mode {mode!r}")
