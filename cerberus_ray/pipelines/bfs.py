"""Single-source hop distance (distributed BFS) over an edge Dataset —
completes the graph family (pagerank, connected components, k-core,
triangles) with reachability/distance. Reference analogue: the
reference's FK-graph traversals (restricted/cascade resolution,
/root/reference/cerberus/models/booking.py) generalized to arbitrary
edge tables.

Modes (the kcore/CC convention):
- ``driver``: distinct edges gathered once (O(E) driver memory — the
  documented band), BFS as numpy frontier sweeps over a sorted-CSR
  adjacency; zero exchanges beyond the distinct-edge partials.
- ``shuffle``: Bellman-Ford-style min-distance propagation — each
  round is one hash-partitioned ``groupby(node).min(dist)`` over
  (frontier messages ∪ current state), the 10⁹-edge path. Labels live
  in Datasets end-to-end; the driver sees a convergence checksum per
  round. Converges in O(eccentricity) rounds; RAISES on
  non-convergence rather than returning partial distances (the CC
  convention after ADVICE round 2).

Both modes drop self-loops/duplicate edges, treat edges as UNDIRECTED
(pass both directions yourself for digraphs via ``directed=True``),
and return only REACHED nodes — recursive-CTE oracle parity in
tests/test_bfs.py.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["hop_distance"]

#: above this many distinct edges the auto planner switches to shuffle
_DRIVER_MAX_EDGES = 20_000_000


def _distinct_edges(ds, src: str, dst: str, *,
                    directed: bool) -> "pd.DataFrame":
    def partial(b: pa.Table) -> pa.Table:
        # null endpoints = no edge (nullable-FK rows); NaN→astype
        # would otherwise mint the phantom node INT64_MIN bridging
        # every null-FK row
        t = b.select([src, dst]).drop_null()
        s = t[src].to_numpy(zero_copy_only=False).astype(np.int64)
        d = t[dst].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = s != d
        s, d = s[keep], d[keep]
        if not directed:
            lo, hi = np.minimum(s, d), np.maximum(s, d)
            s, d = lo, hi
        e = np.unique(np.stack([s, d], axis=1), axis=0)
        return pa.Table.from_pydict({
            "s": pa.array(e[:, 0], pa.int64()),
            "d": pa.array(e[:, 1], pa.int64())})

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True).to_pandas()
    return parts.drop_duplicates(ignore_index=True)


def hop_distance(ds, source: int, *, src: str = "src",
                 dst: str = "dst", directed: bool = False,
                 mode: str = "auto", max_rounds: int = 50,
                 n_partitions: int = 8) -> pd.DataFrame:
    """→ DataFrame (node, dist) for every node REACHABLE from
    ``source`` (including the source at dist 0), sorted by (dist,
    node). Integer node ids."""
    if mode == "auto":
        mode = ("driver" if ds.count() <= _DRIVER_MAX_EDGES
                else "shuffle")
    if mode == "driver":
        e = _distinct_edges(ds, src, dst, directed=directed)
        s = e["s"].to_numpy(np.int64)
        d = e["d"].to_numpy(np.int64)
        if not directed:
            s, d = np.concatenate([s, d]), np.concatenate([d, s])
        # compact node ids -> fully vectorized visited/dist arrays
        nodes, inv = np.unique(np.concatenate([s, d, [source]]),
                               return_inverse=True)
        si, di = inv[:len(s)], inv[len(s):-1]
        order = np.argsort(si, kind="mergesort")
        si, di = si[order], di[order]
        dist = np.full(len(nodes), -1, np.int64)
        start = int(inv[-1])
        dist[start] = 0
        frontier = np.array([start], np.int64)
        depth = 0
        while len(frontier) and depth < max_rounds:
            depth += 1
            lo = np.searchsorted(si, frontier, side="left")
            hi = np.searchsorted(si, frontier, side="right")
            spans = [di[a:b] for a, b in zip(lo, hi) if b > a]
            if not spans:
                break
            nbrs = np.unique(np.concatenate(spans))
            frontier = nbrs[dist[nbrs] < 0]
            dist[frontier] = depth
        if len(frontier) and depth >= max_rounds:
            # the shuffle path raises here too — the documented
            # contract is raise-on-non-convergence, never a silently
            # partial distance table
            raise RuntimeError(
                f"BFS frontier still active after max_rounds="
                f"{max_rounds}; raise max_rounds")
        reached = dist >= 0
        out = pd.DataFrame({"node": nodes[reached],
                            "dist": dist[reached]})
    elif mode == "shuffle":
        import ray.data as rd
        from ray.data.aggregate import Min

        def both(b: pa.Table) -> pa.Table:
            t = b.select([src, dst]).drop_null()   # null = no edge
            s = t[src].to_numpy(zero_copy_only=False).astype(np.int64)
            d = t[dst].to_numpy(zero_copy_only=False).astype(np.int64)
            keep = s != d
            s, d = s[keep], d[keep]
            if not directed:
                s, d = np.concatenate([s, d]), np.concatenate([d, s])
            return pa.Table.from_pydict({
                "s": pa.array(s, pa.int64()),
                "d": pa.array(d, pa.int64())})

        edges = ds.map_batches(both, batch_format="pyarrow",
                               zero_copy_batch=True).materialize()
        state = rd.from_arrow(pa.Table.from_pydict({
            "node": pa.array([int(source)], pa.int64()),
            "dist": pa.array([0], pa.int64())}))

        def checksum(st) -> int:
            def h(t: pa.Table) -> pa.Table:
                n = t["node"].to_numpy(zero_copy_only=False)
                v = t["dist"].to_numpy(zero_copy_only=False)
                x = (n * np.int64(1000003) + v).sum()
                return pa.Table.from_pydict(
                    {"s": [int(x) & 0x7FFFFFFFFFFFFFFF]})

            return int(st.map_batches(h, batch_format="pyarrow")
                       .sum("s") or 0)

        prev = checksum(state)
        converged = False
        for _ in range(max_rounds):
            msgs = (edges.join(state, join_type="inner",
                               num_partitions=n_partitions,
                               on=("s",), right_on=("node",))
                    .map_batches(lambda t: pa.Table.from_pydict({
                        "node": t["d"],
                        "dist": pc.add(t["dist"],
                                       pa.scalar(1, pa.int64()))}),
                        batch_format="pyarrow"))
            # materialize truncates lineage; repartition coalesces the
            # hash aggregate's schema-less empty blocks (CC convention)
            state = (state.union(msgs).groupby("node")
                     .aggregate(Min("dist", alias_name="dist"))
                     .repartition(n_partitions).materialize())
            cur = checksum(state)
            if cur == prev:
                converged = True
                break
            prev = cur
        if not converged:
            raise RuntimeError(
                f"hop_distance shuffle mode did not converge within "
                f"{max_rounds} rounds — graph eccentricity exceeds it")
        out = state.to_pandas()
    else:
        raise ValueError(f"unknown mode: {mode!r}")
    out = out.astype({"node": "int64", "dist": "int64"})
    return (out.sort_values(["dist", "node"])
            .reset_index(drop=True)[["node", "dist"]])
