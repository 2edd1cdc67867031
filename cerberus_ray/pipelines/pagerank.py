"""PageRank over an edge Dataset — the link-graph centrality signal
web-corpus pipelines use for page quality (the public
Brin-Page/CommonCrawl ranking recipe).

Execution shape per power-iteration round:

- ``driver`` mode (node set fits driver memory — the id map and two
  float vectors, ~24 B/node): node ids factorize once to contiguous
  ints; each round broadcasts the O(N) rank vector via ``ray.put`` and
  streams the (materialized-once) edge blocks through one vectorized
  ``np.bincount`` partial per block; the driver merges O(#blocks) dense
  partial vectors. Edges are read ONCE from storage; rounds touch only
  the cached integer edge blocks.
- ``shuffle`` mode (beyond-driver node sets): ranks live in a Dataset;
  each round runs two join-free ``keyed_apply`` hash exchanges
  (by-source to emit contributions, by-destination to sum them),
  materialized per round — iterative Dataset algorithms must cut
  lineage, see ``dedup.connected_components_shuffle``. High fixed cost
  per round that amortizes on genuinely big graphs.

Dangling nodes (no out-edges) redistribute their mass uniformly — the
standard stochastic-matrix completion, so ranks always sum to 1.
Convergence: L1 delta ≤ ``tol`` or ``max_rounds`` (raises on
non-convergence rather than returning silently-partial ranks, same
contract as connected_components_shuffle).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray

__all__ = ["pagerank"]


def _factorize(edges_ds, src: str, dst: str):
    """Sorted distinct node ids from both endpoints (string-cast)."""
    parts = edges_ds.map_batches(
        lambda b: pa.Table.from_pydict({"node": pa.concat_arrays(
            [pa.chunked_array([b[src]]).combine_chunks().unique().cast(
                pa.string()),
             pa.chunked_array([b[dst]]).combine_chunks().unique().cast(
                 pa.string())])}),
        batch_format="pyarrow", zero_copy_batch=True).to_pandas()
    return np.sort(parts["node"].unique())


def pagerank(edges_ds, *, src: str = "src", dst: str = "dst",
             damping: float = 0.85, tol: float = 1e-10,
             max_rounds: int = 200, mode: str = "driver") -> pd.DataFrame:
    # default max_rounds must cover the damping-rate-limited floor:
    # power iteration contracts by ~damping per round, so reaching
    # tol=1e-10 needs ≥ log(tol)/log(0.85) ≈ 142 rounds on slow-mixing
    # (hub/near-periodic) graphs — the old 100 raised spuriously
    """→ (node, rank) for every node appearing as an endpoint, ranks
    summing to 1. Parallel edges count once per occurrence (weighted by
    multiplicity), matching the adjacency-matrix formulation. Edges
    with a null endpoint are dropped (a null node is not addressable)."""
    edges_ds = edges_ds.map_batches(
        lambda df: df.dropna(subset=[src, dst]), batch_format="pandas")
    if mode == "driver":
        return _driver(edges_ds, src, dst, damping, tol, max_rounds)
    if mode == "shuffle":
        return _shuffle(edges_ds, src, dst, damping, tol, max_rounds)
    raise ValueError(f"unknown mode {mode!r}")


def _driver(edges_ds, src, dst, damping, tol, max_rounds) -> pd.DataFrame:
    ids = _factorize(edges_ds, src, dst)
    n = len(ids)
    if n == 0:
        return pd.DataFrame({"node": [], "rank": []})
    idx_ref = ray.put(pd.Index(ids))

    def encode(b: pa.Table) -> pa.Table:
        ix = ray.get(idx_ref)  # hash-based C lookup, no per-edge Python
        s = ix.get_indexer(b[src].cast(pa.string()).to_pandas())
        d = ix.get_indexer(b[dst].cast(pa.string()).to_pandas())
        return pa.Table.from_pydict({"s": pa.array(s.astype(np.int64)),
                                     "d": pa.array(d.astype(np.int64))})

    enc = edges_ds.map_batches(encode, batch_format="pyarrow",
                               zero_copy_batch=True).materialize()

    deg_parts = enc.map_batches(
        lambda b: pa.Table.from_pydict({"deg": pa.array(np.bincount(
            b["s"].to_numpy(zero_copy_only=False), minlength=n))}),
        batch_format="pyarrow", zero_copy_batch=True).to_pandas()
    outdeg = (deg_parts["deg"].to_numpy(dtype=np.float64)
              .reshape(-1, n).sum(axis=0))
    dangling = outdeg == 0

    rank = np.full(n, 1.0 / n)
    for _ in range(max_rounds):
        contrib = np.where(dangling, 0.0, rank / np.maximum(outdeg, 1.0))
        ref = ray.put(contrib)

        def push(b: pa.Table) -> pa.Table:
            c = ray.get(ref)
            s = b["s"].to_numpy(zero_copy_only=False)
            d = b["d"].to_numpy(zero_copy_only=False)
            return pa.Table.from_pydict({"acc": pa.array(
                np.bincount(d, weights=c[s], minlength=n))})

        parts = enc.map_batches(push, batch_format="pyarrow",
                                zero_copy_batch=True).to_pandas()
        inbound = parts["acc"].to_numpy(dtype=np.float64).reshape(-1, n).sum(
            axis=0)
        dangling_mass = float(rank[dangling].sum())
        new = ((1.0 - damping) / n
               + damping * (inbound + dangling_mass / n))
        delta = float(np.abs(new - rank).sum())
        rank = new
        if delta <= tol:
            return pd.DataFrame({"node": ids, "rank": rank})
    raise RuntimeError(
        f"pagerank did not converge to L1<={tol} within {max_rounds} "
        "rounds — raise max_rounds or loosen tol")


def _shuffle(edges_ds, src, dst, damping, tol, max_rounds) -> pd.DataFrame:
    """Beyond-driver-memory path: rank state lives in a Dataset and every
    round runs TWO keyed hash exchanges (``keyed_apply`` — the repo's
    join-free co-location primitive), no ``Dataset.join``:

    1. bucket by SOURCE node: attach rank/outdeg to each edge, emit
       (dst, contribution) rows;
    2. bucket by DESTINATION node together with the state rows: sum
       inbound mass per node and emit the new state.

    The driver holds only scalars (n, dangling mass, L1 delta, each a
    streamed O(#blocks) partial reduction). State materializes per round
    (iterative Dataset algorithms must cut lineage, see
    ``dedup.connected_components_shuffle``)."""
    from ..stages.keyed_window import auto_buckets, keyed_apply

    edges = edges_ds.map_batches(
        lambda b: pa.Table.from_pydict({
            "key": b[src].cast(pa.string()),
            "d": b[dst].cast(pa.string())}),
        batch_format="pyarrow", zero_copy_batch=True).materialize()
    # size the keyed exchanges ONCE from the (materialized, metadata-
    # backed) edge count — never auto-count inside the round loop
    nb = auto_buckets(edges.count())

    # state bootstrap: per-block (node, outdeg-partial) rows from both
    # endpoints, merged per node in one keyed exchange
    def node_partials(b: pa.Table) -> pa.Table:
        s = b["key"].to_pandas()
        d = b["d"].to_pandas()
        cnt = s.value_counts()
        nodes = pd.Index(cnt.index).union(pd.Index(d.unique()))
        return pa.Table.from_pydict({
            "key": pa.array(nodes.to_numpy(dtype=object), pa.string()),
            "deg": pa.array(cnt.reindex(nodes).fillna(0)
                            .to_numpy(dtype=np.int64))})

    parts = edges.map_batches(node_partials, batch_format="pyarrow",
                              zero_copy_batch=True)
    state = keyed_apply(
        parts, "key",
        lambda g: g.groupby("key", sort=False, as_index=False)["deg"]
        .sum().rename(columns={"key": "node", "deg": "outdeg"}),
        n_buckets=nb).materialize()
    n = state.count()
    if n == 0:
        return pd.DataFrame({"node": [], "rank": []})
    state = state.map_batches(
        lambda df: df.assign(rank=np.full(len(df), 1.0 / n)),
        batch_format="pandas").materialize()

    def scalar_sum(ds_, fn):
        ps = ds_.map_batches(
            lambda df: pd.DataFrame({"v": [float(fn(df))]}),
            batch_format="pandas").take_all()
        return float(sum(r["v"] for r in ps))

    for _ in range(max_rounds):
        dangling_mass = scalar_sum(
            state, lambda df: df.loc[df["outdeg"] == 0, "rank"].sum())
        base = (1.0 - damping) / n + damping * dangling_mass / n

        # exchange 1: by source — contribution per edge
        e_tag = edges.map_batches(
            lambda b: b.append_column("kind", pa.array(
                np.zeros(b.num_rows, dtype=np.int8))).append_column(
                "rank", pa.nulls(b.num_rows, pa.float64())).append_column(
                "outdeg", pa.nulls(b.num_rows, pa.int64())),
            batch_format="pyarrow", zero_copy_batch=True)
        r_tag = state.map_batches(
            lambda df: pd.DataFrame({
                "key": df["node"], "d": None,
                "kind": np.int8(1), "rank": df["rank"],
                "outdeg": df["outdeg"]}), batch_format="pandas")

        def push(g: pd.DataFrame) -> pd.DataFrame:
            r = g[g["kind"] == 1].set_index("key")
            e = g[g["kind"] == 0]
            contrib = r["rank"] / r["outdeg"].where(r["outdeg"] > 0)
            return pd.DataFrame({"key": e["d"].to_numpy(dtype=object),
                                 "c": e["key"].map(contrib).to_numpy()})

        contribs = keyed_apply(e_tag.union(r_tag), "key", push,
                               n_buckets=nb)

        # exchange 2: by destination — new rank per node
        c_tag = contribs.map_batches(
            lambda df: df.assign(kind=np.int8(0), rank=np.nan,
                                 outdeg=np.int64(0)),
            batch_format="pandas")
        r2_tag = state.map_batches(
            lambda df: pd.DataFrame({
                "key": df["node"], "c": np.nan, "kind": np.int8(1),
                "rank": df["rank"], "outdeg": df["outdeg"]}),
            batch_format="pandas")

        def pull(g: pd.DataFrame) -> pd.DataFrame:
            r = g[g["kind"] == 1]
            inb = (g.loc[g["kind"] == 0].groupby("key", sort=False)["c"]
                   .sum())
            got = r["key"].map(inb).fillna(0.0).to_numpy()
            new_rank = base + damping * got
            return pd.DataFrame({
                "node": r["key"].to_numpy(dtype=object),
                "outdeg": r["outdeg"].to_numpy(dtype=np.int64),
                "rank": new_rank,
                "rank_old": r["rank"].to_numpy()})

        # repartition: map_groups emits one block per bucket-run, so the
        # state's block count otherwise doubles per round (measured
        # 9→21→45→93… with per-round cost following it)
        new_state = (keyed_apply(c_tag.union(r2_tag), "key", pull,
                                 n_buckets=nb)
                     .repartition(min(nb, 64)).materialize())
        delta = scalar_sum(
            new_state, lambda df: (df["rank"] - df["rank_old"]).abs().sum())
        state = new_state.map_batches(
            lambda df: df.drop(columns=["rank_old"]),
            batch_format="pandas").materialize()
        if delta <= tol:
            out = state.to_pandas()[["node", "rank"]]
            return out.sort_values("node").reset_index(drop=True)
    raise RuntimeError(
        f"pagerank (shuffle) did not converge within {max_rounds} rounds")
