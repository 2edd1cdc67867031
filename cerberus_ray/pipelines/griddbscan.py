"""Grid-density clustering (DBSCAN on the ε-grid).

Density clustering for low-dimensional numeric spaces (2-6 dims:
geo-ish coordinates, PCA projections, score pairs) without the
all-pairs ε-neighborhood joins exact DBSCAN needs. The public
grid-based approximation (the GriDBSCAN / grid-histogram family):

1. **Cell census** — one streamed pass mapping each row to its ε-grid
   cell (⌊x/ε⌋ per dim) and emitting per-block (cell → count)
   partials; the driver merge is bounded by OCCUPIED cells (≪ rows for
   anything density-clusterable — the documented planner assumption).
2. **Core cells** — count ≥ min_pts. Adjacent (Chebyshev-1) core
   cells union into clusters via driver union-find over the bounded
   core-cell set (3^d neighbor probes against a hash set).
3. **Labeling pass** — the cell→cluster map broadcasts once; rows in
   core cells take their cluster, rows in non-core cells adjacent to
   a core cell join it as border points (smallest cluster id —
   deterministic), everything else is noise (−1).

Semantics vs exact DBSCAN (documented approximation): ε-cell width
guarantees points within ε never sit more than one cell apart, so no
true cluster is split below cell granularity, but cells merge clusters
whose gap < ~2ε√d and min_pts applies per CELL, not per ε-ball.
Cluster ids are renumbered by (size desc, min-cell) — deterministic
and layout-invariant.
"""

from __future__ import annotations

from itertools import product
from typing import List, Sequence, Tuple

import numpy as np
import pandas as pd
import pyarrow as pa

import ray

__all__ = ["grid_density_clusters"]


def _cells(b: pa.Table, cols: List[str], eps: float) -> np.ndarray:
    X = np.column_stack([
        b[c].to_numpy(zero_copy_only=False).astype(np.float64)
        for c in cols])
    # non-FINITE rows (NaN or ±Inf) are noise: an Inf coordinate would
    # floor/astype into the INT64_MIN cell and, with enough such rows,
    # promote that garbage cell to a fake core cluster
    return (np.floor(np.nan_to_num(X, nan=0.0, posinf=0.0,
                                   neginf=0.0) / eps).astype(np.int64),
            ~np.isfinite(X).all(axis=1))


def _find(parent, i):
    while parent[i] != i:
        parent[i] = parent[parent[i]]
        i = parent[i]
    return i


def grid_density_clusters(ds, cols: Sequence[str], *, eps: float,
                          min_pts: int = 5,
                          max_cells: int = 2_000_000):
    """→ (labeled Dataset with ``cluster`` int64 (−1 = noise), summary
    DataFrame (cluster, n_rows, n_cells) sorted by cluster)."""
    cols = list(cols)
    if eps <= 0 or min_pts < 1:
        raise ValueError("eps > 0 and min_pts >= 1 required")
    d = len(cols)
    if d == 0:
        raise ValueError("cols must be non-empty")

    def census(b: pa.Table) -> pa.Table:
        cells, bad = _cells(b, cols, eps)
        cells = cells[~bad]
        if not len(cells):
            return pa.Table.from_pydict(
                {"cell": pa.array([], pa.string()),
                 "n": pa.array([], pa.int64())})
        df = pd.DataFrame({"cell": ["\x1f".join(map(str, r))
                                    for r in cells]})
        g = df.groupby("cell", as_index=False).size()
        return pa.Table.from_pydict({
            "cell": pa.array(g["cell"]),
            "n": pa.array(g["size"].to_numpy(np.int64))})

    cen = (ds.map_batches(census, batch_format="pyarrow",
                          zero_copy_batch=True)
           .to_pandas().groupby("cell", as_index=False).sum())
    if len(cen) > max_cells:
        raise ValueError(f"{len(cen)} occupied cells exceed max_cells="
                         f"{max_cells}; widen eps or reduce dims")
    counts = dict(zip(cen["cell"], cen["n"]))
    core = sorted(c for c, n in counts.items() if n >= min_pts)
    core_idx = {c: i for i, c in enumerate(core)}
    parent = list(range(len(core)))
    offsets = [o for o in product((-1, 0, 1), repeat=d)
               if any(o)]
    for c in core:
        coords = list(map(int, c.split("\x1f")))
        i = core_idx[c]
        for off in offsets:
            nb = "\x1f".join(str(x + dx) for x, dx in zip(coords, off))
            j = core_idx.get(nb)
            if j is not None:
                ri, rj = _find(parent, i), _find(parent, j)
                if ri != rj:
                    parent[max(ri, rj)] = min(ri, rj)
    root = [_find(parent, i) for i in range(len(core))]
    # renumber by (size desc, smallest member cell) — deterministic
    sizes: dict = {}
    for c, r in zip(core, root):
        sizes.setdefault(r, [0, c])
        sizes[r][0] += counts[c]
        sizes[r][1] = min(sizes[r][1], c)
    order = sorted(sizes, key=lambda r: (-sizes[r][0], sizes[r][1]))
    renum = {r: i for i, r in enumerate(order)}
    cell_cluster = {c: renum[r] for c, r in zip(core, root)}
    # border map: non-core occupied cell adjacent to core → min cluster
    border = {}
    for c in cen["cell"]:
        if c in cell_cluster:
            continue
        coords = list(map(int, c.split("\x1f")))
        cands = []
        for off in offsets:
            nb = "\x1f".join(str(x + dx) for x, dx in zip(coords, off))
            if nb in cell_cluster:
                cands.append(cell_cluster[nb])
        if cands:
            border[c] = min(cands)
    full_map = cell_cluster | border
    mref = ray.put(full_map)

    def label(b: pa.Table, _mref=mref) -> pa.Table:
        mp = ray.get(_mref)
        cells, bad = _cells(b, cols, eps)
        lab = np.full(len(bad), -1, dtype=np.int64)
        keys = ["\x1f".join(map(str, r)) for r in cells]
        for i, (k, isbad) in enumerate(zip(keys, bad)):
            if not isbad:
                lab[i] = mp.get(k, -1)
        return b.append_column("cluster", pa.array(lab))

    labeled = ds.map_batches(label, batch_format="pyarrow",
                             zero_copy_batch=True)
    # one pass over each dict (the per-cluster rescans were
    # O(#clusters × #occupied_cells) driver Python)
    n_cells_per: dict = {}
    n_rows_per: dict = {}
    for c, cl in cell_cluster.items():
        n_cells_per[cl] = n_cells_per.get(cl, 0) + 1
        n_rows_per[cl] = n_rows_per.get(cl, 0) + counts[c]
    for c, cl in border.items():
        n_rows_per[cl] = n_rows_per.get(cl, 0) + counts[c]
    rows = [(cl, n_rows_per.get(cl, 0), n_cells_per.get(cl, 0))
            for cl in sorted(renum.values())]
    summary = pd.DataFrame(rows, columns=["cluster", "n_rows",
                                          "n_cells"])
    return labeled, summary
