"""Per-file Bloom key index — file pruning for point lookups.

Parquet footer min/max statistics prune RANGE scans (see
`stages/layout.py`); they are useless for equality probes on a column
the layout isn't sorted by (every file's [min, max] covers a popular key
space). The standard fix is a per-file Bloom filter on the probe column
(Hudi's bloom index, Iceberg/Parquet bloom pages): a point lookup tests
each file's filter and reads only the files that MIGHT contain the key —
no false negatives by construction, false positives bounded by ``fpp``.

Shape:
- sizing is FOOTER-ONLY: each file's filter is sized from its footer row
  count at the target false-positive rate before any data is read.
- the hash pass is one streamed ``map_batches`` over the probe column
  with ``include_paths=True``: each batch ORs its keys into a
  partial filter for its file and emits (path, bloom bytes); partials
  merge by bitwise OR on the driver — commutative/associative, so the
  index is independent of block layout and arrival order.
- driver state is the index itself: #files × m-bit filters. That is the
  DESIGNED product (an index is supposed to be small and resident); it
  persists as a parquet sidecar table and loads once per probe session.
- a lookup unions candidate files over the probe keys and issues ONE
  pruned ``read_parquet`` on that file list with an ``isin`` pushdown.

Reuses `state/bloom.BloomFilter` (the ST5 referential pre-filter) as the
per-file sketch.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..state.bloom import BloomFilter

__all__ = ["FileBloomIndex"]


class FileBloomIndex:
    """Per-file Bloom membership index over one column of a parquet
    directory."""

    def __init__(self, col: str, fpp: float,
                 blooms: Dict[str, BloomFilter]):
        self.col = col
        self.fpp = fpp
        self.blooms = blooms

    # -- construction ---------------------------------------------------

    @classmethod
    def build(cls, path: str, col: str, *, fpp: float = 0.01
              ) -> "FileBloomIndex":
        import pyarrow.parquet as pq
        import ray.data as rd

        # footer-only sizing plan
        files = []
        for root, _, names in os.walk(path):
            for f in sorted(names):
                if f.endswith(".parquet"):
                    files.append(os.path.join(root, f))
        sizes = {f: pq.ParquetFile(f).metadata.num_rows for f in files}
        n_bits = {f: BloomFilter.size_for(max(r, 1), fpp)
                  for f, r in sizes.items()}

        def partial(b: pa.Table) -> pa.Table:
            paths = b["path"].to_numpy(zero_copy_only=False)
            out_p, out_b = [], []
            for p in np.unique(paths):
                bf = BloomFilter(n_bits=n_bits[p], k=5)
                bf.add(b.filter(pc.equal(b["path"], p))[col])
                out_p.append(p)
                out_b.append(bf.to_bytes())
            return pa.Table.from_pydict({
                "path": pa.array(out_p, pa.string()),
                "bloom": pa.array(out_b, pa.binary())})

        parts = rd.read_parquet(path, columns=[col],
                                include_paths=True).map_batches(
            partial, batch_format="pyarrow").to_pandas()
        blooms: Dict[str, BloomFilter] = {}
        for p, raw in zip(parts["path"], parts["bloom"]):
            bf = BloomFilter.from_bytes(raw)
            if p in blooms:
                blooms[p].merge(bf)
            else:
                blooms[p] = bf
        # files whose rows never reached the hash pass (empty files)
        for f in files:
            blooms.setdefault(f, BloomFilter(n_bits=n_bits[f], k=5))
        return cls(col, fpp, blooms)

    # -- persistence -----------------------------------------------------

    def save(self, index_path: str) -> None:
        """Persist as a parquet sidecar (path, bloom, col, fpp)."""
        import pyarrow.parquet as pq

        paths = sorted(self.blooms)
        t = pa.Table.from_pydict({
            "path": pa.array(paths, pa.string()),
            "bloom": pa.array([self.blooms[p].to_bytes() for p in paths],
                              pa.binary()),
            "col": pa.array([self.col] * len(paths), pa.string()),
            "fpp": pa.array([self.fpp] * len(paths), pa.float64())})
        pq.write_table(t, index_path)

    @classmethod
    def load(cls, index_path: str) -> "FileBloomIndex":
        import pyarrow.parquet as pq

        t = pq.read_table(index_path)
        if t.num_rows == 0:
            return cls("", 0.01, {})
        blooms = {p: BloomFilter.from_bytes(b) for p, b in
                  zip(t["path"].to_pylist(), t["bloom"].to_pylist())}
        return cls(t["col"][0].as_py(), t["fpp"][0].as_py(), blooms)

    # -- probing ----------------------------------------------------------

    def files_for(self, values) -> List[str]:
        """Files that might contain ANY of ``values`` (sorted; never a
        false negative)."""
        vals = np.atleast_1d(np.asarray(values))
        return sorted(p for p, bf in self.blooms.items()
                      if bool(bf.contains(vals).any()))

    def lookup(self, values, *, columns: Optional[Sequence[str]] = None):
        """Pruned point lookup → Dataset of rows where ``col`` ∈ values,
        reading only candidate files (one read, `isin` pushdown)."""
        import pyarrow.dataset as pads
        import ray.data as rd

        cand = self.files_for(values)
        vals = np.atleast_1d(np.asarray(values)).tolist()
        if not cand:
            sch = ([pa.field(c, pa.null()) for c in columns]
                   if columns else [])
            return rd.from_arrow(pa.Table.from_pydict(
                {f.name: pa.array([], f.type) for f in sch}))
        return rd.read_parquet(
            cand, columns=list(columns) if columns else None,
            filter=pads.field(self.col).isin(vals))
