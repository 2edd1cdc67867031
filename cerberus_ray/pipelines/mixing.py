"""Data mixing + document chunking — the last-mile shaping ops of a
training-corpus pipeline.

- ``sample_by_source``: static domain mixing (the public DoReMi /
  The-Pile recipe shape): each source keeps a caller-given fraction of
  its documents. Selection is a pure function of (seed, doc_id) via the
  engine's counter-based hashing — deterministic under retries, block
  splits and cluster size, with no RNG state to coordinate; expected
  proportions hold per block, so the op is one stateless streamed filter
  (no shuffle, no driver state).

- ``chunk_documents``: split each document into ≤ max_tokens whitespace-
  token windows with ``overlap`` tokens of context carry-over (the
  context-window packing step before tokenizer/loader hand-off). One
  flat-map-shaped ``map_batches`` pass; chunk ids are (doc_id, chunk_idx)
  so downstream stays resumable/joinable. Token reconstruction is exact:
  concatenating each chunk's non-overlap tail reproduces the document's
  token stream (property-tested).
"""

from __future__ import annotations

from typing import Dict, List

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..determinism import hash_strings


def sample_by_source(ds, weights: Dict[str, float], *,
                     source_col: str = "source", key_col: str = "doc_id",
                     seed: int = 42, default_weight: float = 1.0):
    """Keep each row with probability ``weights[source]`` (deterministic
    in (seed, key)); sources absent from the map use default_weight."""
    for s, w in weights.items():
        if not 0.0 <= w <= 1.0:
            raise ValueError(f"weight for {s!r} must be in [0,1], got {w}")

    def keep(b: pa.Table) -> pa.Table:
        keys = pc.cast(b[key_col], pa.string()).to_numpy(zero_copy_only=False)
        u = (hash_strings(np.char.add(keys.astype(str), f"|mix{seed}"))
             .astype(np.float64) / 2.0 ** 64)
        src = b[source_col].to_numpy(zero_copy_only=False)
        thresh = np.array([weights.get(s, default_weight) for s in src],
                          dtype=np.float64)
        return b.filter(pa.array(u < thresh))

    return ds.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True)


def chunk_documents(ds, *, text_col: str = "text", key_col: str = "doc_id",
                    max_tokens: int = 512, overlap: int = 0):
    """→ Dataset (doc_id, chunk_idx, text, n_tokens); empty docs emit no
    chunks. ``overlap`` tokens repeat at the start of each later chunk."""
    if overlap >= max_tokens:
        raise ValueError("overlap must be smaller than max_tokens")
    step = max_tokens - overlap

    def chunk(b: pa.Table) -> pa.Table:
        keys = pc.cast(b[key_col], pa.string()).to_numpy(zero_copy_only=False)
        texts = b[text_col].to_numpy(zero_copy_only=False)
        out_key: List[str] = []
        out_idx: List[int] = []
        out_text: List[str] = []
        out_n: List[int] = []
        for k, t in zip(keys, texts):
            toks = (t or "").split()
            if not toks:
                continue
            i = 0
            ci = 0
            while True:
                window = toks[i:i + max_tokens]
                out_key.append(k)
                out_idx.append(ci)
                out_text.append(" ".join(window))
                out_n.append(len(window))
                if i + max_tokens >= len(toks):
                    break
                i += step
                ci += 1
        return pa.Table.from_pydict({
            "doc_id": pa.array(out_key, pa.string()),
            "chunk_idx": pa.array(out_idx, pa.int64()),
            "text": pa.array(out_text, pa.string()),
            "n_tokens": pa.array(out_n, pa.int64())})

    return ds.map_batches(chunk, batch_format="pyarrow", zero_copy_batch=True)
