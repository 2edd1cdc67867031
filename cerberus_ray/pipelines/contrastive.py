"""Contrastive training-pair construction over a labeled embedding
table — the two negative-sampling primitives a retrieval/embedding
training pipeline needs:

- ``hard_negatives``: per anchor, the top-k most-similar vectors with a
  DIFFERENT label (the "hard" negatives of triplet/InfoNCE training;
  Schroff et al. 2015 semi-hard mining is a client-side filter over
  this output). Same execution shape as ``similarity.brute_force_topk``
  — broadcast anchor matrix + labels, per-block masked-matmul partial
  top-k, tiny driver merge — so the corpus streams and nothing
  quadratic materializes.
- ``random_negatives``: per (anchor, slot), a seeded hash-picked id
  from the universe, rejecting the anchor's OWN positives via a
  broadcast positive-set lookup (exact below the broadcast band — the
  bloom swap beyond is the engine's usual referential pattern).
  Counter-based draws (determinism.py) make the sample reproducible
  across reruns and layouts.

Tests: tests/test_contrastive.py.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

__all__ = ["hard_negatives", "random_negatives"]


def hard_negatives(ds, anchor_ids: np.ndarray, *, k: int = 5,
                   id_col: str = "vec_id", vec_col: str = "embedding",
                   label_col: str = "label",
                   round_digits: int = 4) -> pa.Table:
    """→ (anchor_id, vec_id, sim, anchor_label, neg_label): per
    anchor, the k nearest vectors whose label differs. Anchors are
    resolved from the dataset by id (one candidate-only pass), then
    broadcast once."""
    from .similarity import _mat, _unit

    anchor_ids = np.asarray(anchor_ids, dtype=np.int64)
    aset = pa.array(np.sort(anchor_ids))

    def grab(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        return b.filter(pc.is_in(b[id_col], value_set=aset))

    adf = (ds.map_batches(grab, batch_format="pyarrow",
                          zero_copy_batch=True).to_pandas()
           .drop_duplicates(id_col).set_index(id_col)
           .reindex(anchor_ids))
    if adf[vec_col].isna().any():
        missing = anchor_ids[adf[vec_col].isna().to_numpy()]
        raise KeyError(f"anchor ids not found: {missing.tolist()}")
    q = _unit(np.stack(adf[vec_col].to_numpy()))
    alab = adf[label_col].to_numpy()
    qref = ray.put((q, alab, anchor_ids))

    def partial(b: pa.Table) -> pa.Table:
        qm, qlab, aids = ray.get(qref)
        ids = b[id_col].to_numpy(zero_copy_only=False)
        labs = b[label_col].to_numpy(zero_copy_only=False)
        if not len(ids):
            return pa.Table.from_pydict({
                "anchor_id": pa.array([], pa.int64()),
                "vec_id": pa.array([], pa.int64()),
                "sim": pa.array([], pa.float64()),
                "neg_label": pa.array([], pa.int64())})
        e = _unit(_mat(b[vec_col]))
        sims = e @ qm.T                       # (n, nq)
        # same-label candidates are not negatives — mask them out
        bad = labs[:, None] == qlab[None, :]
        sims = np.where(bad, -np.inf, sims)
        kk = min(k, len(ids))
        top = np.argpartition(-sims, kk - 1, axis=0)[:kk]
        rows = []
        for qi in range(qm.shape[0]):
            sel = top[:, qi]
            ok = np.isfinite(sims[sel, qi])
            rows.append(pd.DataFrame({
                "anchor_id": aids[qi],
                "vec_id": ids[sel][ok],
                "sim": np.round(sims[sel, qi][ok], round_digits),
                "neg_label": labs[sel][ok]}))
        return pa.Table.from_pandas(pd.concat(rows),
                                    preserve_index=False)

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True).to_pandas()
    if not len(parts):
        return pa.Table.from_pydict({
            "anchor_id": pa.array([], pa.int64()),
            "vec_id": pa.array([], pa.int64()),
            "sim": pa.array([], pa.float64()),
            "anchor_label": pa.array([], pa.int64()),
            "neg_label": pa.array([], pa.int64())})
    out = (parts.sort_values(["anchor_id", "sim", "vec_id"],
                             ascending=[True, False, True])
           .groupby("anchor_id", as_index=False).head(k)
           .reset_index(drop=True))
    lab_map = dict(zip(anchor_ids, alab))
    out["anchor_label"] = out["anchor_id"].map(lab_map)
    return pa.Table.from_pandas(
        out[["anchor_id", "vec_id", "sim", "anchor_label",
             "neg_label"]], preserve_index=False)


def random_negatives(pairs_ds, universe: np.ndarray, *, k: int = 4,
                     seed: int = 42, anchor_col: str = "anchor",
                     pos_col: str = "positive", max_tries: int = 16):
    """Seeded uniform negatives: for each (anchor, positive) ROW, ``k``
    ids drawn from ``universe`` that are not the anchor, not this
    positive, and not ANY of the anchor's positives. Draws are
    counter-based — hash of (seed, anchor, positive, slot, try) — so
    the sample is a pure function of the inputs (rerun/layout
    invariant, tested).

    Execution: one streamed ``map_batches`` pass. The global
    positive-pair set is collected once as sorted composite int64 keys
    and broadcast (`ray.put`) for a vectorized searchsorted membership
    test — the exact-below-band form of the engine's referential
    pattern (the beyond-band swap is a Bloom broadcast, the same seam
    `stages/referential.py` wires). Rejection runs as ``max_tries``
    vectorized rounds over the whole batch; a row that exhausts its
    tries keeps fewer than ``k`` negatives rather than looping.

    → Dataset (anchor, positive, negative, slot). Ids must fit in
    31 bits (composite packing) — raises otherwise."""
    from ..determinism import hash_idx

    universe = np.asarray(universe, dtype=np.int64)
    if universe.max(initial=0) >= (1 << 31):
        raise ValueError("ids must fit in 31 bits")

    def pos_partial(b: pa.Table) -> pa.Table:
        a = b[anchor_col].to_numpy(zero_copy_only=False)
        p = b[pos_col].to_numpy(zero_copy_only=False)
        comp = np.unique((a.astype(np.int64) << 31)
                         | p.astype(np.int64))
        return pa.Table.from_pydict({"c": pa.array(comp, pa.int64())})

    pos_keys = np.unique(pairs_ds.map_batches(
        pos_partial, batch_format="pyarrow",
        zero_copy_batch=True).to_pandas()["c"].to_numpy())
    ref = ray.put((universe, pos_keys))

    def draw(b: pa.Table) -> pa.Table:
        uni, pk = ray.get(ref)
        a = b[anchor_col].to_numpy(zero_copy_only=False).astype(
            np.int64)
        p = b[pos_col].to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(a)
        out_a, out_p, out_n, out_s = [], [], [], []
        for slot in range(k):
            cand = np.full(n, -1, dtype=np.int64)
            alive = np.ones(n, dtype=bool)
            for t in range(max_tries):
                if not alive.any():
                    break
                key = ((a << 13) ^ p) * np.int64(k * max_tries) \
                    + np.int64(slot * max_tries + t)
                h = hash_idx(key, seed)
                c = uni[(h % np.uint64(len(uni))).astype(np.int64)]
                comp = (a << 31) | c
                if len(pk):
                    pos = np.minimum(np.searchsorted(pk, comp),
                                     len(pk) - 1)
                    is_pos = pk[pos] == comp
                else:
                    is_pos = np.zeros(n, dtype=bool)
                bad = (c == a) | (c == p) | is_pos
                take = alive & ~bad
                cand[take] = c[take]
                alive &= bad
            ok = cand >= 0
            out_a.append(a[ok])
            out_p.append(p[ok])
            out_n.append(cand[ok])
            out_s.append(np.full(int(ok.sum()), slot, dtype=np.int64))
        return pa.Table.from_pydict({
            "anchor": pa.array(np.concatenate(out_a), pa.int64()),
            "positive": pa.array(np.concatenate(out_p), pa.int64()),
            "negative": pa.array(np.concatenate(out_n), pa.int64()),
            "slot": pa.array(np.concatenate(out_s), pa.int64())})

    return pairs_ds.map_batches(draw, batch_format="pyarrow",
                                zero_copy_batch=True)
