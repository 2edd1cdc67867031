"""Dedup-quality evaluation harness — measure the near-dup detector
instead of trusting it: exact-Jaccard scoring of (a) every MinHash
candidate pair and (b) a seeded random-pair control group.

- precision: fraction of candidate pairs whose EXACT n-gram Jaccard
  clears the threshold (LSH candidates are estimates; this is the
  false-positive readout);
- random_dup_rate: fraction of uniformly-drawn non-candidate pairs
  that clear the threshold — the density of duplicates the detector
  did NOT surface, the (scaled) false-negative readout. At web scale
  a single random sample bounds the missed-dup mass: E[missed pairs]
  ≈ random_dup_rate × C(n,2) − |candidates|.

Texts for both groups ship candidate-only (the broadcast semi-join of
``dedup.verify_pairs_exact``); pair sampling is counter-based hashing
(pure function of seed). Tests: tests/test_dedup_eval.py.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray

from .dedup import minhash_near_dup_pairs, ngram_jaccard

__all__ = ["near_dup_eval"]


def _exact_jaccards(pairs: pd.DataFrame, ds, text_col: str,
                    key_col: str, w: int) -> np.ndarray:
    """Exact Jaccard per (a, b) row, candidate-only text fetch."""
    wanted = sorted(set(pairs["a"]) | set(pairs["b"]))
    ref = ray.put(np.array(wanted, dtype=object))

    def grab(batch: pa.Table) -> pa.Table:
        ids = ray.get(ref)
        keys = pc.cast(batch[key_col], pa.string()).to_numpy(
            zero_copy_only=False)
        mask = np.isin(keys.astype(str), ids.astype(str))
        return pa.Table.from_arrays(
            [pa.array(keys[mask], pa.string()),
             batch[text_col].filter(pa.array(mask))],
            names=["key", "text"])

    texts = ds.map_batches(grab, batch_format="pyarrow",
                           zero_copy_batch=True).to_pandas()
    lookup = dict(zip(texts.get("key", []), texts.get("text", [])))
    return np.array([ngram_jaccard(lookup.get(x, ""),
                                   lookup.get(y, ""), w=w)
                     for x, y in zip(pairs["a"], pairs["b"])])


def near_dup_eval(ds, *, text_col: str = "text",
                  key_col: str = "doc_id", w: int = 3,
                  threshold: float = 0.7, n_random: int = 500,
                  seed: int = 42, round_digits: int = 6,
                  **minhash_kwargs) -> pd.DataFrame:
    """→ one-row frame (n_docs, n_candidates, precision, n_random,
    random_dup_rate, threshold). ``minhash_kwargs`` pass through to
    ``minhash_near_dup_pairs`` (its estimate threshold defaults to the
    exact ``threshold`` here so the two gates align)."""
    from ..determinism import randint

    minhash_kwargs.setdefault("threshold", threshold)
    cand = minhash_near_dup_pairs(ds, text_col=text_col,
                                  key_col=key_col, w=w, seed=seed,
                                  **minhash_kwargs).to_pandas()
    cand_pairs = pd.DataFrame({"a": cand.get("doc_id_a", []),
                               "b": cand.get("doc_id_b", [])})
    if len(cand_pairs):
        jac_c = _exact_jaccards(cand_pairs, ds, text_col, key_col, w)
        precision = float((jac_c >= threshold).mean())
    else:
        precision = float("nan")

    # seeded random control pairs over the distinct key list (the key
    # list is one streamed distinct pass; at 10¹²-doc scale swap in a
    # seeded key SAMPLE first — documented seam)
    def keys_part(b: pa.Table) -> pa.Table:
        return pa.Table.from_arrays(
            [pc.cast(b[key_col], pa.string()).unique()], names=["k"])

    keys = np.sort(ds.map_batches(
        keys_part, batch_format="pyarrow",
        zero_copy_batch=True).to_pandas()["k"].unique())
    n_docs = len(keys)
    idx = np.arange(n_random, dtype=np.int64)
    ia = randint(idx, seed, 1, 0, n_docs)
    ib = randint(idx, seed, 2, 0, n_docs)
    ok = ia != ib
    cand_set = set(zip(cand_pairs["a"].astype(str),
                       cand_pairs["b"].astype(str)))
    ra = np.minimum(ia[ok], ib[ok])
    rb = np.maximum(ia[ok], ib[ok])
    rnd = pd.DataFrame({"a": keys[ra], "b": keys[rb]})
    rnd = rnd[[(x, y) not in cand_set
               for x, y in zip(rnd["a"], rnd["b"])]]
    if len(rnd):
        jac_r = _exact_jaccards(rnd, ds, text_col, key_col, w)
        rate = float((jac_r >= threshold).mean())
    else:
        rate = float("nan")
    return pd.DataFrame([{
        "n_docs": int(n_docs),
        "n_candidates": int(len(cand_pairs)),
        "precision": round(precision, round_digits),
        "n_random": int(len(rnd)),
        "random_dup_rate": round(rate, round_digits),
        "threshold": threshold}])
