"""Fuzzy string join: all (left, right) pairs within Levenshtein
distance ``k`` — the record-linkage / title-matching primitive.

Candidate generation is FastSS deletion neighborhoods (Bocek et al.
2007, public): every string expands to its variants with ≤k characters
deleted; two strings within edit distance k ALWAYS share a variant, so
bucketing by variant hash has exact recall — no all-pairs, no
length-band heuristics. Expansion is O(len^k) variants per string
(k=1 → len+1, k=2 → O(len²)/2), which bounds sensible use to short
strings (names, titles, codes) and k ≤ 2 — documented contract.

Execution shape: both sides stream a variant-expansion pass (a Python
loop, but over the block's DISTINCT values × O(len^k) variants — the
vocabulary axis, not the corpus axis), then ONE ``keyed_apply`` hash
exchange on the variant co-locates candidates; inside each bucket the
distinct cross-side pairs are verified with a BATCH Levenshtein kernel —
the classic DP run row-by-row over character positions but vectorized
ACROSS the pair axis (O(maxlen²) numpy steps per bucket, regardless of
pair count). Verified pairs dedupe in the final pass (a pair can share
several variants).
"""

from __future__ import annotations

from itertools import combinations
from typing import List

import numpy as np
import pandas as pd
import pyarrow as pa

__all__ = ["fuzzy_join", "levenshtein_batch"]


def levenshtein_batch(a: np.ndarray, b: np.ndarray,
                      max_len: int = 256) -> np.ndarray:
    """Exact Levenshtein distance for each (a[i], b[i]) pair — DP rows
    iterate over character positions, every step vectorized across the
    whole pair batch. Strings longer than ``max_len`` raise (the DP cost
    is O(max_len²) per batch)."""
    n = len(a)
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    la = np.fromiter((len(x) for x in a), dtype=np.int64, count=n)
    lb = np.fromiter((len(x) for x in b), dtype=np.int64, count=n)
    L = int(max(la.max(initial=0), lb.max(initial=0)))
    if L > max_len:
        raise ValueError(f"string length {L} exceeds max_len={max_len}")
    # pad to (n, L) uint32 codepoint matrices
    A = np.zeros((n, L), dtype=np.uint32)
    B = np.zeros((n, L), dtype=np.uint32)
    for i in range(n):  # one pass to build the matrices; DP below is hot
        A[i, :la[i]] = np.frombuffer(a[i].encode("utf-32-le"),
                                     dtype=np.uint32)
        B[i, :lb[i]] = np.frombuffer(b[i].encode("utf-32-le"),
                                     dtype=np.uint32)
    prev = np.broadcast_to(np.arange(L + 1, dtype=np.int64),
                           (n, L + 1)).copy()
    # cells beyond each b's length must not win the final min: mask later
    for i in range(1, L + 1):
        cur = np.empty((n, L + 1), dtype=np.int64)
        cur[:, 0] = i
        sub = prev[:, :-1] + (A[:, i - 1][:, None] != B).astype(np.int64)
        np.minimum(sub, prev[:, 1:] + 1, out=sub)
        # insertion needs a left-to-right scan: do it with a serial
        # column loop (L iterations, vectorized over pairs)
        for j in range(1, L + 1):
            cur[:, j] = np.minimum(sub[:, j - 1], cur[:, j - 1] + 1)
        # rows where a is shorter than i keep their previous values
        done = la < i
        if done.any():
            cur[done] = prev[done]
        prev = cur
    return prev[np.arange(n), lb]


def _variants(values: np.ndarray, k: int) -> pd.DataFrame:
    """(variant, original) rows: every ≤k-deletion variant of every
    distinct input string (Python expansion bounded by the distinct
    value set × O(len^k) variants)."""
    out_v: List[str] = []
    out_o: List[str] = []
    seen_pairs = set()
    for s in values:
        variants = {s}
        frontier = {s}
        for _ in range(k):
            nxt = set()
            for v in frontier:
                for i in range(len(v)):
                    nxt.add(v[:i] + v[i + 1:])
            variants |= nxt
            frontier = nxt
        for v in variants:
            if (v, s) not in seen_pairs:
                seen_pairs.add((v, s))
                out_v.append(v)
                out_o.append(s)
    return pd.DataFrame({"variant": out_v, "orig": out_o})


def fuzzy_join(left_ds, right_ds, col: str, *, k: int = 1,
               n_buckets: int = 32, self_join: bool = False,
               max_len: int = 256,
               overlong: str = "error") -> pd.DataFrame:
    """→ (left, right, dist): every distinct cross-side string pair with
    Levenshtein distance ≤ ``k`` (k ∈ {1, 2}). Exact — FastSS deletion
    blocking has full recall; each candidate is verified with the exact
    DP kernel.

    ``self_join=True`` matches ``left_ds`` against itself with HALF the
    work of the two-sided call (one variant expansion, each unordered
    pair verified once; left < right in the output); ``right_ds`` is
    ignored. ``overlong`` controls values longer than ``max_len`` (the
    DP kernel's O(max_len²) cost guard): ``'error'`` (default) raises
    inside the verify kernel, ``'skip'`` drops them from matching —
    they can then never pair, which entity resolution treats as
    singleton identities."""
    if k not in (1, 2):
        raise ValueError("k must be 1 or 2 (deletion-neighborhood "
                         "expansion is O(len^k) variants per string)")
    if overlong not in ("error", "skip"):
        raise ValueError(f"unknown overlong policy {overlong!r}")
    from ..stages.keyed_window import keyed_apply

    def expand(side: int):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            vals = df[col].dropna().unique()
            if overlong == "skip":
                vals = np.asarray(
                    [x for x in vals if len(x) <= max_len], dtype=object)
            v = _variants(np.asarray(vals, dtype=object), k)
            v["side"] = np.int8(side)
            return v
        return fn

    if self_join:
        u = left_ds.map_batches(expand(0), batch_format="pandas")
    else:
        u = (left_ds.map_batches(expand(0), batch_format="pandas")
             .union(right_ds.map_batches(expand(1), batch_format="pandas")))

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["variant", "orig", "side"])
        lefts = g[g["side"] == 0].groupby("variant")["orig"].unique()
        rights = g[g["side"] == 1].groupby("variant")["orig"].unique()
        both = lefts.index.intersection(rights.index)
        if not len(both):
            return pd.DataFrame({"left": [], "right": []})
        la, ra = [], []
        for v in both:
            ls, rs = lefts[v], rights[v]
            la.append(np.repeat(ls, len(rs)))
            ra.append(np.tile(rs, len(ls)))
        cand = pd.DataFrame({
            "left": np.concatenate(la),
            "right": np.concatenate(ra)}).drop_duplicates()
        d = levenshtein_batch(cand["left"].to_numpy(dtype=object),
                              cand["right"].to_numpy(dtype=object),
                              max_len=max_len)
        cand = cand.assign(dist=d)
        return cand[cand["dist"] <= k]

    def bucket_pairs_self(g: pd.DataFrame) -> pd.DataFrame:
        """Unordered distinct pairs within each variant bucket — each
        pair expanded and DP-verified ONCE (the two-sided path verified
        both orientations of every self-join pair)."""
        g = g.drop_duplicates(["variant", "orig"])
        byv = g.groupby("variant")["orig"].unique()
        la, ra = [], []
        for vals in byv:
            if len(vals) < 2:
                continue
            vs = np.sort(vals.astype(object))
            iu, ju = np.triu_indices(len(vs), 1)
            la.append(vs[iu])
            ra.append(vs[ju])
        if not la:
            return pd.DataFrame({"left": [], "right": []})
        cand = pd.DataFrame({
            "left": np.concatenate(la),
            "right": np.concatenate(ra)}).drop_duplicates()
        d = levenshtein_batch(cand["left"].to_numpy(dtype=object),
                              cand["right"].to_numpy(dtype=object),
                              max_len=max_len)
        cand = cand.assign(dist=d)
        return cand[cand["dist"] <= k]

    kern = bucket_pairs_self if self_join else bucket_pairs
    pairs = keyed_apply(u, "variant", kern,
                        n_buckets=n_buckets).to_pandas()
    if not len(pairs):
        return pd.DataFrame({"left": [], "right": [], "dist": []})
    pairs = pairs.drop_duplicates(["left", "right"])
    return (pairs.sort_values(["left", "right"])
            .reset_index(drop=True)[["left", "right", "dist"]]
            .astype({"dist": "int64"}))
