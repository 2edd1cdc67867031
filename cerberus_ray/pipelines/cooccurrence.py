"""Adjacent-token co-occurrence counts and PMI collocations — the
phrase-mining / collocation signal (Church-Hanks pointwise mutual
information over bigram counts).

Execution shape: one streamed pass producing per-block (w1, w2, count)
hash-aggregate partials (tokens vectorized with pandas string kernels —
explode + shifted-pair masking, no per-doc Python), then a merge bounded
by the DISTINCT-bigram domain:

- ``driver`` mode: partials merge on the driver (pandas groupby over
  O(#blocks × #distinct-bigrams-per-block) rows) — right whenever the
  bigram vocabulary fits driver memory (it grows with vocab², not
  corpus size, and is Zipf-truncated by ``min_count`` in practice).
- ``shuffle`` mode: one ``keyed_apply`` hash exchange on w1 merges
  partials distributed — the beyond-driver-memory path, same planner
  contract as ``vocab.token_top_k``.

Tokenization contract (shared with the language-ID oracle family):
lowercase, split on whitespace runs, empty tokens dropped — expressible
byte-for-byte in DuckDB as
``list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '')``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

__all__ = ["adjacent_pair_counts", "pmi_top_k"]


def _pair_partial(df: pd.DataFrame, text_col: str) -> pd.DataFrame:
    toks = df[text_col].fillna("").str.lower().str.split()
    lens = toks.str.len().to_numpy(dtype=np.int64)
    # explode is the C-level flatten; empty docs contribute one NaN row
    flat = toks.explode().dropna().to_numpy(dtype=object)
    if len(flat) < 2:
        return pd.DataFrame({"w1": [], "w2": [], "n": []})
    w1, w2 = flat[:-1], flat[1:]
    # mask pairs that straddle a document boundary
    last = np.cumsum(lens)[:-1] - 1 if len(lens) > 1 else np.empty(
        0, dtype=np.int64)
    valid = np.ones(len(flat) - 1, dtype=bool)
    valid[last[(last >= 0) & (last < len(valid))]] = False
    g = (pd.DataFrame({"w1": w1[valid], "w2": w2[valid]})
         .groupby(["w1", "w2"], sort=False).size().reset_index(name="n"))
    return g


def adjacent_pair_counts(ds, text_col: str = "text", *,
                         min_count: int = 1, mode: str = "driver",
                         n_buckets: int = 32) -> pd.DataFrame:
    """→ (w1, w2, n): corpus-wide adjacent-bigram counts with
    ``n ≥ min_count``, sorted by (-n, w1, w2)."""
    partials = ds.map_batches(lambda df: _pair_partial(df, text_col),
                              batch_format="pandas")
    if mode == "driver":
        pdf = partials.to_pandas()
        if not len(pdf):
            return pd.DataFrame({"w1": [], "w2": [], "n": []})
        g = pdf.groupby(["w1", "w2"], as_index=False)["n"].sum()
    elif mode == "shuffle":
        from ..stages.keyed_window import keyed_apply

        g = keyed_apply(
            partials, "w1",
            lambda b: b.groupby(["w1", "w2"], sort=False,
                                as_index=False)["n"].sum(),
            n_buckets=n_buckets).to_pandas()
        if not len(g):
            return pd.DataFrame({"w1": [], "w2": [], "n": []})
    else:
        raise ValueError(f"unknown mode {mode!r}")
    g = g[g["n"] >= min_count]
    g["n"] = g["n"].astype("int64")
    return (g.sort_values(["n", "w1", "w2"],
                          ascending=[False, True, True])
            .reset_index(drop=True))


def pmi_top_k(ds, text_col: str = "text", *, k: int = 20,
              min_count: int = 5, mode: str = "driver") -> pd.DataFrame:
    """→ (w1, w2, n, pmi): the ``k`` adjacent bigrams with the highest
    pointwise mutual information ``log2(p(ab) / (p(a) p(b)))`` among
    those with ``n ≥ min_count`` (the Church-Hanks collocation measure;
    the min-count gate suppresses the rare-pair PMI inflation).
    Unigram/bigram totals come from the same streamed pass family;
    ties break on (w1, w2)."""
    pairs = adjacent_pair_counts(ds, text_col, min_count=1, mode=mode)

    def uni_partial(df: pd.DataFrame) -> pd.DataFrame:
        toks = df[text_col].fillna("").str.lower().str.split().explode()
        toks = toks[toks.notna()]
        return toks.value_counts().rename_axis("w").reset_index(name="n")

    uni = (ds.map_batches(uni_partial, batch_format="pandas").to_pandas()
           .groupby("w")["n"].sum())
    n_tokens = float(uni.sum())
    # denominators over ALL adjacent pairs — filtering before the total
    # would inflate every p(ab) by total/filtered
    n_pairs = float(pairs["n"].sum()) if len(pairs) else 0.0
    pairs = pairs[pairs["n"] >= min_count].reset_index(drop=True)
    if not len(pairs) or n_pairs == 0:
        return pd.DataFrame({"w1": [], "w2": [], "n": [], "pmi": []})
    p_ab = pairs["n"].to_numpy(dtype=np.float64) / n_pairs
    p_a = pairs["w1"].map(uni).to_numpy(dtype=np.float64) / n_tokens
    p_b = pairs["w2"].map(uni).to_numpy(dtype=np.float64) / n_tokens
    out = pairs.assign(pmi=np.log2(p_ab / (p_a * p_b)))
    return (out.sort_values(["pmi", "w1", "w2"],
                            ascending=[False, True, True])
            .head(k).reset_index(drop=True))
