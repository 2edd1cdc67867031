"""BPE tokenizer training over a Ray Dataset — the artifact-production
step of a training-data pipeline (learn the subword vocabulary FROM the
corpus, then tokenize the corpus with it).

Public recipe (Sennrich et al. 2016; the HuggingFace-tokenizers training
shape): BPE does not iterate over the corpus — it iterates over the WORD
FREQUENCY TABLE. That factors perfectly onto Ray:

- distributed: ONE word-count aggregation (the `vocab.token_top_k`
  machinery shape — per-block pyarrow hash-aggregate partials,
  driver/`groupby` mode-planned merge). At 10^12 docs the scale lever is
  the same CMS heavy-hitter path; the merge loop only needs the top-W
  words, which cover almost all pair mass in any Zipfian corpus.
- driver: the Sennrich merge loop over ≤ ``max_words`` symbol sequences
  (O(num_merges × Σ|word|) — seconds for 50k words). Deterministic
  tie-break: max count, then lexicographically smallest pair.
- distributed again: ``encode_bpe`` broadcasts the merge ranks once and
  tokenizes each block with a per-actor word→tokens cache (the ST2
  pattern) — each DISTINCT word is encoded once per actor, not once per
  occurrence.

End-of-word marker ``</w>`` follows the original paper: the final symbol
of every word carries it, so merges cannot cross word boundaries and
decoding is unambiguous.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np
import pandas as pd
import pyarrow as pa

__all__ = ["word_counts", "fit_bpe", "encode_bpe", "bpe_merge_loop"]

_EOW = "</w>"


def word_counts(ds, *, text_col: str = "text", mode: str = "driver",
                max_words: int = 50_000) -> pd.Series:
    """Top-``max_words`` lowercase whitespace words by corpus frequency
    (count desc, word asc ties — deterministic, partition-invariant;
    the cap is applied after the global merge)."""
    if mode not in ("driver", "shuffle"):
        raise ValueError(f"unknown mode {mode!r}")

    def partial(b: pa.Table) -> pa.Table:
        texts = pd.Series(b[text_col].to_numpy(zero_copy_only=False),
                          dtype=object).fillna("")
        toks = texts.str.lower().str.split().explode().dropna()
        if not len(toks):
            return pa.Table.from_pydict({
                "w": pa.array([], pa.string()),
                "c": pa.array([], pa.int64())})
        t = pa.Table.from_pydict({
            "w": pa.array(toks.to_numpy(dtype=object).astype(str))})
        g = t.group_by("w").aggregate([([], "count_all")])
        return pa.Table.from_arrays([g["w"], g["count_all"]],
                                    names=["w", "c"])

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True)
    if mode == "driver":
        pdf = parts.to_pandas()
        tot = (pdf.groupby("w")["c"].sum() if len(pdf)
               else pd.Series(dtype=np.int64))
    else:
        pdf = parts.groupby("w").sum("c").to_pandas()
        tot = (pdf.set_index("w")["sum(c)"] if len(pdf)
               else pd.Series(dtype=np.int64))
    tot = tot.sort_index()
    order = np.lexsort((tot.index.to_numpy(), -tot.to_numpy()))
    return tot.iloc[order[:max_words]]


def bpe_merge_loop(counts: pd.Series, num_merges: int
                   ) -> List[Tuple[str, str]]:
    """The Sennrich loop over the word-frequency table (pure driver
    function, exact): repeatedly merge the most frequent adjacent symbol
    pair. Returns the ordered merge list."""
    words: List[List[str]] = [list(w[:-1]) + [w[-1] + _EOW]
                              for w in counts.index]
    freqs = counts.to_numpy()
    merges: List[Tuple[str, str]] = []
    for _ in range(num_merges):
        pair_counts: Dict[Tuple[str, str], int] = {}
        for sym, f in zip(words, freqs):
            for a, b in zip(sym, sym[1:]):
                pair_counts[(a, b)] = pair_counts.get((a, b), 0) + int(f)
        if not pair_counts:
            break
        # deterministic: max count, then lexicographically smallest pair
        top = max(pair_counts.values())
        best = min(p for p, c in pair_counts.items() if c == top)
        if pair_counts[best] < 2:
            break
        merges.append(best)
        a, b = best
        ab = a + b
        for sym in words:
            i = 0
            while i < len(sym) - 1:
                if sym[i] == a and sym[i + 1] == b:
                    sym[i:i + 2] = [ab]
                else:
                    i += 1
    return merges


def _encode_word(w: str, ranks: Dict[Tuple[str, str], int]) -> List[str]:
    sym = list(w[:-1]) + [w[-1] + _EOW] if w else []
    while len(sym) > 1:
        pairs = [(ranks.get((a, b), np.inf), i)
                 for i, (a, b) in enumerate(zip(sym, sym[1:]))]
        r, i = min(pairs)
        if r == np.inf:
            break
        sym[i:i + 2] = [sym[i] + sym[i + 1]]
    return sym


def fit_bpe(ds, *, text_col: str = "text", num_merges: int = 200,
            max_words: int = 50_000, mode: str = "driver"
            ) -> List[Tuple[str, str]]:
    """Distributed word-count pass + driver merge loop → ordered merges."""
    counts = word_counts(ds, text_col=text_col, mode=mode,
                         max_words=max_words)
    return bpe_merge_loop(counts, num_merges)


def encode_bpe(ds, merges: List[Tuple[str, str]], *,
               text_col: str = "text"):
    """Append ``n_bpe_tokens`` (and keep other columns): tokenize each
    document under the learned merges. Actor-pool stage with a per-actor
    word→len cache — each distinct word is encoded once per actor."""
    import ray

    ref = ray.put({tuple(m): i for i, m in enumerate(merges)})

    class Encoder:
        def __init__(self):
            self.ranks = ray.get(ref)
            self.cache: Dict[str, int] = {}

        def __call__(self, b: pa.Table) -> pa.Table:
            texts = pd.Series(b[text_col].to_numpy(zero_copy_only=False),
                              dtype=object).fillna("")
            out = np.empty(len(texts), dtype=np.int64)
            for i, t in enumerate(texts):
                n = 0
                for w in t.lower().split():
                    ln = self.cache.get(w)
                    if ln is None:
                        ln = len(_encode_word(w, self.ranks))
                        self.cache[w] = ln
                    n += ln
                out[i] = n
            return b.append_column("n_bpe_tokens", pa.array(out))

    return ds.map_batches(Encoder, batch_format="pyarrow",
                          zero_copy_batch=True, concurrency=2)
