"""Unigram-LM subword tokenizer training (Kudo 2018) — the
SentencePiece counterpart to the engine's BPE module, sharing its
factorization: the algorithm never iterates the corpus, only the WORD
FREQUENCY TABLE.

- distributed: ONE word-count pass (`bpe.word_counts` — per-block
  pyarrow hash-aggregate partials, driver/shuffle mode planner, top-W
  Zipf cap).
- driver: seed vocabulary = all substrings ≤ ``max_piece_len`` of the
  top words weighted by word count (capped by count desc; every
  observed character is mandatory so any word stays encodable), then
  Viterbi-EM rounds: E = best segmentation of each distinct word under
  the current piece log-probs (an O(|w|·max_piece_len) DP per DISTINCT
  word — seconds at the 50k cap), M = renormalized piece counts;
  between rounds the lowest-mass non-character pieces are pruned until
  ``vocab_size`` remains (Kudo's prune schedule, Viterbi-E documented
  approximation of the paper's full forward-backward E).
- distributed again: ``encode_unigram`` broadcasts the piece table once
  and tokenizes each block with a per-actor word→pieces cache (ST2) —
  each distinct word is segmented once per actor, not per occurrence.

Deterministic throughout: seed counts tie-break lexicographically,
prune order is (mass, piece), DP prefers longer pieces on ties.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List

import numpy as np
import pandas as pd
import pyarrow as pa

from .bpe import word_counts

__all__ = ["UnigramModel", "fit_unigram", "encode_unigram",
           "viterbi_segment"]

_UNK = "<unk>"


@dataclass
class UnigramModel:
    logprobs: Dict[str, float]
    max_piece_len: int
    nll_per_iter: List[float] = field(default_factory=list)

    @property
    def vocab(self) -> List[str]:
        return sorted(self.logprobs)


def viterbi_segment(w: str, logprobs: Dict[str, float],
                    max_piece_len: int) -> List[str]:
    """Best segmentation (max Σ logprob); ties prefer the LONGER last
    piece (deterministic). Characters absent from the table become
    ``<unk>`` at a fixed penalty."""
    n = len(w)
    best = np.full(n + 1, -np.inf)
    best[0] = 0.0
    back = np.zeros(n + 1, dtype=np.int64)
    unk_lp = min(logprobs.values(), default=-10.0) - 10.0
    for i in range(1, n + 1):
        for l in range(1, min(max_piece_len, i) + 1):
            piece = w[i - l:i]
            lp = logprobs.get(piece)
            if lp is None:
                if l > 1:
                    continue
                lp = unk_lp                     # unknown single char
            s = best[i - l] + lp
            # >= : later (longer) l wins ties
            if s >= best[i]:
                best[i] = s
                back[i] = l
    out = []
    i = n
    while i > 0:
        l = back[i]
        piece = w[i - l:i]
        out.append(piece if piece in logprobs else _UNK)
        i -= l
    return out[::-1]


def _seed_vocab(counts: pd.Series, max_piece_len: int,
                seed_size: int) -> pd.Series:
    """Substring-count seed: every substring ≤ max_piece_len of every
    word, weighted by word count; capped to ``seed_size`` by (count
    desc, piece asc); all single characters kept unconditionally."""
    acc: Dict[str, int] = {}
    for w, c in counts.items():
        c = int(c)
        for i in range(len(w)):
            for l in range(1, min(max_piece_len, len(w) - i) + 1):
                p = w[i:i + l]
                acc[p] = acc.get(p, 0) + c
    s = pd.Series(acc)
    s = s.iloc[np.lexsort([s.index.to_numpy(object), -s.to_numpy()])]
    chars = s[[len(p) == 1 for p in s.index]]
    multi = s[[len(p) > 1 for p in s.index]].head(
        max(seed_size - len(chars), 0))
    return pd.concat([chars, multi])


def fit_unigram(ds, *, text_col: str = "text", vocab_size: int = 512,
                max_words: int = 50_000, max_piece_len: int = 8,
                n_iters: int = 3, prune_frac: float = 0.25,
                seed_factor: int = 8, mode: str = "driver"
                ) -> UnigramModel:
    """→ UnigramModel with exactly ≤ ``vocab_size`` pieces (all
    observed characters always included)."""
    if vocab_size < 2:
        raise ValueError("vocab_size must be >= 2")
    counts = word_counts(ds, text_col=text_col, mode=mode,
                         max_words=max_words)
    if not len(counts):
        raise ValueError("empty corpus")
    seed = _seed_vocab(counts, max_piece_len,
                       seed_factor * vocab_size)
    total = float(seed.sum())
    logprobs = {p: float(np.log(c / total)) for p, c in seed.items()}
    model = UnigramModel(logprobs=logprobs, max_piece_len=max_piece_len)

    words = list(counts.items())
    while True:
        for _ in range(n_iters):
            piece_counts: Dict[str, float] = {}
            nll = 0.0
            wtot = 0.0
            for w, c in words:
                segs = viterbi_segment(w, model.logprobs, max_piece_len)
                for p in segs:
                    if p != _UNK:
                        piece_counts[p] = piece_counts.get(p, 0.0) + c
                nll -= c * sum(model.logprobs.get(p, -30.0)
                               for p in segs)
                wtot += c
            model.nll_per_iter.append(round(nll / wtot, 10))
            tot = sum(piece_counts.values())
            # M-step over pieces USED by some Viterbi path; unused
            # pieces keep a floor mass so pruning (not the M-step)
            # retires them deterministically
            floor = 0.1 / max(tot, 1.0)
            model.logprobs = {
                p: float(np.log(max(piece_counts.get(p, 0.0) / tot,
                                    floor)))
                for p in model.logprobs}
        n_multi = sum(1 for p in model.logprobs if len(p) > 1)
        n_chars = len(model.logprobs) - n_multi
        target_multi = max(vocab_size - n_chars, 0)
        if n_multi <= target_multi:
            break
        keep = max(target_multi, int(n_multi * (1 - prune_frac)))
        multi = [(p, lp) for p, lp in model.logprobs.items()
                 if len(p) > 1]
        multi.sort(key=lambda t: (-t[1], t[0]))
        kept = dict(multi[:keep])
        model.logprobs = {p: lp for p, lp in model.logprobs.items()
                          if len(p) == 1 or p in kept}
    return model


def encode_unigram(ds, model: UnigramModel, *, text_col: str = "text",
                   out_col: str = "n_unigram_tokens"):
    """Append the per-document piece count — actor pool with the ST2
    per-actor word→len cache."""
    import ray

    ref = ray.put((model.logprobs, model.max_piece_len))

    class Encoder:
        def __init__(self):
            self.logprobs, self.mpl = ray.get(ref)
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
                        ln = len(viterbi_segment(w, self.logprobs,
                                                 self.mpl))
                        self.cache[w] = ln
                    n += ln
                out[i] = n
            return b.append_column(out_col, pa.array(out))

    return ds.map_batches(Encoder, batch_format="pyarrow",
                          zero_copy_batch=True, concurrency=2)
