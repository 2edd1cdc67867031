"""RAKE keyphrase extraction (Rose, Engel, Cramer & Cowley 2010).

Corpus-level keyphrases — the PHRASE-level signal next to the token
(`vocab`), collocation/PMI (`cooccurrence`) and tf-idf stages: split
each document into candidate phrases at stopword / punctuation /
number boundaries, score each word by degree/frequency over all
candidate phrases, score a phrase as the sum of its word scores.

Scale shape (all-mergeable, one streamed pass):

- per block: candidate-phrase counts (capped by emitting only phrases
  the block saw ≥ 1×; the driver merge then applies ``min_count`` —
  phrase space is corpus-bounded like the n-gram stages, the same
  Zipf-cap contract as `bpe.word_counts`) + word (freq, degree) sums
  (vocab-bounded).
- driver: merge, score, top-k by (score desc, phrase asc) —
  deterministic and layout-invariant.

Exact single-process reference parity in tests/test_keyphrases.py.
"""

from __future__ import annotations

import re
from typing import Dict, FrozenSet, List, Tuple

import numpy as np
import pandas as pd
import pyarrow as pa

__all__ = ["DEFAULT_STOPWORDS", "extract_keyphrases",
           "phrase_candidates"]

DEFAULT_STOPWORDS: FrozenSet[str] = frozenset("""
a an and are as at be but by for from has have if in into is it its of
on or that the their then there these they this to was were will with
we you your not no so than too very can could should would i he she
him her his hers our us them what which who whom when where why how
all any both each few more most other some such only own same s t don
now d ll m o re ve y
""".split())

_FRAG_RE = re.compile(r"[.!?;:,\n\r\t()\[\]{}\"]+")
_SPLIT_RE = re.compile(r"[^a-z0-9']+")


def phrase_candidates(text: str,
                      stopwords: FrozenSet[str],
                      max_phrase_len: int) -> List[Tuple[str, ...]]:
    """Candidate phrases: maximal stopword/number-free word runs
    WITHIN a punctuation-delimited fragment (candidates never cross a
    sentence/clause boundary — the original RAKE delimiter set),
    truncated at ``max_phrase_len``."""
    out: List[Tuple[str, ...]] = []
    for frag in _FRAG_RE.split((text or "").lower()):
        run: List[str] = []
        for w in _SPLIT_RE.split(frag):
            if not w:
                continue
            if w in stopwords or w.isdigit():
                if run:
                    out.append(tuple(run[:max_phrase_len]))
                    run = []
            else:
                run.append(w)
        if run:
            out.append(tuple(run[:max_phrase_len]))
    return out


def extract_keyphrases(ds, *, text_col: str = "text", top_k: int = 20,
                       max_phrase_len: int = 3, min_count: int = 2,
                       stopwords: FrozenSet[str] = DEFAULT_STOPWORDS
                       ) -> pd.DataFrame:
    """→ frame (phrase, n, score) — top-``top_k`` by (score desc,
    phrase asc), phrases seen ≥ ``min_count`` times."""
    if top_k < 1 or max_phrase_len < 1 or min_count < 1:
        raise ValueError("top_k, max_phrase_len, min_count must be >= 1")

    def partial(b: pa.Table) -> pa.Table:
        texts = b[text_col].to_numpy(zero_copy_only=False)
        pcounts: Dict[str, int] = {}
        freq: Dict[str, int] = {}
        deg: Dict[str, int] = {}
        for t in texts:
            for ph in phrase_candidates(t, stopwords, max_phrase_len):
                key = " ".join(ph)
                pcounts[key] = pcounts.get(key, 0) + 1
                for w in ph:
                    freq[w] = freq.get(w, 0) + 1
                    deg[w] = deg.get(w, 0) + len(ph)
        return pa.Table.from_pydict({
            "kind": pa.array(["p"] * len(pcounts) + ["w"] * len(freq)),
            "key": pa.array(list(pcounts) + list(freq)),
            "n": pa.array(list(pcounts.values())
                          + list(freq.values()), pa.int64()),
            "deg": pa.array([0] * len(pcounts)
                            + list(deg.values()), pa.int64())})

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True).to_pandas()
    if not len(parts):
        return pd.DataFrame({"phrase": [], "n": [], "score": []})
    g = parts.groupby(["kind", "key"], as_index=False).sum()
    words = g[g["kind"] == "w"].set_index("key")
    wscore = (words["deg"] / words["n"]).to_dict()
    phrases = g[g["kind"] == "p"]
    phrases = phrases[phrases["n"] >= min_count]
    rows = []
    for key, n in zip(phrases["key"], phrases["n"]):
        rows.append((key, int(n),
                     round(sum(wscore[w] for w in key.split()), 6)))
    out = pd.DataFrame(rows, columns=["phrase", "n", "score"])
    return (out.sort_values(["score", "phrase"],
                            ascending=[False, True])
            .head(top_k).reset_index(drop=True))
