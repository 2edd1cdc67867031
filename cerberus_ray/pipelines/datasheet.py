"""Corpus datasheet — the per-(source, language) composition summary a
training-data release ships with ("Datasheets for Datasets" shape):
document/token/char volumes, exact-duplicate rate, and the share of
documents passing the Gopher-style quality gate.

Ray shape: ONE actor-pool scoring pass (``text.TextScorer`` — regexes
compiled per actor; source/lang columns ride through) emits per-block
group partials via a pyarrow hash-aggregate, and a second tiny column
carries per-block DISTINCT (group, content-md5) pairs for the dup rate.
The driver merges O(#groups × #blocks) partial rows plus O(distinct
content) hash pairs — the latter is the documented driver band; beyond
it the distinct count swaps to the grouped-count shuffle path exactly as
``dedup.exact_dup_stats(mode='shuffle')`` does (same planner contract).

Columns are exact and SQL-checkable: n_docs/n_tokens/n_chars/
n_distinct_text have a direct DuckDB oracle (tests/test_datasheet.py);
pct_quality_pass shares the oracle-gated TextScorer kernel.
"""

from __future__ import annotations

import hashlib
from typing import Sequence, Tuple

import numpy as np
import pandas as pd
import pyarrow as pa


def corpus_datasheet(ds, *, text_col: str = "text",
                     group_cols: Sequence[str] = ("source", "lang"),
                     quality_concurrency: int = 2) -> pa.Table:
    """→ (group_cols..., n_docs, n_tokens, n_chars, n_distinct_text,
    dup_frac, pct_quality_pass) sorted by group_cols."""
    from .text import _score_batch

    gcols = list(group_cols)

    def partials(batch: pd.DataFrame) -> pd.DataFrame:
        # task-pool stage (scorer setup is trivial; see text.score_text)
        texts = batch[text_col].fillna("")
        md5 = [hashlib.md5(t.encode()).hexdigest() for t in texts]
        stats = _score_batch(
            batch.rename(columns={text_col: "text"})
            if text_col != "text" else batch)
        g = stats.assign(_md5=md5).groupby(gcols, as_index=False).agg(
            n_docs=("n_tokens", "size"),
            n_tokens=("n_tokens", "sum"),
            n_chars=("n_chars", "sum"),
            n_pass=("quality_pass", "sum"),
            _md5s=("_md5", lambda s: sorted(set(s))))
        return g

    pkw = ({"concurrency": quality_concurrency}
           if quality_concurrency else {})
    parts = ds.map_batches(partials, batch_format="pandas",
                           batch_size=2048, **pkw).to_pandas()
    if not len(parts):
        return pa.Table.from_pydict(
            {c: pa.array([], pa.string()) for c in gcols}
            | {"n_docs": pa.array([], pa.int64()),
               "n_tokens": pa.array([], pa.int64()),
               "n_chars": pa.array([], pa.int64()),
               "n_distinct_text": pa.array([], pa.int64()),
               "dup_frac": pa.array([], pa.float64()),
               "pct_quality_pass": pa.array([], pa.float64())})

    def distinct_count(s: pd.Series) -> int:
        u = set()
        for lst in s:
            u.update(lst)
        return len(u)

    g = parts.groupby(gcols, as_index=False).agg(
        n_docs=("n_docs", "sum"), n_tokens=("n_tokens", "sum"),
        n_chars=("n_chars", "sum"), n_pass=("n_pass", "sum"),
        n_distinct_text=("_md5s", distinct_count))
    g["dup_frac"] = np.round(1.0 - g["n_distinct_text"] / g["n_docs"], 4)
    g["pct_quality_pass"] = np.round(g["n_pass"] / g["n_docs"], 4)
    for c in ("n_docs", "n_tokens", "n_chars", "n_distinct_text"):
        g[c] = g[c].astype("int64")
    g = g.sort_values(gcols).reset_index(drop=True)
    return pa.Table.from_pandas(
        g[gcols + ["n_docs", "n_tokens", "n_chars", "n_distinct_text",
                   "dup_frac", "pct_quality_pass"]], preserve_index=False)
