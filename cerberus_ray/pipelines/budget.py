"""Global token-budget corpus selection — keep the highest-quality
documents whose cumulative token count fits a fixed training budget.

The corpus-shaping primitive behind "build a T-token training set from
the best documents" (the data-constrained scaling recipe of public
LLM-pipeline literature: rank by a quality signal, take the prefix until
the token budget is exhausted). Semantically it is the SQL window

    SUM(n_tokens) OVER (ORDER BY score DESC, key
                        ROWS UNBOUNDED PRECEDING) <= budget

and because tokens are non-negative the running sum is monotone, so the
selected set is a PREFIX of the (score desc, key asc) total order. A
prefix is fully described by its LAST element — the cut pair
(score*, key*) — which makes the final selection a stateless streamed
filter against two scalars, never a broadcast id-set.

Ray shape (mode planner, matching the engine's other driver/shuffle
planners):

- ``mode='driver'`` (small inputs): pull ONLY (score, tokens, key) —
  never the text — sort on the driver, running-sum, read off the cut
  pair. O(n) driver rows of 3 scalar columns; right below ~10^7 rows.
- ``mode='sort'`` (scale path): distributed range sort by
  (score desc, key asc) — Ray's shuffle sort keeps output blocks
  size-bounded, so skewed scores cannot produce a giant partition —
  then one streamed pass emits a per-block summary row (first/last
  sort key, token sum, row count). The driver orders the #blocks
  summaries, running-sums the block totals to locate the CUT BLOCK,
  collects just that one block's (score, tokens, key) columns, and
  resolves the exact cut pair inside it. Driver structure:
  O(#blocks) + one block.
- Both modes end in the same one-scalar-broadcast streamed filter, and
  are agreement-tested; ``mode='auto'`` switches on ``ds.count()``.

Reference anchor: the closest reference analogue is the ordered-prefix
pagination family (SURVEY.md §2.7 O1/O4,
/root/reference/cerberus/views.py ordering+slicing); applied here to a
global token-weighted cut rather than a row offset.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_DRIVER_MAX_ROWS = 5_000_000


def _py(v):
    """numpy scalar → Python scalar (pa.scalar chokes on np.str_ keys)."""
    return v.item() if isinstance(v, np.generic) else v


def _token_counts(b: pa.Table, text_col: str) -> pa.Array:
    """Whitespace token count (the engine's standard tokenizer)."""
    t = pc.utf8_trim_whitespace(pc.fill_null(b[text_col], ""))
    n = pc.list_value_length(pc.split_pattern_regex(t, r"\s+"))
    return pc.if_else(pc.equal(t, ""), pa.scalar(0, pa.int64()),
                      pc.cast(n, pa.int64()))


def with_token_counts(ds, *, text_col: str = "text",
                      out_col: str = "n_tokens"):
    """Append a whitespace token-count column (streamed, zero-copy)."""

    def add(b: pa.Table) -> pa.Table:
        return b.append_column(out_col, _token_counts(b, text_col))

    return ds.map_batches(add, batch_format="pyarrow",
                          zero_copy_batch=True)


def _prefix_cut(score: np.ndarray, tok: np.ndarray, keys: np.ndarray,
                budget: int) -> Tuple[int, Optional[tuple]]:
    """Rows are pre-sorted (score desc, key asc). → (n_kept, cut_pair)
    where cut_pair is the last kept (score, key), None if none kept."""
    cum = np.cumsum(tok)
    kept = np.flatnonzero(cum <= budget)
    if not len(kept):
        return 0, None
    last = int(kept[-1])
    return last + 1, (float(score[last]), _py(keys[last]))


def token_budget_cut(ds, budget: int, *, score_col: str,
                     token_col: str = "n_tokens",
                     key_col: str = "doc_id",
                     mode: str = "auto") -> Optional[tuple]:
    """→ cut pair (score*, key*) of the last document inside the budget,
    or None when not even the best document fits. ``ds`` is consumed
    once (driver) or twice (sort mode: sort is materialized) — pass a
    materialized/parquet-backed Dataset."""
    if mode not in ("auto", "driver", "sort"):
        raise ValueError(f"unknown mode {mode!r}")
    if budget < 0:
        raise ValueError("budget must be >= 0")
    if mode == "auto":
        mode = "driver" if ds.count() <= _DRIVER_MAX_ROWS else "sort"

    if mode == "driver":
        pdf = ds.select_columns([score_col, token_col, key_col]).to_pandas()
        if not len(pdf):
            return None
        pdf = pdf.sort_values([score_col, key_col],
                              ascending=[False, True], kind="mergesort")
        return _prefix_cut(pdf[score_col].to_numpy(),
                           pdf[token_col].to_numpy(dtype=np.int64),
                           pdf[key_col].to_numpy(), budget)[1]

    sorted_ds = (ds.select_columns([score_col, token_col, key_col])
                   .sort([score_col, key_col], descending=[True, False])
                   .materialize())

    def summary(b: pa.Table) -> pa.Table:
        if not b.num_rows:
            return pa.Table.from_pydict(
                {"first_score": pa.array([], pa.float64()),
                 "first_key": b[key_col],
                 "last_score": pa.array([], pa.float64()),
                 "last_key": b[key_col],
                 "tok": pa.array([], pa.int64())})
        return pa.Table.from_pydict({
            "first_score": [float(b[score_col][0].as_py())],
            "first_key": [b[key_col][0].as_py()],
            "last_score": [float(b[score_col][-1].as_py())],
            "last_key": [b[key_col][-1].as_py()],
            "tok": [int(pc.sum(b[token_col]).as_py() or 0)]})

    # batch_size=None → one summary row per block
    blk = sorted_ds.map_batches(summary, batch_size=None,
                                batch_format="pyarrow",
                                zero_copy_batch=True).to_pandas()
    if not len(blk):
        return None
    # reconstruct block order on the driver (sort emits range partitions
    # but collection order is not guaranteed): descending first_score,
    # ascending first_key
    blk = blk.sort_values(["first_score", "first_key"],
                          ascending=[False, True], kind="mergesort")
    cums = blk["tok"].to_numpy(dtype=np.int64).cumsum()
    over = np.flatnonzero(cums > budget)
    if not len(over):  # whole corpus fits
        last = blk.iloc[-1]
        return (float(last["last_score"]), _py(last["last_key"]))
    ci = int(over[0])  # the cut block
    spent = int(cums[ci - 1]) if ci else 0
    cb = blk.iloc[ci]

    def grab(b: pa.Table) -> pa.Table:
        s, k = b[score_col], b[key_col]
        lo = pc.or_(pc.less(s, float(cb["first_score"])),
                    pc.and_(pc.equal(s, float(cb["first_score"])),
                            pc.greater_equal(k, pa.scalar(_py(cb["first_key"])))))
        hi = pc.or_(pc.greater(s, float(cb["last_score"])),
                    pc.and_(pc.equal(s, float(cb["last_score"])),
                            pc.less_equal(k, pa.scalar(_py(cb["last_key"])))))
        return b.filter(pc.and_(lo, hi))

    pdf = sorted_ds.map_batches(grab, batch_format="pyarrow",
                                zero_copy_batch=True).to_pandas()
    pdf = pdf.sort_values([score_col, key_col],
                          ascending=[False, True], kind="mergesort")
    n, cut = _prefix_cut(pdf[score_col].to_numpy(),
                         pdf[token_col].to_numpy(dtype=np.int64),
                         pdf[key_col].to_numpy(), budget - spent)
    if cut is not None:
        return cut
    if ci == 0:  # nothing fits at all
        return None
    prev = blk.iloc[ci - 1]  # cut lands exactly on a block boundary
    return (float(prev["last_score"]), _py(prev["last_key"]))


def sample_exact_k(ds, k: int, *, key_col: str = "doc_id",
                   seed: int = 0, mode: str = "auto"):
    """Exactly-k uniform sample without replacement — deterministic in
    (seed, key), partition-invariant, any scale.

    ``Dataset.random_sample(fraction)`` gives a BINOMIAL size; training
    pipelines routinely need exactly k ("hold out 100k eval docs").
    Reduction: give every row a deterministic uniform draw keyed on
    (seed, hash(key)) and take the k smallest — which is exactly the
    budget prefix cut with score = -draw, unit tokens and budget = k.
    Inherits the driver/sort mode planner and the two-scalar streamed
    filter; returns the sampled rows with original columns."""
    import pyarrow.compute as _pc

    def draw(b: pa.Table) -> pa.Table:
        keys = b[key_col]
        if not pa.types.is_integer(keys.type):
            from ..determinism import hash_strings
            idx = hash_strings(_pc.cast(keys, pa.string()).to_numpy(
                zero_copy_only=False))
        else:
            idx = keys.to_numpy(zero_copy_only=False).astype(np.uint64)
        from ..determinism import uniform01
        u = uniform01(idx, seed, salt=0xA5)
        b = b.append_column("_samp_score", pa.array(-u, pa.float64()))
        return b.append_column("_samp_one",
                               pa.array(np.ones(b.num_rows, np.int64)))

    scored = ds.map_batches(draw, batch_format="pyarrow",
                            zero_copy_batch=True).materialize()
    out = select_token_budget(scored, k, score_col="_samp_score",
                              token_col="_samp_one", key_col=key_col,
                              mode=mode)
    return out.drop_columns(["_samp_score", "_samp_one"])


def select_token_budget(ds, budget: int, *, score_col: str,
                        token_col: str = "n_tokens",
                        key_col: str = "doc_id", mode: str = "auto"):
    """→ Dataset of the budget-selected prefix (all columns preserved):
    the documents with the highest ``score_col`` whose cumulative
    ``token_col`` (ties broken by ``key_col``) stays within ``budget``.
    One streamed filter against the two cut scalars."""
    cut = token_budget_cut(ds, budget, score_col=score_col,
                           token_col=token_col, key_col=key_col, mode=mode)
    if cut is None:
        return ds.map_batches(lambda b: b.slice(0, 0),
                              batch_format="pyarrow", zero_copy_batch=True)
    s_star, k_star = float(cut[0]), _py(cut[1])

    def keep(b: pa.Table) -> pa.Table:
        s, k = b[score_col], b[key_col]
        m = pc.or_(pc.greater(s, s_star),
                   pc.and_(pc.equal(s, s_star),
                           pc.less_equal(k, pa.scalar(k_star))))
        return b.filter(m)

    return ds.map_batches(keep, batch_format="pyarrow",
                          zero_copy_batch=True)
