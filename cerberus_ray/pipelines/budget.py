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
import ray

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


def _draw_cols(b: pa.Table, key_col: str, seed: int) -> np.ndarray:
    """Deterministic uniform draw per key (pure in (seed, key))."""
    keys = b[key_col]
    if not pa.types.is_integer(keys.type):
        from ..determinism import hash_strings
        idx = hash_strings(pc.cast(keys, pa.string()).to_numpy(
            zero_copy_only=False))
    else:
        idx = keys.to_numpy(zero_copy_only=False).astype(np.uint64)
    from ..determinism import uniform01
    return uniform01(idx, seed, salt=0xA5)


def sample_exact_k_per_group(ds, k: int, *, group_col: str,
                             key_col: str = "doc_id", seed: int = 0,
                             mode: str = "auto"):
    """Stratified exactly-k sample: k uniform draws WITHOUT replacement
    from every ``group_col`` stratum (groups smaller than k are kept
    whole) — eval-set construction per language/source. Deterministic in
    (seed, key); partition-invariant.

    Per group the kept set is a prefix of the (draw asc, key asc) order,
    so it reduces to ONE cut pair per group. ``mode='driver'`` pulls the
    compact (group, draw, key) triplets and resolves cuts with one
    pandas pass (right below ~5M rows). ``mode='sort'`` (scale path)
    sorts by (group, draw, key) — groups occupy contiguous block
    ranges — then per-(block, group) summary rows let the driver locate
    each group's cut block and collect ONLY those boundary blocks
    (≤ #groups of them). The final filter broadcasts the O(#groups) cut
    map once. Strata are assumed domain-bounded (languages, sources)."""
    if mode not in ("auto", "driver", "sort"):
        raise ValueError(f"unknown mode {mode!r}")
    if k <= 0:
        raise ValueError("k must be >= 1")
    if mode == "auto":
        mode = "driver" if ds.count() <= _DRIVER_MAX_ROWS else "sort"

    def compact(b: pa.Table) -> pa.Table:
        return pa.Table.from_pydict({
            "g": b[group_col], "u": pa.array(_draw_cols(b, key_col, seed),
                                             pa.float64()),
            "key": b[key_col]})

    tri = ds.map_batches(compact, batch_format="pyarrow",
                         zero_copy_batch=True)

    if mode == "driver":
        pdf = tri.to_pandas().sort_values(["g", "u", "key"],
                                          kind="mergesort")
        top = pdf.groupby("g", sort=False).head(k)
        cuts = top.groupby("g", sort=False).tail(1)  # per-group last kept
        cut_map = {_py(r["g"]): (float(r["u"]), _py(r["key"]))
                   for _, r in cuts.iterrows()}
    else:
        srt = tri.sort(["g", "u", "key"]).materialize()

        def summary(b: pa.Table) -> pa.Table:
            """One row per (block, group-run): first/last (u, key) of
            the run plus its row count."""
            g = b["g"].to_numpy(zero_copy_only=False)
            if not len(g):
                e64 = pa.array([], pa.float64())
                return pa.Table.from_pydict(
                    {"g": b["g"], "u0": e64, "k0": b["key"],
                     "u1": e64, "k1": b["key"],
                     "n": pa.array([], pa.int64())})
            new = np.ones(len(g), dtype=bool)
            new[1:] = g[1:] != g[:-1]
            starts = np.flatnonzero(new)
            lasts = np.append(starts[1:] - 1, len(g) - 1)
            u = b["u"].to_numpy(zero_copy_only=False)
            return pa.Table.from_pydict({
                "g": b["g"].take(pa.array(starts)),
                "u0": pa.array(u[starts], pa.float64()),
                "k0": b["key"].take(pa.array(starts)),
                "u1": pa.array(u[lasts], pa.float64()),
                "k1": b["key"].take(pa.array(lasts)),
                "n": pa.array(lasts - starts + 1, pa.int64())})

        # runs of one group across blocks are ordered by their own first
        # (u, key) — the global sort is (g, u, key), so within a group
        # the run order IS the (u0, k0) order
        blk = (srt.map_batches(summary, batch_size=None,
                               batch_format="pyarrow",
                               zero_copy_batch=True).to_pandas()
               .sort_values(["g", "u0", "k0"], kind="mergesort"))
        cut_map = {}
        boundary = []  # (g, run row, remaining-in-run)
        for g, gg in blk.groupby("g", sort=False):
            cum = gg["n"].to_numpy().cumsum()
            if cum[-1] <= k:  # whole group fits: keep-all sentinel
                cut_map[_py(g)] = None
                continue
            ci = int(np.flatnonzero(cum > k)[0])
            rem = int(k - (cum[ci - 1] if ci else 0))
            if rem <= 0:  # cut ends exactly at the previous run's last row
                prev = gg.iloc[ci - 1]
                cut_map[_py(g)] = (float(prev["u1"]), _py(prev["k1"]))
            else:
                boundary.append((_py(g), gg.iloc[ci], rem))
        if boundary:
            want = [(g_, float(r["u0"]), _py(r["k0"]), float(r["u1"]),
                     _py(r["k1"])) for g_, r, _ in boundary]

            def grab(b: pa.Table) -> pa.Table:
                """Collect ONLY the cut runs' rows — each run lives in
                one block, so this is ≤ #groups block-sized slices."""
                g = b["g"].to_numpy(zero_copy_only=False)
                u = b["u"].to_numpy(zero_copy_only=False)
                ky = b["key"].to_numpy(zero_copy_only=False)
                m = np.zeros(len(g), dtype=bool)
                for g_, u0, k0, u1, k1 in want:
                    ge = (u > u0) | ((u == u0) & (ky >= k0))
                    le = (u < u1) | ((u == u1) & (ky <= k1))
                    m |= (g == g_) & ge & le
                return b.filter(pa.array(m))

            bp = (srt.map_batches(grab, batch_format="pyarrow",
                                  zero_copy_batch=True).to_pandas()
                  .sort_values(["g", "u", "key"], kind="mergesort"))
            for g_, _, rem in boundary:
                r = bp[bp["g"] == g_].iloc[rem - 1]
                cut_map[g_] = (float(r["u"]), _py(r["key"]))

    ref = ray.put(cut_map)

    def keep(b: pa.Table) -> pa.Table:
        cuts = ray.get(ref)
        g = b[group_col].to_numpy(zero_copy_only=False)
        u = _draw_cols(b, key_col, seed)
        keys = b[key_col].to_numpy(zero_copy_only=False)
        m = np.zeros(len(g), dtype=bool)
        for gg_, cut in cuts.items():
            sel = g == gg_
            if cut is None:  # whole group kept
                m |= sel
            else:
                u_star, k_star = cut
                m |= sel & ((u < u_star) |
                            ((u == u_star) & (keys <= k_star)))
        return b.filter(pa.array(m))

    return ds.map_batches(keep, batch_format="pyarrow",
                          zero_copy_batch=True)


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


def sample_exact_k_weighted(ds, k: int, *, weight_col: str,
                            key_col: str = "doc_id", seed: int = 0,
                            mode: str = "auto"):
    """Exactly-k WEIGHTED sample without replacement (Efraimidis &
    Spirakis 2006, A-ES): each row gets key u^(1/w) for a deterministic
    uniform u pure in (seed, key); the k LARGEST keys are the sample —
    inclusion probability rises with weight, the sample is exact-size,
    deterministic, and partition-invariant (all the
    :func:`sample_exact_k` guarantees, plus weights).

    Reduces to the budget prefix cut with score = log(u)/w (ascending ⇔
    u^(1/w) descending — the log form avoids float underflow at tiny
    weights), unit tokens and budget = k. Rows with weight ≤ 0 or null
    never enter the sample (score -inf ⇒ sorted last; they can only
    appear if fewer than k positive-weight rows exist)."""
    import pyarrow.compute as _pc

    def draw(b: pa.Table) -> pa.Table:
        u = _draw_cols(b, key_col, seed ^ 0x5EED)
        w = _pc.cast(b[weight_col], pa.float64()).to_numpy(
            zero_copy_only=False)
        w = np.nan_to_num(w, nan=0.0)
        with np.errstate(divide="ignore", invalid="ignore"):
            es = np.where(w > 0, np.log(u) / w, -np.inf)
        # budget cut keeps the HIGHEST score first: log(u)/w in (-inf, 0],
        # larger ⇔ larger u^(1/w)
        b = b.append_column("_samp_score", pa.array(es, pa.float64()))
        return b.append_column("_samp_one",
                               pa.array(np.ones(b.num_rows, np.int64)))

    scored = ds.map_batches(draw, batch_format="pyarrow",
                            zero_copy_batch=True).materialize()
    out = select_token_budget(scored, k, score_col="_samp_score",
                              token_col="_samp_one", key_col=key_col,
                              mode=mode)
    return out.drop_columns(["_samp_score", "_samp_one"])
