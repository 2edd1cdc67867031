"""Map-side combined grouped aggregation with a driver-side final merge.

The right plan when the GROUP CARDINALITY is small (weeks, types, langs,
months — bounded by the domain, not the data): each block produces one
partial row per group (pyarrow hash aggregate), and the driver merges
(#blocks × #groups) tiny rows with pandas. No Ray all-to-all — measured
~3 s fixed cost per groupby on this Ray version (BASELINE.md) — and the
pattern stays correct at any input size because the output is bounded.

For unbounded group keys (order ids, doc ids) use the uniqueness/shuffle
machinery instead.
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import pandas as pd
import pyarrow as pa


def grouped_agg(ds, group_cols: Sequence[str],
                aggs: Dict[str, Tuple[str, str]]) -> pd.DataFrame:
    """→ pandas frame: one row per group.

    ``aggs`` maps output column → (input column, fn) with fn ∈
    {count, sum, mean, min, max, geomean, hmean}. ``count`` counts
    rows (input column ignored). Means are merged exactly from (sum,
    non-null count) partials — SQL AVG ignores NULLs, so the divisor
    is the aggregated column's own non-null count, not the group's row
    count. ``geomean`` = exp(mean(ln x)) and ``hmean`` = n/Σ(1/x) run
    over non-null values via transformed-column partials (ln/
    reciprocal inside the block) — values must be positive; a zero
    yields geomean 0 / hmean 0 by limit convention.
    """
    group_cols = list(group_cols)
    pa_aggs: List[Tuple[str, str]] = []
    need_count = False
    transforms: Dict[str, Tuple[str, str]] = {}  # newcol -> (src, kind)
    for out_col, (col, fn) in aggs.items():
        if fn == "count":
            need_count = True
        elif fn == "mean":
            pa_aggs.append((col, "sum"))
            pa_aggs.append((col, "count"))  # non-null count (AVG divisor)
        elif fn == "geomean":
            t = f"__ln_{col}"
            transforms[t] = (col, "ln")
            pa_aggs.append((t, "sum"))
            pa_aggs.append((t, "count"))
        elif fn == "hmean":
            t = f"__inv_{col}"
            transforms[t] = (col, "inv")
            pa_aggs.append((t, "sum"))
            pa_aggs.append((t, "count"))
        elif fn in ("sum", "min", "max"):
            pa_aggs.append((col, fn))
        else:
            raise ValueError(f"unsupported agg {fn!r}")
    pa_aggs = sorted(set(pa_aggs))
    if need_count:
        pa_aggs.append(([], "count_all"))

    def partial(b: pa.Table) -> pa.Table:
        if transforms:
            import numpy as np
            import pyarrow.compute as pc
            for t, (src, kind) in transforms.items():
                v = b[src].to_numpy(zero_copy_only=False).astype(
                    "float64")
                with np.errstate(divide="ignore", invalid="ignore"):
                    x = np.log(v) if kind == "ln" else 1.0 / v
                arr = pa.array(x, pa.float64(),
                               from_pandas=False)
                if b[src].null_count:
                    arr = pc.if_else(pc.is_valid(b[src]), arr,
                                     pa.scalar(None, pa.float64()))
                b = b.append_column(t, arr)
        return b.group_by(group_cols).aggregate(pa_aggs)

    pdf = ds.map_batches(partial, batch_format="pyarrow",
                         zero_copy_batch=True).to_pandas()
    if not len(pdf):
        cols = group_cols + list(aggs)
        return pd.DataFrame({c: [] for c in cols})

    merge_plan = {}
    for col, fn in pa_aggs:
        if fn == "count_all":
            merge_plan["count_all"] = "sum"
        else:
            # partial sums AND partial counts both merge by summing
            merge_plan[f"{col}_{fn}"] = "sum" if fn in ("sum", "count") else fn
    g = pdf.groupby(group_cols, as_index=False, dropna=False).agg(merge_plan)

    out = g[group_cols].copy()
    for out_col, (col, fn) in aggs.items():
        if fn == "count":
            out[out_col] = g["count_all"].astype("int64")
        elif fn == "mean":
            # divide by the column's non-null count; a 0-count group
            # yields NaN, matching SQL AVG = NULL over all-NULL input
            out[out_col] = g[f"{col}_sum"] / g[f"{col}_count"].replace(0, pd.NA)
        elif fn == "sum":
            out[out_col] = g[f"{col}_sum"]
        elif fn == "geomean":
            import numpy as np
            t = f"__ln_{col}"
            cnt = g[f"{t}_count"].replace(0, pd.NA)
            out[out_col] = np.exp(
                (g[f"{t}_sum"] / cnt).astype("float64"))
        elif fn == "hmean":
            t = f"__inv_{col}"
            cnt = g[f"{t}_count"].replace(0, pd.NA)
            out[out_col] = (cnt / g[f"{t}_sum"]).astype("float64")
        else:
            out[out_col] = g[f"{col}_{fn}"]
    return out.sort_values(group_cols).reset_index(drop=True)


def mode_by(ds, group_col: str, value_col: str) -> pd.DataFrame:
    """Per-group modal value (most frequent; ties broken by SMALLEST
    value so both engines are deterministic) → frame
    (group_col, value_col, n).

    Bounded by the (group × value) DOMAIN like every aggregate in this
    module: per-block (group, value) count partials, driver merge,
    vectorized argmax via a stable sort + drop_duplicates. The SQL
    mirror is a counts CTE + ``ROW_NUMBER() OVER (PARTITION BY group
    ORDER BY cnt DESC, value ASC) = 1`` (tests/test_mode.py) — DuckDB's
    own ``mode()`` breaks ties arbitrarily, so the tie rule is explicit
    on both sides.
    """
    def partial(b: pa.Table) -> pa.Table:
        return b.group_by([group_col, value_col]).aggregate(
            [([], "count_all")])

    pdf = ds.map_batches(partial, batch_format="pyarrow",
                         zero_copy_batch=True).to_pandas()
    if not len(pdf):
        return pd.DataFrame({group_col: [], value_col: [], "n": []})
    # dropna=False: the Arrow partials keep NULL groups/values, and SQL
    # GROUP BY groups NULLs — the driver merge must not drop them
    g = (pdf.groupby([group_col, value_col], dropna=False, as_index=False)
         ["count_all"].sum())
    g = g.sort_values([group_col, "count_all", value_col],
                      ascending=[True, False, True], kind="mergesort")
    out = g.drop_duplicates(group_col).rename(columns={"count_all": "n"})
    out["n"] = out["n"].astype("int64")
    return out.reset_index(drop=True)


def approx_quantiles_by_group(ds, group_col: str, value_col: str, *,
                              qs: Sequence[float] = (0.25, 0.5, 0.75),
                              compression: float = 200.0,
                              round_digits: int = 4) -> pd.DataFrame:
    """Per-group approximate quantiles via mergeable t-digests → frame
    (group_col, q25/q50/... one column per requested quantile).

    One digest per (block, group) — same contract as
    ``uniqueness.approx_distinct_by_group``: no shuffle, the driver
    merges O(#blocks × #groups) KB-sized sketches, bounded by the group
    DOMAIN. The sketch-path analogue of the exact domain-bounded
    histogram quantiles (``relational.q_events_quantiles``); rank
    accuracy is the t-digest contract (tested against exact quantiles).
    """
    import numpy as np

    from ..state.tdigest import TDigest

    def sketch(batch: pa.Table) -> pa.Table:
        t = batch.select([group_col, value_col])
        gi = t[group_col].to_numpy(zero_copy_only=False)
        vals = t[value_col].to_numpy(zero_copy_only=False).astype(float)
        ok = ~np.isnan(vals)
        gi, vals = gi[ok], vals[ok]
        order = np.argsort(gi.astype(str), kind="stable")
        gs, vs = gi[order], vals[order]
        starts = np.flatnonzero(
            np.r_[True, gs[1:] != gs[:-1]]) if len(gs) else []
        bounds = list(starts) + [len(gs)]
        groups, origs, payloads = [], [], []
        for i in range(len(bounds) - 1):
            d = TDigest(compression=compression)
            d.update(vs[bounds[i]:bounds[i + 1]])
            groups.append(str(gs[bounds[i]]))
            origs.append(gs[bounds[i]])
            payloads.append(d.to_bytes())
        # the string form keys the sketch dict; the ORIGINAL value rides
        # along so the output keeps the group column's dtype (a
        # stringified int group used to sort '10' < '2' and never join
        # back against grouped_agg output)
        return pa.Table.from_pydict({
            "g": pa.array(groups, pa.string()),
            "orig": pa.array(origs),
            "sketch": pa.array(payloads, pa.binary())})

    parts = ds.map_batches(sketch, batch_format="pyarrow",
                           zero_copy_batch=True).to_pandas()
    acc: Dict[str, TDigest] = {}
    orig: Dict[str, object] = {}
    for _, r in parts.iterrows():
        d = TDigest.from_bytes(r["sketch"])
        if r["g"] in acc:
            acc[r["g"]].merge(d)
        else:
            acc[r["g"]] = d
            orig[r["g"]] = r["orig"]
    keys = sorted(acc)
    out = pd.DataFrame({group_col: [orig[g] for g in keys]})
    for q in qs:
        out[f"q{int(round(q * 100))}"] = [
            round(float(acc[g].quantile(q)), round_digits)
            for g in keys]
    return (out.sort_values(group_col, kind="mergesort")
            .reset_index(drop=True))


def _rollup_levels(cols: Sequence[str]) -> List[Tuple[str, ...]]:
    return [tuple(cols[:i]) for i in range(len(cols), -1, -1)]


def _cube_levels(cols: Sequence[str]) -> List[Tuple[str, ...]]:
    from itertools import combinations

    out: List[Tuple[str, ...]] = []
    for r in range(len(cols), -1, -1):
        out.extend(combinations(cols, r))
    return out


def rollup_agg(ds, group_cols: Sequence[str],
               aggs: Dict[str, Tuple[str, str]], *, cube: bool = False,
               grouping_id: bool = False,
               sets: Sequence[Sequence[str]] | None = None) -> pd.DataFrame:
    """SQL ``GROUP BY ROLLUP`` (or ``CUBE``, or arbitrary ``GROUPING
    SETS`` via ``sets=[("a","b"), ("a",), ()]``) — the requested
    subtotal levels, rolled-up group columns emitted as SQL NULLs.

    One streamed partial pass at the FINEST granularity (the same
    per-block pyarrow hash aggregate as :func:`grouped_agg`); every
    coarser level is then an exact driver-side re-aggregation of those
    partials — count/sum re-sum, min/max re-extremize, mean re-derives
    from its (sum, non-null count) partials — so the data is read ONCE
    and the driver cost is #levels × (#blocks × #finest-groups) tiny
    rows, bounded by the group domain like every other
    bounded-cardinality aggregate in this module.

    ``grouping_id=True`` appends the SQL GROUPING_ID bitmask (first
    group column = most significant bit; 1 = rolled up), which
    disambiguates subtotal rows from genuine NULL group values.
    """
    group_cols = list(group_cols)
    if not group_cols:
        raise ValueError("group_cols must be non-empty")
    pa_aggs: List[Tuple[str, str]] = []
    need_count = False
    for out_col, (col, fn) in aggs.items():
        if fn == "count":
            need_count = True
        elif fn == "mean":
            pa_aggs.append((col, "sum"))
            pa_aggs.append((col, "count"))
        elif fn in ("sum", "min", "max"):
            pa_aggs.append((col, fn))
        else:
            raise ValueError(f"unsupported agg {fn!r}")
    pa_aggs = sorted(set(pa_aggs))
    if need_count:
        pa_aggs.append(([], "count_all"))

    def partial(b: pa.Table) -> pa.Table:
        return b.group_by(group_cols).aggregate(pa_aggs)

    pdf = ds.map_batches(partial, batch_format="pyarrow",
                         zero_copy_batch=True).to_pandas()
    out_cols = group_cols + list(aggs) + (["grouping_id"] if grouping_id
                                          else [])
    if not len(pdf):
        return pd.DataFrame({c: [] for c in out_cols})

    merge_plan = {}
    for col, fn in pa_aggs:
        if fn == "count_all":
            merge_plan["count_all"] = "sum"
        else:
            merge_plan[f"{col}_{fn}"] = ("sum" if fn in ("sum", "count")
                                         else fn)

    if sets is not None:
        levels = []
        for s in sets:
            t = tuple(s)
            unknown = set(t) - set(group_cols)
            if unknown:
                raise ValueError(f"grouping set {t} has columns not in "
                                 f"group_cols: {sorted(unknown)}")
            levels.append(t)
        if not levels:
            raise ValueError("sets must contain at least one grouping set")
    else:
        levels = (_cube_levels(group_cols) if cube
                  else _rollup_levels(group_cols))
    frames = []
    for lv in levels:
        if lv:
            g = pdf.groupby(list(lv), as_index=False,
                            dropna=False).agg(merge_plan)
        else:  # grand total
            g = pdf.agg(merge_plan).to_frame().T
        row = pd.DataFrame(index=g.index)
        for c in group_cols:
            row[c] = g[c] if c in lv else None
        for out_col, (col, fn) in aggs.items():
            if fn == "count":
                row[out_col] = g["count_all"].astype("int64")
            elif fn == "mean":
                row[out_col] = (g[f"{col}_sum"]
                                / g[f"{col}_count"].replace(0, pd.NA))
            elif fn == "sum":
                row[out_col] = g[f"{col}_sum"]
            else:
                row[out_col] = g[f"{col}_{fn}"]
        if grouping_id:
            gid = sum(1 << (len(group_cols) - 1 - i)
                      for i, c in enumerate(group_cols) if c not in lv)
            row["grouping_id"] = gid
        frames.append(row)
    out = pd.concat(frames, ignore_index=True)
    sort_cols = (["grouping_id"] if grouping_id else []) + group_cols
    if not grouping_id:
        # deterministic order without the bitmask: coarser levels last
        out["_nulls"] = out[group_cols].isna().sum(axis=1)
        sort_cols = ["_nulls"] + group_cols
    out = (out.sort_values(sort_cols, na_position="last",
                           kind="mergesort").reset_index(drop=True))
    return out.drop(columns=["_nulls"]) if not grouping_id else out


def grouped_first_last(ds, group_cols: Sequence[str],
                       order_cols: Sequence[str],
                       value_cols: Sequence[str]) -> pd.DataFrame:
    """Grouped arg-extremal aggregate: per group, each value column at
    the FIRST and LAST row in ``order_cols`` order (SQL
    FIRST_VALUE/LAST_VALUE over the whole partition, or arg_min /
    arg_max). ``order_cols`` must totally order rows within a group —
    include a unique tiebreak column — or the result is
    arrival-order-dependent.

    Algebraic like the rest of this module: each block emits its own
    per-group first and last rows (2 × groups-per-block partials), the
    driver re-runs the identical extremal selection over the partials.
    Bounded-cardinality groups only.

    → frame: group_cols + first_<v> / last_<v> per value column,
    sorted by group."""
    group_cols, order_cols = list(group_cols), list(order_cols)
    value_cols = list(value_cols)
    need = list(dict.fromkeys(group_cols + order_cols + value_cols))

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        s = df[need].sort_values(group_cols + order_cols,
                                 kind="mergesort")
        f = s.drop_duplicates(group_cols, keep="first")
        la = s.drop_duplicates(group_cols, keep="last")
        return pd.concat([f.assign(__kind=0), la.assign(__kind=1)],
                         ignore_index=True)

    pdf = ds.map_batches(partial, batch_format="pandas").to_pandas()
    if not len(pdf):
        cols = group_cols + [f"{w}_{v}" for v in value_cols
                             for w in ("first", "last")]
        return pd.DataFrame({c: [] for c in cols})
    s = pdf.sort_values(group_cols + order_cols, kind="mergesort")
    f = (s[s["__kind"] == 0].drop_duplicates(group_cols, keep="first")
         .set_index(group_cols))
    la = (s[s["__kind"] == 1].drop_duplicates(group_cols, keep="last")
          .set_index(group_cols))
    out = f.index.to_frame(index=False)
    for v in value_cols:
        out[f"first_{v}"] = f[v].to_numpy()
        out[f"last_{v}"] = la[v].reindex(f.index).to_numpy()
    return (out.sort_values(group_cols).reset_index(drop=True))


def grouped_approx_distinct(ds, group_col: str, value_col: str, *,
                            p: int = 12, mode: str = "driver",
                            n_buckets: int = 32) -> pd.DataFrame:
    """Per-group approximate COUNT(DISTINCT value) via one HyperLogLog
    sketch per group — the scale path when BOTH the group count and the
    per-group value cardinality are unbounded (the exact grouped
    distinct of events_users_per_type shuffles every (group, value)
    pair; this ships #groups × 2^p bytes instead, error ≈ 1.04/√2^p).

    Per-block partial: one vectorized scatter-max into a
    (#block-groups × 2^p) register matrix (no per-group Python), one
    binary register row per (block, group). Merge is elementwise max —
    commutative/associative, so the estimate is BIT-IDENTICAL across
    block layouts and retries (unlike sampled estimators).
    ``mode='driver'`` reduceat-merges the partials on the driver
    (#groups × #blocks rows); ``'shuffle'`` routes them through one
    hash-bucketed keyed exchange. → (group, approx_distinct) sorted.
    """
    import numpy as np

    from ..determinism import hash_strings, splitmix64
    from ..state.hll import HyperLogLog
    from .keyed_window import keyed_apply

    if mode not in ("driver", "shuffle"):
        raise ValueError(f"unknown mode {mode!r}")
    m = 1 << p

    def partial(b: pa.Table) -> pa.Table:
        v = b[value_col].to_numpy(zero_copy_only=False)
        g = b[group_col].to_numpy(zero_copy_only=False)
        uniq, codes = np.unique(g, return_inverse=True)
        # SQL COUNT(DISTINCT v) skips NULLs (the exact twins and the
        # KMV sketch agree) — mask null values but keep their GROUPS,
        # so an all-null group still reports distinct ≈ 0
        ok = ~pd.isna(v)
        v, codes = v[ok], codes[ok]
        if v.dtype.kind in "iu":
            h = splitmix64(v.astype(np.uint64))
        else:
            # any non-integer dtype hashes by its string form (floats,
            # dates, objects) — deterministic and dtype-safe
            h = hash_strings(np.asarray(v.astype(str), dtype=object))
        idx = (h & np.uint64(m - 1)).astype(np.int64)
        w = h >> np.uint64(p)
        bl = np.frexp(w.astype(np.float64))[1]
        rank = np.clip(64 - p - bl + 1, 1, 64).astype(np.uint8)
        regs = np.zeros((len(uniq), m), dtype=np.uint8)
        np.maximum.at(regs, (codes, idx), rank)
        return pa.Table.from_pydict({
            "g": pa.array(uniq),
            "regs": pa.array([r.tobytes() for r in regs],
                             pa.binary())})

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True)

    def merge_frame(pdf: pd.DataFrame) -> pd.DataFrame:
        """Vectorized per-group register max + per-group estimate."""
        pdf = pdf.sort_values("g", kind="mergesort")
        stack = np.frombuffer(b"".join(pdf["regs"]), dtype=np.uint8
                              ).reshape(len(pdf), m)
        gv = pdf["g"].to_numpy()
        starts = np.flatnonzero(np.r_[True, gv[1:] != gv[:-1]])
        merged = np.maximum.reduceat(stack, starts, axis=0)
        ests = []
        for row in merged:
            s = HyperLogLog(p)
            s.registers = row.copy()
            ests.append(s.estimate())
        return pd.DataFrame({group_col: gv[starts],
                             "approx_distinct": np.asarray(
                                 ests, dtype="float64")})

    if mode == "driver":
        pdf = parts.to_pandas()
        if not len(pdf):
            return pd.DataFrame({group_col: [], "approx_distinct": []})
        out = merge_frame(pdf)
    else:
        res = keyed_apply(parts, "g", merge_frame,
                          n_buckets=n_buckets).to_pandas()
        if not len(res):
            return pd.DataFrame({group_col: [], "approx_distinct": []})
        out = res.sort_values(group_col, kind="mergesort")
    return out.reset_index(drop=True)
