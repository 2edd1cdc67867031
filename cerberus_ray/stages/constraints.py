"""Cross-row dataset constraints — functional dependency and per-key
ordering checks, emitting standard violation rows.

Two constraint classes the per-row rule families cannot express:

- ``functional_dependency_violations``: A → B (every value of the
  determinant column maps to exactly one dependent value — the
  denormalization-consistency check; e.g. nation → region, sku → unit
  price). Ray shape: per-block DISTINCT (A, B) pairs via one pyarrow
  hash-aggregate (the map-side combine — block output is bounded by the
  pair universe, not rows), then a driver merge (``mode='driver'``,
  right while distinct pairs fit) or a ``groupby(A)`` distinct-count
  shuffle that filters to violating determinants BEFORE collecting
  (``mode='shuffle'``). Violating keys broadcast back for the row-level
  violation pass, ∝ violation rate.
- ``monotonic_violations``: within each key, a sequence column must be
  non-decreasing (or strictly increasing) in a given order column —
  the event-stream sanity check (per-user timestamps, per-device
  counters). Ray shape: the `keyed_window.keyed_apply` exchange — one
  hash-bucketed keyed exchange, vectorized diff per bucket with
  group-boundary masks; no per-key Python.

Both are SQL-expressible (GROUP BY / LAG) — the parity tests compare
against DuckDB on the same frames.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from ..schema import VIOLATIONS

__all__ = ["functional_dependency_violations", "monotonic_violations"]


def functional_dependency_violations(ds, det_col: str, dep_col: str, *,
                                     key_col: str = "doc_id",
                                     mode: str = "driver",
                                     rule: str | None = None):
    """→ violations Dataset: one row per input row whose ``det_col``
    value maps to >1 distinct ``dep_col`` value corpus-wide."""
    if mode not in ("driver", "shuffle"):
        raise ValueError(f"unknown mode {mode!r}")
    rule = rule or f"fd-{det_col}->{dep_col}"

    def pairs(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        t = pa.Table.from_arrays(
            [pc.cast(b[det_col], pa.string()),
             pc.cast(b[dep_col], pa.string())], names=["a", "bb"])
        return t.group_by(["a", "bb"]).aggregate([])

    parts = ds.map_batches(pairs, batch_format="pyarrow",
                           zero_copy_batch=True)
    if mode == "driver":
        pdf = parts.to_pandas()
        if not len(pdf):
            bad = np.array([], dtype=object)
        else:
            nun = pdf.drop_duplicates().groupby("a")["bb"].nunique()
            bad = np.sort(nun[nun > 1].index.to_numpy(dtype=object))
    else:
        # distinct (a,b) pairs may recur across blocks: re-distinct on
        # the PAIR first, then count dependents per determinant; only
        # violating determinants are ever collected
        dedup = parts.groupby(["a", "bb"]).count()

        def drop_cnt(t: pa.Table) -> pa.Table:
            return t.select(["a"])

        merged = (dedup.map_batches(drop_cnt, batch_format="pyarrow")
                  .groupby("a").count())

        def only_bad(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc
            return t.filter(pc.greater(t["count()"], 1)).select(["a"])

        pdf = merged.map_batches(only_bad, batch_format="pyarrow") \
            .to_pandas()
        bad = (np.sort(pdf["a"].to_numpy(dtype=object))
               if "a" in pdf.columns and len(pdf)
               else np.array([], dtype=object))

    ref = ray.put(bad)

    def flag(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        bk = ray.get(ref)
        if not len(bk):
            return VIOLATIONS.empty_table()
        a = pc.cast(b[det_col], pa.string()).to_numpy(zero_copy_only=False)
        pos = np.clip(np.searchsorted(bk, a), 0, len(bk) - 1)
        hit = bk[pos] == a
        if not hit.any():
            return VIOLATIONS.empty_table()
        keys = pc.cast(b[key_col], pa.string()).to_numpy(
            zero_copy_only=False)[hit]
        dep = pc.cast(b[dep_col], pa.string()).to_numpy(
            zero_copy_only=False)[hit]
        det = a[hit]
        return pa.Table.from_arrays([
            pa.array(keys, pa.string()),
            pa.array(np.full(len(keys), rule, dtype=object), pa.string()),
            pa.array(np.full(len(keys), dep_col, dtype=object),
                     pa.string()),
            pa.array([f"{d!s} maps to multiple {dep_col} values "
                      f"(saw {v!s})" for d, v in zip(det, dep)],
                     pa.string())], schema=VIOLATIONS)

    return ds.map_batches(flag, batch_format="pyarrow",
                          zero_copy_batch=True)


def monotonic_violations(ds, key_col: str, order_col: str, value_col: str,
                         *, strict: bool = False, id_col: str = "doc_id",
                         rule: str | None = None, n_buckets: int = 8):
    """→ violations Dataset: one row per element whose ``value_col``
    decreases (or fails to strictly increase) relative to the previous
    element of the same ``key_col`` when ordered by ``order_col`` (ties
    broken by ``id_col`` for determinism)."""
    from .keyed_window import keyed_apply

    rule = rule or (f"monotonic-{value_col}-strict" if strict
                    else f"monotonic-{value_col}")

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key_col, order_col, id_col],
                            kind="mergesort").reset_index(drop=True)
        k = df[key_col].to_numpy()
        v = df[value_col].to_numpy()
        same = np.zeros(len(df), dtype=bool)
        same[1:] = k[1:] == k[:-1]
        prev = np.roll(v, 1)
        bad = same & ((v < prev) if not strict else (v <= prev))
        out = df.loc[bad, [id_col]].copy()
        out["rule"] = rule
        out["path"] = value_col
        pv = prev[bad]
        cv = v[bad]
        out["detail"] = [f"{c} after {p} within {key_col}"
                         for c, p in zip(cv, pv)]
        out = out.rename(columns={id_col: "doc_id"})
        out["doc_id"] = out["doc_id"].astype(str)
        return out[["doc_id", "rule", "path", "detail"]]

    return keyed_apply(ds, key_col, kernel, n_buckets=n_buckets)


def denial_constraint_violations(ds, eq_cols, a_col: str, b_col: str, *,
                                 b_op: str = "<", id_col: str = "doc_id",
                                 rule: str | None = None,
                                 n_buckets: int = 32):
    """Denial-constraint check (Holoclean-style): no two rows agreeing
    on every ``eq_cols`` column may satisfy ``t1.a > t2.a AND t1.b
    <b_op> t2.b`` — e.g. "no customer may place a LATER order with a
    SMALLER total". → violations Dataset flagging every row that
    participates in at least one violating pair (either side).

    ``b_op`` ∈ {'<', '>', '!='} (the a-atom is always the strict '>';
    swap a/b or negate a column for other orientations). NULLs in
    a/b never satisfy a comparison atom (SQL semantics).

    Scale shape: one hash-bucketed keyed exchange on the composite
    equality key (`keyed_window.keyed_apply` — every eq-group lands
    whole in one bucket), then a VECTORIZED no-pairs kernel: rows sort
    by (group, a); running prefix/suffix extrema of b taken at the
    previous/next distinct-a block boundary decide each row's
    violation in O(g log g) per group — never the O(g²) self-join the
    SQL oracle runs. Reference analogue: the cross-booking conflict
    predicates of /root/reference/cerberus/models/booking.py.
    """
    if b_op not in ("<", ">", "!="):
        raise ValueError(f"unknown b_op {b_op!r}")
    eq_cols = [eq_cols] if isinstance(eq_cols, str) else list(eq_cols)
    rule = rule or f"dc-{'+'.join(eq_cols)}-{a_col}>-{b_col}{b_op}"
    _KEY = "__dc_key"

    def add_key(b: pa.Table) -> pa.Table:
        cols = [np.asarray(b[c].to_numpy(zero_copy_only=False),
                           dtype=object) for c in eq_cols]
        if len(cols) == 1:
            key = cols[0].astype(str)
        else:
            key = np.char.add(cols[0].astype(str), "\x1e")
            for c in cols[1:-1]:
                key = np.char.add(np.char.add(key, c.astype(str)),
                                  "\x1e")
            key = np.char.add(key, cols[-1].astype(str))
        return b.append_column(_KEY, pa.array(key.astype(str)))

    keyed = ds.map_batches(add_key, batch_format="pyarrow",
                           zero_copy_batch=True)

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        df = df[[_KEY, id_col, a_col, b_col]].dropna(
            subset=[a_col, b_col])
        if not len(df):
            return pd.DataFrame({"doc_id": pd.Series([], dtype=str),
                                 "rule": [], "path": [], "detail": []})
        df = df.sort_values([_KEY, a_col, id_col],
                            kind="mergesort").reset_index(drop=True)
        g = df[_KEY].to_numpy()
        a = df[a_col].to_numpy()
        b = df[b_col].to_numpy()
        n = len(df)
        new_grp = np.ones(n, dtype=bool)
        new_grp[1:] = g[1:] != g[:-1]
        new_blk = new_grp.copy()
        new_blk[1:] |= a[1:] != a[:-1]
        gcodes = np.cumsum(new_grp) - 1
        gs = pd.Series(b)
        gb = gs.groupby(gcodes)
        cmax = gb.cummax().to_numpy()
        cmin = gb.cummin().to_numpy()
        # suffix extrema: cummax/cummin over the reversed rows (group
        # codes are symmetric under reversal of the whole frame)
        rmax = gs[::-1].groupby(gcodes[::-1]).cummax()[::-1].to_numpy()
        rmin = gs[::-1].groupby(gcodes[::-1]).cummin()[::-1].to_numpy()
        # value of the running extrema at the END of the previous
        # distinct-a block (strictly-smaller-a witness set), and at the
        # START of the next block (strictly-larger-a witness set)
        blk_id = np.cumsum(new_blk) - 1
        starts = np.flatnonzero(new_blk)
        n_blk = len(starts)
        ends = np.empty(n_blk, dtype=np.int64)
        ends[:-1] = starts[1:] - 1
        ends[-1] = n - 1
        has_prev = ~new_grp[starts]          # prev block in same group
        has_next = np.zeros(n_blk, dtype=bool)
        has_next[:-1] = ~new_grp[starts[1:]]
        pre_max = np.where(has_prev, cmax[starts - 1], np.nan)[blk_id]
        pre_min = np.where(has_prev, cmin[starts - 1], np.nan)[blk_id]
        nxt = np.minimum(ends + 1, n - 1)
        suf_max = np.where(has_next, rmax[nxt], np.nan)[blk_id]
        suf_min = np.where(has_next, rmin[nxt], np.nan)[blk_id]
        hp = has_prev[blk_id]
        hn = has_next[blk_id]
        with np.errstate(invalid="ignore"):
            if b_op == "<":
                bad = (hp & (pre_max > b)) | (hn & (suf_min < b))
            elif b_op == ">":
                bad = (hp & (pre_min < b)) | (hn & (suf_max > b))
            else:  # "!=": any strictly-smaller/larger-a row with b' != b
                bad = (hp & ((pre_min != b) | (pre_max != b))
                       ) | (hn & ((suf_min != b) | (suf_max != b)))
        out = df.loc[bad, [id_col]].copy()
        out["rule"] = rule
        out["path"] = f"{a_col},{b_col}"
        wit = np.where(hp, pre_max if b_op == "<" else pre_min, suf_min
                       if b_op == "<" else suf_max)[bad]
        out["detail"] = [f"{b_col}={v} conflicts with {w} in "
                         f"{'+'.join(eq_cols)} group"
                         for v, w in zip(b[bad], wit)]
        out = out.rename(columns={id_col: "doc_id"})
        out["doc_id"] = out["doc_id"].astype(str)
        return out[["doc_id", "rule", "path", "detail"]]

    from .keyed_window import keyed_apply

    return keyed_apply(keyed, _KEY, kernel, n_buckets=n_buckets)


def conditional_fd_violations(ds, det_col: str, dep_col: str,
                              condition: dict, *,
                              key_col: str = "doc_id",
                              mode: str = "driver",
                              rule: str | None = None):
    """Conditional functional dependency (Bohannon et al. 2007): the FD
    ``det_col → dep_col`` must hold only among rows matching the
    pattern tableau ``condition`` ({col: constant, ...} — all equality
    atoms must match; rows outside the pattern are exempt). → the same
    violations Dataset as `functional_dependency_violations`, flagging
    every MATCHING row whose determinant maps to >1 dependent value
    within the matching subset.

    Scale shape: the pattern filter is pushed into the per-block
    distinct-pair partial (the same map-side combine as the
    unconditional FD; filtering before the pair census shrinks the
    exchange, never grows it). SQL parity in tests/test_constraints.py.
    """
    if not condition:
        raise ValueError("empty condition: use "
                         "functional_dependency_violations")
    rule = rule or (
        "cfd-" + ",".join(f"{c}={v}" for c, v in sorted(
            condition.items())) + f":{det_col}->{dep_col}")

    def matching(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        m = None
        for c, v in condition.items():
            e = pc.equal(b[c], pa.scalar(v))
            e = pc.fill_null(e, False)
            m = e if m is None else pc.and_(m, e)
        return b.filter(m)

    sub = ds.map_batches(matching, batch_format="pyarrow",
                         zero_copy_batch=True)
    return functional_dependency_violations(
        sub, det_col, dep_col, key_col=key_col, mode=mode, rule=rule)
