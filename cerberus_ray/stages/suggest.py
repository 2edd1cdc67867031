"""Constraint suggestion: profile a table once, propose validation
rules, and apply them back — the Deequ "constraint suggestion" loop
(Schelter et al., VLDB 2018) re-expressed Ray-Data-first.

One streamed profiling pass (per-block pyarrow partials: null counts,
numeric min/max, string max length, capped distinct sets, row counts —
all mergeable, driver merge bounded by #columns × cap), then
driver-side heuristics:

- zero observed nulls            → ``not-null``
- numeric                        → ``range [min, max]`` (observed)
- ≤ ``enum_cap`` distinct values → ``enum`` domain
- string                         → ``max-length`` (observed)
- distinct == rows (exact below the cap, HLL-free)  → ``unique``

``apply_suggested_rules`` turns the suggestion table back into one
vectorized ``map_batches`` violation pass — by construction the
profiled data itself validates clean (the suggestion invariant,
tested), and rows violating any suggested bound are flagged with the
standard (doc_id, rule, path, detail) schema.

Reference anchor: the reference derives its rule set from Django model
declarations (cerberus/models/*.py field types, choices, max_length);
this stage derives the same RULE SHAPES from the data when no
declaration exists — SURVEY.md §2.9's extension surface.
"""

from __future__ import annotations

import json
from typing import Optional, Sequence

import numpy as np
import pandas as pd
import pyarrow as pa

from ..schema import VIOLATIONS

__all__ = ["suggest_rules", "apply_suggested_rules"]

#: at most this many distinct values for an enum-domain suggestion
_ENUM_CAP = 24
#: per-column distinct tracking stops (and unique/enum suggestions are
#: withheld) beyond this cap — keeps block partials bounded
_DISTINCT_CAP = 100_000


def suggest_rules(ds, *, columns: Optional[Sequence[str]] = None,
                  enum_cap: int = _ENUM_CAP,
                  distinct_cap: int = _DISTINCT_CAP) -> pd.DataFrame:
    """→ suggestion frame (column, rule, params, support) sorted by
    (column, rule). ``params`` is a JSON object string; ``support`` is
    the fraction of rows satisfying the rule in the profiled data
    (1.0 by construction for observed-bound rules)."""
    names = list(columns) if columns else [
        f for f in ds.schema().names]

    def partial(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        out = {"n_rows": [b.num_rows]}
        for c in names:
            col = b[c]
            out[f"nulls_{c}"] = [col.null_count]
            t = col.type
            if pa.types.is_integer(t) or pa.types.is_floating(t):
                v = col.drop_null()
                out[f"min_{c}"] = [pc.min(v).as_py() if len(v)
                                   else None]
                out[f"max_{c}"] = [pc.max(v).as_py() if len(v)
                                   else None]
            if pa.types.is_string(t) or pa.types.is_large_string(t):
                v = col.drop_null()
                out[f"maxlen_{c}"] = [
                    pc.max(pc.utf8_length(v)).as_py() if len(v)
                    else None]
            uniq = pc.unique(col.drop_null())
            if len(uniq) <= distinct_cap:
                out[f"distinct_{c}"] = [
                    json.dumps(sorted(str(x) for x in
                                      uniq.to_pylist()))]
            else:
                out[f"distinct_{c}"] = [None]   # over cap in ONE block
        return pa.Table.from_pydict(out)

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True).to_pandas()
    n = int(parts["n_rows"].sum())
    rows = []
    for c in names:
        nulls = int(parts[f"nulls_{c}"].sum())
        if nulls == 0 and n > 0:
            rows.append((c, "not-null", json.dumps({}), 1.0))
        # type flags come from which partials the ARROW batches emitted
        # (Dataset.schema() reports <class 'object'> for pandas-backed
        # string blocks; the map_batches arrow conversion is the truth)
        is_num = f"min_{c}" in parts.columns
        is_str = f"maxlen_{c}" in parts.columns
        if is_num and parts[f"min_{c}"].notna().any():
            lo = parts[f"min_{c}"].min()
            hi = parts[f"max_{c}"].max()
            rows.append((c, "range", json.dumps(
                {"min": float(lo), "max": float(hi)}), 1.0))
        if is_str and parts[f"maxlen_{c}"].notna().any():
            rows.append((c, "max-length", json.dumps(
                {"max_len": int(parts[f"maxlen_{c}"].max())}), 1.0))
        dser = parts[f"distinct_{c}"]
        if dser.notna().all():
            merged = sorted(set().union(
                *(json.loads(x) for x in dser)))
            if len(merged) <= distinct_cap:
                n_valid = n - nulls
                if len(merged) <= enum_cap and is_str:
                    rows.append((c, "enum",
                                 json.dumps({"values": merged}), 1.0))
                # exact uniqueness: distinct non-null == non-null rows
                # (only provable when every block stayed under cap AND
                # the merged set did too)
                if n_valid > 0 and len(merged) == n_valid:
                    rows.append((c, "unique", json.dumps({}), 1.0))
    out = pd.DataFrame(rows, columns=["column", "rule", "params",
                                      "support"])
    return out.sort_values(["column", "rule"]).reset_index(drop=True)


def apply_suggested_rules(ds, suggestions: pd.DataFrame, *,
                          key_col: str = "doc_id"):
    """→ violations Dataset from one vectorized pass of every
    suggested row-local rule (not-null / range / max-length / enum).
    ``unique`` suggestions are cross-row — route those through
    `uniqueness.duplicate_key_counts`; they are skipped here (and
    listed in the docstring contract)."""
    import ray

    local = suggestions[suggestions["rule"] != "unique"]
    spec = [(r["column"], r["rule"], json.loads(r["params"]))
            for _, r in local.iterrows()]
    ref = ray.put(spec)

    def check(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        rules = ray.get(ref)
        keys = pc.cast(b[key_col], pa.string()).to_numpy(
            zero_copy_only=False)
        ids, rids, paths, details = [], [], [], []

        def emit(mask: np.ndarray, rule: str, col: str, msg: str):
            idx = np.flatnonzero(mask)
            if not len(idx):
                return
            ids.append(keys[idx])
            rids.append(np.full(len(idx), rule, dtype=object))
            paths.append(np.full(len(idx), col, dtype=object))
            details.append(np.full(len(idx), msg, dtype=object))

        for col, rule, prm in rules:
            arr = b[col]
            if rule == "not-null":
                emit(pc.is_null(arr).to_numpy(zero_copy_only=False),
                     f"suggested-not-null-{col}", col, "null value")
            elif rule == "range":
                v = arr.to_numpy(zero_copy_only=False).astype(
                    "float64")
                with np.errstate(invalid="ignore"):
                    bad = (v < prm["min"]) | (v > prm["max"])
                emit(np.nan_to_num(bad.astype(bool), nan=False),
                     f"suggested-range-{col}", col,
                     f"outside [{prm['min']}, {prm['max']}]")
            elif rule == "max-length":
                ln = pc.utf8_length(pc.fill_null(arr, "")).to_numpy(
                    zero_copy_only=False)
                emit(ln > prm["max_len"],
                     f"suggested-maxlen-{col}", col,
                     f"longer than {prm['max_len']}")
            elif rule == "enum":
                vals = pc.cast(arr, pa.string()).to_numpy(
                    zero_copy_only=False)
                dom = np.array(prm["values"], dtype=object)
                pos = np.clip(np.searchsorted(dom, vals.astype(str)),
                              0, max(len(dom) - 1, 0))
                ok = (dom[pos] == vals) if len(dom) else np.zeros(
                    len(vals), bool)
                ok |= pc.is_null(arr).to_numpy(zero_copy_only=False)
                emit(~ok, f"suggested-enum-{col}", col,
                     "value outside suggested domain")
        if not ids:
            return VIOLATIONS.empty_table()
        return pa.Table.from_arrays(
            [pa.array(np.concatenate(ids), pa.string()),
             pa.array(np.concatenate(rids), pa.string()),
             pa.array(np.concatenate(paths), pa.string()),
             pa.array(np.concatenate(details), pa.string())],
            schema=VIOLATIONS)

    return ds.map_batches(check, batch_format="pyarrow",
                          zero_copy_batch=True)


def suggest_diff(old: pd.DataFrame, new: pd.DataFrame) -> pd.DataFrame:
    """Contract drift between two suggestion snapshots of the same
    table: which rules appeared, disappeared, or changed parameters —
    the RULE-level complement of `schema_check` (type drift) and
    `drift` (value drift). A disappeared 'not-null' means nulls
    arrived; a widened 'range' means new extremes; a changed 'enum'
    means new categories. → (column, rule, change, old_params,
    new_params) sorted; ``change`` ∈ {'added', 'removed', 'changed'}.
    """
    ko = {(r["column"], r["rule"]): r["params"]
          for _, r in old.iterrows()}
    kn = {(r["column"], r["rule"]): r["params"]
          for _, r in new.iterrows()}
    rows = []
    for k in sorted(set(ko) | set(kn)):
        if k not in kn:
            rows.append((*k, "removed", ko[k], None))
        elif k not in ko:
            rows.append((*k, "added", None, kn[k]))
        elif ko[k] != kn[k]:
            rows.append((*k, "changed", ko[k], kn[k]))
    return pd.DataFrame(rows, columns=["column", "rule", "change",
                                       "old_params", "new_params"])
