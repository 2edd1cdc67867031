"""Uniqueness rules (exact + sketched).

Exact path re-creates what the reference delegates to DB unique indexes
(unique_together: cerberus/models/booking.py:50,266, contact.py:43,
service.py:29; duplicate insert → IntegrityError,
cerberus/tests/test_bookings.py:108-117):

    per-batch partial value_counts (pyarrow hash-aggregate)
      → groupby(key).sum over the partials  (shuffle of UNIQUE keys only,
        never of full rows — the map-side combine is the salted-key-safe
        version of the DB's global B-tree)
      → keys with total count > 1 become one violation row per key.

Sketch path (north_rule, 10^12-doc scale): per-batch HyperLogLog, merged
via a tiny reduce — gives an approximate distinct count whose disagreement
with the row count flags duplicate-heavy partitions without any shuffle.
"""

from __future__ import annotations

from typing import List, Sequence

import numpy as np
import pyarrow as pa

from ..rules import details as D
from ..schema import VIOLATIONS
from ..state.hll import HyperLogLog


def _partial_counts(batch: pa.Table, keys: Sequence[str]) -> pa.Table:
    t = batch.select(list(keys))
    return t.group_by(list(keys)).aggregate([([], "count_all")])


def _key_strings_col(batch: pa.Table, keys: Sequence[str]):
    import pyarrow.compute as pc

    cols = [pc.cast(batch[k], pa.string()) for k in keys]
    if len(cols) == 1:
        return cols[0]
    return pc.binary_join_element_wise(*cols, "\x1f")


def duplicate_key_counts(ds, keys: Sequence[str], *, mode: str = "auto",
                         cms_width: int = 0,
                         n_rows_hint: int = 0) -> pa.Table:
    """(key cols..., n) for every key tuple appearing more than once.

    Execution mode selection (mode='auto'), mirroring a broadcast-vs-
    shuffle join planner:

    - 'driver' (≤ ~5M rows): per-block exact partial counts (pyarrow
      hash-aggregate) stream to the driver and merge there. No shuffle,
      no sketch; the driver holds one row per distinct key.
    - 'cms' (> 5M rows): two passes, NO keyed shuffle —
      1. a Count-Min sketch per block (width sized to the input, so
         sketch traffic ∝ data, not a fixed 32 MB per block), merged on
         the driver;
      2. per-block exact partial counts filtered to keys whose CMS
         estimate is ≥ 2 (a superset of true duplicates — CMS never
         undercounts); only candidates reach the driver merge, which
         drops false candidates by their true global count. Exact.
    - 'shuffle': map-side combined partial counts → groupby(keys) — the
      10^12-key path (CMS saturates, candidates stop being rare); high
      fixed cost that amortizes on genuinely big inputs.
    - 'hash2': two-pass hash-only variant of 'hash' — pass 1 ships
      16 B/key (int64 hash + count), pass 2 fetches key columns for
      candidate duplicate hashes only; for the band where key STRINGS
      dominate driver transfer.
    """
    keys = list(keys)
    import pandas as pd

    if mode == "auto":
        n = n_rows_hint or ds.count()
        # planner: tiny inputs merge raw partials on the driver; mid-scale
        # merges fixed-width int64 HASH counts on the driver (numpy C
        # speed, ~8 bytes/key) and verifies only hash-duplicate
        # candidates; beyond driver memory (~200M distinct) shuffle.
        mode = ("driver" if n <= 200_000
                else "hash" if n <= 200_000_000 else "shuffle")
    if not cms_width:
        cms_width = 1 << 20

    if mode == "driver":
        partials = ds.map_batches(
            lambda b: _partial_counts(b, keys), batch_format="pyarrow",
            zero_copy_batch=True).to_pandas()
        if "count_all" not in partials.columns or len(partials) == 0:
            pdf = pd.DataFrame({k: pd.Series(dtype=object) for k in keys}
                               | {"n": pd.Series(dtype="int64")})
            return pa.Table.from_pandas(pdf[keys + ["n"]], preserve_index=False)
        g = partials.groupby(keys, as_index=False, dropna=False)["count_all"].sum()
        g = g[g["count_all"] > 1].rename(columns={"count_all": "n"})
        g = g.sort_values(keys).reset_index(drop=True)
        return pa.Table.from_pandas(g[keys + ["n"]], preserve_index=False)

    if mode == "hash":
        # Single pass: per-block pyarrow hash-aggregate → (h=hash(key),
        # key cols..., c) partial rows. The driver merges on the int64
        # hashes with numpy sort+reduceat (C speed, GIL-friendly) and
        # touches key strings ONLY inside duplicate hash groups (rare).
        # Hash collisions between distinct keys are resolved exactly by a
        # per-group key comparison on the (tiny) duplicate subset.
        import ray  # noqa: F401

        from ..determinism import hash_strings

        def hash_partials(batch: pa.Table) -> pa.Table:
            part = _partial_counts(batch, keys)
            h = hash_strings(_key_strings_col(part, keys)).view(np.int64)
            return part.append_column("h", pa.array(h))

        import ray as _ray

        blocks = [t for t in _ray.get(ds.map_batches(
            hash_partials, batch_format="pyarrow", zero_copy_batch=True
        ).to_arrow_refs()) if t.num_rows]
        if not blocks:
            pdf = pd.DataFrame({k: pd.Series(dtype=object) for k in keys}
                               | {"n": pd.Series(dtype="int64")})
            return pa.Table.from_pandas(pdf[keys + ["n"]], preserve_index=False)
        part = pa.concat_tables(blocks)
        all_h = part["h"].to_numpy()
        all_c = part["count_all"].to_numpy(zero_copy_only=False)
        order = np.argsort(all_h)
        h_s, c_s = all_h[order], all_c[order]
        # a hash belongs to a duplicate group iff it equals a neighbour in
        # sorted order (cross-block dup) or its partial count is >= 2
        # (in-block dup) — no per-group reduction over the ~all-singleton
        # group array needed
        n = len(h_s)
        in_dup = c_s >= 2
        if n > 1:
            eq = h_s[1:] == h_s[:-1]
            in_dup[:-1] |= eq
            in_dup[1:] |= eq
        if not in_dup.any():
            pdf = pd.DataFrame({k: pd.Series(dtype=object) for k in keys}
                               | {"n": pd.Series(dtype="int64")})
            return pa.Table.from_pandas(pdf[keys + ["n"]], preserve_index=False)
        sub = part.take(pa.array(order[np.flatnonzero(in_dup)]))
        g = sub.to_pandas().groupby(keys, as_index=False, dropna=False)["count_all"].sum()
        g = g[g["count_all"] > 1].rename(columns={"count_all": "n"})
        g = g.sort_values(keys).reset_index(drop=True)
        return pa.Table.from_pandas(g[keys + ["n"]], preserve_index=False)

    if mode == "hash2":
        # Two-pass hash-only variant of 'hash' for the band where key
        # STRINGS dominate driver transfer (tens of millions of distinct
        # keys): pass 1 ships only (int64 hash, count) — 16 B/key — and
        # the driver finds candidate duplicate hashes; pass 2 re-reads the
        # input and ships key columns ONLY for candidate hashes (rare).
        # Collisions between distinct keys are resolved exactly by the
        # key-level merge of pass 2. Same output as every other mode.
        import pyarrow.compute as pc
        import ray

        from ..determinism import hash_strings

        def hash_only(batch: pa.Table) -> pa.Table:
            part = _partial_counts(batch, keys)
            h = hash_strings(_key_strings_col(part, keys)).view(np.int64)
            return pa.Table.from_pydict(
                {"h": pa.array(h),
                 "c": pc.cast(part["count_all"], pa.int64())})

        hp = ds.map_batches(hash_only, batch_format="pyarrow",
                            zero_copy_batch=True).to_pandas()
        if not len(hp):
            pdf = pd.DataFrame({k: pd.Series(dtype=object) for k in keys}
                               | {"n": pd.Series(dtype="int64")})
            return pa.Table.from_pandas(pdf[keys + ["n"]], preserve_index=False)
        all_h = hp["h"].to_numpy()
        all_c = hp["c"].to_numpy()
        order = np.argsort(all_h)
        h_s, c_s = all_h[order], all_c[order]
        cand = c_s >= 2
        if len(h_s) > 1:
            eq = h_s[1:] == h_s[:-1]
            cand[:-1] |= eq
            cand[1:] |= eq
        cand_hashes = np.unique(h_s[cand])
        if len(cand_hashes) == 0:
            pdf = pd.DataFrame({k: pd.Series(dtype=object) for k in keys}
                               | {"n": pd.Series(dtype="int64")})
            return pa.Table.from_pandas(pdf[keys + ["n"]], preserve_index=False)
        cref = ray.put(cand_hashes)

        def fetch_candidates(batch: pa.Table) -> pa.Table:
            ch = ray.get(cref)
            part = _partial_counts(batch, keys)
            h = hash_strings(_key_strings_col(part, keys)).view(np.int64)
            pos = np.clip(np.searchsorted(ch, h), 0, len(ch) - 1)
            return part.filter(pa.array(ch[pos] == h))

        pdf = ds.map_batches(fetch_candidates, batch_format="pyarrow",
                             zero_copy_batch=True).to_pandas()
        if "count_all" not in pdf.columns or not len(pdf):
            pdf = pd.DataFrame({k: pd.Series(dtype=object) for k in keys}
                               | {"n": pd.Series(dtype="int64")})
            return pa.Table.from_pandas(pdf[keys + ["n"]], preserve_index=False)
        g = pdf.groupby(keys, as_index=False, dropna=False)["count_all"].sum()
        g = g[g["count_all"] > 1].rename(columns={"count_all": "n"})
        g = g.sort_values(keys).reset_index(drop=True)
        return pa.Table.from_pandas(g[keys + ["n"]], preserve_index=False)

    if mode == "shuffle":
        from ray.data.aggregate import Sum

        partials = ds.map_batches(
            lambda b: _partial_counts(b, keys), batch_format="pyarrow",
            zero_copy_batch=True,
        )
        total = partials.groupby(keys).aggregate(Sum("count_all", alias_name="n"))
        pdf = total.filter(expr="n > 1").to_pandas()
        if "n" not in pdf.columns:
            pdf = pd.DataFrame({k: [] for k in keys} | {"n": []})
        pdf = pdf.sort_values(keys).reset_index(drop=True)
        return pa.Table.from_pandas(pdf[keys + ["n"]], preserve_index=False)

    if mode != "cms":
        raise ValueError(f"unknown mode {mode!r}")

    import ray

    from ..state.countmin import CountMinSketch

    def sketch(batch: pa.Table) -> pa.Table:
        cm = CountMinSketch(width=cms_width, depth=4)
        cm.add(_key_strings_col(batch, keys))
        return pa.Table.from_pydict({"sketch": [cm.to_bytes()]})

    acc = CountMinSketch(width=cms_width, depth=4)
    for row in ds.map_batches(sketch, batch_format="pyarrow",
                              zero_copy_batch=True).take_all():
        acc.merge(CountMinSketch.from_bytes(row["sketch"]))
    ref = ray.put(acc.to_bytes())

    class CandidateFilter:
        """Actor pool: the merged CMS is deserialized ONCE per actor
        (__init__), not per batch."""

        def __init__(self, sketch_ref, key_cols):
            self.cm = CountMinSketch.from_bytes(ray.get(sketch_ref))
            self.keys = key_cols

        def __call__(self, batch: pa.Table) -> pa.Table:
            part = _partial_counts(batch, self.keys)
            est = self.cm.query(_key_strings_col(part, self.keys))
            return part.filter(pa.array(est >= 2))

    # num_cpus=0.5 so the pool never reserves every core — upstream read /
    # generate tasks must keep scheduling (actor-starvation pitfall)
    pdf = ds.map_batches(CandidateFilter,
                         fn_constructor_kwargs={"sketch_ref": ref,
                                                "key_cols": keys},
                         batch_format="pyarrow", zero_copy_batch=True,
                         concurrency=2, num_cpus=0.5).to_pandas()
    if "count_all" not in pdf.columns or len(pdf) == 0:
        pdf = pd.DataFrame({k: pd.Series(dtype=object) for k in keys}
                           | {"n": pd.Series(dtype="int64")})
        return pa.Table.from_pandas(pdf[keys + ["n"]], preserve_index=False)
    g = pdf.groupby(keys, as_index=False, dropna=False)["count_all"].sum()
    g = g[g["count_all"] > 1].rename(columns={"count_all": "n"})
    g = g.sort_values(keys).reset_index(drop=True)
    return pa.Table.from_pandas(g[keys + ["n"]], preserve_index=False)


def unique_violations(ds, keys: Sequence[str], *, rule: str | None = None,
                      mode: str = "auto", n_rows_hint: int = 0) -> pa.Table:
    """Exact duplicate detection → violations table (one row per dup key)."""
    keys = list(keys)
    rule = rule or f"unique-{'-'.join(keys)}"
    pdf = duplicate_key_counts(ds, keys, mode=mode,
                               n_rows_hint=n_rows_hint).to_pandas()
    if len(pdf) == 0:
        return VIOLATIONS.empty_table()
    key_str = pdf[keys[0]].astype(str)
    for k in keys[1:]:
        key_str = key_str + "|" + pdf[k].astype(str)
    return pa.Table.from_arrays(
        [
            pa.array(key_str.tolist(), type=pa.string()),
            pa.array([rule] * len(pdf), type=pa.string()),
            pa.array([",".join(keys)] * len(pdf), type=pa.string()),
            pa.array([D.d_unique(int(n)) for n in pdf["n"]], type=pa.string()),
        ],
        schema=VIOLATIONS,
    )


def approx_distinct_by_group(ds, group_col: str, key: str, *,
                             p: int = 14) -> "pd.DataFrame":
    """Per-group HLL distinct estimates → DataFrame (group_col, approx):
    mergeable register rows, no shuffle, driver merge bounded by the
    group DOMAIN — the sketch-path analogue of the exact grouped
    distinct (events_users_per_type). Thin wrapper over the single
    grouped-HLL implementation (`groupagg.grouped_approx_distinct`:
    one vectorized scatter-max per block instead of a per-group Python
    loop; same register/estimate math), kept for its original
    string-group/`approx` output contract."""
    import pandas as pd

    from .groupagg import grouped_approx_distinct

    out = grouped_approx_distinct(ds, group_col, key, p=p,
                                  mode="driver")
    res = pd.DataFrame({
        group_col: out[group_col].astype(str).to_numpy(),
        "approx": out["approx_distinct"].to_numpy()})
    return res.sort_values(group_col).reset_index(drop=True)


def approx_distinct(ds, key: str, *, p: int = 14) -> float:
    """HLL-estimated distinct count of ``key`` — no shuffle; one sketch per
    block, merged on the driver (sketches are tiny and mergeable)."""

    def sketch(batch: pa.Table) -> pa.Table:
        h = HyperLogLog(p=p)
        h.update_strings(batch[key])
        return pa.Table.from_pydict({"sketch": [h.to_bytes()]})

    rows: List[bytes] = [
        r["sketch"] for r in ds.map_batches(
            sketch, batch_format="pyarrow", zero_copy_batch=True
        ).take_all()
    ]
    acc = HyperLogLog(p=p)
    for b in rows:
        acc.merge_bytes(b)
    return acc.estimate()
