"""Schema-profiling discovery — the "where do the constraints COME
from" side of the validation engine. `stages/uniqueness.py` and
`stages/referential.py` CHECK declared unique / FK constraints
(cerberus/models/pet.py:68-72, booking.py:50); these two profilers
DISCOVER them from data, the classic unary inclusion-dependency and
candidate-key mining primitives of data profiling.

Both reuse the engine's existing distributed set machinery so the scale
story is inherited, not re-derived:

- ``inclusion_profile`` — containment of distinct(A) in distinct(B) per
  candidate pair, via `setops.except_distinct` (block-local distinct
  partials; bucketed shuffle mode beyond the driver band) plus a
  distinct-count pass. Traffic ∝ distinct values, never rows.
- ``candidate_key_profile`` — per column-combo uniqueness from
  `uniqueness.duplicate_key_counts` (driver/hash/cms/shuffle planner);
  the distinct count falls out of the duplicate multiset without a
  second pass: distinct = rows − Σ(n−1).
- ``fd_profile`` — functional-dependency mining (does det → dep hold?)
  from block-local distinct (det, dep) partials; driver mode merges the
  bounded distinct-pair set, shuffle mode co-locates each det value via
  one `keyed_apply` hash exchange and merges only per-bucket summary
  rows. Traffic ∝ distinct (det, dep) pairs, never rows.
- ``pattern_profile`` — string-shape mining: every value is reduced to
  a mask (uppercase→A, lowercase→a, digit→9, optionally run-compressed)
  through an ordered RE2 replacement chain exported as ``MASK_STEPS`` /
  ``MASK_COMPRESS_STEPS`` so a DuckDB oracle can interpolate the SAME
  chain (both engines are RE2 → byte-exact masks). Block-local mask
  counts merge on the driver — mask cardinality is format diversity,
  not data size (a column with unboundedly many masks has no format,
  which is itself the finding).

DuckDB parity in tests/test_profile.py.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import numpy as np
import pandas as pd
import pyarrow as pa

from .setops import except_distinct
from .uniqueness import duplicate_key_counts

__all__ = ["inclusion_profile", "candidate_key_profile", "fd_profile",
           "fd_violations", "pattern_profile",
           "inclusion_sketch_profile", "join_size_profile",
           "MASK_STEPS", "MASK_COMPRESS_STEPS"]


def _as_key(ds, col: str, *, drop_null: bool = False):
    """One-column view named 'k' (setops needs matching column names).
    ``drop_null=True`` excludes NULLs — the parent side of an inclusion
    check, where SQL says a NULL key never matches anything."""
    def proj(b: pa.Table) -> pa.Table:
        arr = b[col]
        if drop_null:
            if isinstance(arr, pa.ChunkedArray):
                arr = arr.combine_chunks()
            arr = arr.drop_null()
        return pa.Table.from_arrays([arr], names=["k"])
    return ds.map_batches(proj, batch_format="pyarrow",
                          zero_copy_batch=True)


def _distinct_count(ds, col: str) -> int:
    def part(b: pa.Table) -> pa.Table:
        return b.select([col]).group_by([col]).aggregate([])
    pdf = ds.map_batches(part, batch_format="pyarrow",
                         zero_copy_batch=True).to_pandas()
    return int(pdf[col].nunique(dropna=False))


def inclusion_profile(pairs: Sequence[Tuple[str, object, str, object, str]],
                      *, mode: str = "auto",
                      round_digits: int = 6) -> pd.DataFrame:
    """FK discovery. ``pairs`` is a sequence of
    ``(name, ds_a, col_a, ds_b, col_b)`` candidates; for each, reports
    how much of distinct(``col_a``) is contained in distinct(``col_b``)
    — containment 1.0 ⇒ a valid inclusion dependency (FK candidate).

    → frame (pair, n_distinct_a, n_missing, containment, is_subset),
    one row per candidate, input order preserved. NULLs in A count as
    distinct values (a NULL never matches, so a nullable FK column
    profiles as containment < 1 — surface it, don't hide it)."""
    rows = []
    for name, ds_a, col_a, ds_b, col_b in pairs:
        a = _as_key(ds_a, col_a)
        # B drops NULLs: setops' key encoding treats NULL = NULL, but
        # SQL inclusion says a NULL parent key matches nothing — without
        # this, a NULL in A was hidden whenever B also held a NULL,
        # defeating the documented nullable-FK signal
        missing = except_distinct(a, _as_key(ds_b, col_b, drop_null=True),
                                  ["k"], mode=mode)
        n_a = _distinct_count(ds_a, col_a)
        n_miss = int(len(missing))
        rows.append({
            "pair": name,
            "n_distinct_a": n_a,
            "n_missing": n_miss,
            "containment": round(1.0 - n_miss / n_a, round_digits)
                           if n_a else float("nan"),
            "is_subset": n_miss == 0})
    return pd.DataFrame(rows,
                        columns=["pair", "n_distinct_a", "n_missing",
                                 "containment", "is_subset"])


def candidate_key_profile(ds, combos: Sequence[Sequence[str]], *,
                          mode: str = "auto",
                          round_digits: int = 6) -> pd.DataFrame:
    """Candidate-key mining. For each column combo, reports how close
    it comes to uniquely identifying rows.

    → frame (key, n_rows, n_distinct, n_dup_keys, uniqueness, is_key),
    one row per combo, input order preserved; ``key`` is the
    '+'-joined column list, ``n_dup_keys`` the number of key tuples
    occurring more than once."""
    n_rows = ds.count()
    rows = []
    for combo in combos:
        combo = list(combo)
        dups = duplicate_key_counts(ds, combo, mode=mode,
                                    n_rows_hint=n_rows)
        extra = int(pa.compute.sum(
            pa.compute.subtract(dups["n"], 1)).as_py() or 0)
        n_distinct = n_rows - extra
        rows.append({
            "key": "+".join(combo),
            "n_rows": n_rows,
            "n_distinct": n_distinct,
            "n_dup_keys": dups.num_rows,
            "uniqueness": round(n_distinct / n_rows, round_digits)
                          if n_rows else float("nan"),
            "is_key": dups.num_rows == 0})
    return pd.DataFrame(rows,
                        columns=["key", "n_rows", "n_distinct",
                                 "n_dup_keys", "uniqueness", "is_key"])


def fd_profile(ds, candidates: Sequence[Tuple[Sequence[str], str]], *,
               mode: str = "auto", n_buckets: int = 32,
               driver_band: int = 5_000_000) -> pd.DataFrame:
    """Functional-dependency mining. For each ``(det_cols, dep_col)``
    candidate, reports whether every distinct determinant tuple maps to
    exactly one ``dep_col`` value (NULL counts as a value — a det that
    maps to both NULL and 'x' violates the FD).

    → frame (fd, n_det, n_violating_det, max_dep_per_det, fd_holds),
    one row per candidate, input order preserved."""
    n_rows = ds.count()
    rows = []
    for det_cols, dep_col in candidates:
        det = list(det_cols)
        cols = det + [dep_col]

        def pairs(b: pa.Table, _c=cols) -> pa.Table:
            return b.select(_c).group_by(_c).aggregate([])

        pairs_ds = ds.map_batches(pairs, batch_format="pyarrow",
                                  zero_copy_batch=True)
        m = mode
        if m == "auto":
            m = "driver" if n_rows <= driver_band else "shuffle"
        if m == "driver":
            pdf = pairs_ds.to_pandas().drop_duplicates()
            br = (pdf.groupby(det, dropna=False)[dep_col]
                  .nunique(dropna=False))
            n_det, n_viol = len(br), int((br > 1).sum())
            mx = int(br.max()) if n_det else 0
        elif m == "shuffle":
            from .keyed_window import keyed_apply
            from .setops import _KEY, _encode_key

            keyed = pairs_ds.map_batches(
                lambda b, _d=det: _encode_key(b, _d),
                batch_format="pyarrow", zero_copy_batch=True)

            def kern(g: pd.DataFrame) -> pd.DataFrame:
                # every copy of a det key is in this bucket → exact
                br = (g.drop_duplicates([_KEY, dep_col])[_KEY]
                      .value_counts())
                return pd.DataFrame({
                    "n_det": [len(br)],
                    "n_viol": [int((br > 1).sum())],
                    "mx": [int(br.max()) if len(br) else 0]})

            s = keyed_apply(keyed, _KEY, kern,
                            n_buckets=n_buckets).to_pandas()
            n_det = int(s["n_det"].sum())
            n_viol = int(s["n_viol"].sum())
            mx = int(s["mx"].max()) if len(s) else 0
        else:
            raise ValueError(f"unknown mode {m!r}")
        rows.append({"fd": "+".join(det) + "->" + dep_col,
                     "n_det": n_det, "n_violating_det": n_viol,
                     "max_dep_per_det": mx, "fd_holds": n_viol == 0})
    return pd.DataFrame(rows, columns=["fd", "n_det", "n_violating_det",
                                       "max_dep_per_det", "fd_holds"])


def fd_violations(ds, det_cols: Sequence[str], dep_col: str, *,
                  top_k: int = 20, mode: str = "auto",
                  n_buckets: int = 32,
                  driver_band: int = 5_000_000) -> pd.DataFrame:
    """The actionable sequel to :func:`fd_profile`: for the worst
    ``top_k`` determinants violating det → dep, report how many dep
    values they map to and the two most common (by ROW count — the
    survivorship signal: which value a repair would keep). Same
    planner shape as fd_profile: (det, dep, rowcount) partials merge
    on the driver inside the band, or per-det via one keyed exchange
    beyond it.

    → frame (det..., n_dep_values, n_rows, dep_top1, n_top1,
    dep_top2, n_top2) sorted by (n_dep_values desc, n_rows desc,
    det) — deterministic."""
    det = list(det_cols)
    cols = det + [dep_col]

    def part(b: pa.Table) -> pa.Table:
        return (b.select(cols).group_by(cols)
                .aggregate([([], "count_all")]))

    pairs_ds = ds.map_batches(part, batch_format="pyarrow",
                              zero_copy_batch=True)
    m = mode
    if m == "auto":
        m = "driver" if ds.count() <= driver_band else "shuffle"

    def summarize(g: pd.DataFrame) -> pd.DataFrame:
        g = (g.groupby(det + [dep_col], dropna=False, as_index=False)
             ["count_all"].sum())
        g = g.sort_values(det + ["count_all", dep_col],
                          ascending=[True] * len(det) + [False, True],
                          kind="mergesort")
        gb = g.groupby(det, dropna=False, sort=False)
        agg = gb.agg(n_rows=("count_all", "sum")).reset_index()
        # nunique(dropna=False): a det mapping to {NULL, x} IS a
        # violation — fd_profile counts it, so this stage must too
        agg.insert(len(det), "n_dep_values",
                   gb[dep_col].nunique(dropna=False).to_numpy())
        first = gb.nth(0).reset_index(drop=True)
        second = gb.nth(1).reset_index(drop=True)
        agg["dep_top1"] = first[dep_col].to_numpy()
        agg["n_top1"] = first["count_all"].to_numpy()
        agg = agg.merge(
            second.rename(columns={dep_col: "dep_top2",
                                   "count_all": "n_top2"}),
            on=det, how="left")
        return agg[agg["n_dep_values"] > 1]

    if m == "driver":
        out = summarize(pairs_ds.to_pandas())
    elif m == "shuffle":
        from .keyed_window import keyed_apply
        from .setops import _KEY, _encode_key

        keyed = pairs_ds.map_batches(
            lambda b, _d=det: _encode_key(b, _d),
            batch_format="pyarrow", zero_copy_batch=True)

        def kern(g: pd.DataFrame) -> pd.DataFrame:
            return summarize(g.drop(columns=[_KEY]))

        out = keyed_apply(keyed, _KEY, kern,
                          n_buckets=n_buckets).to_pandas()
    else:
        raise ValueError(f"unknown mode {m!r}")
    if not len(out):
        return pd.DataFrame(columns=det + [
            "n_dep_values", "n_rows", "dep_top1", "n_top1",
            "dep_top2", "n_top2"])
    out["n_rows"] = out["n_rows"].astype("int64")
    out["n_top1"] = out["n_top1"].astype("int64")
    out = out.sort_values(["n_dep_values", "n_rows"] + det,
                          ascending=[False, False] + [True] * len(det),
                          kind="mergesort").head(top_k)
    return out.reset_index(drop=True)


def _kmv_sketch(ds, col: str, k: int):
    """Bottom-k distinct 64-bit hashes of ``col`` (k-minimum-values
    sketch, Bar-Yossef et al. 2002). Per-block partials are each the
    block's bottom-k; the union's bottom-k is their merge — mergeable,
    order-invariant, O(k) driver state per column. NULLs are skipped
    (a NULL never joins). Returns a sorted uint64 array of ≤k hashes."""
    from ..determinism import hash_strings, splitmix64

    def part(b: pa.Table) -> pa.Table:
        arr = b[col]
        v = arr.to_numpy(zero_copy_only=False)
        if arr.null_count:
            v = v[~pd.isna(v)]
        if np.asarray(v).dtype.kind in "iu":
            h = splitmix64(np.asarray(v).astype(np.uint64))
        else:
            # hash by string form: floats/dates/objects are not
            # byte-convertible (hash_strings would TypeError)
            h = hash_strings(np.asarray(
                np.asarray(v).astype(str), dtype=object))
        h = np.unique(h)[:k]  # unique() sorts → bottom-k
        return pa.Table.from_arrays([pa.array(h, pa.uint64())],
                                    names=["h"])

    parts = ds.map_batches(part, batch_format="pyarrow",
                           zero_copy_batch=True).to_pandas()
    return np.unique(parts["h"].to_numpy(dtype=np.uint64))[:k]


def _kmv_distinct(s, k: int) -> float:
    """Distinct-count estimate from a KMV sketch: exact below k, else
    the order-statistic estimator (k−1)/h_(k) with h normalized to
    (0, 1)."""
    if len(s) < k:
        return float(len(s))
    return (k - 1) / (float(s[-1]) / 2.0 ** 64)


def inclusion_sketch_profile(pairs: Sequence[Tuple[str, object, str,
                                                   object, str]], *,
                             k: int = 8192,
                             round_digits: int = 6) -> pd.DataFrame:
    """Sketch-path FK discovery: the O(k)-state approximation of
    ``inclusion_profile`` for columns whose distinct sets outgrow the
    setops driver band. Containment is estimated from the two KMV
    sketches via the standard combined-bottom-k intersection estimator:
    J = |X ∩ A ∩ B| / |X| over X = bottom-k(A ∪ B), n̂∩ = J·n̂∪,
    containment = n̂∩ / n̂A. EXACT whenever both columns' distinct
    counts fit in k (the sketches ARE the sets); otherwise a (1±ε)
    estimate with ε ≈ 1/√k. NULLs are skipped (unlike the exact
    profiler — documented asymmetry, a sketch cannot represent NULL).

    → frame (pair, est_distinct_a, est_distinct_b, est_containment,
    exact), one row per candidate, input order preserved."""
    rows = []
    for name, ds_a, col_a, ds_b, col_b in pairs:
        sa = _kmv_sketch(ds_a, col_a, k)
        sb = _kmv_sketch(ds_b, col_b, k)
        exact = len(sa) < k and len(sb) < k
        if exact:
            # both sketches ARE the full distinct sets (64-bit-hash
            # collisions aside) — compute containment directly
            n_a, n_b = float(len(sa)), float(len(sb))
            inter = len(np.intersect1d(sa, sb, assume_unique=True))
            cont = inter / n_a if n_a else float("nan")
        else:
            x = np.union1d(sa, sb)[:k]
            in_both = np.intersect1d(x, sa, assume_unique=True)
            in_both = np.intersect1d(in_both, sb, assume_unique=True)
            j = len(in_both) / len(x) if len(x) else float("nan")
            n_union = _kmv_distinct(x, k)
            n_a = _kmv_distinct(sa, k)
            n_b = _kmv_distinct(sb, k)
            cont = (min(1.0, (j * n_union) / n_a) if n_a
                    else float("nan"))
        rows.append({
            "pair": name,
            "est_distinct_a": round(n_a, 2),
            "est_distinct_b": round(n_b, 2),
            "est_containment": round(cont, round_digits),
            "exact": exact})
    return pd.DataFrame(rows, columns=["pair", "est_distinct_a",
                                       "est_distinct_b",
                                       "est_containment", "exact"])


def join_size_profile(pairs: Sequence[Tuple[str, object, str,
                                            object, str]], *,
                      width: int = 1 << 14,
                      depth: int = 4) -> pd.DataFrame:
    """Sketch-based equi-join cardinality estimation (Cormode &
    Muthukrishnan 2005 §4.2): |A ⋈ B| = Σ_k f_A(k)·f_B(k) is estimated
    as min over the ``depth`` rows of the two sides' Count-Min inner
    products. One-sided (never undercounts), error ≤ (e/width)·|A|·|B|
    w.h.p. — the planner-feeding statistic for broadcast-vs-shuffle
    and skew decisions WITHOUT running the join.

    Scale shape: per-block CMS partials (merge = elementwise add, so
    the merged sketch is layout/retry-invariant), driver holds
    depth×width ints per side per candidate.

    → frame (pair, n_rows_a, n_rows_b, est_join_rows, error_bound),
    input order preserved; NULL keys are hashed like values (a real
    join drops them — treat a high NULL share separately)."""
    from ..state.countmin import CountMinSketch

    def side_sketch(ds, col):
        def part(b: pa.Table) -> pa.Table:
            cm = CountMinSketch(width=width, depth=depth)
            cm.add(b[col])
            return pa.Table.from_pydict({
                "cms": pa.array([cm.to_bytes()], pa.binary()),
                "n": pa.array([b.num_rows], pa.int64())})

        pdf = ds.map_batches(part, batch_format="pyarrow",
                             zero_copy_batch=True).to_pandas()
        merged = CountMinSketch(width=width, depth=depth)
        for raw in pdf["cms"]:
            merged.merge(CountMinSketch.from_bytes(raw))
        return merged, int(pdf["n"].sum())

    rows = []
    for name, ds_a, col_a, ds_b, col_b in pairs:
        ca, n_a = side_sketch(ds_a, col_a)
        cb, n_b = side_sketch(ds_b, col_b)
        est = int(min(int(np.dot(ca.table[d], cb.table[d]))
                      for d in range(depth)))
        rows.append({
            "pair": name, "n_rows_a": n_a, "n_rows_b": n_b,
            "est_join_rows": est,
            "error_bound": int(np.ceil(np.e / width * n_a * n_b))})
    return pd.DataFrame(rows, columns=["pair", "n_rows_a", "n_rows_b",
                                       "est_join_rows", "error_bound"])


# Ordered RE2 (pattern, replacement) chain shared verbatim with the
# DuckDB oracle (regexp_replace(..., 'g')) — order matters: class masks
# first, then run compression over the mask alphabet.
MASK_STEPS = (("[A-Z]", "A"), ("[a-z]", "a"), ("[0-9]", "9"))
MASK_COMPRESS_STEPS = (("A{2,}", "A"), ("a{2,}", "a"), ("9{2,}", "9"))


def _mask_array(arr, compress: bool):
    import pyarrow.compute as pc

    s = pc.cast(arr, pa.string())
    steps = MASK_STEPS + (MASK_COMPRESS_STEPS if compress else ())
    for pat, rep in steps:
        s = pc.replace_substring_regex(s, pattern=pat, replacement=rep)
    return s


def pattern_profile(ds, cols: Sequence[str], *, top_k: int = 10,
                    compress: bool = True,
                    round_digits: int = 6) -> pd.DataFrame:
    """String-shape profiling: per column, the ``top_k`` most frequent
    value masks with coverage. NULL values profile as mask NULL.

    → frame (column, mask, n, frac, rank) sorted by (column, n desc,
    mask) — deterministic under count ties."""
    cols = list(cols)

    def part(b: pa.Table) -> pa.Table:
        out_c, out_m, out_n = [], [], []
        for c in cols:
            t = pa.Table.from_arrays([_mask_array(b[c], compress)],
                                     names=["mask"])
            g = t.group_by(["mask"]).aggregate([([], "count_all")])
            out_c.append(pa.array([c] * g.num_rows, pa.string()))
            out_m.append(g["mask"].combine_chunks())
            out_n.append(g["count_all"].combine_chunks())
        return pa.Table.from_arrays(
            [pa.concat_arrays(out_c),
             pa.concat_arrays([a.cast(pa.string()) for a in out_m]),
             pa.concat_arrays(out_n)],
            names=["column", "mask", "n"])

    pdf = ds.map_batches(part, batch_format="pyarrow",
                         zero_copy_batch=True).to_pandas()
    agg = (pdf.groupby(["column", "mask"], dropna=False)["n"].sum()
           .reset_index())
    tot = agg.groupby("column")["n"].transform("sum")
    agg["frac"] = (agg["n"] / tot).round(round_digits)
    agg = agg.sort_values(["column", "n", "mask"],
                          ascending=[True, False, True],
                          na_position="last")
    agg["rank"] = agg.groupby("column").cumcount() + 1
    out = agg[agg["rank"] <= top_k].reset_index(drop=True)
    return out[["column", "mask", "n", "frac", "rank"]]


def fd_repair(ds, det_cols: Sequence[str], dep_col: str, *,
              key_col: str = "doc_id", mode: str = "auto",
              n_buckets: int = 32, driver_band: int = 5_000_000):
    """Apply the majority-vote FD repair (Holoclean-lite, single
    dependency): for every determinant violating det → dep, rewrite
    the dependent to its most frequent value (ties → smallest, both
    engines deterministic). The APPLY step downstream of
    `fd_violations`' survivorship signal.

    → (repaired Dataset, repair-log frame (key, det..., old, new)
    sorted by key). Scale shape: the (det, dep, rowcount) census
    reuses fd_violations' planner (driver merge in the band, keyed
    exchange beyond); only VIOLATING determinants broadcast back —
    ∝ violation rate, never the determinant universe. The rewrite is
    one vectorized map_batches pass. Post-repair,
    ``fd_violations(repaired)`` is empty (tested).
    """
    import ray

    det = list(det_cols)
    cols = det + [dep_col]

    def part(b: pa.Table) -> pa.Table:
        return (b.select(cols).group_by(cols)
                .aggregate([([], "count_all")]))

    pairs_ds = ds.map_batches(part, batch_format="pyarrow",
                              zero_copy_batch=True)
    m = mode
    if m == "auto":
        m = "driver" if ds.count() <= driver_band else "shuffle"

    def majorities(g: pd.DataFrame) -> pd.DataFrame:
        g = (g.groupby(det + [dep_col], dropna=False, as_index=False)
             ["count_all"].sum())
        g = g.sort_values(det + ["count_all", dep_col],
                          ascending=[True] * len(det) + [False, True],
                          kind="mergesort")
        gb = g.groupby(det, dropna=False, sort=False)
        agg = gb.agg(n_rows=("count_all", "sum")).reset_index()
        agg["n_dep"] = gb[dep_col].nunique(dropna=False).to_numpy()
        first = gb.nth(0).reset_index(drop=True)
        agg["keep"] = first[dep_col].to_numpy()
        return agg[agg["n_dep"] > 1][det + ["keep"]]

    if m == "driver":
        fix = majorities(pairs_ds.to_pandas())
    elif m == "shuffle":
        from .keyed_window import keyed_apply
        from .setops import _KEY, _encode_key

        keyed = pairs_ds.map_batches(
            lambda b, _d=det: _encode_key(b, _d),
            batch_format="pyarrow", zero_copy_batch=True)

        def kern(g: pd.DataFrame) -> pd.DataFrame:
            return majorities(g.drop(columns=[_KEY]))

        fix = keyed_apply(keyed, _KEY, kern,
                          n_buckets=n_buckets).to_pandas()
    else:
        raise ValueError(f"unknown mode {m!r}")
    # broadcast the violating-determinant → majority map; the lookup
    # is a searchsorted over the composite STRING key, so sort by that
    # key (sorting by the raw det columns breaks for numeric dets:
    # int order "99" < "100" ≠ string order). BOTH sides build the key
    # through setops._encode_key on Arrow data: pandas astype(str)
    # formats floats/bools/NaN differently ("1.0"/"True"/"nan") than
    # the Arrow cast the batches use ("1"/"true"/null-sentinel), which
    # silently missed every repair on such det columns
    from .setops import _KEY as _SK
    from .setops import _encode_key as _enc

    if len(fix):
        cols_arr = [pa.array([None if pd.isna(x) else x
                              for x in fix[c].to_numpy(dtype=object)])
                    for c in det]
        ft = pa.Table.from_arrays(cols_arr, names=det)
        comp = (_enc(ft, det)[_SK].to_numpy(zero_copy_only=False)
                .astype(object))
        keep = fix["keep"].to_numpy(dtype=object)
    else:
        comp = np.array([], dtype=object)
        keep = np.array([], dtype=object)
    if len(comp):
        order = np.argsort(comp.astype(str), kind="mergesort")
        comp, keep = comp[order], keep[order]
    ref = ray.put((comp, keep))

    def rewrite(b: pa.Table) -> dict:
        ck, kv = ray.get(ref)
        key = (_enc(b, det)[_SK].to_numpy(zero_copy_only=False)
               .astype(object))
        pos = np.clip(np.searchsorted(ck, key), 0,
                      max(len(ck) - 1, 0))
        hit = (ck[pos] == key) if len(ck) else np.zeros(len(key),
                                                        bool)
        old = b[dep_col].to_numpy(zero_copy_only=False)
        new = old.copy()
        if hit.any():
            new[hit] = kv[pos[hit]]
        changed = hit & (old != new)
        out = b.set_column(b.schema.get_field_index(dep_col), dep_col,
                           pa.array(new, b[dep_col].type))
        return out, changed, old

    def repaired_batch(b: pa.Table) -> pa.Table:
        out, _, _ = rewrite(b)
        return out

    def log_batch(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        _, changed, old = rewrite(b)
        idx = np.flatnonzero(changed)
        cols_out = {"key": pc.cast(b[key_col], pa.string()).to_numpy(
            zero_copy_only=False)[idx]}
        for c in det:
            cols_out[c] = b[c].to_numpy(zero_copy_only=False)[idx]
        ck, kv = ray.get(ref)
        cols_out["old"] = old[idx].astype(str)
        # recompute the assigned value for the log (same shared key)
        key = (_enc(b, det)[_SK].to_numpy(zero_copy_only=False)
               .astype(object))
        pos = np.clip(np.searchsorted(ck, key), 0,
                      max(len(ck) - 1, 0))
        cols_out["new"] = kv[pos[idx]].astype(str)
        return pa.Table.from_pydict(cols_out)

    repaired = ds.map_batches(repaired_batch, batch_format="pyarrow",
                              zero_copy_batch=True)
    log = ds.map_batches(log_batch, batch_format="pyarrow",
                         zero_copy_batch=True).to_pandas()
    log = log.sort_values("key", kind="mergesort").reset_index(
        drop=True)
    return repaired, log


def relationship_profile(child_ds, fk_col: str, parent_ds, pk_col: str,
                         *, mode: str = "auto",
                         driver_band: int = 5_000_000) -> dict:
    """Infer the CARDINALITY CLASS of a relationship (the profiling
    step before declaring an FK): max fanout in both directions plus
    orphan/null coverage →
    ``class`` ∈ {'1:1', 'N:1', '1:N', 'N:M'} with

    - ``max_children_per_parent``: max child rows sharing one fk value
    - ``max_rows_per_parent_key``: max parent rows per pk value (> 1
      means the parent side is not a key — the M side)
    - ``n_orphans``: child rows whose fk misses every parent key
    - ``n_null_fk``: child rows with NULL fk (excluded from fanout and
      orphan counts, SQL semantics)

    Scale shape: fanouts are grouped counts — per-block (key, n)
    partials with a driver merge inside ``driver_band`` distinct keys,
    Ray's hash groupby beyond (``mode='shuffle'``); the orphan check
    broadcasts the parent keyset inside the band and semi-joins
    natively beyond (the `referential` convention). DuckDB parity in
    tests/test_profile.py.
    """
    import ray  # noqa: F401

    if mode not in ("auto", "driver", "shuffle"):
        raise ValueError(f"unknown mode {mode!r}")

    from ..scale import dataset_rows_hint

    def counts_max(ds, col) -> Tuple[int, int, int]:
        """→ (max rows per key, n distinct keys, n null rows). The mode
        decision happens BEFORE any partial is collected: beyond the
        band the grouped counts stay distributed (Ray hash groupby) and
        the driver sees only per-block (max, n_keys) reductions plus
        1-row null-count partials — the earlier version materialized
        every (key, count) partial first, making 'shuffle' a dead
        parameter exactly where it was needed."""
        m = mode
        if m == "auto":
            n_hint = dataset_rows_hint(ds) or ds.count()
            m = "driver" if n_hint <= driver_band else "shuffle"

        def part(b: pa.Table) -> pa.Table:
            t = b.select([col])
            nn = t.column(0).null_count
            g = t.drop_null().group_by([col]).aggregate(
                [([], "count_all")])
            nulls = np.zeros(max(g.num_rows, 1), dtype=np.int64)
            nulls[0] = nn
            if not g.num_rows:        # all-null block: keep the schema
                g = pa.Table.from_arrays(
                    [pa.array([None], t.column(0).type),
                     pa.array([0], pa.int64())],
                    names=[col, "count_all"])
            return g.append_column("_nulls", pa.array(nulls,
                                                      pa.int64()))

        if m == "driver":
            pdf = ds.map_batches(part, batch_format="pyarrow",
                                 zero_copy_batch=True).to_pandas()
            nulls = int(pdf["_nulls"].sum())
            pdf = pdf.dropna(subset=[col])
            if not len(pdf):
                return 0, 0, nulls
            g = pdf.groupby(col)["count_all"].sum()
            return int(g.max()), int(len(g)), nulls
        if m != "shuffle":
            raise ValueError(f"unknown mode {m!r}")

        # null counts: 1-row-per-block partials (O(#blocks) driver ints)
        def nullpart(b: pa.Table) -> pa.Table:
            return pa.Table.from_pydict(
                {"_nulls": pa.array([b[col].null_count], pa.int64())})

        nulls = int(ds.map_batches(nullpart, batch_format="pyarrow",
                                   zero_copy_batch=True)
                    .to_pandas()["_nulls"].sum())

        def proj(b: pa.Table) -> pa.Table:
            t = b.select([col])
            return t.drop_null()

        grouped = (ds.map_batches(proj, batch_format="pyarrow",
                                  zero_copy_batch=True)
                   .groupby(col).count())

        def reduce_part(b: pa.Table) -> pa.Table:
            if b.num_rows == 0 or "count()" not in b.column_names:
                return pa.Table.from_pydict(
                    {"mx": pa.array([0], pa.int64()),
                     "nk": pa.array([0], pa.int64())})
            c = b["count()"].to_numpy(zero_copy_only=False)
            return pa.Table.from_pydict(
                {"mx": pa.array([int(c.max())], pa.int64()),
                 "nk": pa.array([int(len(c))], pa.int64())})

        r = grouped.map_batches(reduce_part,
                                batch_format="pyarrow").to_pandas()
        if not len(r):
            return 0, 0, nulls
        return int(r["mx"].max()), int(r["nk"].sum()), nulls

    max_cpp, n_fk_distinct, n_null_fk = counts_max(child_ds, fk_col)
    max_rpk, n_pk_distinct, _ = counts_max(parent_ds, pk_col)

    from .referential import column_keys, referential_violations

    orphans = referential_violations(
        child_ds, parent_ds, extract=column_keys(fk_col, fk_col),
        parent_key=pk_col, rule="rel-profile-orphan").count()
    if max_cpp > 1 and max_rpk > 1:
        cls = "N:M"
    elif max_cpp > 1:
        cls = "N:1"
    elif max_rpk > 1:
        cls = "1:N"
    else:
        cls = "1:1"
    return {"class": cls,
            "max_children_per_parent": max_cpp,
            "max_rows_per_parent_key": max_rpk,
            "n_fk_distinct": n_fk_distinct,
            "n_pk_distinct": n_pk_distinct,
            "n_orphans": int(orphans),
            "n_null_fk": n_null_fk}
