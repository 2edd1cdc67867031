"""Entity resolution: cluster near-identical string identities and tag
every row with its canonical entity.

The classic record-linkage composition (Fellegi-Sunter shape, exact
small-edit blocking): normalize → FastSS deletion-neighborhood blocking
(full recall for Levenshtein ≤ k — the `fuzzyjoin` machinery, self-join
flavor) → exact vectorized DP verification → connected components over
the match graph → canonical member per entity (lexicographically
smallest normalized form; deterministic). Matching runs over DISTINCT
normalized values, never rows: a billion rows with a million distinct
names cost a million-value match, and the row tagging is one streamed
broadcast-lookup pass.

Scale notes: blocking + verification are bucketed (`keyed_apply`), the
match graph is candidate-only (pairs that already passed the distance
gate), components run on the driver with
`dedup.connected_components_shuffle` as the wired beyond-driver path,
and the value→entity map is O(#distinct values) — the documented bound
(same contract as the referential broadcast lookups).
"""

from __future__ import annotations

import re
from typing import Optional

import numpy as np
import pandas as pd
import pyarrow as pa

_WS = re.compile(r"\s+")


def normalize_identity(values: np.ndarray) -> np.ndarray:
    """Canonical matching form: casefold, strip punctuation to spaces,
    collapse whitespace. Vectorized via pandas string kernels."""
    s = pd.Series(values, dtype=object).fillna("")
    s = s.str.casefold()
    s = s.str.replace(r"[^\w\s]", " ", regex=True)
    s = s.str.replace(_WS, " ", regex=True).str.strip()
    return s.to_numpy(dtype=object)


def match_pairs(ds, text_col: str, *, k: int = 1,
                n_buckets: int = 32) -> pd.DataFrame:
    """→ (a, b, dist) over distinct NORMALIZED values with Levenshtein
    distance in [1, k] (self-pairs and symmetric duplicates removed;
    a < b lexicographically). Exact recall — deletion blocking misses
    nothing within k — AMONG values of ≤256 chars: longer values (junk
    rows, pathological names) are skipped rather than crashing the DP
    kernel, so they resolve as singleton identities. Runs the fuzzyjoin
    TRUE self-join (one variant expansion, each unordered pair verified
    once — half the two-sided cost)."""
    from .fuzzyjoin import fuzzy_join

    def norm(b: pa.Table) -> pa.Table:
        return pa.Table.from_pydict({
            text_col: pa.array(
                normalize_identity(
                    b[text_col].to_numpy(zero_copy_only=False)),
                pa.string())})

    nds = ds.map_batches(norm, batch_format="pyarrow",
                         zero_copy_batch=True).materialize()
    pairs = fuzzy_join(nds, None, text_col, k=k, n_buckets=n_buckets,
                       self_join=True, overlong="skip")
    if not len(pairs):
        return pd.DataFrame({"a": [], "b": [], "dist": []})
    out = pd.DataFrame({"a": pairs["left"], "b": pairs["right"],
                        "dist": pairs["dist"]})
    out = out[out["a"] != out["b"]].drop_duplicates(["a", "b"])
    return out.sort_values(["a", "b"]).reset_index(drop=True)


def resolve_entities(ds, key_col: str, text_col: str, *, k: int = 1,
                     n_buckets: int = 32,
                     cc_mode: str = "driver"):
    """→ (row Dataset + ``canonical`` column, entity frame
    (value, canonical) over the distinct normalized values that matched
    anything). ``canonical`` — the entity id — is the lexicographically
    smallest member of the value's component; values that matched
    nothing canonicalize to themselves."""
    from .dedup import connected_components, connected_components_shuffle

    pairs = match_pairs(ds, text_col, k=k, n_buckets=n_buckets)
    if len(pairs):
        pt = pa.Table.from_pandas(pairs[["a", "b"]], preserve_index=False)
        if cc_mode == "driver":
            cc = connected_components(pt, a_col="a", b_col="b").to_pandas()
        else:
            cc = connected_components_shuffle(
                pt, a_col="a", b_col="b").to_pandas()
        ent = dict(zip(cc["doc_id"], cc["cluster_id"]))
    else:
        ent = {}

    import ray

    ref = ray.put(ent)

    def tag(b: pa.Table) -> pa.Table:
        m = ray.get(ref)
        vals = pd.Series(normalize_identity(
            b[text_col].to_numpy(zero_copy_only=False)))
        canon = vals.map(m).fillna(vals)    # vectorized dict lookup
        return b.append_column(
            "canonical", pa.array(canon.to_numpy(dtype=object),
                                  pa.string()))

    tagged = ds.map_batches(tag, batch_format="pyarrow",
                            zero_copy_batch=True)
    ent_frame = (pd.DataFrame(
        {"value": list(ent), "canonical": [ent[v] for v in ent]})
        .sort_values("value").reset_index(drop=True))
    return tagged, ent_frame


def sorted_neighborhood_pairs(ds, id_col: str, text_col: str, *,
                              window: int = 5,
                              n_buckets: int = 32) -> pd.DataFrame:
    """Sorted-neighborhood blocking (Hernández & Stolfo 1995): order
    all rows by the normalized identity key and emit every candidate
    pair within ``window`` positions — the classic alternative to hash
    blocking when matches share PREFIXES rather than whole tokens
    (typos late in the string stay adjacent in sort order).

    Scale shape: one range-partition sort (via
    `global_rank.global_row_number`'s no-driver-state plan), then rows
    route to ``rank // window`` AND the following bucket — a pair
    within the window spans at most two adjacent buckets, so every
    candidate appears in exactly the bucket of its LARGER rank (the
    dedup rule; boundary pairs are never lost, the same
    boundary-duplication idiom as the interval-overlap rule). Pair
    expansion per bucket is a vectorized searchsorted + repeat — no
    per-row Python. Output ≤ (window−1) pairs per row.

    → pandas frame (a, b, key_a, key_b, rank_gap) with (a, b) the
    id pair sorted by rank, deduplicated, sorted.
    """
    import pyarrow.compute as pc

    from ..stages.global_rank import global_row_number
    from ..stages.keyed_window import keyed_apply

    if window < 2:
        raise ValueError(f"window must be ≥ 2: {window}")

    def norm(b: pa.Table) -> pa.Table:
        key = normalize_identity(
            b[text_col].to_numpy(zero_copy_only=False))
        return pa.Table.from_pydict({
            "_id": pc.cast(b[id_col], pa.string()),
            "_key": pa.array(key, pa.string())})

    keyed = ds.map_batches(norm, batch_format="pyarrow",
                           zero_copy_batch=True)
    ranked = global_row_number(keyed, ["_key", "_id"],
                               out_col="_rn").materialize()
    # route duplicates every ranked row into two buckets; size the pair
    # exchange once from the materialized (metadata-backed) count
    from ..stages.keyed_window import auto_buckets

    nb = auto_buckets(2 * ranked.count())

    def route(b: pa.Table) -> pa.Table:
        """Duplicate each row into its home bucket and the next one —
        every windowed pair then co-locates in the larger rank's
        bucket (boundary-duplication idiom)."""
        df = b.to_pandas()
        home = (df["_rn"].to_numpy(dtype=np.int64) - 1) // window
        dup = pd.concat([df.assign(_bkt=home),
                         df.assign(_bkt=home + 1)], ignore_index=True)
        return pa.Table.from_pandas(dup, preserve_index=False)

    routed = keyed_apply(
        ranked.map_batches(route, batch_format="pyarrow",
                           zero_copy_batch=True),
        "_bkt", lambda g: _sn_bucket_pairs(g, window), n_buckets=nb)
    pdf = routed.to_pandas()
    if not len(pdf):
        return pd.DataFrame({"a": [], "b": [], "key_a": [],
                             "key_b": [], "rank_gap": []})
    out = pdf.drop_duplicates(["a", "b"]).sort_values(["a", "b"])
    return out.reset_index(drop=True)


def _sn_bucket_pairs(g: pd.DataFrame, window: int) -> pd.DataFrame:
    """Vectorized windowed pair expansion for one keyed_apply frame.
    The frame may hold SEVERAL _bkt groups (hash-bucket collisions);
    each group is a contiguous rank range of natives plus the previous
    bucket's duplicates. Sorting by (_bkt, _rn) and offsetting ranks
    per group keeps one global searchsorted from crossing groups."""
    g = g.sort_values(["_bkt", "_rn"], kind="mergesort"
                      ).reset_index(drop=True)
    rn = g["_rn"].to_numpy(dtype=np.int64)
    bk = g["_bkt"].to_numpy(dtype=np.int64)
    if not len(g):
        return pd.DataFrame({"a": [], "b": [], "key_a": [],
                             "key_b": [], "rank_gap": []})
    # disjoint monotone key per group: gaps between groups ≥ window
    off = np.int64(rn.max() + window)
    adj = rn + (bk - bk.min()) * off
    native = ((rn - 1) // window) == bk
    # for native row at position p, pair with positions q < p whose
    # rank is within the window (same group by construction of adj)
    lo = np.searchsorted(adj, adj - (window - 1), side="left")
    p = np.flatnonzero(native)
    counts = p - lo[p]
    m = counts > 0
    p, counts = p[m], counts[m]
    if not len(p):
        return pd.DataFrame({"a": [], "b": [], "key_a": [],
                             "key_b": [], "rank_gap": []})
    total = int(counts.sum())
    starts = np.zeros(len(counts), dtype=np.int64)
    starts[1:] = np.cumsum(counts)[:-1]
    q = (np.arange(total) - np.repeat(starts, counts)
         + np.repeat(lo[p], counts))
    pj = np.repeat(p, counts)
    # a duplicate copy and a native of the SAME row can both sit in
    # one group when rn makes them window-adjacent — impossible by
    # construction (each rank routed once per bucket), but self-pairs
    # are cheap to assert away
    keep = rn[pj] != rn[q]
    q, pj = q[keep], pj[keep]
    ids = g["_id"].to_numpy(dtype=object)
    keys = g["_key"].to_numpy(dtype=object)
    return pd.DataFrame({
        "a": ids[q], "b": ids[pj],
        "key_a": keys[q], "key_b": keys[pj],
        "rank_gap": (rn[pj] - rn[q]).astype("int64")})


def fs_em_weights(pairs_ds, agree_cols, *, max_iter: int = 3000,
                  tol: float = 1e-7, lam0: float = 0.1,
                  m0: float = 0.9, u0: float = 0.1) -> dict:
    """Fellegi-Sunter match/non-match parameter estimation (Fellegi &
    Sunter 1969; EM per Winkler 1988) over a candidate-pair Dataset
    with boolean per-field agreement columns.

    The EM never iterates over pairs: one distributed AGREEMENT-PATTERN
    census (group by the k boolean columns — map-side combined, output
    bounded by 2^k patterns regardless of pair count) feeds a driver
    EM on the pattern frequency table (O(2^k · iters)). Deterministic:
    fixed init, fixed iteration order. → {'lambda', 'm': {col: m_f},
    'u': {col: u_f}, 'log2_weights': {col: (agree_w, disagree_w)},
    'n_pairs', 'n_iter', 'converged'} with weights
    log2(m/u) / log2((1−m)/(1−u)).
    """
    agree_cols = list(agree_cols)
    k = len(agree_cols)
    if not 1 <= k <= 20:
        raise ValueError(f"need 1..20 agreement columns, got {k}")

    from ..stages.groupagg import grouped_agg

    cen = grouped_agg(pairs_ds, agree_cols,
                      {"n": (agree_cols[0], "count")})
    if not len(cen):
        raise ValueError("no candidate pairs")
    G = cen[agree_cols].to_numpy(dtype="float64")       # (P, k) in {0,1}
    n = cen["n"].to_numpy(dtype="float64")              # (P,)
    N = float(n.sum())
    lam = float(lam0)
    m = np.full(k, float(m0))
    u = np.full(k, float(u0))
    it, converged = 0, False
    for it in range(1, max_iter + 1):
        pm = np.exp(G @ np.log(m) + (1 - G) @ np.log1p(-m))
        pu = np.exp(G @ np.log(u) + (1 - G) @ np.log1p(-u))
        w = lam * pm / (lam * pm + (1 - lam) * pu)
        lam_new = float((w * n).sum() / N)
        wm = (w * n)
        wu = ((1 - w) * n)
        m_new = np.clip((G.T @ wm) / wm.sum(), 1e-9, 1 - 1e-9)
        u_new = np.clip((G.T @ wu) / wu.sum(), 1e-9, 1 - 1e-9)
        delta = max(abs(lam_new - lam),
                    float(np.abs(m_new - m).max()),
                    float(np.abs(u_new - u).max()))
        lam, m, u = lam_new, m_new, u_new
        if delta < tol:
            converged = True
            break
    return {
        "lambda": lam,
        "m": dict(zip(agree_cols, m.tolist())),
        "u": dict(zip(agree_cols, u.tolist())),
        "log2_weights": {
            c: (float(np.log2(m[i] / u[i])),
                float(np.log2((1 - m[i]) / (1 - u[i]))))
            for i, c in enumerate(agree_cols)},
        "n_pairs": int(N), "n_iter": it, "converged": converged}


def fs_score_pairs(pairs_ds, agree_cols, params: dict):
    """→ the pairs Dataset with a ``match_weight`` column: Σ_f
    log2(m_f/u_f) on agreement, log2((1−m_f)/(1−u_f)) on disagreement
    — the Fellegi-Sunter decision statistic, one vectorized dot
    product per batch against the broadcast weight vectors."""
    import ray

    cols = list(agree_cols)
    aw = np.array([params["log2_weights"][c][0] for c in cols])
    dw = np.array([params["log2_weights"][c][1] for c in cols])
    ref = ray.put((aw, dw))

    def score(b: pa.Table) -> pa.Table:
        a, d = ray.get(ref)
        G = np.column_stack([
            b[c].to_numpy(zero_copy_only=False).astype("float64")
            for c in cols])
        wgt = G @ a + (1 - G) @ d
        return b.append_column("match_weight",
                               pa.array(wgt, pa.float64()))

    return pairs_ds.map_batches(score, batch_format="pyarrow",
                                zero_copy_batch=True)


#: American Soundex consonant codes (published algorithm, public
#: domain): 0 = dropped vowel-class (a e i o u y), 7 = h/w separator
#: (same-code consonants AROUND h/w collapse), 1-6 = code classes.
_SOUNDEX_CODE = {
    **{c: 1 for c in "bfpv"}, **{c: 2 for c in "cgjkqsxz"},
    **{c: 3 for c in "dt"}, "l": 4, **{c: 5 for c in "mn"}, "r": 6,
    **{c: 0 for c in "aeiouy"}, "h": 7, "w": 7}


def soundex(values: np.ndarray, *, max_len: int = 24) -> np.ndarray:
    """Vectorized American Soundex: letter + 3 digits (zero-padded),
    '' for values with no ASCII letter. Implements the full published
    rule set — adjacent same-code collapse, the h/w bridge (same-code
    consonants separated by h or w emit once), vowels reset the bridge,
    first letter's own code never emitted. Vectorization is across the
    VALUE axis: one pass over ≤ ``max_len`` character positions, each a
    numpy step over all strings (no per-value Python).
    """
    s = pd.Series(values, dtype=object).fillna("").str.lower()
    s = s.str.replace(r"[^a-z]", "", regex=True).str.slice(0, max_len)
    n = len(s)
    fixed = np.array(s.to_numpy(dtype=object), dtype=f"S{max_len}")
    mat = np.zeros((n, max_len), dtype=np.uint8)
    raw = fixed.view(np.uint8).reshape(n, max_len)
    mat[:, :] = raw
    lut = np.zeros(256, dtype=np.int8)
    lut[:] = -1                                   # -1 = padding
    for ch, code in _SOUNDEX_CODE.items():
        lut[ord(ch)] = code
    codes = lut[mat]                              # (n, L)
    first = mat[:, 0]
    has = first != 0
    out_digits = np.zeros((n, 3), dtype=np.int8)
    n_out = np.zeros(n, dtype=np.int64)
    prev = np.where(has, codes[:, 0], -1)         # last EFFECTIVE code
    for j in range(1, max_len):
        c = codes[:, j]
        emit = (c >= 1) & (c <= 6) & (c != prev) & (n_out < 3)
        for d in range(3):
            sel = emit & (n_out == d)
            out_digits[sel, d] = c[sel]
        n_out[emit] += 1
        # state: vowels (0) reset prev; h/w (7) keep it; letters set it
        prev = np.where(c == 0, -1, np.where(c == 7, prev, c))
    heads = np.char.upper(first.view("S1").astype("U1"))
    res = np.where(
        has,
        np.char.add(
            heads,
            np.char.add(np.char.add(out_digits[:, 0].astype("U1"),
                                    out_digits[:, 1].astype("U1")),
                        out_digits[:, 2].astype("U1"))),
        "")
    return res.astype(object)


def _jaro(s1: str, s2: str) -> float:
    """Jaro similarity (Jaro 1989, public algorithm). Matches DuckDB's
    jaro_similarity bit-for-bit on ASCII (same float64 arithmetic
    order: mean of the three fractions)."""
    l1, l2 = len(s1), len(s2)
    if l1 == 0 or l2 == 0:
        # incl. BOTH empty → 0.0: DuckDB's convention (kept for exact
        # oracle parity; the textbook value for two empties is 1.0)
        return 0.0
    # clamp: for 1-char strings max//2-1 is -1, an empty scan window —
    # 'a' vs 'a' scored 0.0 while DuckDB/rapidfuzz (window >= 0) give
    # 1.0; the clamp restores exact parity
    window = max(max(l1, l2) // 2 - 1, 0)
    used2 = [False] * l2
    m1, m2 = [], []
    for i, c in enumerate(s1):
        lo, hi = max(0, i - window), min(l2, i + window + 1)
        for j in range(lo, hi):
            if not used2[j] and s2[j] == c:
                used2[j] = True
                m1.append(c)
                m2.append(j)
                break
    m = len(m1)
    if m == 0:
        return 0.0
    m2chars = [s2[j] for j in sorted(m2)]
    # FLOOR-halved transpositions — rapidfuzz's (hence DuckDB's)
    # integer counting, not the textbook mis/2.0
    t = sum(a != b for a, b in zip(m1, m2chars)) // 2
    return (m / l1 + m / l2 + (m - t) / m) / 3.0


def jaro_winkler(a, b, *, prefix_scale: float = 0.1,
                 boost_threshold: float = 0.7,
                 max_prefix: int = 4) -> np.ndarray:
    """Jaro-Winkler similarity for CANDIDATE pairs (two equal-length
    sequences of strings) — the verification kernel that runs only on
    blocking output, never all-pairs; the per-pair loop is the
    documented candidate-only convention (cf. the n-gram Jaccard
    verify). Winkler boost: +l·p·(1−jaro) for the common prefix
    l ≤ 4 when jaro exceeds the boost threshold — the standard
    parameterization DuckDB's jaro_winkler_similarity implements, so
    parity is exact (tests)."""
    a = np.asarray(a, dtype=object)
    b = np.asarray(b, dtype=object)
    out = np.empty(len(a), dtype="float64")
    for i in range(len(a)):
        s1, s2 = a[i] or "", b[i] or ""
        j = _jaro(s1, s2)
        if j > boost_threshold:
            l = 0
            for c1, c2 in zip(s1[:max_prefix], s2[:max_prefix]):
                if c1 != c2:
                    break
                l += 1
            j += l * prefix_scale * (1.0 - j)
        out[i] = j
    return out


def soundex_blocking_pairs(ds, id_col: str, text_col: str, *,
                           jw_threshold: float = 0.8,
                           max_bucket: int = 2000) -> pd.DataFrame:
    """Phonetic blocking + Jaro-Winkler verification: distinct
    normalized FIRST TOKENS of the identity string bucket by their
    Soundex code (per-block distinct partials — the map-side combine),
    candidate pairs expand within buckets (size-capped, capped buckets
    reported via the 'capped' flag) and verify with `jaro_winkler` ≥
    threshold. → (a, b, sim) over distinct identity values, sorted.
    """
    import pyarrow.compute as pc  # noqa: F401

    def norm(b: pa.Table) -> pa.Table:
        vals = normalize_identity(
            b[text_col].to_numpy(zero_copy_only=False))
        u = np.unique(vals.astype(str))
        return pa.Table.from_pydict({"v": pa.array(u, pa.string())})

    vals = np.unique(
        ds.map_batches(norm, batch_format="pyarrow",
                       zero_copy_batch=True).to_pandas()["v"]
        .to_numpy(dtype=object))
    if not len(vals):
        return pd.DataFrame({"a": [], "b": [], "sim": [], "capped": []})
    first = pd.Series(vals, dtype=object).str.split(" ").str[0]
    codes = soundex(first.to_numpy(dtype=object))
    order = np.lexsort((vals.astype(str), codes.astype(str)))
    cv, vv = codes[order].astype(str), vals[order]
    starts = np.flatnonzero(np.r_[True, cv[1:] != cv[:-1]])
    ends = np.r_[starts[1:], len(cv)]
    ai, bi, capped_flags = [], [], []
    for s, e in zip(starts, ends):
        size = e - s
        if size < 2 or not cv[s]:
            continue
        # hot code: CAP to the first max_bucket members (values are
        # value-sorted within the code → deterministic) instead of
        # silently dropping the whole bucket; pairs from a truncated
        # bucket carry capped=True so the recall loss is visible
        was_capped = size > max_bucket
        use = min(size, max_bucket)
        iu, ju = np.triu_indices(use, k=1)
        ai.append(iu + s)
        bi.append(ju + s)
        capped_flags.append(np.full(len(iu), was_capped))
    if not ai:
        return pd.DataFrame({"a": [], "b": [], "sim": [], "capped": []})
    ai = np.concatenate(ai)
    bi = np.concatenate(bi)
    capped_flags = np.concatenate(capped_flags)
    sim = jaro_winkler(vv[ai], vv[bi])
    keep = sim >= jw_threshold
    out = pd.DataFrame({"a": vv[ai][keep], "b": vv[bi][keep],
                        "sim": sim[keep],
                        "capped": capped_flags[keep]})
    return out.sort_values(["a", "b"]).reset_index(drop=True)
