"""SQL-auditable deterministic sampling.

The keep/drop decision is a pure closed-form arithmetic hash of the key
— ``h(k) = ((k mod 2³²) · 2654435761) mod 2³²`` (Knuth's multiplicative
hash; the mod-2³² identity makes the pre-reduction safe for any int64
key) — so an EXTERNAL SQL engine can re-derive exactly which rows a
sample contains. The existing samplers (``mixing.sample_by_source``,
``assign_splits``, ``budget``) are deterministic too, but their
splitmix/string hashes aren't expressible in portable SQL; this module
is the audit-grade variant: keep iff ``h < floor(frac·2³²)``, so a
downstream auditor, a DuckDB oracle, or a second engine reproduces the
row set bit-for-bit from the predicate alone.

Like every hash-gated stage here the decision is pure in the key:
retries, block splits, repartitions and cluster resizes reproduce the
same sample; expected size is binomial (use ``budget.sample_exact_k``
when exact counts matter).
"""

from __future__ import annotations

from typing import Dict

import numpy as np
import pyarrow as pa

KNUTH32 = 2654435761
M32 = 2 ** 32


def key_hash_u32(keys: np.ndarray) -> np.ndarray:
    """Vectorized h(k) over non-negative integer keys → uint64 in
    [0, 2³²). Max intermediate (2³²−1)·2654435761 ≈ 1.14e19 < uint64
    max, so the numpy path never wraps where the SQL HUGEINT path
    wouldn't."""
    k = keys.astype(np.uint64) % np.uint64(M32)
    return (k * np.uint64(KNUTH32)) % np.uint64(M32)


def hash_threshold(frac: float) -> int:
    """floor(frac·2³²) — computed ONCE here and interpolated verbatim
    into both the engine filter and the SQL predicate, so there is no
    float-rounding seam between the two."""
    if not 0.0 <= frac <= 1.0:
        raise ValueError(f"frac must be in [0,1], got {frac}")
    return int(frac * M32)


def hash_sql_predicate(key_col: str, frac: float) -> str:
    """The DuckDB/ANSI predicate selecting exactly the engine's sample
    (HUGEINT cast: the multiply exceeds BIGINT for keys near 2³²)."""
    return (f"((CAST(({key_col}) % 4294967296 AS HUGEINT) * {KNUTH32}) "
            f"% 4294967296) < {hash_threshold(frac)}")


def hash_sample(ds, key_col: str, frac: float):
    """Bernoulli(frac) sample keyed on ``key_col`` (non-negative ints).
    Streamed filter — no shuffle, no state."""
    thresh = np.uint64(hash_threshold(frac))

    def keep(b: pa.Table) -> pa.Table:
        k = b[key_col].to_numpy(zero_copy_only=False)
        return b.filter(pa.array(key_hash_u32(k) < thresh))

    return ds.map_batches(keep, batch_format="pyarrow",
                          zero_copy_batch=True)


def weighted_sample_topk(ds, key_col: str, weight_col: str, k: int):
    """Weighted sampling WITHOUT replacement, k rows, deterministic —
    the Efraimidis–Spirakis A-ES scheme with the hash as the uniform
    draw: score(r) = ln(u)/w where u = (h(key)+0.5)/2³² ∈ (0,1), keep
    the k largest scores. Inclusion probability is proportional to
    weight, the draw is pure in the key (retry/partition invariant),
    and the whole selection is SQL-mirrorable (the same closed-form
    ORDER BY ... LIMIT k — :func:`weighted_sample_sql`).

    Distributed plan: top-k is algebraic (top-k of a union = top-k of
    concatenated per-block top-ks), so each block reduces to ≤k rows in
    ``map_batches`` and the driver merges O(#blocks × k). Rows with
    weight ≤ 0 or NULL are excluded (zero mass). Ties (identical score)
    break on the smaller key so both engines agree.

    → pandas frame (key_col, weight_col, score) sorted by rank."""
    import pandas as pd

    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")

    def partial(b: pa.Table) -> pa.Table:
        t = b.select([key_col, weight_col]).drop_null()
        keys = t[key_col].to_numpy(zero_copy_only=False)
        w = t[weight_col].to_numpy(zero_copy_only=False).astype(np.float64)
        ok = w > 0
        keys, w = keys[ok], w[ok]
        u = (key_hash_u32(keys).astype(np.float64) + 0.5) / M32
        score = np.log(u) / w
        if len(score) > k:
            top = np.argpartition(-score, k - 1)[:k]
            keys, w, score = keys[top], w[top], score[top]
        return pa.Table.from_pydict({
            key_col: pa.array(keys),
            weight_col: pa.array(w, pa.float64()),
            "score": pa.array(score, pa.float64())})

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True).to_pandas()
    if not len(parts):
        return pd.DataFrame({key_col: [], weight_col: [], "score": []})
    order = np.lexsort((parts[key_col].to_numpy(),
                        -parts["score"].to_numpy()))
    return parts.iloc[order[:k]].reset_index(drop=True)


def weighted_sample_sql(src: str, key_col: str, weight_col: str,
                        k: int) -> str:
    """The DuckDB mirror of :func:`weighted_sample_topk` — selects the
    identical k keys from the same table."""
    h = (f"((CAST(({key_col}) % 4294967296 AS HUGEINT) * {KNUTH32}) "
         f"% 4294967296)")
    return (f"SELECT {key_col}, CAST({weight_col} AS DOUBLE) "
            f"AS {weight_col}, "
            f"ln(({h} + 0.5) / 4294967296.0) / ({weight_col}) AS score "
            f"FROM {src} WHERE {weight_col} > 0 "
            f"ORDER BY score DESC, {key_col} LIMIT {k}")


def stratified_sample(ds, key_col: str, strata_col: str,
                      fracs: Dict[str, float], *,
                      default_frac: float = 0.0):
    """Per-stratum Bernoulli sampling: row kept iff
    ``h(key) < floor(fracs[stratum]·2³²)``; strata absent from the map
    use ``default_frac``. One streamed pass, thresholds resolved
    vectorized per batch — the SQL mirror is a CASE over
    :func:`hash_sql_predicate` per stratum (tests/test_sampling.py)."""
    thresholds = {s: np.uint64(hash_threshold(f)) for s, f in fracs.items()}
    default_t = np.uint64(hash_threshold(default_frac))

    def keep(b: pa.Table) -> pa.Table:
        k = b[key_col].to_numpy(zero_copy_only=False)
        strata = b[strata_col].to_numpy(zero_copy_only=False)
        # one vectorized mask per stratum (strata maps are small —
        # domains, not data), never a per-row Python lookup
        t = np.full(len(k), default_t, dtype=np.uint64)
        for s, th in thresholds.items():
            t[strata == s] = th
        return b.filter(pa.array(key_hash_u32(k) < t))

    return ds.map_batches(keep, batch_format="pyarrow",
                          zero_copy_batch=True)
