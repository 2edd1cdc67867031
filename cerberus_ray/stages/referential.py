"""Referential-integrity rules (the engine's FK checker).

Reference semantics: PROTECT FKs — "child key must exist in parent"
(cerberus/models/pet.py:68-72, booking.py:250-255; missing nested id →
ValidationError in serializers.fix_nested_object, serializers.py:52-72).
A missing parent key becomes a violation row ``rule='fk-missing'`` (or a
caller-supplied rule id), ``path=<fk column>``.

Two execution modes:

- ``broadcast``  (default): the parent key set is collected distributed
  (per-block distinct → driver set), put in the object store ONCE
  (``ray.put``) and read by every validator task — never re-shipped per
  batch. Right for dimension-sized parents (media catalog, customer dim).

- ``bloom``  (scale path, north_rule ST5): a Bloom filter of parent keys is
  built by per-block sketch tasks and OR-merged (tiny), then broadcast.
  The missing-key SET is computed over DISTINCT child keys only
  (bloom-negative ⇒ certainly missing, no check; bloom-positive ⇒
  exact-checked against the parent key set), then broadcast back for one
  row-level violation pass. Child rows never enter a shuffle; the
  exchanged volume is the distinct key sets.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray

from ..rules import details as D
from ..schema import VIOLATIONS, empty_violations
from ..state.bloom import BloomFilter


# ---------------------------------------------------------------------------
# key extractors: batch -> (keys: object ndarray, row_keys: object ndarray,
#                           paths: object ndarray)   [aligned, nulls dropped]
# ---------------------------------------------------------------------------

def column_keys(key_col: str, fk_col: str) -> Callable:
    def extract(batch: pa.Table) -> Tuple[pa.Array, np.ndarray, np.ndarray]:
        fk = batch[fk_col]
        valid = pc.is_valid(fk).to_numpy(zero_copy_only=False)
        idx = np.flatnonzero(valid)
        take = pa.array(idx)
        keys = pc.cast(fk, pa.string()).take(take)
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        rk = pc.cast(batch[key_col], pa.string()).to_numpy(
            zero_copy_only=False).astype(object)[idx]
        paths = np.full(len(idx), fk_col, dtype=object)
        return keys, rk, paths

    return extract


def span_media_keys(batch: pa.Table) -> Tuple[pa.Array, np.ndarray, np.ndarray]:
    """Extract non-null spans[*].media_ref with doc_id + span path.

    Keys stay an Arrow string array (zero-copy into the polars hash)."""
    from ..rules.row_rules import _flatten_spans

    doc_ids, flat, parent, pos = _flatten_spans(batch)
    if len(flat) == 0:
        z = np.empty(0, dtype=object)
        return pa.array([], type=pa.string()), z, z
    ref = flat.field("media_ref")
    valid = pc.is_valid(ref).to_numpy(zero_copy_only=False)
    idx = np.flatnonzero(valid)
    keys = ref.take(pa.array(idx))
    rk = doc_ids[parent[idx]]
    paths = np.char.mod("spans[%d].media_ref", pos[idx]).astype(object)
    return keys, rk, paths


# ---------------------------------------------------------------------------
# parent-side structures
# ---------------------------------------------------------------------------

def collect_parent_keys(parent_ds, parent_key: str) -> np.ndarray:
    """Distributed per-block distinct → sorted unique key array on driver.

    Shuffle-free: each block contributes its distinct keys only; suitable
    when the DISTINCT parent key set fits the driver (dimension tables).
    """

    def distinct(batch: pa.Table) -> pa.Table:
        k = pc.cast(batch[parent_key], pa.string())
        return pa.Table.from_arrays([pc.unique(k)], names=["k"])

    pdf = parent_ds.map_batches(distinct, batch_format="pyarrow",
                                zero_copy_batch=True).to_pandas()
    if len(pdf) == 0:
        return np.empty(0, dtype=str)
    return np.unique(pdf["k"].to_numpy().astype(str))  # sorted — fast searchsorted


def build_parent_bloom(parent_ds, parent_key: str, *, n_keys_hint: int,
                       fpp: float = 0.01) -> BloomFilter:
    """Distributed Bloom build: one filter per block, OR-merged on driver."""
    n_bits = BloomFilter.size_for(n_keys_hint, fpp)

    def sketch(batch: pa.Table) -> pa.Table:
        bf = BloomFilter(n_bits=n_bits)
        bf.add(pc.cast(batch[parent_key], pa.string()))
        return pa.Table.from_pydict({"sketch": [bf.to_bytes()]})

    acc = BloomFilter(n_bits=n_bits)
    for row in parent_ds.map_batches(sketch, batch_format="pyarrow",
                                     zero_copy_batch=True).take_all():
        acc.merge(BloomFilter.from_bytes(row["sketch"]))
    return acc


# ---------------------------------------------------------------------------
# violation emission
# ---------------------------------------------------------------------------

def _emit_missing(keys, rk, paths, missing_mask, rule, parent_name) -> pa.Table:
    idx = np.flatnonzero(missing_mask)
    if len(idx) == 0:
        return empty_violations()
    if isinstance(keys, (pa.Array, pa.ChunkedArray)):
        kv = keys.take(pa.array(idx)).to_pylist()
    else:
        kv = [keys[i] for i in idx]
    det = np.array([D.d_fk_missing(k, parent_name) for k in kv], dtype=object)
    return pa.Table.from_arrays(
        [
            pa.array(rk[idx], type=pa.string()),
            pa.array(np.full(len(idx), rule, dtype=object), type=pa.string()),
            pa.array(paths[idx], type=pa.string()),
            pa.array(det, type=pa.string()),
        ],
        schema=VIOLATIONS,
    )


def referential_violations(child_ds, parent_ds, *, extract: Callable,
                           parent_key: str, rule: str = "fk-missing",
                           parent_name: str = "parent",
                           mode: str = "broadcast",
                           semi_join: str = "auto",
                           n_keys_hint: Optional[int] = None):
    """→ Dataset of violation rows for child keys absent from the parent.

    ``semi_join`` (bloom mode only) picks how bloom-positive candidates
    are verified: 'driver' collects the distinct parent key set once
    (fine for dimension-sized parents), 'shuffle' routes tagged distinct
    keys through a hash-partitioned groupby so the driver NEVER holds the
    parent key set — the 10^9+-parent path. 'auto' switches on
    n_keys_hint (> 5M ⇒ shuffle)."""
    if mode == "broadcast":
        from ..determinism import hash_strings

        parent_keys = collect_parent_keys(parent_ds, parent_key)
        # membership probe on sorted int64 hashes (fast numpy searchsorted);
        # a hash hit is confirmed by ONE vectorized string comparison at the
        # matched slot, so collisions can't produce a false pass. Parent
        # keys with colliding hashes (≈ n²/2^64) fall back to exact string
        # search for correctness.
        ph = hash_strings(parent_keys.astype(object))
        order = np.argsort(ph)
        ph_sorted = ph[order]
        pk_by_hash = parent_keys[order]
        has_collisions = bool((ph_sorted[1:] == ph_sorted[:-1]).any()) \
            if len(ph_sorted) > 1 else False
        ref = ray.put((ph_sorted, pk_by_hash, parent_keys, has_collisions))

        def check(batch: pa.Table) -> pa.Table:
            phs, pkh, pk_str, collide = ray.get(ref)
            keys, rk, paths = extract(batch)
            if len(keys) == 0:
                return empty_violations()
            if len(phs) == 0:
                hit = np.zeros(len(keys), dtype=bool)
            else:
                # dictionary-encode: hash + probe only the UNIQUE keys of
                # the batch (child fks repeat heavily), then fan the
                # per-unique verdicts back out via the indices
                k_arr = keys if isinstance(keys, pa.Array) else keys.combine_chunks()
                d = pc.dictionary_encode(k_arr)
                if isinstance(d, pa.ChunkedArray):
                    d = d.combine_chunks()
                uniq = d.dictionary
                idx = d.indices.to_numpy(zero_copy_only=False)
                uh = hash_strings(uniq)
                pos = np.clip(np.searchsorted(phs, uh), 0, len(phs) - 1)
                confirm = pc.equal(uniq, pa.array(pkh[pos].astype(object),
                                                  type=pa.string()))
                confirm = np.nan_to_num(
                    confirm.to_numpy(zero_copy_only=False).astype(float)
                ).astype(bool)
                hit_u = (phs[pos] == uh) & confirm
                if collide:  # rare: verify against the full sorted key set
                    ks = uniq.to_numpy(zero_copy_only=False).astype(str)
                    p2 = np.clip(np.searchsorted(pk_str, ks), 0,
                                 len(pk_str) - 1)
                    hit_u |= pk_str[p2] == ks
                hit = hit_u[idx]
            return _emit_missing(keys, rk, paths, ~hit, rule, parent_name)

        return child_ds.map_batches(check, batch_format="pyarrow",
                                    zero_copy_batch=True)

    if mode == "bloom":
        # Scale path: the MISSING KEY SET is computed on DISTINCT keys,
        # then one row-level pass emits the violations.
        #   phase 1: per-block distinct child keys, pre-screened by the
        #     broadcast bloom — bloom-negative keys are certainly missing
        #     (skip the join); bloom-positive keys are semi-join candidates.
        #   phase 2: distinct-key semi-join finds the bloom false
        #     positives. Only DISTINCT keys move, never child rows.
        #   phase 3: broadcast the (small) missing-key set; one row pass
        #     emits (doc_id, rule, path, detail) for rows that hit it.
        bloom = build_parent_bloom(parent_ds, parent_key,
                                   n_keys_hint=n_keys_hint or 1_000_000)
        bref = ray.put(bloom.to_bytes())

        def child_distinct(batch: pa.Table) -> pa.Table:
            bf = BloomFilter.from_bytes(ray.get(bref))
            keys, _, _ = extract(batch)
            if len(keys) == 0:
                return pa.Table.from_pydict(
                    {"k": pa.array([], pa.string()),
                     "certain_miss": pa.array([], pa.bool_())})
            k_arr = keys if isinstance(keys, (pa.Array, pa.ChunkedArray)) \
                else pa.array(keys, type=pa.string())
            u = pc.unique(k_arr)
            maybe = bf.contains(u)
            return pa.Table.from_pydict({"k": u,
                                         "certain_miss": pa.array(~maybe)})

        cd_ds = child_ds.map_batches(child_distinct, batch_format="pyarrow",
                                     zero_copy_batch=True)
        import ray.data as rd

        if semi_join == "auto":
            semi_join = ("shuffle" if (n_keys_hint or 0) > 5_000_000
                         else "driver")

        if semi_join == "driver":
            # dimension-sized parent: collect the distinct parent key set
            # once; verify bloom-positives with a vectorized searchsorted
            cd = cd_ds.to_pandas()
            if not len(cd):
                return rd.from_arrow(empty_violations())
            cd = cd.drop_duplicates("k")
            certain_missing = set(cd[cd["certain_miss"]]["k"])
            maybe_keys = cd[~cd["certain_miss"]]["k"].to_numpy().astype(str)
            parent_keys = collect_parent_keys(parent_ds, parent_key)
            if len(parent_keys) and len(maybe_keys):
                pos = np.clip(np.searchsorted(parent_keys, maybe_keys), 0,
                              len(parent_keys) - 1)
                fp = parent_keys[pos] != maybe_keys
            else:
                fp = np.ones(len(maybe_keys), dtype=bool)
            missing = np.array(sorted(set(certain_missing)
                                      | set(maybe_keys[fp])), dtype=str)
        elif semi_join == "shuffle":
            # distinct-key groupby semi-join: bloom-negative child keys are
            # certainly missing (collected directly — rare); bloom-POSITIVE
            # child keys and distinct parent keys ride a hash-partitioned
            # groupby(k) tagged by side, and groups with no parent member
            # are the bloom false positives. Only DISTINCT keys are
            # exchanged; the driver holds missing keys only.
            from ray.data.aggregate import Sum

            certain = cd_ds.filter(expr="certain_miss == True").to_pandas()
            certain_missing = (set(certain["k"]) if len(certain) else set())

            def tag_child(batch: pa.Table) -> pa.Table:
                t = batch.filter(pc.invert(batch["certain_miss"]))
                return pa.Table.from_pydict({
                    "k": t["k"],
                    "is_parent": pa.array(
                        np.zeros(t.num_rows, dtype=np.int64))})

            def parent_distinct(batch: pa.Table) -> pa.Table:
                u = pc.unique(pc.cast(batch[parent_key], pa.string()))
                return pa.Table.from_pydict({
                    "k": u,
                    "is_parent": pa.array(np.ones(len(u), dtype=np.int64))})

            tagged = cd_ds.map_batches(
                tag_child, batch_format="pyarrow", zero_copy_batch=True
            ).union(parent_ds.map_batches(
                parent_distinct, batch_format="pyarrow", zero_copy_batch=True))
            fp_pdf = (tagged.groupby("k")
                      .aggregate(Sum("is_parent", alias_name="n_parent"))
                      .filter(expr="n_parent == 0").to_pandas())
            fp_keys = (set(fp_pdf["k"]) if "k" in fp_pdf.columns else set())
            missing = np.array(sorted(certain_missing | fp_keys), dtype=str)
        else:
            raise ValueError(f"unknown semi_join {semi_join!r}")
        mref = ray.put(missing)

        def emit_rows(batch: pa.Table) -> pa.Table:
            miss = ray.get(mref)
            keys, rk, paths = extract(batch)
            if len(keys) == 0 or len(miss) == 0:
                return empty_violations()
            ks = (keys.to_numpy(zero_copy_only=False)
                  if isinstance(keys, (pa.Array, pa.ChunkedArray))
                  else np.asarray(keys)).astype(str)
            p2 = np.clip(np.searchsorted(miss, ks), 0, len(miss) - 1)
            bad = miss[p2] == ks
            return _emit_missing(keys, rk, paths, bad, rule, parent_name)

        return child_ds.map_batches(emit_rows, batch_format="pyarrow",
                                    zero_copy_batch=True)

    raise ValueError(f"unknown mode {mode!r}")
