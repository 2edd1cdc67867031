"""Deterministic synthetic interleaved-document generator.

Generates the primary input table (schema.DOCUMENTS_INTERLEAVED), the
``media_catalog`` parent table, and the golden expected-violation rows —
all as pure functions of (seed, doc index), so:

- the table is identical no matter how Ray splits the index range into
  blocks (batch-split independence),
- retried tasks regenerate byte-identical blocks,
- golden outputs are computable exactly without running the validator
  (FIXTURES.md).

Violation injection: each doc draws ONE uniform u = U(seed, idx); the
configured per-rule fractions partition [0, sum_f) so at most one rule is
injected per doc, which keeps golden rows trivially enumerable (mirrors the
reference's constraint unit tests that construct one violating object per
case, e.g. cerberus/tests/test_bookings.py:48-56).

The 'unique-doc-id' injection only fires at even indices > 0 and copies the
doc_id of idx-1 (odd indices never lose their id), so duplicate groups are
always exactly {idx-1, idx} with count 2.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict

import numpy as np
import pyarrow as pa

from .determinism import hash_idx, randint, uniform01
from .rules import details as D
from .schema import DOCUMENTS_INTERLEAVED, MEDIA_CATALOG, MEDIA_KINDS, VIOLATIONS

# fixed word bank for span text (deterministic, no external data)
_WORDS = np.array(
    "the quick brown fox jumps over lazy dog data span media table audio image "
    "text offset batch stream arrow block shuffle merge sort filter rule check "
    "valid hash key ref doc row col part group agg join scan read write".split()
)

# salts for independent hash streams
_S_RULE = 0xABC
_S_NSPAN = 1
_S_POS = 2
_S_MEDIA = 3
_S_HOT = 4

DEFAULT_FRACTIONS: Dict[str, float] = {
    "span-kind-domain": 0.004,
    "span-text-required": 0.004,
    "span-text-maxlen": 0.004,
    "span-media-ref-for-text": 0.004,
    "span-media-ref-required": 0.004,
    "span-offset-negative": 0.004,
    "span-offset-order": 0.004,
    "fk-missing": 0.006,
    "unique-doc-id": 0.006,
}


@dataclass(frozen=True)
class GenConfig:
    n_docs: int = 1000
    seed: int = 42
    n_media: int = 1000
    min_spans: int = 2
    max_spans: int = 8
    text_max_len: int = 256
    #: fraction of media spans routed to a small hot-key set (skew testing)
    hot_media_frac: float = 0.0
    hot_media_n: int = 4
    fractions: Dict[str, float] = field(default_factory=lambda: dict(DEFAULT_FRACTIONS))

    def rule_bounds(self):
        """Cumulative [lo, hi) slots of u-space per rule, fixed order."""
        out, acc = {}, 0.0
        for r in sorted(self.fractions):
            f = self.fractions[r]
            out[r] = (acc, acc + f)
            acc += f
        assert acc < 1.0, "violation fractions must sum to < 1"
        return out


def _doc_ids(idx: np.ndarray) -> np.ndarray:
    return np.char.mod("d%010d", idx)


def _injected_rule(cfg: GenConfig, idx: np.ndarray):
    """Return (rule_code per doc, rule list). Code -1 = clean."""
    u = uniform01(idx, cfg.seed, _S_RULE)
    bounds = cfg.rule_bounds()
    rules = list(bounds)
    code = np.full(len(idx), -1, dtype=np.int64)
    for i, r in enumerate(rules):
        lo, hi = bounds[r]
        code[(u >= lo) & (u < hi)] = i
    # unique-doc-id only legal at even idx > 0
    if "unique-doc-id" in bounds:
        k = rules.index("unique-doc-id")
        code[(code == k) & ((idx % 2 == 1) | (idx == 0))] = -1
    return code, rules


def gen_docs_batch(idx: np.ndarray, cfg: GenConfig) -> pa.Table:
    """Generate documents for the given doc indices (pure function)."""
    idx = np.asarray(idx, dtype=np.int64)
    n = len(idx)
    doc_id = _doc_ids(idx)

    code, rules = _injected_rule(cfg, idx)

    # duplicate-id injection
    dup_k = rules.index("unique-doc-id") if "unique-doc-id" in rules else -2
    dup_mask = code == dup_k
    if dup_mask.any():
        doc_id = doc_id.copy()
        doc_id[dup_mask] = np.char.mod("d%010d", idx[dup_mask] - 1)

    # span counts and flattened layout
    counts = randint(idx, cfg.seed, _S_NSPAN, cfg.min_spans, cfg.max_spans + 1)
    total = int(counts.sum())
    starts = np.zeros(n, dtype=np.int64)
    np.cumsum(counts[:-1], out=starts[1:])
    parent = np.repeat(np.arange(n), counts)
    span_j = np.arange(total) - np.repeat(starts, counts)

    # per-span hash stream keyed by (doc index, span position)
    skey = idx[parent] * np.int64(1_000_003) + span_j
    g = hash_idx(skey, cfg.seed, 7)

    # kind: 70% text, rest uniformly over media kinds
    kr = (g % np.uint64(100)).astype(np.int64)
    is_text = kr < 70
    media_kind_idx = ((g >> np.uint64(8)) % np.uint64(len(MEDIA_KINDS))).astype(np.int64)
    kinds = np.where(
        is_text, "text", np.array(MEDIA_KINDS, dtype=object)[media_kind_idx]
    ).astype(object)

    # text: three hashed words (vectorized); None for media spans
    w1 = _WORDS[(g % np.uint64(len(_WORDS))).astype(np.int64)]
    w2 = _WORDS[((g >> np.uint64(16)) % np.uint64(len(_WORDS))).astype(np.int64)]
    w3 = _WORDS[((g >> np.uint64(32)) % np.uint64(len(_WORDS))).astype(np.int64)]
    texts = np.char.add(np.char.add(np.char.add(w1, " "), np.char.add(w2, " ")), w3).astype(object)
    texts[~is_text] = None

    # media_ref: None for text spans; hashed id for media spans (with optional hot keys)
    mnum = (hash_idx(skey, cfg.seed, _S_MEDIA) % np.uint64(cfg.n_media)).astype(np.int64)
    if cfg.hot_media_frac > 0:
        hot = uniform01(skey, cfg.seed, _S_HOT) < cfg.hot_media_frac
        mnum[hot] = mnum[hot] % cfg.hot_media_n
    refs = np.char.mod("m%08d", mnum).astype(object)
    refs[is_text] = None

    # offsets: grouped cumulative sum of per-span increments in [1, 50]
    incr = ((g >> np.uint64(40)) % np.uint64(50)).astype(np.int64) + 1
    cs = np.cumsum(incr)
    base = cs[starts] - incr[starts]
    offsets = (cs - np.repeat(base, counts)).astype(np.int64)

    # --- violation injections (at most one per doc) -----------------------
    # span position hit by the injection, per doc
    pos = randint(idx, cfg.seed, _S_POS, 0, 10**9) % counts
    flat = starts + pos  # flattened index of the injected span per doc

    def hit(rule):
        if rule not in rules:
            return np.zeros(n, dtype=bool)
        return code == rules.index(rule)

    m = hit("span-kind-domain")
    if m.any():
        kinds[flat[m]] = "video"
        # a 'video' span behaves like media: give it a ref, drop text
        texts[flat[m]] = None
        refs[flat[m]] = np.char.mod("m%08d", mnum[flat[m]]).astype(object)

    m = hit("span-text-required")
    if m.any():
        f = flat[m]
        kinds[f] = "text"
        texts[f] = None
        refs[f] = None

    m = hit("span-text-maxlen")
    if m.any():
        f = flat[m]
        kinds[f] = "text"
        refs[f] = None
        texts[f] = "x" * (cfg.text_max_len + 7)

    m = hit("span-media-ref-for-text")
    if m.any():
        f = flat[m]
        kinds[f] = "text"
        texts[f] = "stray ref span"
        refs[f] = np.char.mod("m%08d", mnum[f]).astype(object)

    m = hit("span-media-ref-required")
    if m.any():
        f = flat[m]
        kinds[f] = "image"
        texts[f] = None
        refs[f] = None

    m = hit("span-offset-negative")
    if m.any():
        # at span position 0 only, so the order rule can't also fire
        offsets[starts[m]] = -1

    m = hit("span-offset-order")
    if m.any():
        # force a decrease at the injected span; pos 0 remaps to 1 (counts >= 2).
        # new value = prev - 1 stays >= 0 (prev is a cumsum of increments >= 1),
        # so the negative-offset rule can't also fire.
        f = starts[m] + np.maximum(pos[m], 1)
        offsets[f] = offsets[f - 1] - 1

    m = hit("fk-missing")
    if m.any():
        f = flat[m]
        kinds[f] = "image"
        texts[f] = None
        refs[f] = np.char.mod("missing%08d", idx[m]).astype(object)

    struct = pa.StructArray.from_arrays(
        [
            pa.array(kinds, type=pa.string()),
            pa.array(texts, type=pa.string()),
            pa.array(refs, type=pa.string()),
            pa.array(offsets, type=pa.int32()),
        ],
        names=["kind", "text", "media_ref", "offset"],
    )
    list_offsets = np.zeros(n + 1, dtype=np.int32)
    np.cumsum(counts, out=list_offsets[1:])
    spans = pa.ListArray.from_arrays(pa.array(list_offsets, type=pa.int32()), struct)
    return pa.Table.from_arrays(
        [pa.array(doc_id.astype(object), type=pa.string()), spans],
        schema=DOCUMENTS_INTERLEAVED,
    )


def gen_media_catalog(cfg: GenConfig) -> pa.Table:
    k = np.arange(cfg.n_media, dtype=np.int64)
    refs = np.char.mod("m%08d", k).astype(object)
    kind = np.array(MEDIA_KINDS, dtype=object)[
        (hash_idx(k, cfg.seed, 11) % np.uint64(len(MEDIA_KINDS))).astype(np.int64)
    ]
    nbytes = (hash_idx(k, cfg.seed, 12) % np.uint64(10_000_000)).astype(np.int64)
    return pa.Table.from_arrays(
        [
            pa.array(refs, type=pa.string()),
            pa.array(kind, type=pa.string()),
            pa.array(nbytes, type=pa.int64()),
        ],
        schema=MEDIA_CATALOG,
    )


def expected_violations(cfg: GenConfig) -> pa.Table:
    """Golden (doc_id, rule, path, detail) rows for the whole table.

    Recomputes the same hash decisions as gen_docs_batch — never runs the
    validator. Sorted by (doc_id, rule, path).
    """
    idx = np.arange(cfg.n_docs, dtype=np.int64)
    code, rules = _injected_rule(cfg, idx)
    counts = randint(idx, cfg.seed, _S_NSPAN, cfg.min_spans, cfg.max_spans + 1)
    pos = randint(idx, cfg.seed, _S_POS, 0, 10**9) % counts

    rows = {"doc_id": [], "rule": [], "path": [], "detail": []}

    def add(doc_id, rule, path, detail):
        rows["doc_id"].append(doc_id)
        rows["rule"].append(rule)
        rows["path"].append(path)
        rows["detail"].append(detail)

    doc_id = _doc_ids(idx)
    from .schema import SPAN_KINDS

    for i in np.flatnonzero(code >= 0):
        r = rules[code[i]]
        p = int(pos[i])
        did = str(doc_id[i])
        if r == "span-kind-domain":
            add(did, r, D.span_path(p, "kind"), D.d_kind_domain("video", SPAN_KINDS))
        elif r == "span-text-required":
            add(did, r, D.span_path(p, "text"), D.d_text_required())
        elif r == "span-text-maxlen":
            add(did, r, D.span_path(p, "text"),
                D.d_text_maxlen(cfg.text_max_len + 7, cfg.text_max_len))
        elif r == "span-media-ref-for-text":
            add(did, r, D.span_path(p, "media_ref"), D.d_media_ref_for_text())
        elif r == "span-media-ref-required":
            add(did, r, D.span_path(p, "media_ref"), D.d_media_ref_required("image"))
        elif r == "span-offset-negative":
            add(did, r, D.span_path(0, "offset"), D.d_offset_negative(-1))
        elif r == "span-offset-order":
            pp = max(p, 1)
            # recompute this doc's original offsets to know prev / new values
            cnt = int(counts[i])
            skey = idx[i] * np.int64(1_000_003) + np.arange(cnt, dtype=np.int64)
            gg = hash_idx(skey, cfg.seed, 7)
            inc = ((gg >> np.uint64(40)) % np.uint64(50)).astype(np.int64) + 1
            offs = np.cumsum(inc)
            prev = int(offs[pp - 1])
            add(did, r, D.span_path(pp, "offset"), D.d_offset_order(prev - 1, prev))
        elif r == "fk-missing":
            add(did, r, D.span_path(p, "media_ref"),
                D.d_fk_missing(f"missing{int(idx[i]):08d}"))
        elif r == "unique-doc-id":
            add(f"d{int(idx[i]) - 1:010d}", r, "doc_id", D.d_unique(2))
    t = pa.Table.from_pydict(rows, schema=VIOLATIONS)
    return t.sort_by([("doc_id", "ascending"), ("rule", "ascending")])


#: rules attributed to a doc OTHER than the one carrying them, or needing
#: global state — excluded from row-local verdict golden derivation
_GLOBAL_RULES = ("unique-doc-id", "fk-missing")


def expected_fragment_verdicts(cfg: GenConfig, fragment_size: int) -> pa.Table:
    """Golden per-fragment verdicts for the ROW-LOCAL ruleset (the
    fragment_verdicts/validate pipeline surface): recomputed from the
    generator's injection bookkeeping, never from the validator.
    → (fragment_id, pass, n_rows, n_violations) sorted by fragment."""
    import pandas as pd

    golden = expected_violations(cfg).to_pandas()
    golden = golden[~golden["rule"].isin(_GLOBAL_RULES)]
    vidx = golden["doc_id"].str[1:].astype(np.int64) // fragment_size
    nv = vidx.value_counts()
    n_frags = -(-cfg.n_docs // fragment_size)
    frag_idx = np.arange(n_frags, dtype=np.int64)
    rows = np.full(n_frags, fragment_size, dtype=np.int64)
    rows[-1] = cfg.n_docs - fragment_size * (n_frags - 1)
    nviol = (pd.Series(0, index=frag_idx).add(nv, fill_value=0)
             .astype("int64").to_numpy())
    return pa.Table.from_pydict({
        "fragment_id": pa.array(
            np.char.mod("frag-%06d", frag_idx).astype(object),
            type=pa.string()),
        "pass": pa.array(nviol == 0),
        "n_rows": pa.array(rows),
        "n_violations": pa.array(nviol)})


def docs_dataset(cfg: GenConfig, *, parallelism: int = -1,
                 fragment_size: int = 0):
    """Distributed generation: ray.data.range → map_batches(gen_docs_batch).

    With fragment_size > 0, a deterministic ``fragment_id`` column
    (= doc_index // fragment_size) is attached for per-partition verdicts
    and checkpointing.
    """
    import ray.data as rd

    def make(batch):
        idx = batch["id"]
        t = gen_docs_batch(idx, cfg)
        if fragment_size > 0:
            frag = np.char.mod("frag-%06d", idx // fragment_size).astype(object)
            t = t.append_column("fragment_id", pa.array(frag, type=pa.string()))
        return t

    ds = rd.range(cfg.n_docs, override_num_blocks=parallelism if parallelism > 0 else None)
    return ds.map_batches(make, batch_format="numpy", batch_size=65536)


def media_dataset(cfg: GenConfig, *, blocks: int = 8):
    """Media catalog as a Dataset. from_arrow yields ONE block, which
    pins any downstream actor-pool stage (e.g. MediaDecoder) to a single
    task — split so decode parallelism matches the pool."""
    import ray.data as rd

    ds = rd.from_arrow(gen_media_catalog(cfg))
    return ds.repartition(blocks) if cfg.n_media >= blocks * 8 else ds


def write_fixture(cfg: GenConfig, out_dir: str) -> None:
    """Write docs + media_catalog + golden violations as parquet files."""
    import os

    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    idx = np.arange(cfg.n_docs, dtype=np.int64)
    pq.write_table(gen_docs_batch(idx, cfg), os.path.join(out_dir, "documents_interleaved.parquet"))
    pq.write_table(gen_media_catalog(cfg), os.path.join(out_dir, "media_catalog.parquet"))
    pq.write_table(expected_violations(cfg), os.path.join(out_dir, "golden_violations.parquet"))
