"""Data mixing + document chunking — the last-mile shaping ops of a
training-corpus pipeline.

- ``sample_by_source``: static domain mixing (the public DoReMi /
  The-Pile recipe shape): each source keeps a caller-given fraction of
  its documents. Selection is a pure function of (seed, doc_id) via the
  engine's counter-based hashing — deterministic under retries, block
  splits and cluster size, with no RNG state to coordinate; expected
  proportions hold per block, so the op is one stateless streamed filter
  (no shuffle, no driver state).

- ``chunk_documents``: split each document into ≤ max_tokens whitespace-
  token windows with ``overlap`` tokens of context carry-over (the
  context-window packing step before tokenizer/loader hand-off). One
  flat-map-shaped ``map_batches`` pass; chunk ids are (doc_id, chunk_idx)
  so downstream stays resumable/joinable. Token reconstruction is exact:
  concatenating each chunk's non-overlap tail reproduces the document's
  token stream (property-tested).

- ``pack_sequences``: bin-pack items (docs or chunks) into fixed
  ``capacity``-token training sequences WITHOUT splitting items — the
  packing step between chunking and loader hand-off. Packing is
  block-local by design (bin-packing needs no global view: at corpus
  scale each block packs independently with zero shuffle; the waste is
  bounded by the open bins of one block, negligible against a block's
  thousands of sequences). Within a block the result is independent of
  row order (items are canonically ordered first) and sequence ids are
  content-addressed (hash of member keys), so retries and block
  reordering reproduce identical rows.
"""

from __future__ import annotations

import hashlib
from typing import Dict, List

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..determinism import hash_strings


def temperature_weights(counts: Dict[str, int], alpha: float = 0.3
                        ) -> Dict[str, float]:
    """Exponential-smoothing mixture rates (multilingual-LM recipe,
    Conneau & Lample 2019 / XLM-R): given observed per-source sizes
    ``c_i``, the target sampling distribution is ``q_i ∝ p_i^alpha``
    where ``p_i = c_i / Σc``. Realizing q by per-source resampling needs
    rate_i ∝ q_i / p_i; rates are normalized so ``max(rate) == 1.0``
    when downsampling-only (pass the dict to :func:`sample_by_source`),
    or left unnormalized>1 for :func:`resample_by_rate` upsampling.

    alpha=1 reproduces the natural distribution (all rates 1);
    alpha=0 targets the uniform mixture (rate ∝ 1/p_i). Pure driver
    math over O(#sources) scalars.
    """
    if not 0.0 <= alpha <= 1.0:
        raise ValueError(f"alpha must be in [0,1], got {alpha}")
    srcs = sorted(counts)
    c = np.array([counts[s] for s in srcs], dtype=np.float64)
    if (c <= 0).any():
        raise ValueError("source counts must be positive")
    p = c / c.sum()
    q = p ** alpha
    q /= q.sum()
    rate = q / p
    rate /= rate.max()
    return {s: float(r) for s, r in zip(srcs, rate)}


def source_counts(ds, *, source_col: str = "source") -> Dict[str, int]:
    """Exact per-source row counts in one streamed pass: per-block hash
    aggregates, driver merges O(#sources × #blocks) tiny partials (the
    source domain is catalog-bounded)."""
    def partial(b: pa.Table) -> pa.Table:
        g = (b.select([source_col]).group_by([source_col])
             .aggregate([([], "count_all")]))
        return pa.Table.from_arrays([g[source_col], g["count_all"]],
                                    names=["s", "n"])

    pdf = (ds.map_batches(partial, batch_format="pyarrow",
                          zero_copy_batch=True).to_pandas())
    if not len(pdf):
        return {}
    g = pdf.groupby("s")["n"].sum()
    return {str(s): int(n) for s, n in g.items()}


def resample_by_rate(ds, rates: Dict[str, float], *,
                     source_col: str = "source", key_col: str = "doc_id",
                     seed: int = 42, default_rate: float = 1.0):
    """Resample each source at ``rates[source]`` ≥ 0, ALLOWING
    upsampling: a rate of 2.5 emits 2 deterministic copies of every row
    plus a third for the 50% of keys whose (seed, key) draw lands under
    the fraction. Output gains a ``copy_ix`` int32 column (0-based copy
    ordinal) so downstream keys stay unique: (key, copy_ix).

    Epoch-style oversampling of scarce sources is how temperature
    mixtures are realized without dropping the big sources to slivers.
    Stateless streamed pass — replication is block-local ``take`` on a
    vectorized repeat index; no shuffle, no driver state.
    """
    for s, r in rates.items():
        if r < 0:
            raise ValueError(f"rate for {s!r} must be >= 0, got {r}")

    def rep(b: pa.Table) -> pa.Table:
        src = b[source_col].to_numpy(zero_copy_only=False)
        rate = np.array([rates.get(s, default_rate) for s in src],
                        dtype=np.float64)
        whole = np.floor(rate).astype(np.int64)
        frac = rate - whole
        keys = pc.cast(b[key_col], pa.string()).to_numpy(
            zero_copy_only=False)
        u = (hash_strings(np.char.add(keys.astype(str), f"|tmix{seed}"))
             .astype(np.float64) / 2.0 ** 64)
        n_copies = whole + (u < frac)
        idx = np.repeat(np.arange(len(src)), n_copies)
        out = b.take(pa.array(idx, pa.int64()))
        starts = np.cumsum(n_copies) - n_copies
        copy_ix = np.arange(len(idx)) - np.repeat(starts, n_copies)
        return out.append_column("copy_ix",
                                 pa.array(copy_ix, pa.int32()))

    return ds.map_batches(rep, batch_format="pyarrow",
                          zero_copy_batch=True)


def sample_by_temperature(ds, *, alpha: float = 0.3,
                          source_col: str = "source",
                          key_col: str = "doc_id", seed: int = 42,
                          upsample: bool = False):
    """End-to-end temperature mixing: one counting pass → rates →
    streamed resample. With ``upsample=False`` the largest-rate source
    keeps everything and the rest downsample (`sample_by_source`);
    with ``upsample=True`` rates are rescaled so the LARGEST source
    keeps rate 1.0 and scarce sources replicate above 1
    (`resample_by_rate`).

    Returns (dataset, rates) so callers can log the realized mixture.
    """
    counts = source_counts(ds, source_col=source_col)
    if not counts:
        return ds, {}
    rates = temperature_weights(counts, alpha)
    if upsample:
        big = max(counts, key=counts.get)
        scale = 1.0 / rates[big]
        rates = {s: r * scale for s, r in rates.items()}
        return (resample_by_rate(ds, rates, source_col=source_col,
                                 key_col=key_col, seed=seed), rates)
    return (sample_by_source(ds, rates, source_col=source_col,
                             key_col=key_col, seed=seed), rates)


def sample_by_source(ds, weights: Dict[str, float], *,
                     source_col: str = "source", key_col: str = "doc_id",
                     seed: int = 42, default_weight: float = 1.0):
    """Keep each row with probability ``weights[source]`` (deterministic
    in (seed, key)); sources absent from the map use default_weight."""
    for s, w in weights.items():
        if not 0.0 <= w <= 1.0:
            raise ValueError(f"weight for {s!r} must be in [0,1], got {w}")

    def keep(b: pa.Table) -> pa.Table:
        keys = pc.cast(b[key_col], pa.string()).to_numpy(zero_copy_only=False)
        u = (hash_strings(np.char.add(keys.astype(str), f"|mix{seed}"))
             .astype(np.float64) / 2.0 ** 64)
        src = b[source_col].to_numpy(zero_copy_only=False)
        thresh = np.array([weights.get(s, default_weight) for s in src],
                          dtype=np.float64)
        return b.filter(pa.array(u < thresh))

    return ds.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True)


def domain_kl_weights(ds, *, domain_col: str = "source",
                      text_col: str = "text", vocab_size: int = 50_000,
                      eta: float = 1.0, smooth: float = 0.2):
    """Diversity-preserving domain mixture reweighting → frame
    (domain, n_tokens, kl_bits, weight), weights summing to 1.

    Signal: KL(p_d ‖ q) in bits — how far each domain's unigram
    distribution sits from the corpus mixture q (computed exactly over
    the corpus top-``vocab_size`` vocabulary + one OOV bucket, add-one
    smoothed). The update is the DoReMi exponentiated-gradient step
    (Xie et al. 2023, public method): ``w_d ∝ exp(eta · excess_d)``
    with uniform smoothing ``(1-smooth)·w + smooth/k`` — here with KL
    as the excess term (the full DoReMi trains a proxy model for it;
    this one-pass variant upweights domains the corpus-level
    distribution serves worst, the same direction).

    Plan: one footer-pruned pass for the shared vocab (`fit_unigram`),
    one streamed pass of per-(domain, token-id) count partials —
    bounded by #domains × (vocab_size+1), a DOMAIN quantity — then
    driver math on the merged counts. No shuffle."""
    import ray

    from .lm_score import fit_unigram

    toks, _logp, _oov = fit_unigram(ds, text_col=text_col,
                                    vocab_size=vocab_size)
    ref = ray.put(toks)
    v = len(toks)

    def partial(b: pa.Table) -> pa.Table:
        vt = ray.get(ref)
        doms = b[domain_col].to_numpy(zero_copy_only=False)
        texts = b[text_col].to_numpy(zero_copy_only=False)
        out_d: list = []
        out_i: list = []
        for d, t in zip(doms, texts):
            ts = (t or "").lower().split()
            if not ts:
                continue
            arr = np.array(ts, dtype=object)
            if v:
                pos = np.clip(np.searchsorted(vt, arr), 0, v - 1)
                ids = np.where(vt[pos] == arr, pos, v)  # v = OOV bucket
            else:
                ids = np.full(len(arr), v, dtype=np.int64)
            out_d.append(np.full(len(ids), d, dtype=object))
            out_i.append(ids)
        if not out_i:
            # same schema as the aggregate branch (count_all, not "n")
            # or block concatenation fails on schema unification
            return pa.Table.from_pydict({
                "d": pa.array([], pa.string()),
                "tid": pa.array([], pa.int64()),
                "count_all": pa.array([], pa.int64())})
        dd = np.concatenate(out_d)
        ii = np.concatenate(out_i).astype(np.int64)
        t = pa.table({"d": pa.array(dd, pa.string()),
                      "tid": pa.array(ii, pa.int64())})
        return t.group_by(["d", "tid"]).aggregate([([], "count_all")])

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True).to_pandas()
    if not len(parts):
        return pd.DataFrame({"domain": [], "n_tokens": [],
                             "kl_bits": [], "weight": []})
    g = (parts.groupby(["d", "tid"], as_index=False)["count_all"].sum())
    domains = sorted(g["d"].unique())
    k = len(domains)
    counts = np.ones((k, v + 1), dtype=np.float64)      # add-one smooth
    di = {d: i for i, d in enumerate(domains)}
    counts[g["d"].map(di).to_numpy(),
           g["tid"].to_numpy()] += g["count_all"].to_numpy()
    p = counts / counts.sum(axis=1, keepdims=True)
    qc = counts.sum(axis=0)
    q = qc / qc.sum()
    kl = (p * np.log2(p / q[None, :])).sum(axis=1)
    w = np.exp(eta * kl)
    w = w / w.sum()
    w = (1.0 - smooth) * w + smooth / k
    n_tok = (counts - 1).sum(axis=1).astype(np.int64)
    return pd.DataFrame({
        "domain": domains, "n_tokens": n_tok,
        "kl_bits": np.round(kl, 6),
        "weight": np.round(w, 6)})


def assign_splits(ds, ratios: Dict[str, float], *,
                  key_col: str = "doc_id", seed: int = 42,
                  out_col: str = "split"):
    """Deterministic train/val/test assignment: append ``out_col`` with
    the split name drawn from ``ratios`` (must sum to 1 within 1e-9).

    Assignment is pure in (seed, key) — the same counter-based-hash
    contract as ``sample_by_source``: a document lands in the same split
    under retries, block splits, cluster resize, or re-ingestion, which
    is what prevents silent train/eval leakage when a corpus is rebuilt.
    Split names are processed in sorted order so the cut points are
    independent of dict insertion order. Sizes are binomial (hash-split
    convention); use ``budget.sample_exact_k`` when exact counts matter."""
    if abs(sum(ratios.values()) - 1.0) > 1e-9:
        raise ValueError(f"ratios must sum to 1, got {sum(ratios.values())}")
    if any(w < 0 for w in ratios.values()):
        raise ValueError("ratios must be non-negative")
    names = sorted(ratios)
    cuts = np.cumsum([ratios[s] for s in names])
    cuts[-1] = 1.0 + 1e-15          # guard the topmost edge

    def tag(b: pa.Table) -> pa.Table:
        keys = pc.cast(b[key_col], pa.string()).to_numpy(
            zero_copy_only=False)
        u = (hash_strings(np.char.add(keys.astype(str), f"|split{seed}"))
             .astype(np.float64) / 2.0 ** 64)
        idx = np.searchsorted(cuts, u, side="right")
        lab = np.asarray(names, dtype=object)[np.clip(idx, 0, len(names) - 1)]
        return b.append_column(out_col, pa.array(lab, pa.string()))

    return ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)


def chunk_documents(ds, *, text_col: str = "text", key_col: str = "doc_id",
                    max_tokens: int = 512, overlap: int = 0):
    """→ Dataset (doc_id, chunk_idx, text, n_tokens); empty docs emit no
    chunks. ``overlap`` tokens repeat at the start of each later chunk."""
    if overlap >= max_tokens:
        raise ValueError("overlap must be smaller than max_tokens")
    if overlap < 0:
        raise ValueError(
            "overlap must be non-negative (a negative overlap would "
            "silently skip the tokens between chunks)")
    step = max_tokens - overlap

    def chunk(b: pa.Table) -> pa.Table:
        keys = pc.cast(b[key_col], pa.string()).to_numpy(zero_copy_only=False)
        texts = b[text_col].to_numpy(zero_copy_only=False)
        out_key: List[str] = []
        out_idx: List[int] = []
        out_text: List[str] = []
        out_n: List[int] = []
        for k, t in zip(keys, texts):
            toks = (t or "").split()
            if not toks:
                continue
            i = 0
            ci = 0
            while True:
                window = toks[i:i + max_tokens]
                out_key.append(k)
                out_idx.append(ci)
                out_text.append(" ".join(window))
                out_n.append(len(window))
                if i + max_tokens >= len(toks):
                    break
                i += step
                ci += 1
        return pa.Table.from_pydict({
            "doc_id": pa.array(out_key, pa.string()),
            "chunk_idx": pa.array(out_idx, pa.int64()),
            "text": pa.array(out_text, pa.string()),
            "n_tokens": pa.array(out_n, pa.int64())})

    return ds.map_batches(chunk, batch_format="pyarrow", zero_copy_batch=True)


def _pack_block(keys: np.ndarray, sizes: np.ndarray, capacity: int,
                strategy: str):
    """Pack one block's items into bins; → (bin_of_item, order) where
    ``order`` is the canonical item order used (indices into keys)."""
    if strategy == "ffd":
        # first-fit-decreasing: stable sort by (-size, key) — canonical
        # regardless of incoming row order. The per-item probe is one
        # vectorized scan over open-bin remainders.
        order = np.lexsort((keys, -sizes))
    elif strategy == "nextfit":
        order = np.argsort(keys, kind="stable")
    else:
        raise ValueError(f"unknown packing strategy {strategy!r}")

    bin_of = np.empty(len(order), dtype=np.int64)
    if strategy == "nextfit":
        b = -1
        rem = -1
        for i in order:
            s = int(sizes[i])
            if s > rem:
                b += 1
                rem = capacity
            bin_of[i] = b
            rem -= s
        return bin_of, order

    rem = np.empty(0, dtype=np.int64)  # remaining capacity per open bin
    n_bins = 0
    for i in order:
        s = int(sizes[i])
        fit = np.flatnonzero(rem[:n_bins] >= s)
        if len(fit):
            b = int(fit[0])
        else:
            if n_bins == len(rem):
                rem = np.concatenate(
                    [rem, np.full(max(8, len(rem)), -1, dtype=np.int64)])
            b = n_bins
            rem[b] = capacity
            n_bins += 1
        rem[b] -= s
        bin_of[i] = b
    return bin_of, order


def pack_sequences(ds, *, key_col: str = "doc_id",
                   tokens_col: str = "n_tokens", capacity: int = 2048,
                   strategy: str = "ffd", emit: str = "summary",
                   batch_size: int | None = None):
    """Pack items into ≤ ``capacity``-token sequences (no item is split;
    an item larger than capacity becomes its own sequence with
    ``overflow=true``). ``emit='summary'`` → one row per sequence
    (seq_id, n_items, total_tokens, fill_ratio, overflow);
    ``emit='assignments'`` → one row per item (seq_id, <key_col>, slot,
    n_tokens). seq_id = md5 of the member keys in slot order, so ids are
    stable under retries and dataset reordering. ``batch_size=None``
    packs whole blocks (the intended granularity); pass an int to bound
    the packing unit (and hence the FFD probe cost) on huge blocks."""
    if capacity <= 0:
        raise ValueError("capacity must be positive")
    if emit not in ("summary", "assignments"):
        raise ValueError(f"unknown emit mode {emit!r}")

    def pack(b: pa.Table) -> pa.Table:
        keys = pc.cast(b[key_col], pa.string()).to_numpy(zero_copy_only=False)
        sizes = pc.cast(b[tokens_col], pa.int64()).to_numpy(
            zero_copy_only=False).astype(np.int64)
        keep = sizes > 0  # empty items carry no tokens: nothing to pack
        keys, sizes = keys[keep], sizes[keep]
        if not len(keys):
            if emit == "assignments":
                return pa.Table.from_pydict({
                    "seq_id": pa.array([], pa.string()),
                    key_col: pa.array([], pa.string()),
                    "slot": pa.array([], pa.int64()),
                    "n_tokens": pa.array([], pa.int64())})
            return pa.Table.from_pydict({
                "seq_id": pa.array([], pa.string()),
                "n_items": pa.array([], pa.int64()),
                "total_tokens": pa.array([], pa.int64()),
                "fill_ratio": pa.array([], pa.float64()),
                "overflow": pa.array([], pa.bool_())})

        bin_of, order = _pack_block(keys, sizes, capacity, strategy)
        # member keys per bin, in slot (packing) order
        members: Dict[int, List[int]] = {}
        for i in order:
            members.setdefault(int(bin_of[i]), []).append(int(i))
        seq_ids = {
            b_: hashlib.md5("|".join(keys[j] for j in idxs).encode()
                            ).hexdigest()[:16]
            for b_, idxs in members.items()}

        if emit == "assignments":
            out_seq, out_key, out_slot, out_n = [], [], [], []
            for b_, idxs in sorted(members.items()):
                for slot, j in enumerate(idxs):
                    out_seq.append(seq_ids[b_])
                    out_key.append(keys[j])
                    out_slot.append(slot)
                    out_n.append(int(sizes[j]))
            return pa.Table.from_pydict({
                "seq_id": pa.array(out_seq, pa.string()),
                key_col: pa.array(out_key, pa.string()),
                "slot": pa.array(out_slot, pa.int64()),
                "n_tokens": pa.array(out_n, pa.int64())})

        out_seq, out_ni, out_tt, out_fill, out_ovf = [], [], [], [], []
        for b_, idxs in sorted(members.items()):
            tot = int(sizes[np.asarray(idxs)].sum())
            out_seq.append(seq_ids[b_])
            out_ni.append(len(idxs))
            out_tt.append(tot)
            out_fill.append(round(min(tot, capacity) / capacity, 4))
            out_ovf.append(tot > capacity)
        return pa.Table.from_pydict({
            "seq_id": pa.array(out_seq, pa.string()),
            "n_items": pa.array(out_ni, pa.int64()),
            "total_tokens": pa.array(out_tt, pa.int64()),
            "fill_ratio": pa.array(out_fill, pa.float64()),
            "overflow": pa.array(out_ovf, pa.bool_())})

    return ds.map_batches(pack, batch_format="pyarrow", zero_copy_batch=True,
                          batch_size=batch_size)


def length_bucket_stats(ds, *, text_col: str = "text",
                        min_cap: int = 16) -> pa.Table:
    """Length-bucketed batching report: assign every document to the
    power-of-two token-capacity bucket it would be padded into
    (cap = smallest power of two ≥ its whitespace-token count, floored at
    ``min_cap``) and roll up per-bucket document/token totals plus the
    padding waste a pad-to-bucket loader would pay. The standard
    padding-efficiency probe before choosing loader bucket boundaries.

    Ray shape: one streamed pass emits per-block (bucket, n_docs,
    n_tokens, pad) hash-aggregate partials — the driver merges
    O(#buckets × #blocks) tiny rows (#buckets ≈ log2 of the longest doc).
    No shuffle, no per-row Python.

    → (bucket_cap, n_docs, n_tokens, pad_tokens, pad_frac) sorted by
    bucket_cap; pad_frac = pad / (bucket_cap × n_docs). CONVENTIONS
    (pinned by tests/test_mixing.py's pandas + DuckDB references):
    empty/whitespace-only docs count as min_cap-bucket members with 0
    tokens (the census covers every input row — filter upstream if the
    loader drops empties), and tokens are the RE2 ``\\s+`` split the
    SQL oracles evaluate (ASCII whitespace), not Python ``str.split``.
    """
    import pandas as pd

    def partial(b: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(
            pc.utf8_lower(pc.fill_null(b[text_col], "")), r"\s+")
        flat = pc.list_flatten(toks)
        nonempty = pc.not_equal(flat, "")
        # per-row count of non-empty tokens: sum a 0/1 mask per list slot
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        mask = nonempty.to_numpy(zero_copy_only=False).astype(np.int64)
        starts = np.zeros(len(lens), dtype=np.int64)
        np.cumsum(lens[:-1], out=starts[1:])
        n = np.zeros(len(lens), dtype=np.int64)
        nz = lens > 0
        if mask.size and nz.any():
            n[nz] = np.add.reduceat(mask, starts[nz])
        cap = np.maximum(
            min_cap,
            1 << np.ceil(np.log2(np.maximum(n, 1))).astype(np.int64))
        t = pa.Table.from_pydict({
            "bucket_cap": pa.array(cap, pa.int64()),
            "n": pa.array(n, pa.int64()),
            "pad": pa.array(cap - n, pa.int64())})
        g = t.group_by("bucket_cap").aggregate(
            [("n", "sum"), ("pad", "sum"), ([], "count_all")])
        return pa.Table.from_arrays(
            [g["bucket_cap"], g["count_all"], g["n_sum"], g["pad_sum"]],
            names=["bucket_cap", "n_docs", "n_tokens", "pad_tokens"])

    pdf = ds.map_batches(partial, batch_format="pyarrow",
                         zero_copy_batch=True).to_pandas()
    if "bucket_cap" not in pdf.columns or not len(pdf):
        return pa.Table.from_pydict({
            "bucket_cap": pa.array([], pa.int64()),
            "n_docs": pa.array([], pa.int64()),
            "n_tokens": pa.array([], pa.int64()),
            "pad_tokens": pa.array([], pa.int64()),
            "pad_frac": pa.array([], pa.float64())})
    g = (pdf.groupby("bucket_cap", as_index=False)
            .agg(n_docs=("n_docs", "sum"), n_tokens=("n_tokens", "sum"),
                 pad_tokens=("pad_tokens", "sum"))
            .sort_values("bucket_cap").reset_index(drop=True))
    g["pad_frac"] = (g["pad_tokens"]
                     / (g["bucket_cap"] * g["n_docs"])).round(4)
    for c in ("n_docs", "n_tokens", "pad_tokens"):
        g[c] = g[c].astype("int64")
    return pa.Table.from_pandas(
        g[["bucket_cap", "n_docs", "n_tokens", "pad_tokens", "pad_frac"]],
        preserve_index=False)
