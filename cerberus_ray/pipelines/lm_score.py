"""Language-model quality scoring — per-document perplexity under a
corpus-fit unigram model.

The model-based quality-filter family of public corpus pipelines (CCNet
scores documents with a KenLM 5-gram; docs far from the reference
distribution are cut). The in-sandbox variant is a REAL scorer, not a
stub: the reference model is the corpus's own unigram distribution
(optionally a separate reference corpus), and each document's
cross-entropy / perplexity under it is exact.

Two streamed passes, no shuffle:

1. fit: token counts (the vocab machinery's per-block distinct-token
   hash aggregates) → driver merge of the frequency table, truncated to
   the top ``vocab_size`` tokens; everything else scores as one OOV
   bucket with add-one mass. The table broadcasts once via ``ray.put``
   as (sorted token array, log2-prob array) — O(vocab), never O(corpus).
2. score: per batch, flatten every doc's tokens, one ``searchsorted``
   lookup against the broadcast vocabulary, ``reduceat`` per-doc sums →
   (doc_id, n_tokens, xent, ppl). Pure vectorized numpy per block.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .vocab import _token_counts_block


def _doc_tokens(b: pa.Table, text_col: str):
    """Per-doc token stream with the SAME kernel the fit pass uses
    (Arrow utf8_lower + RE2 ``\\s+`` split): scoring with Python
    ``.lower().split()`` disagreed with the fit on non-ASCII whitespace
    (e.g. U+00A0 in scraped HTML), so tokens the vocab held could never
    match at scoring time. → (doc index per token, token object array,
    per-doc non-empty token counts)."""
    toks = pc.split_pattern_regex(
        pc.utf8_lower(pc.fill_null(b[text_col], "")), r"\s+")
    lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
    flat = pc.list_flatten(toks)
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    flat_np = flat.to_numpy(zero_copy_only=False)
    mask = flat_np != ""
    doc = np.repeat(np.arange(len(lens), dtype=np.int64),
                    lens)[mask]
    counts = np.bincount(doc, minlength=len(lens)).astype(np.int64)
    return doc, flat_np[mask], counts


def fit_unigram(ds, *, text_col: str = "text",
                vocab_size: int = 50_000) -> Tuple[np.ndarray, np.ndarray, float]:
    """→ (sorted token array, log2 p per token, log2 p for OOV).
    Add-one smoothing over vocab ∪ {OOV}."""
    pdf = ds.map_batches(
        lambda b: _token_counts_block(b, text_col),
        batch_format="pyarrow", zero_copy_batch=True).to_pandas()
    if "token" not in pdf.columns or not len(pdf):
        return (np.array([], dtype=object), np.array([], dtype=np.float64),
                0.0)
    g = (pdf.groupby("token", as_index=False)["n"].sum()
         .sort_values(["n", "token"], ascending=[False, True])
         .head(vocab_size))
    toks = g["token"].to_numpy(dtype=object)
    counts = g["n"].to_numpy(dtype=np.float64)
    total = counts.sum() + len(counts) + 1  # add-one incl. the OOV bucket
    order = np.argsort(toks)
    logp = np.log2((counts + 1.0) / total)[order]
    oov_logp = float(np.log2(1.0 / total))
    return toks[order], logp, oov_logp


def score_perplexity(docs_ds, *, text_col: str = "text",
                     key_col: str = "doc_id", vocab_size: int = 50_000,
                     reference_ds=None, carry_cols: Tuple[str, ...] = ()):
    """→ Dataset (doc_id, n_tokens, xent, ppl [, carry_cols...]):
    cross-entropy (bits per token) and perplexity of each document under
    the unigram model fit on ``reference_ds`` (default: the corpus
    itself). ``carry_cols`` are passed through unchanged (e.g. ``lang``
    for the per-language CCNet bucket split)."""
    import ray

    toks, logp, oov_logp = fit_unigram(
        reference_ds if reference_ds is not None else docs_ds,
        text_col=text_col, vocab_size=vocab_size)
    ref = ray.put((toks, logp, oov_logp))

    def score(b: pa.Table) -> pa.Table:
        vt, vl, oov = ray.get(ref)
        doc, arr, counts = _doc_tokens(b, text_col)
        if len(arr) and len(vt):
            pos = np.clip(np.searchsorted(vt, arr), 0, len(vt) - 1)
            hit = vt[pos] == arr
            lp = np.where(hit, vl[pos], oov)
        else:
            lp = np.full(len(arr), oov, dtype=np.float64)
        # bincount accumulates in traversal order — deterministic
        sums = (np.bincount(doc, weights=lp, minlength=len(counts))
                if len(lp) else np.zeros(len(counts)))
        xent = np.where(counts > 0, -sums / np.maximum(counts, 1), 0.0)
        arrays = [pc.cast(b[key_col], pa.string()),
                  pa.array(counts), pa.array(np.round(xent, 4)),
                  pa.array(np.round(np.exp2(xent), 2))]
        names = ["doc_id", "n_tokens", "xent", "ppl"]
        for c in carry_cols:
            arrays.append(b[c])
            names.append(c)
        return pa.Table.from_arrays(arrays, names=names)

    return docs_ds.map_batches(score, batch_format="pyarrow",
                               zero_copy_batch=True)


def grouped_quantile_thresholds(ds, *, score_col: str, group_col: str,
                                cuts: Tuple[float, ...] = (1 / 3, 2 / 3),
                                compression: float = 200.0) -> dict:
    """Per-group approximate quantile cut points via mergeable t-digests.

    One streamed pass emits a serialized digest per (block, group) — the
    driver merges O(#blocks × #groups) KB-sized rows and reads the cut
    points off each group's merged digest. No shuffle, no value
    materialization; the group universe (languages) is domain-bounded.
    → {group: np.ndarray of len(cuts) thresholds (ascending)}."""
    from ..state.tdigest import TDigest

    def partial(b: pa.Table) -> pa.Table:
        v = b[score_col].to_numpy(zero_copy_only=False).astype(np.float64)
        g = b[group_col].to_numpy(zero_copy_only=False)
        ok = ~np.isnan(v)
        v, g = v[ok], g[ok]
        groups, sketches = [], []
        for grp in pd.unique(g):
            td = TDigest(compression=compression)
            td.update(v[g == grp])
            groups.append(str(grp))
            sketches.append(td.to_bytes().hex())
        return pa.Table.from_pydict({
            "group": pa.array(groups, pa.string()),
            "sketch": pa.array(sketches, pa.string())})

    pdf = ds.map_batches(partial, batch_format="pyarrow",
                         zero_copy_batch=True).to_pandas()
    out: dict = {}
    if "group" not in pdf.columns:
        return out
    for grp, rows in pdf.groupby("group")["sketch"]:
        merged = TDigest(compression=compression)
        for s in rows:
            merged = merged.merge(TDigest.from_bytes(bytes.fromhex(s)))
        out[grp] = np.array([merged.quantile(q) for q in cuts],
                            dtype=np.float64)
    return out


#: CCNet bucket names for the canonical tercile split (lowest perplexity
#: = closest to the reference distribution = "head").
_CCNET_LABELS = ("head", "middle", "tail")


def bucket_by_perplexity(docs_ds, *, text_col: str = "text",
                         key_col: str = "doc_id", lang_col: str = "lang",
                         vocab_size: int = 50_000,
                         cuts: Tuple[float, ...] = (1 / 3, 2 / 3),
                         reference_ds=None, compression: float = 200.0):
    """CCNet-style per-language perplexity split: score every document
    under the unigram reference model, take per-language quantile cut
    points (default terciles), and label each document head / middle /
    tail within its OWN language's distribution (so high-resource and
    low-resource languages are split on their own scales, exactly the
    CCNet design).

    Ray shape: one scoring pass (model broadcast once) → materialize
    (the scored table feeds both the threshold sketch pass and the
    assignment pass) → per-(block, lang) t-digest partials merged on the
    driver (O(#langs) thresholds) → the tiny {lang: cuts} map broadcast
    once → one streamed assignment pass. No shuffle anywhere.

    → Dataset (doc_id, lang, n_tokens, ppl, bucket). The cut points are
    t-digest-approximate (rank accuracy tested in tests/test_pruning.py);
    the ASSIGNMENT is exact w.r.t. the chosen cut points.
    """
    import ray

    if len(cuts) == 2:
        labels = _CCNET_LABELS
    else:
        labels = tuple(f"q{i}" for i in range(len(cuts) + 1))
    scored = score_perplexity(
        docs_ds, text_col=text_col, key_col=key_col,
        vocab_size=vocab_size, reference_ds=reference_ds,
        carry_cols=(lang_col,)).materialize()
    thresholds = grouped_quantile_thresholds(
        scored, score_col="ppl", group_col=lang_col, cuts=cuts,
        compression=compression)
    thr_ref = ray.put(thresholds)

    def assign(b: pa.Table) -> pa.Table:
        thr = ray.get(thr_ref)
        ppl = b["ppl"].to_numpy(zero_copy_only=False).astype(np.float64)
        langs = b[lang_col].to_numpy(zero_copy_only=False)
        idx = np.zeros(len(ppl), dtype=np.int64)
        for grp in pd.unique(langs):
            m = langs == grp
            c = thr.get(str(grp))
            if c is None:  # unseen group (reference-fit corpus differs)
                idx[m] = 1 if len(cuts) == 2 else 0
            else:
                # side='left': ppl strictly greater than cut k moves to
                # bucket k+1, so ties on the cut stay in the lower bucket
                idx[m] = np.searchsorted(c, ppl[m], side="left")
        lab = np.array(labels, dtype=object)[idx]
        return b.append_column("bucket", pa.array(lab, pa.string()))

    return scored.map_batches(assign, batch_format="pyarrow",
                              zero_copy_batch=True)


def fit_bigram(ds, *, text_col: str = "text", vocab_size: int = 50_000,
               bigram_size: int = 200_000):
    """Bigram model over the unigram vocabulary → (unigram model,
    sorted bigram key array 'h\\x1ew', bigram counts, sorted history
    array, history totals).

    One extra streamed pass beyond the unigram fit: per-block (h, w, n)
    hash-aggregate partials with both tokens already mapped into
    vocab-or-OOV (so the key domain is bounded by the vocabulary, not
    the corpus). The driver merges the partials, keeps context totals
    c(h·) over ALL observed bigrams (exact — computed before any
    truncation), then truncates the (h, w) table to the top
    ``bigram_size`` pairs; a truncated pair scores through the unigram
    interpolation term, never silently as zero probability."""
    toks, logp, oov_logp = fit_unigram(ds, text_col=text_col,
                                       vocab_size=vocab_size)
    import ray

    vref = ray.put(toks)

    def pair_partial(b: pa.Table) -> pa.Table:
        vt = ray.get(vref)
        doc, arr, _ = _doc_tokens(b, text_col)
        if len(arr) and len(vt):
            pos = np.clip(np.searchsorted(vt, arr), 0, len(vt) - 1)
            arr = np.where(vt[pos] == arr, arr, "\x1dOOV")
        # adjacent token pairs WITHIN a doc: positions whose successor
        # shares the doc index (vectorized — no per-doc Python)
        adj = (np.flatnonzero(doc[1:] == doc[:-1])
               if len(arr) > 1 else np.empty(0, dtype=np.int64))
        if not len(adj):
            return pa.Table.from_pydict({
                "h": pa.array([], pa.string()),
                "w": pa.array([], pa.string()),
                "n": pa.array([], pa.int64())})
        g = (pd.DataFrame({"h": arr[adj], "w": arr[adj + 1]})
             .groupby(["h", "w"], sort=False).size().reset_index(name="n"))
        return pa.Table.from_pandas(g, preserve_index=False)

    pdf = ds.map_batches(pair_partial, batch_format="pyarrow",
                         zero_copy_batch=True).to_pandas()
    if not len(pdf):
        empty = np.array([], dtype=object)
        return ((toks, logp, oov_logp), empty,
                np.array([], dtype=np.float64), empty,
                np.array([], dtype=np.float64))
    g = pdf.groupby(["h", "w"], as_index=False)["n"].sum()
    ctx = g.groupby("h")["n"].sum()  # exact c(h·), pre-truncation
    g = g.sort_values(["n", "h", "w"],
                      ascending=[False, True, True]).head(bigram_size)
    key = (g["h"] + "\x1f" + g["w"]).to_numpy(dtype=object)
    cnt = g["n"].to_numpy(dtype=np.float64)
    order = np.argsort(key)
    h_arr = np.sort(ctx.index.to_numpy(dtype=object))
    h_tot = ctx.reindex(h_arr).to_numpy(dtype=np.float64)
    return ((toks, logp, oov_logp), key[order], cnt[order], h_arr, h_tot)


def score_perplexity_bigram(docs_ds, *, text_col: str = "text",
                            key_col: str = "doc_id",
                            vocab_size: int = 50_000,
                            bigram_size: int = 200_000,
                            lam: float = 0.7, reference_ds=None,
                            model=None):
    """→ Dataset (doc_id, n_tokens, xent, ppl): interpolated bigram
    perplexity — ``p(w|h) = λ·c(h,w)/c(h·) + (1−λ)·p_uni(w)`` (Jelinek-
    Mercer smoothing; the unigram term guarantees nonzero mass, so
    truncated/unseen bigrams degrade gracefully). A document's first
    token scores on the unigram term alone. λ=0 reproduces the unigram
    scorer exactly (agreement-tested)."""
    if not 0.0 <= lam < 1.0:
        raise ValueError("lam must be in [0, 1)")
    import ray

    if model is None:  # pass a fit_bigram(...) result to score several
        model = fit_bigram(  # lambdas / corpora off ONE fit
            reference_ds if reference_ds is not None else docs_ds,
            text_col=text_col, vocab_size=vocab_size,
            bigram_size=bigram_size)
    ref = ray.put(model)

    def score(b: pa.Table) -> pa.Table:
        (vt, vl, oov), bkey, bcnt, harr, htot = ray.get(ref)
        doc, arr, counts = _doc_tokens(b, text_col)
        n_flat = len(arr)
        if n_flat and len(vt):
            pos = np.clip(np.searchsorted(vt, arr), 0, len(vt) - 1)
            hit = vt[pos] == arr
            p_uni = np.exp2(np.where(hit, vl[pos], oov))
            mapped = np.where(hit, arr, "\x1dOOV")
            # bigram term for every position with a same-doc predecessor
            p_bi = np.zeros(n_flat)
            has_prev = np.zeros(n_flat, dtype=bool)
            if n_flat > 1:
                has_prev[1:] = doc[1:] == doc[:-1]
            if n_flat > 1 and len(bkey):
                pk = mapped[:-1] + "\x1f" + mapped[1:]
                bp = np.clip(np.searchsorted(bkey, pk), 0, len(bkey) - 1)
                bhit = bkey[bp] == pk
                hp = np.clip(np.searchsorted(harr, mapped[:-1]), 0,
                             max(len(harr) - 1, 0))
                hh = harr[hp] == mapped[:-1] if len(harr) else \
                    np.zeros(n_flat - 1, dtype=bool)
                denom = np.where(hh, htot[hp], np.inf) if len(harr) \
                    else np.full(n_flat - 1, np.inf)
                p_bi[1:] = np.where(bhit, bcnt[bp], 0.0) / denom
            p = lam * p_bi + (1.0 - lam) * p_uni
            # doc-initial tokens: unigram only (no same-doc history)
            p[~has_prev] = p_uni[~has_prev]
            lp = np.log2(p)
        else:
            lp = np.full(n_flat, oov, dtype=np.float64)
        sums = (np.bincount(doc, weights=lp, minlength=len(counts))
                if len(lp) else np.zeros(len(counts)))
        xent = np.where(counts > 0, -sums / np.maximum(counts, 1), 0.0)
        return pa.Table.from_arrays(
            [pc.cast(b[key_col], pa.string()), pa.array(counts),
             pa.array(np.round(xent, 4)),
             pa.array(np.round(np.exp2(xent), 2))],
            names=["doc_id", "n_tokens", "xent", "ppl"])

    return docs_ds.map_batches(score, batch_format="pyarrow",
                               zero_copy_batch=True)
