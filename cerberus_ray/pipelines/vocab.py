"""Corpus vocabulary statistics — top-k token frequency.

A core training-data-pipeline operator (tokenizer fitting, vocabulary
pruning, stopword discovery all start from the corpus term-frequency
table). Mode planner in the engine's standard shape:

- 'driver' (vocabulary fits the driver): per-block token counts (one
  pyarrow hash-aggregate per block — the exchange carries one row per
  DISTINCT token per block, never token instances) merge on the driver.
- 'cms' (the 10^9-token-vocabulary path): Count-Min heavy hitters
  (Cormode & Muthukrishnan 2005) — pass 1 builds one mergeable CMS per
  block plus each block's local top-(k×overscan) candidate set (a
  global top-k token is necessarily a local candidate in at least one
  block at this overscan, and the CMS never undercounts, so the
  candidate union is a superset of the true top-k); pass 2 counts the
  candidate union EXACTLY (broadcast candidate set, per-block partial
  counts, tiny driver merge) and takes the exact top-k. Driver memory is
  O(sketch + candidates), never O(vocabulary).

Both modes return identical results when counts are unambiguous
(agreement-tested); ties broken by token for determinism.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..state.countmin import CountMinSketch


def _token_counts_block(b: pa.Table, text_col: str) -> pa.Table:
    """One (token, n) row per distinct token in the block — vectorized
    split + explode + hash-aggregate, no Python per token."""
    toks = pc.split_pattern_regex(
        pc.utf8_lower(pc.fill_null(b[text_col], "")), r"\s+")
    flat = pc.list_flatten(toks)
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    t = pa.Table.from_arrays([flat], names=["token"])
    t = t.filter(pc.not_equal(t["token"], ""))
    g = t.group_by("token").aggregate([([], "count_all")])
    return pa.Table.from_arrays([g["token"], g["count_all"]],
                                names=["token", "n"])


def token_top_k(ds, *, text_col: str = "text", k: int = 20,
                mode: str = "auto", n_rows_hint: int = 0,
                cms_width: int = 1 << 16, overscan: int = 4) -> pa.Table:
    """→ (token, n) — the k most frequent whitespace tokens, count DESC
    then token ASC (deterministic tie-break)."""
    if mode == "auto":
        n = n_rows_hint or ds.count()
        mode = "driver" if n <= 2_000_000 else "cms"
    if mode not in ("driver", "cms"):
        raise ValueError(f"unknown vocab mode: {mode!r}")

    counts_ds = ds.map_batches(
        lambda b: _token_counts_block(b, text_col),
        batch_format="pyarrow", zero_copy_batch=True)

    if mode == "driver":
        pdf = counts_ds.to_pandas()
        if "token" not in pdf.columns or not len(pdf):
            return _empty()
        g = pdf.groupby("token", as_index=False)["n"].sum()
        return _top(g, k)

    # ---- cms heavy hitters ----
    import ray

    def sketch_and_candidates(b: pa.Table) -> pa.Table:
        g = _token_counts_block(b, text_col)
        cm = CountMinSketch(width=cms_width)
        cm.add(g["token"], g["n"].to_numpy(zero_copy_only=False))
        order = pc.sort_indices(
            g, sort_keys=[("n", "descending"), ("token", "ascending")])
        cand = g.take(order.slice(0, k * overscan))["token"]
        return pa.Table.from_pydict({
            "sketch": pa.array([cm.to_bytes()], type=pa.binary()),
            "cands": pa.array([cand.to_pylist()],
                              type=pa.list_(pa.string()))})

    parts = ds.map_batches(sketch_and_candidates, batch_format="pyarrow",
                           zero_copy_batch=True).to_pandas()
    if not len(parts):
        return _empty()
    cand_union = sorted({t for lst in parts["cands"] for t in lst})
    if not cand_union:
        return _empty()
    # pass 2: EXACT counts for the candidate union only
    ref = ray.put(np.array(cand_union, dtype=object))

    def exact_counts(b: pa.Table) -> pa.Table:
        wanted = ray.get(ref)
        g = _token_counts_block(b, text_col)
        mask = pc.is_in(g["token"], value_set=pa.array(wanted, pa.string()))
        return g.filter(mask)

    pdf = ds.map_batches(exact_counts, batch_format="pyarrow",
                         zero_copy_batch=True).to_pandas()
    if "token" not in pdf.columns or not len(pdf):
        return _empty()
    g = pdf.groupby("token", as_index=False)["n"].sum()
    return _top(g, k)


def _grouped_token_counts_block(b: pa.Table, text_col: str,
                                group_col: str) -> pa.Table:
    """One (group, token, n) row per distinct (group, token) pair in the
    block — split + length-repeat of the group key + hash-aggregate, no
    Python per token."""
    toks = pc.split_pattern_regex(
        pc.utf8_lower(pc.fill_null(b[text_col], "")), r"\s+")
    lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
    flat = pc.list_flatten(toks)
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    groups = np.repeat(
        b[group_col].to_numpy(zero_copy_only=False).astype(object), lens)
    t = pa.Table.from_arrays(
        [pa.array(groups, pa.string()), flat], names=["group", "token"])
    t = t.filter(pc.not_equal(t["token"], ""))
    g = t.group_by(["group", "token"]).aggregate([([], "count_all")])
    return pa.Table.from_arrays([g["group"], g["token"], g["count_all"]],
                                names=["group", "token", "n"])


def token_top_k_by_group(ds, *, text_col: str = "text",
                         agg_partitions: int = 64,
                         group_col: str = "lang", k: int = 20,
                         mode: str = "auto", n_rows_hint: int = 0) -> pa.Table:
    """Per-group heavy hitters: the k most frequent whitespace tokens
    WITHIN each group (language, source domain) — the per-domain
    boilerplate/stopword-discovery primitive.

    → (group, token, n) sorted (group ASC, n DESC, token ASC).

    Modes (standard planner shape, output-identical, agreement-tested):

    - 'driver': per-block (group, token, n) hash-aggregate partials merge
      on the driver — O(Σ_g vocab_g) rows, fine while the per-group
      vocabularies fit driver memory.
    - 'shuffle' (the 10^9-vocabulary path): the same partials go through
      ``groupby(['group','token']).sum`` — after that exchange every
      (group, token) is globally unique, so each output block's per-group
      top-k is a SUPERSET filter for the global per-group top-k
      (a global top-k row must be in the top-k of whatever single block
      holds it). The driver merges ≤ #blocks × #groups × k candidate
      rows, never the token universe.
    """
    if mode == "auto":
        n = n_rows_hint or ds.count()
        mode = "driver" if n <= 2_000_000 else "shuffle"
    if mode not in ("driver", "shuffle"):
        raise ValueError(f"unknown grouped-vocab mode: {mode!r}")

    counts_ds = ds.map_batches(
        lambda b: _grouped_token_counts_block(b, text_col, group_col),
        batch_format="pyarrow", zero_copy_batch=True)

    if mode == "driver":
        pdf = counts_ds.to_pandas()
        if "token" not in pdf.columns or not len(pdf):
            return _empty_grouped()
        g = pdf.groupby(["group", "token"], as_index=False)["n"].sum()
        return _top_per_group(g, k)

    # ---- shuffle: exact global (group, token) counts, then a per-block
    # per-group top-k candidate filter so the driver never sees the
    # full vocabulary ----
    from ray.data.aggregate import Sum

    # coalesce the hash aggregate's schema-less empty blocks; width
    # scales with the (group x token) universe the shuffle path serves
    agg = (counts_ds.groupby(["group", "token"]).aggregate(Sum("n"))
           .repartition(agg_partitions))

    def local_topk(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "group" not in b.column_names:
            return _empty_grouped()
        df = pa.Table.from_arrays(
            [b["group"], b["token"], b["sum(n)"]],
            names=["group", "token", "n"]).to_pandas()
        out = (df.sort_values(["group", "n", "token"],
                              ascending=[True, False, True])
                 .groupby("group", as_index=False).head(k))
        out["n"] = out["n"].astype("int64")
        return pa.Table.from_pandas(out[["group", "token", "n"]],
                                    preserve_index=False)

    pdf = agg.map_batches(local_topk, batch_format="pyarrow",
                          zero_copy_batch=True).to_pandas()
    if "token" not in pdf.columns or not len(pdf):
        return _empty_grouped()
    # rows are already globally-unique (group, token) pairs: no re-sum
    return _top_per_group(pdf, k)


def _empty_grouped() -> pa.Table:
    return pa.Table.from_pydict({"group": pa.array([], pa.string()),
                                 "token": pa.array([], pa.string()),
                                 "n": pa.array([], pa.int64())})


def _top_per_group(g: pd.DataFrame, k: int) -> pa.Table:
    out = (g.sort_values(["group", "n", "token"],
                         ascending=[True, False, True])
            .groupby("group", as_index=False).head(k)
            .reset_index(drop=True))
    out["n"] = out["n"].astype("int64")
    return pa.Table.from_pandas(out[["group", "token", "n"]],
                                preserve_index=False)


def _empty() -> pa.Table:
    return pa.Table.from_pydict({"token": pa.array([], pa.string()),
                                 "n": pa.array([], pa.int64())})


def _top(g: pd.DataFrame, k: int) -> pa.Table:
    g = (g.sort_values(["n", "token"], ascending=[False, True])
          .head(k).reset_index(drop=True))
    g["n"] = g["n"].astype("int64")
    return pa.Table.from_pandas(g[["token", "n"]], preserve_index=False)


def vocab_growth(ds, *, text_col: str = "text", doc_col: str = "doc_id",
                 n_checkpoints: int = 10) -> pd.DataFrame:
    """Heaps'-law vocabulary-growth curve: distinct-vocabulary size vs
    cumulative token count at ``n_checkpoints`` evenly-spaced doc-id
    checkpoints, plus the fitted Heaps parameters (V ≈ K·Tᵝ, log-log
    OLS over the curve) → DataFrame ``(checkpoint_doc, n_tokens_cum,
    vocab_size, heaps_k, heaps_beta)``. The tokenizer-sizing /
    corpus-diversity diagnostic (Heaps 1978, public result).

    Cumulative-distinct is sequential only superficially: a token's
    first occurrence is ``min(doc_id)`` — a plain grouped min — so the
    curve is one streamed pass of tagged per-block partials (per-doc
    token counts + block-local per-token min-doc), a vocabulary-bounded
    driver merge, and two histograms over the checkpoint grid. Same
    whitespace-lowercase tokenization as the rest of this module (the
    DuckDB oracle in tests/test_vocab.py re-derives the curve
    exactly)."""
    if n_checkpoints < 1:
        raise ValueError(f"n_checkpoints must be ≥ 1, got {n_checkpoints}")

    def partial(b: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(
            pc.utf8_lower(pc.fill_null(b[text_col], "")), r"\s+")
        docs = b[doc_col].to_numpy(zero_copy_only=False).astype(np.int64)
        flat = pc.list_flatten(toks)
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        rep = np.repeat(docs, lens)
        keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        tok_np = flat.to_numpy(zero_copy_only=False)[keep]
        doc_np = rep[keep]
        # per-doc token counts (tag 0) + per-token block-local min doc
        # (tag 1) in one union-schema partial
        dd = pd.DataFrame({"d": doc_np})
        cnt = dd.groupby("d", sort=False).size().reset_index(name="n")
        if len(tok_np):
            tm = (pd.DataFrame({"token": tok_np, "d": doc_np})
                  .groupby("token", sort=False)["d"].min()
                  .reset_index())
        else:
            tm = pd.DataFrame({"token": [], "d": []})
        return pa.Table.from_pydict({
            "token": pa.array(np.concatenate(
                [np.full(len(cnt), "", dtype=object),
                 tm["token"].to_numpy(dtype=object)]), pa.string()),
            "d": pa.array(np.concatenate(
                [cnt["d"].to_numpy(np.int64),
                 tm["d"].to_numpy(np.int64)]), pa.int64()),
            "n": pa.array(np.concatenate(
                [cnt["n"].to_numpy(np.int64),
                 np.zeros(len(tm), np.int64)]), pa.int64()),
            "tag": pa.array(np.concatenate(
                [np.zeros(len(cnt), np.int8),
                 np.ones(len(tm), np.int8)]), pa.int8())})

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True).to_pandas()
    cols = ["checkpoint_doc", "n_tokens_cum", "vocab_size",
            "heaps_k", "heaps_beta"]
    if not len(parts) or not (parts["tag"] == 0).any():
        return pd.DataFrame(columns=cols)
    docs = parts[parts["tag"] == 0]
    firsts = (parts[parts["tag"] == 1]
              .groupby("token", sort=False)["d"].min())
    dmax = int(docs["d"].max())
    grid = np.unique(np.ceil(
        dmax * np.arange(1, n_checkpoints + 1) / n_checkpoints)
        .astype(np.int64))
    dsort = docs.sort_values("d")
    tok_cum = np.concatenate(
        [[0], np.cumsum(dsort["n"].to_numpy(np.int64))])
    t_at = tok_cum[np.searchsorted(dsort["d"].to_numpy(np.int64), grid,
                                   side="right")]
    fsort = np.sort(firsts.to_numpy(np.int64))
    v_at = np.searchsorted(fsort, grid, side="right")
    ok = (t_at > 0) & (v_at > 0)
    if ok.sum() >= 2 and len(np.unique(t_at[ok])) >= 2:
        A = np.column_stack([np.ones(ok.sum()), np.log(t_at[ok])])
        coef, *_ = np.linalg.lstsq(A, np.log(v_at[ok]), rcond=None)
        k_fit, beta = float(np.exp(coef[0])), float(coef[1])
    else:
        k_fit, beta = float("nan"), float("nan")
    return pd.DataFrame({
        "checkpoint_doc": grid,
        "n_tokens_cum": t_at.astype(np.int64),
        "vocab_size": v_at.astype(np.int64),
        "heaps_k": k_fit, "heaps_beta": beta})


def token_jsd_matrix(ds, *, group_col: str = "source",
                     text_col: str = "text",
                     max_cells: int = 2_000_000) -> pd.DataFrame:
    """Pairwise Jensen–Shannon divergence between the groups' token
    unigram distributions → frame ``(group_a, group_b, jsd, distance)``
    for every unordered pair (group_a < group_b), nats;
    ``distance = √jsd`` (a metric; Endres & Schindelin 2003, public
    result). The domain-similarity matrix behind mixture design: near-0
    ⇒ interchangeable slices, ln 2 ⇒ disjoint vocabularies.

    One streamed pass of per-block (group, token, n) hash-aggregate
    partials (same kernel as token_top_k_by_group); the driver merges a
    groups×vocabulary count table — guarded by ``max_cells`` — and
    computes every pairwise JSD as H(M) − (H(P)+H(Q))/2 with one dense
    numpy pass per pair over the union vocabulary. Sorted group/token
    order keeps the float reductions layout-independent."""
    parts = ds.map_batches(
        lambda b: _grouped_token_counts_block(b, text_col, group_col),
        batch_format="pyarrow", zero_copy_batch=True).to_pandas()
    cols = ["group_a", "group_b", "jsd", "distance"]
    if not len(parts):
        return pd.DataFrame(columns=cols)
    g = (parts.groupby(["group", "token"], as_index=False)["n"].sum())
    piv = (g.pivot_table(index="token", columns="group", values="n",
                         aggfunc="first", fill_value=0)
           .sort_index())
    piv = piv[sorted(piv.columns)]
    if piv.size > max_cells:
        raise ValueError(
            f"groups×vocab table has {piv.size} cells > "
            f"max_cells={max_cells} — bucket tokens first")
    M = piv.to_numpy(dtype=np.float64)
    M = M / M.sum(axis=0, keepdims=True)

    def h(p: np.ndarray) -> float:
        nz = p[p > 0]
        return float(-(nz * np.log(nz)).sum())

    names = list(piv.columns)
    rows = []
    for i in range(len(names)):
        for j in range(i + 1, len(names)):
            p, q = M[:, i], M[:, j]
            jsd = h((p + q) / 2) - (h(p) + h(q)) / 2
            jsd = max(jsd, 0.0)
            rows.append({"group_a": names[i], "group_b": names[j],
                         "jsd": jsd, "distance": float(np.sqrt(jsd))})
    return pd.DataFrame(rows, columns=cols)
