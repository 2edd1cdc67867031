"""Association-rule mining (market-basket analysis): support /
confidence / lift over (basket, item) co-occurrences — the classic
Agrawal-style frequent-pair miner, sized for the engine's scale story.

One `keyed_apply` hash exchange on the basket key co-locates every
basket, so per-bucket work is exact and independent:

- baskets dedupe to distinct (basket, item) rows,
- pair generation is the lexsort + np.unique + per-SIZE triu_indices
  expansion kernel (shared pattern with the simhash/minhash pair
  tails) — the loop runs over distinct basket SIZES, never baskets,
- buckets emit LOCAL (item-support, pair-count, basket-count)
  partials, so driver traffic ∝ distinct items + observed pairs per
  bucket, never rows. Observed pairs are Σ k²-bounded; a `max_basket`
  cap guards the pathological mega-basket the same way the dedup
  hot-bucket guards do (capped baskets are dropped LOUDLY via the
  report's n_capped count, not silently truncated).

DuckDB self-join parity in tests/test_assoc.py.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

__all__ = ["association_rules", "frequent_itemsets"]


def association_rules(ds, basket_col: str, item_col: str, *,
                      min_pair_n: int = 2, top_k: int = 50,
                      max_basket: int = 1000, n_buckets: int = 32,
                      round_digits: int = 6) -> pd.DataFrame:
    """Mine pairwise association rules a→b from a (basket, item) table.

    → frame (antecedent, consequent, n_pair, n_antecedent,
    n_consequent, n_baskets, n_capped, support, confidence, lift,
    cosine, jaccard), both directions per observed pair, filtered to
    ``n_pair ≥ min_pair_n``, top ``top_k`` by (lift desc, n_pair desc,
    antecedent, consequent) — deterministic under ties. ``cosine`` =
    n_ab/√(n_a·n_b) and ``jaccard`` = n_ab/(n_a+n_b−n_ab) are the
    item-item collaborative-filtering similarities over the same
    counts (symmetric, unlike confidence)."""
    from .keyed_window import keyed_apply

    def kern(g: pd.DataFrame) -> pd.DataFrame:
        d = (g.drop_duplicates([basket_col, item_col])
             .sort_values([basket_col, item_col], kind="mergesort"))
        b = d[basket_col].to_numpy()
        it = d[item_col].to_numpy()
        _, starts, counts = np.unique(b, return_index=True,
                                      return_counts=True)
        capped = counts > max_basket
        n_baskets, n_capped = len(starts), int(capped.sum())
        # item supports exclude capped baskets so support/confidence
        # stay mutually consistent
        keep_rows = np.ones(len(d), dtype=bool)
        for s, c in zip(starts[capped], counts[capped]):
            keep_rows[s:s + c] = False
        item_n = pd.Series(it[keep_rows]).value_counts()
        pa_list, pb_list = [], []
        starts_u, counts_u = starts[~capped], counts[~capped]
        for size in np.unique(counts_u):
            if size < 2:
                continue
            rows = starts_u[counts_u == size]
            # (n_baskets_of_size, size) matrix of item positions
            mat = it[rows[:, None] + np.arange(size)[None, :]]
            iu, ju = np.triu_indices(size, k=1)
            pa_list.append(mat[:, iu].ravel())
            pb_list.append(mat[:, ju].ravel())
        if pa_list:
            pairs = (pd.DataFrame({"a": np.concatenate(pa_list),
                                   "b": np.concatenate(pb_list)})
                     .groupby(["a", "b"]).size().rename("n")
                     .reset_index())
        else:
            pairs = pd.DataFrame({"a": [], "b": [], "n": []})
        out = pd.DataFrame({
            "kind": np.concatenate([
                np.full(len(pairs), 0, dtype=np.int8),
                np.full(len(item_n), 1, dtype=np.int8), [2, 3]]),
            "a": np.concatenate([pairs["a"].to_numpy(),
                                 item_n.index.to_numpy(),
                                 [None, None]], dtype=object),
            "b": np.concatenate([pairs["b"].to_numpy(),
                                 np.full(len(item_n), None),
                                 [None, None]], dtype=object),
            "n": np.concatenate([pairs["n"].to_numpy(),
                                 item_n.to_numpy(),
                                 [n_baskets - n_capped, n_capped]]
                                ).astype("int64")})
        return out

    parts = keyed_apply(ds.select_columns([basket_col, item_col]),
                        basket_col, kern, n_buckets=n_buckets).to_pandas()
    n_baskets = int(parts.loc[parts["kind"] == 2, "n"].sum())
    n_capped = int(parts.loc[parts["kind"] == 3, "n"].sum())
    items = (parts[parts["kind"] == 1].groupby("a")["n"].sum())
    pairs = (parts[parts["kind"] == 0].groupby(["a", "b"])["n"].sum()
             .reset_index())
    pairs = pairs[pairs["n"] >= min_pair_n]
    if not len(pairs) or not n_baskets:
        return pd.DataFrame(columns=[
            "antecedent", "consequent", "n_pair", "n_antecedent",
            "n_consequent", "n_baskets", "n_capped", "support",
            "confidence", "lift", "cosine", "jaccard"])
    # both rule directions share the symmetric pair count
    r = pd.DataFrame({
        "antecedent": np.concatenate([pairs["a"], pairs["b"]]),
        "consequent": np.concatenate([pairs["b"], pairs["a"]]),
        "n_pair": np.concatenate([pairs["n"], pairs["n"]])})
    r["n_antecedent"] = items.reindex(r["antecedent"]).to_numpy()
    r["n_consequent"] = items.reindex(r["consequent"]).to_numpy()
    r["n_baskets"] = n_baskets
    r["n_capped"] = n_capped
    r["support"] = (r["n_pair"] / n_baskets).round(round_digits)
    r["confidence"] = (r["n_pair"] / r["n_antecedent"]).round(round_digits)
    r["lift"] = (r["n_pair"] * n_baskets
                 / (r["n_antecedent"] * r["n_consequent"])
                 ).round(round_digits)
    r["cosine"] = (r["n_pair"]
                   / np.sqrt(r["n_antecedent"] * r["n_consequent"])
                   ).round(round_digits)
    r["jaccard"] = (r["n_pair"]
                    / (r["n_antecedent"] + r["n_consequent"]
                       - r["n_pair"])).round(round_digits)
    for c in ["n_pair", "n_antecedent", "n_consequent"]:
        r[c] = r[c].astype("int64")
    r = r.sort_values(["lift", "n_pair", "antecedent", "consequent"],
                      ascending=[False, False, True, True],
                      kind="mergesort").head(top_k)
    return r.reset_index(drop=True)


def frequent_itemsets(ds, basket_col: str, item_col: str, *,
                      size: int = 3, min_n: int = 2, top_k: int = 50,
                      max_basket: int = 200, n_buckets: int = 32,
                      round_digits: int = 6) -> pd.DataFrame:
    """Frequent ``size``-itemsets (the Apriori support census beyond
    pairs): per co-located basket, all C(s, size) sorted item
    combinations, gathered per distinct basket SIZE like the pair
    kernel — the loop count is #distinct sizes, never baskets. The
    lower default ``max_basket`` reflects the combinatorial growth
    (C(s,3) ~ s³/6); capped baskets are surfaced via n_capped.

    → frame (items, n, n_baskets, n_capped, support) with ``items``
    the '+'-joined sorted member list, filtered to ``n ≥ min_n``,
    top ``top_k`` by (n desc, members asc) — deterministic. Itemsets
    stay MEMBER COLUMNS (native dtype) through the whole distributed
    path; the joined string is formatted only for the surviving rows —
    string building was the measured hot spot of a naive kernel."""
    from itertools import combinations

    from .keyed_window import keyed_apply

    if size < 2:
        raise ValueError("size must be >= 2")
    mcols = [f"m{j}" for j in range(size)]

    def kern(g: pd.DataFrame) -> pd.DataFrame:
        d = (g.drop_duplicates([basket_col, item_col])
             .sort_values([basket_col, item_col], kind="mergesort"))
        b = d[basket_col].to_numpy()
        it = d[item_col].to_numpy()
        _, starts, counts = np.unique(b, return_index=True,
                                      return_counts=True)
        capped = counts > max_basket
        n_baskets, n_capped = int(len(starts)), int(capped.sum())
        starts_u, counts_u = starts[~capped], counts[~capped]
        mems = []
        for s in np.unique(counts_u):
            if s < size:
                continue
            rows = starts_u[counts_u == s]
            mat = it[rows[:, None] + np.arange(s)[None, :]]
            idx = np.array(list(combinations(range(s), size)))
            # (n_baskets_of_size × n_combos, size) member matrix —
            # items within a basket are pre-sorted, so each row is
            # already the canonical (sorted) itemset
            mems.append(mat[:, idx].reshape(-1, size))
        if mems:
            allm = np.concatenate(mems)
            loc = (pd.DataFrame(dict(zip(mcols, allm.T)))
                   .groupby(mcols, sort=False).size().rename("n")
                   .reset_index())
        else:
            loc = pd.DataFrame({c: [] for c in mcols} | {"n": []})
        loc["kind"] = 0
        meta = pd.DataFrame(
            {c: [None, None] for c in mcols}
            | {"n": [n_baskets - n_capped, n_capped], "kind": [1, 2]})
        return pd.concat([loc, meta], ignore_index=True)

    parts = keyed_apply(ds.select_columns([basket_col, item_col]),
                        basket_col, kern, n_buckets=n_buckets).to_pandas()
    n_baskets = int(parts.loc[parts["kind"] == 1, "n"].sum())
    n_capped = int(parts.loc[parts["kind"] == 2, "n"].sum())
    f = (parts[parts["kind"] == 0].groupby(mcols)["n"].sum()
         .reset_index())
    f = f[f["n"] >= min_n]
    if not len(f) or not n_baskets:
        return pd.DataFrame(columns=["items", "n", "n_baskets",
                                     "n_capped", "support"])
    f = f.sort_values(["n"] + mcols, ascending=[False] + [True] * size,
                      kind="mergesort").head(top_k)
    joined = f[mcols[0]].astype(str)
    for c in mcols[1:]:
        joined = joined + "+" + f[c].astype(str)
    out = pd.DataFrame({
        "items": joined.to_numpy(),
        "n": f["n"].astype("int64").to_numpy(),
        "n_baskets": n_baskets, "n_capped": n_capped,
        "support": (f["n"] / n_baskets).round(round_digits).to_numpy()})
    return out.reset_index(drop=True)
