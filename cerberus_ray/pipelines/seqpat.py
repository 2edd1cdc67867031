"""Sequential pattern mining: length-2 subsequence support per key.

The ORDER-aware companion to the co-occurrence/PMI and Markov stages:
``markov`` counts ADJACENT transitions; a sequential pattern a→b only
requires some occurrence of ``a`` strictly before some occurrence of
``b`` in the same key's event stream (the GSP/PrefixSpan length-2
support census, Srikant & Agrawal 1996). The whole pattern family at
length 2 reduces to first/last occurrence times:

    a→b supported for a key  ⇔  first_occ(a) < last_occ(b)

(strict, so a→a means "a repeated at a later timestamp"). That makes
the kernel fully vectorized and the semantics DuckDB-checkable with an
EXISTS self-join (the parity test). Longer patterns need per-item
occurrence lists (a different cost class) — out of scope, documented.

Scale shape: one ``keyed_apply`` pass (every key's rows in one bucket)
computing per-(key, item) first/last via lexsort + reduceat, expanding
the per-key item×item grid (bounded: distinct items per key ≤ domain,
enum-sized by assumption), then emitting per-bucket (a, b, n_keys)
partials — rows ∝ n_buckets × domain², tiny — merged on the driver
against the exact key census.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pandas as pd
import pyarrow as pa

__all__ = ["frequent_sequences"]


def frequent_sequences(ds, key_col: str, ts_col: str, item_col: str, *,
                       min_support: float = 0.0, n_buckets: int = 32,
                       max_items_per_key: int = 10_000) -> pd.DataFrame:
    """→ frame (antecedent, consequent, n_keys, support) sorted by
    (-n_keys, antecedent, consequent), support = n_keys / total keys,
    filtered to ``support >= min_support``."""
    from ..stages.keyed_window import keyed_apply

    if not 0.0 <= min_support <= 1.0:
        raise ValueError("min_support must be in [0, 1]")

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key_col, item_col, ts_col], kind="mergesort")
        keys = df[key_col].to_numpy()
        items = df[item_col].to_numpy(object)
        ts = df[ts_col].to_numpy()
        # distinct (key, item) segments → first/last occurrence
        pair_key = pd.MultiIndex.from_arrays([keys, items])
        seg = np.flatnonzero(np.r_[True, pair_key[1:] != pair_key[:-1]])
        first = ts[seg]
        last = ts[np.r_[seg[1:] - 1, len(ts) - 1]]
        k_seg = keys[seg]
        i_seg = items[seg]
        # per-key item grids, expanded FULLY VECTORIZED (no per-key
        # Python): for a key with c distinct items enumerate all c²
        # ordered pairs via arithmetic on a flat pair index
        kb = np.flatnonzero(np.r_[True, k_seg[1:] != k_seg[:-1]])
        counts = np.diff(np.append(kb, len(k_seg)))
        if counts.max(initial=0) > max_items_per_key:
            raise ValueError("distinct items per key exceed "
                             f"max_items_per_key={max_items_per_key}")
        n_keys_bucket = len(kb)
        tot = counts * counts
        within = (np.arange(int(tot.sum()))
                  - np.repeat(np.cumsum(tot) - tot, tot))
        c_pair = np.repeat(counts, tot)
        start = np.repeat(kb, tot)
        ga = start + within // c_pair
        gb = start + within % c_pair
        sup = first[ga] < last[gb]               # a→b strict order
        if sup.any():
            out = (pd.DataFrame({"a": i_seg[ga[sup]],
                                 "b": i_seg[gb[sup]]})
                   .groupby(["a", "b"], as_index=False).size()
                   .rename(columns={"size": "n"}))
        else:
            out = pd.DataFrame({"a": [], "b": [], "n": []})
        out["_keys"] = 0
        # one census row per bucket carries the key count
        census = pd.DataFrame({"a": [None], "b": [None], "n": [0],
                               "_keys": [n_keys_bucket]})
        return pd.concat([out, census], ignore_index=True)

    parts = keyed_apply(ds.select_columns([key_col, ts_col, item_col]),
                        key_col, per_bucket,
                        n_buckets=n_buckets).to_pandas()
    total_keys = int(parts["_keys"].sum())
    body = parts[parts["a"].notna()]
    g = (body.groupby(["a", "b"], as_index=False)["n"].sum()
         .rename(columns={"a": "antecedent", "b": "consequent",
                          "n": "n_keys"}))
    g["support"] = g["n_keys"] / max(total_keys, 1)
    g = g[g["support"] >= min_support]
    g = (g.sort_values(["n_keys", "antecedent", "consequent"],
                       ascending=[False, True, True])
         .reset_index(drop=True))
    g["n_keys"] = g["n_keys"].astype(np.int64)
    g["support"] = g["support"].round(6)
    return g
