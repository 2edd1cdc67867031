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
    nothing within k."""
    from .fuzzyjoin import fuzzy_join

    def norm(b: pa.Table) -> pa.Table:
        return pa.Table.from_pydict({
            text_col: pa.array(
                normalize_identity(
                    b[text_col].to_numpy(zero_copy_only=False)),
                pa.string())})

    nds = ds.map_batches(norm, batch_format="pyarrow",
                         zero_copy_batch=True).materialize()
    pairs = fuzzy_join(nds, nds, text_col, k=k, n_buckets=n_buckets)
    if not len(pairs):
        return pd.DataFrame({"a": [], "b": [], "dist": []})
    lo = np.minimum(pairs["left"].to_numpy(dtype=object),
                    pairs["right"].to_numpy(dtype=object))
    hi = np.maximum(pairs["left"].to_numpy(dtype=object),
                    pairs["right"].to_numpy(dtype=object))
    out = pd.DataFrame({"a": lo, "b": hi, "dist": pairs["dist"]})
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
