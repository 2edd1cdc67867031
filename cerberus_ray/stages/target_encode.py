"""Target encoding for categorical features: smoothed category→mean
maps and the leave-one-out variant — the standard supervised encoding
pair (public method; the m-estimate smoothing of Micci-Barreca 2001).
Complements `pipelines/logreg.py`'s hashed-TF features with the other
classic way categorical signal enters a model.

Encodings are functions of the per-category (count, Σtarget) census —
exact integer 1/scale units, merged on the driver (bounded by the
category domain), one float division at the end:

    smoothed(c) = (Σy_c + m·prior) / (n_c + m)       prior = Σy / n
    loo(row)    = (Σy_c − y_row) / (n_c − 1)         NaN when n_c = 1

The smoothed map is a broadcast dimension table; the LOO transform is
a streamed per-batch lookup (no self-join — the window-function
semantics fall out of the broadcast (n, Σ) pair). DuckDB window parity
in tests/test_target_encode.py.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

__all__ = ["target_encoding_map", "loo_encode"]


def _census(ds, cat_col: str, target_col: str, scale: int
            ) -> pd.DataFrame:
    def partial(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        col = b[target_col]
        if col.null_count:
            b = b.filter(pc.is_valid(col))
            col = b[target_col]
        y = np.rint(col.to_numpy(zero_copy_only=False)
                    * scale).astype(np.int64)
        return pa.Table.from_pydict({
            "c": b[cat_col],
            "n": pa.array(np.ones(len(y), np.int64), pa.int64()),
            "s": pa.array(y, pa.int64()),
        }).group_by(["c"]).aggregate([("n", "sum"), ("s", "sum")])

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True).to_pandas()
    if not len(parts):
        return pd.DataFrame({"c": [], "n": [], "s": []})
    return (parts.groupby("c", as_index=False)
            .agg(n=("n_sum", "sum"), s=("s_sum", "sum"))
            .sort_values("c").reset_index(drop=True))


def target_encoding_map(ds, cat_col: str, target_col: str, *,
                        m: float = 10.0,
                        scale: int = 100) -> pd.DataFrame:
    """→ (cat_col, n, encoding, prior) sorted by category — the
    m-estimate smoothed category→mean map; ``prior`` (the global
    mean, repeated for convenience) is the correct encoding for
    unseen categories at apply time."""
    cen = _census(ds, cat_col, target_col, scale)
    if not len(cen):
        return pd.DataFrame({cat_col: [], "n": [], "encoding": [],
                             "prior": []})
    n_all = int(cen["n"].sum())
    s_all = int(cen["s"].sum())
    prior = float(s_all) / n_all / scale
    n = cen["n"].to_numpy(np.float64)
    s = cen["s"].to_numpy(np.float64) / scale
    enc = (s + m * prior) / (n + m)
    return pd.DataFrame({cat_col: cen["c"], "n": cen["n"],
                         "encoding": enc,
                         "prior": np.full(len(cen), prior)})


def loo_encode(ds, cat_col: str, target_col: str, *,
               scale: int = 100, out_col: str = "loo"):
    """Streamed leave-one-out transform: append ``out_col`` =
    (Σy_cat − y_row)/(n_cat − 1), NaN for singleton categories. One
    broadcast (category → (n, Σ)) map, one vectorized lookup per
    batch."""
    import ray

    cen = _census(ds, cat_col, target_col, scale)
    n_map = dict(zip(cen["c"], (int(x) for x in cen["n"])))
    s_map = dict(zip(cen["c"], (int(x) for x in cen["s"])))
    ref = ray.put((n_map, s_map))

    def transform(b: pa.Table) -> pa.Table:
        nm, sm = ray.get(ref)
        cats = pd.Series(b[cat_col].to_numpy(zero_copy_only=False))
        y = np.rint(b[target_col].to_numpy(zero_copy_only=False)
                    * scale).astype(np.int64)
        # two C-hashtable lookups — no per-row Python
        n = cats.map(nm).to_numpy(np.int64)
        s = cats.map(sm).to_numpy(np.int64)
        with np.errstate(invalid="ignore", divide="ignore"):
            loo = np.where(n > 1, (s - y) / (n - 1) / scale, np.nan)
        cols = {c: b[c] for c in b.column_names}
        cols[out_col] = pa.array(loo, pa.float64())
        return pa.Table.from_pydict(cols)

    return ds.map_batches(transform, batch_format="pyarrow",
                          zero_copy_batch=True)
