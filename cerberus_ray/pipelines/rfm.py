"""RFM customer segmentation (recency / frequency / monetary) — the
classic CRM scoring pipeline, built scale-safe:

1. per-entity aggregates: per-block pyarrow partials (key, max ts,
   count, sum) shrink the exchange, then ONE `keyed_apply` hash merge
   co-locates each key — output is a distributed Dataset of one row
   per entity (never a driver structure), materialized once because
   three consumers read it (as-of max, thresholds, scoring);
2. quantile thresholds per dimension from merged KLL sketches
   (`state/kll.py`) — O(k log n) per block, EXACT below the sketch
   capacity where they coincide with SQL ``quantile_disc`` (tested),
   rank-error ε ≈ 1/k beyond;
3. a broadcast-threshold scoring map emits bounded (r, f, m) census
   partials — driver merge ≤ n_bins³ rows.

Score convention: f/m score = 1 + #(thresholds strictly below the
value) ∈ 1..n_bins (higher = better); recency is REVERSED (recent =
high score). DuckDB parity in tests/test_rfm.py.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

__all__ = ["rfm_segments"]


def rfm_segments(ds, key_col: str, ts_col: str, amount_col: str, *,
                 asof=None, n_bins: int = 4, kll_k: int = 8192,
                 n_buckets: int = 32,
                 round_digits: int = 6) -> pd.DataFrame:
    """→ census frame (segment, r_score, f_score, m_score,
    n_customers, total_monetary) sorted by (r, f, m) descending
    scores. ``asof`` defaults to the max timestamp in the data;
    recency is whole days before it."""
    import ray

    from ..stages.keyed_window import keyed_apply
    from ..state.kll import KLL

    def partial(b: pa.Table) -> pa.Table:
        return (b.select([key_col, ts_col, amount_col])
                .group_by([key_col])
                .aggregate([(ts_col, "max"), (amount_col, "sum"),
                            ([], "count_all")]))

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        # sort partials before summing: bucket frames arrive in block
        # order, and float sums must not depend on arrival order
        g = g.sort_values([key_col, f"{amount_col}_sum"],
                          kind="mergesort")
        out = g.groupby(key_col, as_index=False).agg(
            last=(f"{ts_col}_max", "max"),
            monetary=(f"{amount_col}_sum", "sum"),
            frequency=("count_all", "sum"))
        return out

    agg = keyed_apply(
        ds.map_batches(partial, batch_format="pyarrow",
                       zero_copy_batch=True),
        key_col, merge, n_buckets=n_buckets).materialize()

    if asof is None:
        mx = agg.map_batches(
            lambda t: pa.Table.from_pydict(
                {"m": [pa.compute.max(t["last"]).as_py()]}),
            batch_format="pyarrow").to_pandas()
        asof = pd.Timestamp(mx["m"].max())
    else:
        asof = pd.Timestamp(asof)

    def with_rec(df: pd.DataFrame) -> pd.DataFrame:
        rec = ((asof - pd.to_datetime(df["last"]))
               // pd.Timedelta(days=1)).astype("int64")
        return pd.DataFrame({
            "recency": rec,
            "frequency": df["frequency"].astype("int64"),
            "monetary": df["monetary"].astype("float64")})

    rfm = agg.map_batches(with_rec, batch_format="pandas").materialize()

    def sketch(df: pd.DataFrame) -> pd.DataFrame:
        row = {}
        for c in ["recency", "frequency", "monetary"]:
            s = KLL(k=kll_k)
            s.update(df[c].to_numpy(dtype=np.float64))
            row[c] = [s.to_bytes().hex()]
        return pd.DataFrame(row)

    parts = rfm.map_batches(sketch, batch_format="pandas").to_pandas()
    qs = [i / n_bins for i in range(1, n_bins)]
    thr = {}
    for c in ["recency", "frequency", "monetary"]:
        merged = KLL(k=kll_k)
        for hexed in parts[c]:
            merged = merged.merge(KLL.from_bytes(bytes.fromhex(hexed)))
        thr[c] = np.array([merged.quantile(q) for q in qs])
    ref = ray.put(thr)

    def score(df: pd.DataFrame) -> pd.DataFrame:
        t = ray.get(ref)
        # bucket = 1 + #(thresholds strictly below value)
        fb = np.searchsorted(t["frequency"],
                             df["frequency"].to_numpy(np.float64),
                             side="left") + 1
        mb = np.searchsorted(t["monetary"],
                             df["monetary"].to_numpy(np.float64),
                             side="left") + 1
        rb = np.searchsorted(t["recency"],
                             df["recency"].to_numpy(np.float64),
                             side="left") + 1
        out = pd.DataFrame({"r_score": n_bins + 1 - rb,  # recent=high
                            "f_score": fb, "m_score": mb,
                            "monetary": df["monetary"]})
        return (out.groupby(["r_score", "f_score", "m_score"],
                            as_index=False)
                .agg(n_customers=("monetary", "size"),
                     total_monetary=("monetary", "sum")))

    census = rfm.map_batches(score, batch_format="pandas").to_pandas()
    # same arrival-order pin for the driver-side float merge
    census = census.sort_values(["r_score", "f_score", "m_score",
                                 "total_monetary"], kind="mergesort")
    out = (census.groupby(["r_score", "f_score", "m_score"],
                          as_index=False)
           .agg(n_customers=("n_customers", "sum"),
                total_monetary=("total_monetary", "sum")))
    out["segment"] = (out["r_score"].astype(str)
                      + out["f_score"].astype(str)
                      + out["m_score"].astype(str))
    out["n_customers"] = out["n_customers"].astype("int64")
    out["total_monetary"] = out["total_monetary"].round(round_digits)
    out = out.sort_values(["r_score", "f_score", "m_score"],
                          ascending=False).reset_index(drop=True)
    return out[["segment", "r_score", "f_score", "m_score",
                "n_customers", "total_monetary"]]
