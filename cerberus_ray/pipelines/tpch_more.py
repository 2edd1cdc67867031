"""The rest of the classic TPC-H query shapes, adapted to the driver
tables' columns (no partsupp/commitdate/shipmode in this corpus — each
docstring names the substitution). Reference semantics: the published
TPC-H specification; reference engine analogue: the reporting queries in
/root/reference/cerberus/models/invoice.py and booking.py (grouped
money roll-ups with dual-path consistency checks).

All money math uses the engine's exact integer-units kernels
(``tpch_extra._rev_e4`` / ``_cents``): 2-dp decimals → int64 10⁻⁴ or
10⁻² units, order-independent sums, one shared final division — DuckDB
parity is bit-exact at any scale factor and any block layout.

Scale shapes:
- single-scan aggregates (Q6, Q19, Q14) are per-block partials with a
  constant-size driver merge — no exchange at all;
- dimension hops (part, supplier) are sorted-key broadcast attaches;
- the one fact×fact hop (orders⋈lineitem) reuses the Q3/Q10
  broadcast-vs-native planner (``_attach_order_attrs``);
- unbounded-key grouping (Q18's per-order quantity) carries a
  driver/shuffle planner: pyarrow partials merged on the driver below
  the band, Ray's hash groupby beyond (agreement-tested).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray

from ..sources.io import read_table
from ..stages.groupagg import grouped_agg
from .tpch_extra import (_BROADCAST_MAX_ROWS, _attach_order_attrs,
                         _cents, _rev_e4)

__all__ = ["q4_order_priority", "q6_revenue_change",
           "q12_priority_class", "q13_customer_distribution",
           "q14_promo_revenue", "q15_top_supplier",
           "q17_small_quantity_revenue", "q18_large_volume_customers",
           "q19_disjunctive_revenue", "q21_waiting_suppliers",
           "q22_stale_customers"]



from ..scale import fact_join_partitions as _nparts  # noqa: E402

def _disc_e2(b: pa.Table) -> np.ndarray:
    """l_discount as exact integer percent (2-dp decimal → int64)."""
    d = b["l_discount"].to_numpy(zero_copy_only=False)
    return np.rint(d * 100.0).astype(np.int64)


def _price_e2(b: pa.Table, col: str = "l_extendedprice") -> np.ndarray:
    """2-dp money column as exact integer cents."""
    v = b[col].to_numpy(zero_copy_only=False)
    return np.rint(v * 100.0).astype(np.int64)


def q6_revenue_change(sf_dir: str, *, date_lo: str = "1996-01-01",
                      date_hi: str = "1997-01-01",
                      disc_lo: int = 4, disc_hi: int = 6,
                      qty_max: float = 24.0) -> pa.Table:
    """Forecasting revenue change (Q6): Σ l_extendedprice·l_discount
    over a ship-year, a discount band and small quantities — the
    single-scan aggregate. date + quantity predicates are pushed into
    the parquet read; the discount band compares EXACT integer
    percents (float ``BETWEEN 0.04 AND 0.06`` is representation-
    dependent, ``rint(d*100) ∈ [4,6]`` is not). One int64 partial per
    block, constant driver merge. → (revenue, n_rows)."""
    import pyarrow.dataset as pads

    lo, hi = pd.Timestamp(date_lo), pd.Timestamp(date_hi)
    lane = read_table(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_extendedprice", "l_discount", "l_quantity",
                 "l_shipdate"],
        filter=(pads.field("l_shipdate") >= lo)
        & (pads.field("l_shipdate") < hi)
        & (pads.field("l_quantity") < qty_max))

    def partial(b: pa.Table) -> pa.Table:
        d = _disc_e2(b)
        m = (d >= disc_lo) & (d <= disc_hi)
        rev = _price_e2(b)[m] * d[m]  # 10^-4 units
        return pa.Table.from_pydict({
            "rev_e4": pa.array([int(rev.sum())], pa.int64()),
            "n": pa.array([int(m.sum())], pa.int64())})

    parts = lane.map_batches(partial, batch_format="pyarrow",
                             zero_copy_batch=True).to_pandas()
    rev = _cents(pd.Series([parts["rev_e4"].sum()]))
    return pa.Table.from_pydict({
        "revenue": pa.array([float(rev.iloc[0])], pa.float64()),
        "n_rows": pa.array([int(parts["n"].sum())], pa.int64())})


def q4_order_priority(sf_dir: str, *, date_lo: str = "1996-01-01",
                      date_hi: str = "1997-01-01",
                      exists_mode: str = "auto") -> pa.Table:
    """Order-priority checking (Q4 shape): count orders per priority in
    a window where EXISTS a lineitem with l_returnflag='R' (the corpus
    has no commitdate/receiptdate pair, so "late delivery" becomes
    "had a returned item" — same EXISTS-distinct semi-join plan).
    → (o_orderpriority, order_count) ordered by priority.

    The distinct R-orderkey set is the scale knob: ``driver`` merges
    per-block ``np.unique`` partials (bounded by #distinct flagged
    orders), ``shuffle`` resolves distinct keys with Ray's hash groupby
    and semi-joins natively; ``auto`` picks by the broadcast band."""
    import pyarrow.dataset as pads

    lo, hi = pd.Timestamp(date_lo), pd.Timestamp(date_hi)
    lane = read_table(f"{sf_dir}/lineitem.parquet",
                      columns=["l_orderkey", "l_returnflag"],
                      filter=pads.field("l_returnflag") == "R"
                      ).drop_columns(["l_returnflag"])
    orders = read_table(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderpriority"],
        filter=(pads.field("o_orderdate") >= lo)
        & (pads.field("o_orderdate") < hi))

    if exists_mode == "auto":
        exists_mode = ("driver" if lane.count() <= _BROADCAST_MAX_ROWS
                       else "shuffle")
    if exists_mode == "driver":
        def uniq(b: pa.Table) -> pa.Table:
            return pa.Table.from_pydict({"k": pa.array(np.unique(
                b["l_orderkey"].to_numpy(zero_copy_only=False)))})

        keys = np.unique(lane.map_batches(
            uniq, batch_format="pyarrow", zero_copy_batch=True
        ).to_pandas()["k"].to_numpy())
        kref = ray.put(keys)

        def semi(b: pa.Table) -> pa.Table:
            ks = ray.get(kref)
            ok = b["o_orderkey"].to_numpy(zero_copy_only=False)
            pos = np.clip(np.searchsorted(ks, ok), 0,
                          max(len(ks) - 1, 0))
            m = (ks[pos] == ok) if len(ks) else np.zeros(len(ok), bool)
            return b.filter(pa.array(m))

        orders = orders.map_batches(semi, batch_format="pyarrow",
                                    zero_copy_batch=True)
    elif exists_mode == "shuffle":
        distinct = lane.groupby("l_orderkey").count()
        orders = orders.join(distinct, join_type="inner",
                             num_partitions=_nparts(sf_dir, "orders"), on=("o_orderkey",),
                             right_on=("l_orderkey",)
                             ).drop_columns(["count()"])
    else:
        raise ValueError(f"unknown exists_mode: {exists_mode!r}")

    g = grouped_agg(orders, ["o_orderpriority"],
                    {"order_count": ("o_orderkey", "count")})
    g = g.sort_values("o_orderpriority").reset_index(drop=True)
    return pa.Table.from_pandas(g[["o_orderpriority", "order_count"]],
                                preserve_index=False)


def q12_priority_class(sf_dir: str, *, date_lo: str = "1996-01-01",
                       date_hi: str = "1997-01-01",
                       join_mode: str = "auto") -> pa.Table:
    """Shipping-priority split (Q12 shape): lineitems shipped in a
    window, grouped by l_linestatus (the corpus has no l_shipmode),
    counting urgent/high-priority orders vs the rest. The orders side
    ships through the Q3/Q10 fact-join planner; the CASE split is a
    vectorized isin. → (l_linestatus, high_line_count, low_line_count)."""
    import pyarrow.dataset as pads

    lo, hi = pd.Timestamp(date_lo), pd.Timestamp(date_hi)
    lane = read_table(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_linestatus", "l_shipdate"],
        filter=(pads.field("l_shipdate") >= lo)
        & (pads.field("l_shipdate") < hi)).drop_columns(["l_shipdate"])
    orders = read_table(f"{sf_dir}/orders.parquet",
                        columns=["o_orderkey", "o_orderpriority"])

    if join_mode == "auto":
        join_mode = ("broadcast"
                     if orders.count() <= _BROADCAST_MAX_ROWS
                     else "shuffle")
    if join_mode == "broadcast":
        joined = _attach_order_attrs(lane, orders, ["o_orderpriority"])
    elif join_mode == "shuffle":
        joined = lane.join(orders, join_type="inner",
                   num_partitions=_nparts(sf_dir, "lineitem"),
                           on=("l_orderkey",), right_on=("o_orderkey",))
    else:
        raise ValueError(f"unknown join_mode: {join_mode!r}")

    def split(b: pa.Table) -> pa.Table:
        hi_m = pc.is_in(b["o_orderpriority"],
                        value_set=pa.array(["1-URGENT", "2-HIGH"]))
        h = pc.cast(hi_m, pa.int64())
        return pa.Table.from_pydict({
            "l_linestatus": b["l_linestatus"], "high": h,
            "low": pc.subtract(pa.scalar(1, pa.int64()), h)})

    joined = joined.map_batches(split, batch_format="pyarrow",
                                zero_copy_batch=True)
    g = grouped_agg(joined, ["l_linestatus"],
                    {"high_line_count": ("high", "sum"),
                     "low_line_count": ("low", "sum")})
    g = g.sort_values("l_linestatus").reset_index(drop=True)
    return pa.Table.from_pandas(
        g[["l_linestatus", "high_line_count", "low_line_count"]],
        preserve_index=False)


def q14_promo_revenue(sf_dir: str, *, date_lo: str = "1996-01-01",
                      date_hi: str = "1996-04-01") -> pa.Table:
    """Promotion effect (Q14): the revenue share of parts with
    p_type='PROMO' (the corpus's type domain is categorical, not
    'PROMO%'-prefixed) over a ship window. The part→is_promo map is a
    genuine dimension broadcast; both sums are exact int64 10⁻⁴ units,
    so the final 100·promo/total is ONE float64 division performed
    identically by both engines — bit-exact parity without tolerance.
    → (promo_revenue_pct, promo_revenue, total_revenue)."""
    import pyarrow.dataset as pads

    lo, hi = pd.Timestamp(date_lo), pd.Timestamp(date_hi)
    part = read_table(f"{sf_dir}/part.parquet",
                      columns=["p_partkey", "p_type"]).to_pandas()
    pk = part["p_partkey"].to_numpy()
    srt = np.argsort(pk, kind="mergesort")
    pref = ray.put((pk[srt],
                    (part["p_type"].to_numpy() == "PROMO")[srt]))

    def partial(b: pa.Table) -> pa.Table:
        keys, promo = ray.get(pref)
        lk = b["l_partkey"].to_numpy(zero_copy_only=False)
        pos = np.clip(np.searchsorted(keys, lk), 0,
                      max(len(keys) - 1, 0))
        m = (keys[pos] == lk) if len(keys) else np.zeros(len(lk), bool)
        rev = _rev_e4(b).to_numpy(zero_copy_only=False)[m]
        is_p = promo[pos[m]]
        return pa.Table.from_pydict({
            "promo_e4": pa.array([int(rev[is_p].sum())], pa.int64()),
            "total_e4": pa.array([int(rev.sum())], pa.int64())})

    parts = read_table(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_extendedprice", "l_discount",
                 "l_shipdate"],
        filter=(pads.field("l_shipdate") >= lo)
        & (pads.field("l_shipdate") < hi)).map_batches(
        partial, batch_format="pyarrow",
        zero_copy_batch=True).to_pandas()
    promo_e4 = int(parts["promo_e4"].sum())
    total_e4 = int(parts["total_e4"].sum())
    pct = 100.0 * float(promo_e4) / float(total_e4) if total_e4 else 0.0
    return pa.Table.from_pydict({
        "promo_revenue_pct": pa.array([pct], pa.float64()),
        "promo_revenue": pa.array(
            [float(_cents(pd.Series([promo_e4])).iloc[0])],
            pa.float64()),
        "total_revenue": pa.array(
            [float(_cents(pd.Series([total_e4])).iloc[0])],
            pa.float64())})


def q15_top_supplier(sf_dir: str, *, date_lo: str = "1996-01-01",
                     date_hi: str = "1996-07-01") -> pa.Table:
    """Top supplier (Q15): per-supplier revenue over a ship window,
    keeping every supplier tied at the max (the spec's view + WHERE
    total = MAX(total) shape). Supplier keys are dimension-bounded, so
    the roll-up is map-side partials with a driver merge; supplier
    attributes are fetched candidate-only for the tied keys.
    → (s_suppkey, s_name, total_revenue) ordered by s_suppkey."""
    import pyarrow.dataset as pads

    lo, hi = pd.Timestamp(date_lo), pd.Timestamp(date_hi)

    def proj(b: pa.Table) -> pa.Table:
        return pa.Table.from_arrays([b["l_suppkey"], _rev_e4(b)],
                                    names=["l_suppkey", "rev_e4"])

    lane = read_table(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_suppkey", "l_extendedprice", "l_discount",
                 "l_shipdate"],
        filter=(pads.field("l_shipdate") >= lo)
        & (pads.field("l_shipdate") < hi)).map_batches(
        proj, batch_format="pyarrow", zero_copy_batch=True)
    g = grouped_agg(lane, ["l_suppkey"], {"rev_sum": ("rev_e4", "sum")})
    g["total_revenue"] = _cents(g.pop("rev_sum"))
    top = g[g["total_revenue"] == g["total_revenue"].max()]

    keyset = sorted(top["l_suppkey"].tolist())
    sup = read_table(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_name"],
        filter=pads.field("s_suppkey").isin(keyset)).to_pandas()
    out = top.merge(sup, left_on="l_suppkey", right_on="s_suppkey",
                    how="left").sort_values("s_suppkey")
    return pa.Table.from_pandas(
        out[["s_suppkey", "s_name", "total_revenue"]].reset_index(
            drop=True), preserve_index=False)


def q17_small_quantity_revenue(sf_dir: str, *,
                               brand: str = "Brand#25") -> pa.Table:
    """Small-quantity-order revenue (Q17 shape): average yearly revenue
    lost if small orders (quantity < 20% of the part's average) of one
    brand's parts were dropped (the corpus has no p_container, so the
    filter is brand-only). Two passes over the brand-filtered lane:
    per-part (Σqty, n) partials → driver avg map (bounded by the
    filtered part count) → broadcast threshold attach + masked sum.
    Quantities are integral, so both engines' averages divide exact
    int64 sums — the 0.2·avg threshold is bit-identical.
    → (avg_yearly, total_revenue, n_small)."""
    import pyarrow.dataset as pads

    part = read_table(f"{sf_dir}/part.parquet",
                      columns=["p_partkey", "p_brand"],
                      filter=pads.field("p_brand") == brand).to_pandas()
    pkeys = np.sort(part["p_partkey"].to_numpy())
    lane = read_table(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_quantity", "l_extendedprice"],
        filter=pads.field("l_partkey").isin(pkeys.tolist()))

    def qty_partial(b: pa.Table) -> pa.Table:
        q = b["l_quantity"].to_numpy(zero_copy_only=False)
        return pa.Table.from_pydict({
            "p": b["l_partkey"],
            "q": pa.array(np.rint(q).astype(np.int64), pa.int64()),
            "n": pa.array(np.ones(len(q), np.int64), pa.int64())}
        ).group_by(["p"]).aggregate([("q", "sum"), ("n", "sum")])

    parts = lane.map_batches(qty_partial, batch_format="pyarrow",
                             zero_copy_batch=True).to_pandas()
    per = parts.groupby("p", as_index=False).agg(
        q=("q_sum", "sum"), n=("n_sum", "sum"))
    thr_keys = per["p"].to_numpy()
    srt = np.argsort(thr_keys, kind="mergesort")
    thr = 0.2 * (per["q"].to_numpy().astype(np.float64)
                 / per["n"].to_numpy().astype(np.float64))
    tref = ray.put((thr_keys[srt], thr[srt]))

    def small_partial(b: pa.Table) -> pa.Table:
        keys, th = ray.get(tref)
        lk = b["l_partkey"].to_numpy(zero_copy_only=False)
        pos = np.clip(np.searchsorted(keys, lk), 0,
                      max(len(keys) - 1, 0))
        hit = (keys[pos] == lk) if len(keys) else np.zeros(
            len(lk), bool)
        q = b["l_quantity"].to_numpy(zero_copy_only=False)
        m = hit & (q < th[pos])
        cents = _price_e2(b)[m]
        return pa.Table.from_pydict({
            "cents": pa.array([int(cents.sum())], pa.int64()),
            "n": pa.array([int(m.sum())], pa.int64())})

    agg = lane.map_batches(small_partial, batch_format="pyarrow",
                           zero_copy_batch=True).to_pandas()
    cents = int(agg["cents"].sum())
    return pa.Table.from_pydict({
        "avg_yearly": pa.array([cents / 100.0 / 7.0], pa.float64()),
        "total_revenue": pa.array([cents / 100.0], pa.float64()),
        "n_small": pa.array([int(agg["n"].sum())], pa.int64())})


def q18_large_volume_customers(sf_dir: str, *,
                               qty_threshold: int = 150,
                               k: int = 100,
                               agg_mode: str = "auto") -> pa.Table:
    """Large-volume customers (Q18): orders whose summed lineitem
    quantity exceeds a threshold, with customer attributes, top-k by
    (o_totalprice desc, o_orderdate, o_orderkey). The per-ORDER
    quantity sum is unbounded-key grouping — the planner: ``driver``
    merges per-block pyarrow partials (#surviving orders bounded);
    ``shuffle`` is Ray's hash groupby for beyond-driver-memory key
    counts. Customer/order attributes are fetched candidate-only for
    the ≤k survivors. → (c_custkey, c_name, o_orderkey, o_orderdate,
    o_totalprice, sum_qty)."""
    import pyarrow.dataset as pads

    lane = read_table(f"{sf_dir}/lineitem.parquet",
                      columns=["l_orderkey", "l_quantity"])
    if agg_mode == "auto":
        agg_mode = ("driver" if lane.count() <= 50_000_000
                    else "shuffle")
    if agg_mode == "driver":
        g = grouped_agg(lane, ["l_orderkey"],
                        {"sum_qty": ("l_quantity", "sum")})
    elif agg_mode == "shuffle":
        g = (lane.groupby("l_orderkey").sum("l_quantity")
             .rename_columns(["l_orderkey", "sum_qty"]).to_pandas())
    else:
        raise ValueError(f"unknown agg_mode: {agg_mode!r}")
    g = g[g["sum_qty"] > qty_threshold]

    keyset = sorted(int(x) for x in g["l_orderkey"].tolist())
    orders = read_table(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate",
                 "o_totalprice"],
        filter=pads.field("o_orderkey").isin(keyset)).to_pandas()
    out = orders.merge(g, left_on="o_orderkey", right_on="l_orderkey")
    out = out.sort_values(
        ["o_totalprice", "o_orderdate", "o_orderkey"],
        ascending=[False, True, True]).head(k)
    cust = read_table(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_name"],
        filter=pads.field("c_custkey").isin(
            sorted(set(int(x) for x in out["o_custkey"])))).to_pandas()
    out = out.merge(cust, left_on="o_custkey", right_on="c_custkey",
                    how="left")
    out["sum_qty"] = out["sum_qty"].astype("float64")
    return pa.Table.from_pandas(
        out[["c_custkey", "c_name", "o_orderkey", "o_orderdate",
             "o_totalprice", "sum_qty"]].reset_index(drop=True),
        preserve_index=False)


#: Q19's OR-of-ANDs arms, adapted to (brand, size band, quantity band)
#: — the corpus has no p_container. Shared with the oracle SQL.
Q19_ARMS = (("Brand#25", 1, 30, 1, 25),
            ("Brand#17", 1, 40, 10, 35),
            ("Brand#13", 1, 50, 20, 45))


def q19_disjunctive_revenue(sf_dir: str) -> pa.Table:
    """Discounted revenue under disjunctive predicates (Q19 shape):
    three (brand, size-band, quantity-band) arms OR-ed together. The
    part→(brand, size) map broadcasts once; every arm is a vectorized
    mask over the joined batch — one scan, no exchange, constant driver
    merge. → (revenue, n_rows)."""
    part = read_table(f"{sf_dir}/part.parquet",
                      columns=["p_partkey", "p_brand",
                               "p_size"]).to_pandas()
    pk = part["p_partkey"].to_numpy()
    srt = np.argsort(pk, kind="mergesort")
    pref = ray.put((pk[srt], part["p_brand"].to_numpy()[srt],
                    part["p_size"].to_numpy()[srt]))

    def partial(b: pa.Table) -> pa.Table:
        keys, brands, sizes = ray.get(pref)
        lk = b["l_partkey"].to_numpy(zero_copy_only=False)
        pos = np.clip(np.searchsorted(keys, lk), 0,
                      max(len(keys) - 1, 0))
        hit = (keys[pos] == lk) if len(keys) else np.zeros(
            len(lk), bool)
        q = b["l_quantity"].to_numpy(zero_copy_only=False)
        br, sz = brands[pos], sizes[pos]
        m = np.zeros(len(lk), bool)
        for brand, s_lo, s_hi, q_lo, q_hi in Q19_ARMS:
            m |= (hit & (br == brand) & (sz >= s_lo) & (sz <= s_hi)
                  & (q >= q_lo) & (q <= q_hi))
        rev = _rev_e4(b).to_numpy(zero_copy_only=False)[m]
        return pa.Table.from_pydict({
            "rev_e4": pa.array([int(rev.sum())], pa.int64()),
            "n": pa.array([int(m.sum())], pa.int64())})

    parts = read_table(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_quantity", "l_extendedprice",
                 "l_discount"]).map_batches(
        partial, batch_format="pyarrow",
        zero_copy_batch=True).to_pandas()
    rev = _cents(pd.Series([parts["rev_e4"].sum()]))
    return pa.Table.from_pydict({
        "revenue": pa.array([float(rev.iloc[0])], pa.float64()),
        "n_rows": pa.array([int(parts["n"].sum())], pa.int64())})


def q22_stale_customers(sf_dir: str, *, cutoff: str = "1999-01-01",
                        anti_mode: str = "auto") -> pa.Table:
    """Global sales opportunity (Q22 shape): customers whose account
    balance exceeds the average positive balance AND who placed no
    order since a cutoff (the corpus has no c_phone country codes, so
    the grouping key is c_mktsegment and "never ordered" becomes
    "stale since cutoff"). The scalar average is one per-block
    (Σcents, n) partial pass; the anti-join set is distinct recent
    o_custkey via the driver/shuffle planner. Balances sum in exact
    integer cents. → (c_mktsegment, numcust, totacctbal)."""
    import pyarrow.dataset as pads

    cust = read_table(f"{sf_dir}/customer.parquet",
                      columns=["c_custkey", "c_acctbal",
                               "c_mktsegment"])

    def bal_partial(b: pa.Table) -> pa.Table:
        cents = _price_e2(b, "c_acctbal")
        m = cents > 0
        return pa.Table.from_pydict({
            "s": pa.array([int(cents[m].sum())], pa.int64()),
            "n": pa.array([int(m.sum())], pa.int64())})

    parts = cust.map_batches(bal_partial, batch_format="pyarrow",
                             zero_copy_batch=True).to_pandas()
    n_pos = int(parts["n"].sum())
    avg_cents = (float(parts["s"].sum()) / n_pos) if n_pos else 0.0

    recent = read_table(
        f"{sf_dir}/orders.parquet", columns=["o_custkey"],
        filter=pads.field("o_orderdate") >= pd.Timestamp(cutoff))
    if anti_mode == "auto":
        anti_mode = ("driver" if recent.count() <= _BROADCAST_MAX_ROWS
                     else "shuffle")
    if anti_mode == "driver":
        def uniq(b: pa.Table) -> pa.Table:
            return pa.Table.from_pydict({"k": pa.array(np.unique(
                b["o_custkey"].to_numpy(zero_copy_only=False)))})

        keys = np.unique(recent.map_batches(
            uniq, batch_format="pyarrow", zero_copy_batch=True
        ).to_pandas()["k"].to_numpy())
    elif anti_mode == "shuffle":
        keys = np.sort(recent.groupby("o_custkey").count()
                       .to_pandas()["o_custkey"].to_numpy())
    else:
        raise ValueError(f"unknown anti_mode: {anti_mode!r}")
    kref = ray.put(keys)

    def keep(b: pa.Table) -> pa.Table:
        ks = ray.get(kref)
        cents = _price_e2(b, "c_acctbal")
        ck = b["c_custkey"].to_numpy(zero_copy_only=False)
        pos = np.clip(np.searchsorted(ks, ck), 0, max(len(ks) - 1, 0))
        has = (ks[pos] == ck) if len(ks) else np.zeros(len(ck), bool)
        m = (~has) & (cents > avg_cents)
        return pa.Table.from_pydict({
            "c_mktsegment": b["c_mktsegment"].filter(pa.array(m)),
            "cents": pa.array(cents[m], pa.int64())})

    kept = cust.map_batches(keep, batch_format="pyarrow",
                            zero_copy_batch=True)
    g = grouped_agg(kept, ["c_mktsegment"],
                    {"numcust": ("cents", "count"),
                     "cents_sum": ("cents", "sum")})
    g["totacctbal"] = g.pop("cents_sum").astype("int64") / 100.0
    g = g.sort_values("c_mktsegment").reset_index(drop=True)
    return pa.Table.from_pandas(
        g[["c_mktsegment", "numcust", "totacctbal"]],
        preserve_index=False)


def q13_customer_distribution(sf_dir: str, *,
                              exclude_priority: str = "1-URGENT",
                              agg_mode: str = "auto") -> pa.Table:
    """Customer distribution (Q13 shape): histogram of per-customer
    order counts, INCLUDING the zero-order customers of the LEFT OUTER
    join. The corpus has no o_comment, so the classic
    ``NOT LIKE '%special%requests%'`` join predicate becomes
    ``o_orderpriority <> exclude_priority`` (same shape: a filter on
    the JOIN side, not on customers). → (c_count, custdist) ordered by
    (custdist desc, c_count desc).

    Scale plan: per-custkey counting is unbounded-key grouping —
    ``driver`` merges per-block pyarrow partials (bounded by #active
    customers), ``shuffle`` is Ray's hash groupby beyond the band. The
    zero bucket never materializes the customer×orders join: it is
    |customer| − |matched custkeys|, with the orders side semi-filtered
    against the customer keyset so FK violations can't inflate a
    bucket (LEFT JOIN counts only orders whose custkey exists).
    Reference analogue: the per-customer booking census rollups in
    /root/reference/cerberus/models/booking.py."""
    import pyarrow.dataset as pads

    lane = read_table(f"{sf_dir}/orders.parquet", columns=["o_custkey"],
                      filter=pads.field("o_orderpriority")
                      != exclude_priority)
    if agg_mode == "auto":
        agg_mode = ("driver" if lane.count() <= 50_000_000
                    else "shuffle")
    if agg_mode == "driver":
        g = grouped_agg(lane, ["o_custkey"],
                        {"c_count": ("o_custkey", "count")})
    elif agg_mode == "shuffle":
        g = (lane.groupby("o_custkey").count()
             .rename_columns(["o_custkey", "c_count"]).to_pandas())
    else:
        raise ValueError(f"unknown agg_mode: {agg_mode!r}")

    def cust_uniq(b: pa.Table) -> pa.Table:
        return pa.Table.from_pydict({"k": pa.array(np.unique(
            b["c_custkey"].to_numpy(zero_copy_only=False)))})

    ckeys = np.unique(read_table(
        f"{sf_dir}/customer.parquet", columns=["c_custkey"]
    ).map_batches(cust_uniq, batch_format="pyarrow",
                  zero_copy_batch=True).to_pandas()["k"].to_numpy())
    ok = g["o_custkey"].to_numpy()
    pos = np.clip(np.searchsorted(ckeys, ok), 0, max(len(ckeys) - 1, 0))
    matched = (ckeys[pos] == ok) if len(ckeys) else np.zeros(
        len(ok), bool)
    counts = g["c_count"].to_numpy()[matched].astype(np.int64)
    vals, dist = np.unique(counts, return_counts=True)
    n_zero = int(len(ckeys) - matched.sum())
    if n_zero > 0:
        vals = np.append(vals, 0)
        dist = np.append(dist, n_zero)
    out = pd.DataFrame({"c_count": vals.astype("int64"),
                        "custdist": dist.astype("int64")})
    out = out.sort_values(["custdist", "c_count"],
                          ascending=[False, False]).reset_index(drop=True)
    return pa.Table.from_pandas(out, preserve_index=False)


def q21_waiting_suppliers(sf_dir: str, *, k: int = 100,
                          pair_mode: str = "auto") -> pa.Table:
    """Suppliers who kept orders waiting (Q21 shape): for finalized
    orders ('F') with lineitems from ≥2 distinct suppliers where
    EXACTLY ONE supplier had a returned line (the corpus has no
    commit/receipt dates, so "late" becomes l_returnflag='R' — same
    EXISTS / NOT-EXISTS double-correlation plan), count each
    qualifying supplier's returned LINES per the classic COUNT(*)
    row semantics. → (s_name, numwait) top-k by (numwait desc, s_name).

    Scale plan: the (order, supplier) pair census is the wide step —
    ``driver`` merges per-block unique-pair partials carrying
    (any-R, n-R-rows); ``shuffle`` resolves pairs with Ray's two-key
    hash groupby and brings back only per-order verdicts. The 'F'
    order keyset semi-filters the lineitem scan through the broadcast
    band; supplier names are fetched CANDIDATE-ONLY for the ≤k
    survivors. Reference analogue: the multi-party booking-conflict
    rules in /root/reference/cerberus/models/booking.py."""
    import pyarrow.dataset as pads

    lane = read_table(f"{sf_dir}/lineitem.parquet",
                      columns=["l_orderkey", "l_suppkey",
                               "l_returnflag"])
    orders_f = read_table(f"{sf_dir}/orders.parquet",
                          columns=["o_orderkey"],
                          filter=pads.field("o_orderstatus") == "F")
    n_f = orders_f.count()
    if n_f <= _BROADCAST_MAX_ROWS:
        fkeys = np.unique(orders_f.to_pandas()["o_orderkey"].to_numpy())
        fref = ray.put(fkeys)

        def semi(b: pa.Table) -> pa.Table:
            ks = ray.get(fref)
            okc = b["l_orderkey"].to_numpy(zero_copy_only=False)
            pos = np.clip(np.searchsorted(ks, okc), 0,
                          max(len(ks) - 1, 0))
            m = (ks[pos] == okc) if len(ks) else np.zeros(
                len(okc), bool)
            return b.filter(pa.array(m))

        lane = lane.map_batches(semi, batch_format="pyarrow",
                                zero_copy_batch=True)
    else:
        lane = lane.join(orders_f, join_type="inner",
                 num_partitions=_nparts(sf_dir, "lineitem"),
                         on=("l_orderkey",), right_on=("o_orderkey",))

    def pair_partial(b: pa.Table) -> pa.Table:
        okc = b["l_orderkey"].to_numpy(zero_copy_only=False)
        sk = b["l_suppkey"].to_numpy(zero_copy_only=False)
        r = (b["l_returnflag"].to_numpy(zero_copy_only=False)
             == "R").astype(np.int64)
        df = pd.DataFrame({"ok": okc, "sk": sk, "any_r": r, "n_r": r})
        p = df.groupby(["ok", "sk"], sort=False).agg(
            any_r=("any_r", "max"), n_r=("n_r", "sum")).reset_index()
        return pa.Table.from_pandas(p, preserve_index=False)

    pairs_ds = lane.map_batches(pair_partial, batch_format="pyarrow",
                                zero_copy_batch=True)
    if pair_mode == "auto":
        pair_mode = ("driver" if lane.count() <= 50_000_000
                     else "shuffle")
    if pair_mode == "driver":
        p = pairs_ds.to_pandas()
        p = p.groupby(["ok", "sk"], sort=False).agg(
            any_r=("any_r", "max"), n_r=("n_r", "sum")).reset_index()
    elif pair_mode == "shuffle":
        from ray.data.aggregate import Max, Sum
        p = (pairs_ds.groupby(["ok", "sk"])
             .aggregate(Max("any_r"), Sum("n_r"))
             .rename_columns(["ok", "sk", "any_r", "n_r"]).to_pandas())
    else:
        raise ValueError(f"unknown pair_mode: {pair_mode!r}")

    o = p.groupby("ok", sort=False).agg(
        n_supp=("sk", "count"), n_flag=("any_r", "sum")).reset_index()
    ok_orders = o[(o["n_supp"] >= 2) & (o["n_flag"] == 1)]["ok"]
    q = p[(p["any_r"] == 1) & p["ok"].isin(set(ok_orders))]
    per_supp = q.groupby("sk", sort=False)["n_r"].sum().reset_index()
    per_supp.columns = ["s_suppkey", "numwait"]

    sup = read_table(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_name"],
        filter=pads.field("s_suppkey").isin(
            sorted(int(x) for x in per_supp["s_suppkey"]))).to_pandas()
    out = per_supp.merge(sup, on="s_suppkey")
    out = out.groupby("s_name", sort=False)["numwait"].sum(
    ).reset_index()
    out["numwait"] = out["numwait"].astype("int64")
    out = out.sort_values(["numwait", "s_name"],
                          ascending=[False, True]).head(k)
    return pa.Table.from_pandas(
        out[["s_name", "numwait"]].reset_index(drop=True),
        preserve_index=False)
