"""Classic multi-join analytical queries (TPC-H Q3/Q10 shapes) over the
driver tables — the composition test for the engine's join planners:
fact×fact native shuffle join, dimension/semi-filter broadcasts,
map-side combined grouped aggregation, candidate-only attribute fetch.

Revenue = Σ l_extendedprice·(1−l_discount) is computed in EXACT integer
10⁻⁴ units: both money columns are 2-dp decimals, so
``round(price·100) · round((1−disc)·100)`` is an exact int64 per row and
the sum is order-independent — the same integer-units trick the engine
uses for 2-dp window aggregates (events_rolling_1h), making DuckDB
parity bit-exact at any scale factor. Final rounding to cents is integer
``(sum + 50) // 100`` on BOTH sides (shared-kernel parity).

Scale shape per query:
- Q3: the selective sides are filtered AT THE READ (segment, date
  cutoffs pushed into the parquet scan); the customer semi-filter uses
  the broadcast-vs-native-join planner (`_BROADCAST_MAX_ROWS`, the same
  dial as revenue_per_nation); orders⋈lineitem is fact×fact → native
  hash-partitioned ``Dataset.join``; the grouped roll-up is map-side
  combined with a driver merge bounded by the FILTERED order count
  (beyond that band the swap is Ray's groupby, the engine convention).
- Q10: fact×fact join as above; the top-k custkeys are resolved first
  and customer/nation attributes are fetched CANDIDATE-ONLY (an `is_in`
  semi-join over k keys) — never a full customer materialization.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray

from ..sources.io import read_table
from ..stages.groupagg import grouped_agg

__all__ = ["q3_shipping_priority", "q10_returned_items",
           "q5_local_supplier_volume", "q7_volume_shipping",
           "q8_market_share"]

#: same broadcast band as relational2 (a lookup side must fit every
#: worker's heap to ship by value)
_BROADCAST_MAX_ROWS = 5_000_000



from ..scale import fact_join_partitions as _nparts  # noqa: E402

def _rev_e4(b: pa.Table) -> pa.Array:
    """Exact per-row revenue in 10⁻⁴ currency units (int64)."""
    price = b["l_extendedprice"].to_numpy(zero_copy_only=False)
    disc = b["l_discount"].to_numpy(zero_copy_only=False)
    p100 = np.rint(price * 100.0).astype(np.int64)
    k100 = np.rint((1.0 - disc) * 100.0).astype(np.int64)
    return pa.array(p100 * k100, pa.int64())


def _cents(sum_e4: pd.Series) -> pd.Series:
    """Integer half-up 10⁻⁴-units → currency (2 dp), order-independent
    and shared verbatim with the oracle's ``(SUM(..)+50)//100``."""
    return ((sum_e4.astype("int64") + 50) // 100) / 100.0


def _attach_order_attrs(lane, orders, attr_cols):
    """Broadcast path for the orders⋈lineitem fact join when the
    FILTERED orders side fits the broadcast band: ship (sorted orderkey,
    attrs) once via ``ray.put`` and attach per lineitem batch with one
    searchsorted — no exchange. The planner picks this below
    ``_BROADCAST_MAX_ROWS`` filtered orders (Q3's date cutoff / Q10's
    window keep a fraction of orders); above the band the native
    hash-partitioned join stays the plan (agreement-tested)."""
    odf = orders.to_pandas()
    order_keys = odf["o_orderkey"].to_numpy()
    srt = np.argsort(order_keys, kind="mergesort")
    payload = (order_keys[srt],
               {c: odf[c].to_numpy()[srt] for c in attr_cols})
    ref = ray.put(payload)

    def attach(b: pa.Table) -> pa.Table:
        keys, attrs = ray.get(ref)
        lk = b["l_orderkey"].to_numpy(zero_copy_only=False)
        pos = np.searchsorted(keys, lk)
        pos_c = np.clip(pos, 0, len(keys) - 1)
        m = (keys[pos_c] == lk) if len(keys) else np.zeros(len(lk), bool)
        mask = pa.array(m)
        cols = {c: b[c].filter(mask) for c in b.column_names}
        for c in attr_cols:
            cols[c] = pa.array(attrs[c][pos_c[m]])
        return pa.Table.from_pydict(cols)

    return lane.map_batches(attach, batch_format="pyarrow",
                            zero_copy_batch=True)


def q3_shipping_priority(sf_dir: str, *, mode: str = "auto",
                         join_mode: str = "auto",
                         segment: str = "BUILDING",
                         cutoff: str = "1998-01-01",
                         k: int = 10) -> pa.Table:
    """Top-k unshipped-revenue orders for a market segment (Q3 shape):
    customer ⋈ orders ⋈ lineitem with opposing date cutoffs, grouped by
    order. → (l_orderkey, revenue, o_orderdate, o_orderpriority) ordered
    by (revenue desc, o_orderdate, l_orderkey)."""
    import pyarrow.dataset as pads

    cut = pd.Timestamp(cutoff)
    cust = read_table(f"{sf_dir}/customer.parquet",
                      columns=["c_custkey"],
                      filter=pads.field("c_mktsegment") == segment)
    if mode == "auto":
        n = cust.count()
        mode = "broadcast" if n <= _BROADCAST_MAX_ROWS else "shuffle"
    if mode not in ("broadcast", "shuffle"):
        raise ValueError(f"unknown join mode: {mode!r}")

    orders = read_table(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate",
                 "o_orderpriority"],
        filter=pads.field("o_orderdate") < cut)
    if mode == "broadcast":
        keys = ray.put(pa.array(np.sort(
            cust.to_pandas()["c_custkey"].to_numpy())))

        def semi(b: pa.Table) -> pa.Table:
            return b.filter(pc.is_in(b["o_custkey"],
                                     value_set=ray.get(keys))).drop_columns(
                ["o_custkey"])

        orders = orders.map_batches(semi, batch_format="pyarrow",
                                    zero_copy_batch=True)
    else:
        # the join coalesces the key pair into the left name, so only
        # o_custkey remains to drop
        orders = orders.join(cust, join_type="inner",
                     num_partitions=_nparts(sf_dir, "orders"),
                             on=("o_custkey",), right_on=("c_custkey",)
                             ).drop_columns(["o_custkey"])

    def lane_proj(b: pa.Table) -> pa.Table:
        return pa.Table.from_arrays(
            [b["l_orderkey"], _rev_e4(b)], names=["l_orderkey", "rev_e4"])

    lane = read_table(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount",
                 "l_shipdate"],
        filter=pads.field("l_shipdate") > cut).map_batches(
        lane_proj, batch_format="pyarrow", zero_copy_batch=True)

    if join_mode == "auto":
        join_mode = ("broadcast"
                     if orders.count() <= _BROADCAST_MAX_ROWS
                     else "shuffle")
    if join_mode == "broadcast":
        # the filtered orders side fits the band: attach attrs by
        # broadcast searchsorted instead of the fixed-cost exchange
        joined = _attach_order_attrs(
            lane, orders, ["o_orderdate", "o_orderpriority"])
    elif join_mode == "shuffle":
        joined = lane.join(orders, join_type="inner",
                   num_partitions=_nparts(sf_dir, "lineitem"),
                           on=("l_orderkey",), right_on=("o_orderkey",))
    else:
        raise ValueError(f"unknown join_mode: {join_mode!r}")
    g = grouped_agg(joined,
                    ["l_orderkey", "o_orderdate", "o_orderpriority"],
                    {"rev_sum": ("rev_e4", "sum")})
    g["revenue"] = _cents(g.pop("rev_sum"))
    g = g.sort_values(["revenue", "o_orderdate", "l_orderkey"],
                      ascending=[False, True, True]).head(k)
    out = g[["l_orderkey", "revenue", "o_orderdate",
             "o_orderpriority"]].reset_index(drop=True)
    return pa.Table.from_pandas(out, preserve_index=False)


def q10_returned_items(sf_dir: str, *, join_mode: str = "auto",
                       date_lo: str = "1997-01-01",
                       date_hi: str = "1997-07-01",
                       k: int = 20) -> pa.Table:
    """Top-k customers by revenue lost to returns in a date window (Q10
    shape). → (c_custkey, c_name, revenue, c_acctbal, n_name) ordered by
    (revenue desc, c_custkey). Customer/nation attributes are fetched
    candidate-only AFTER the top-k is known."""
    import pyarrow.dataset as pads

    lo, hi = pd.Timestamp(date_lo), pd.Timestamp(date_hi)

    def lane_proj(b: pa.Table) -> pa.Table:
        return pa.Table.from_arrays(
            [b["l_orderkey"], _rev_e4(b)], names=["l_orderkey", "rev_e4"])

    lane = read_table(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount",
                 "l_returnflag"],
        filter=pads.field("l_returnflag") == "R").map_batches(
        lane_proj, batch_format="pyarrow", zero_copy_batch=True)
    orders = read_table(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey",
                                             "o_orderdate"],
        filter=(pads.field("o_orderdate") >= lo)
        & (pads.field("o_orderdate") < hi)).drop_columns(["o_orderdate"])

    if join_mode == "auto":
        join_mode = ("broadcast"
                     if orders.count() <= _BROADCAST_MAX_ROWS
                     else "shuffle")
    if join_mode == "broadcast":
        joined = _attach_order_attrs(lane, orders, ["o_custkey"])
    elif join_mode == "shuffle":
        joined = lane.join(orders, join_type="inner",
                   num_partitions=_nparts(sf_dir, "lineitem"),
                           on=("l_orderkey",), right_on=("o_orderkey",))
    else:
        raise ValueError(f"unknown join_mode: {join_mode!r}")
    g = grouped_agg(joined, ["o_custkey"], {"rev_sum": ("rev_e4", "sum")})
    g["revenue"] = _cents(g.pop("rev_sum"))
    top = g.sort_values(["revenue", "o_custkey"],
                        ascending=[False, True]).head(k)

    # candidate-only attribute fetch: k keys, never the customer table
    keyset = pa.array(np.sort(top["o_custkey"].to_numpy()))
    cust = read_table(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_name", "c_acctbal", "c_nationkey"],
        filter=pads.field("c_custkey").isin(keyset.to_pylist())
    ).to_pandas()
    nation = read_table(f"{sf_dir}/nation.parquet",
                        columns=["n_nationkey", "n_name"]).to_pandas()
    cust = cust.merge(nation, left_on="c_nationkey",
                      right_on="n_nationkey", how="left")
    out = top.merge(cust, left_on="o_custkey", right_on="c_custkey",
                    how="left")
    out = out.sort_values(["revenue", "c_custkey"],
                          ascending=[False, True]).reset_index(drop=True)
    return pa.Table.from_pandas(
        out[["c_custkey", "c_name", "revenue", "c_acctbal", "n_name"]],
        preserve_index=False)


def q5_local_supplier_volume(sf_dir: str, *, region: str = "ASIA",
                             date_lo: str = "1996-01-01",
                             date_hi: str = "1997-01-01",
                             cust_mode: str = "auto",
                             join_mode: str = "auto") -> pa.Table:
    """Local-supplier volume (Q5 shape): revenue in a region and year
    where the CUSTOMER's nation equals the SUPPLIER's nation — the
    six-table join composition (region→nation→{customer, supplier} ×
    orders ⋈ lineitem). → (n_name, revenue) ordered by revenue desc.

    Scale plan: region/nation/supplier maps broadcast (genuine
    dimensions); the region-filtered customer→nation map goes through
    the broadcast-vs-native planner (fact-sized at 10¹² rows); the
    orders⋈lineitem fact join reuses the Q3/Q10 planner; the
    same-nation equality is a vectorized post-join filter; the rollup
    is 25-nation-bounded."""
    import pyarrow.dataset as pads

    lo, hi = pd.Timestamp(date_lo), pd.Timestamp(date_hi)
    nation = read_table(f"{sf_dir}/nation.parquet",
                        columns=["n_nationkey", "n_name",
                                 "n_regionkey"]).to_pandas()
    reg = read_table(f"{sf_dir}/region.parquet",
                     columns=["r_regionkey", "r_name"]).to_pandas()
    rkeys = set(reg.loc[reg["r_name"] == region, "r_regionkey"])
    nat = nation[nation["n_regionkey"].isin(rkeys)]
    nkeys = np.sort(nat["n_nationkey"].to_numpy())
    name_map = dict(zip(nat["n_nationkey"], nat["n_name"]))

    sup = read_table(f"{sf_dir}/supplier.parquet",
                     columns=["s_suppkey", "s_nationkey"]).to_pandas()
    sup = sup[sup["s_nationkey"].isin(nkeys)]
    skeys = sup["s_suppkey"].to_numpy()
    srt = np.argsort(skeys, kind="mergesort")
    sup_ref = ray.put((skeys[srt],
                       sup["s_nationkey"].to_numpy()[srt]))

    cust = read_table(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_nationkey"],
        filter=pads.field("c_nationkey").isin(nkeys.tolist()))
    if cust_mode == "auto":
        cust_mode = ("broadcast" if cust.count() <= _BROADCAST_MAX_ROWS
                     else "shuffle")
    orders = read_table(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey"],
        filter=(pads.field("o_orderdate") >= lo)
        & (pads.field("o_orderdate") < hi))
    if cust_mode == "broadcast":
        cdf = cust.to_pandas()
        ck = cdf["c_custkey"].to_numpy()
        csrt = np.argsort(ck, kind="mergesort")
        cref = ray.put((ck[csrt], cdf["c_nationkey"].to_numpy()[csrt]))

        def attach_cn(b: pa.Table) -> pa.Table:
            keys, nats = ray.get(cref)
            ok = b["o_custkey"].to_numpy(zero_copy_only=False)
            pos = np.searchsorted(keys, ok)
            pos_c = np.clip(pos, 0, max(len(keys) - 1, 0))
            m = (keys[pos_c] == ok) if len(keys) else np.zeros(
                len(ok), bool)
            return pa.Table.from_pydict({
                "o_orderkey": b["o_orderkey"].filter(pa.array(m)),
                "cust_nation": pa.array(nats[pos_c[m]], pa.int64())})

        orders = orders.map_batches(attach_cn, batch_format="pyarrow",
                                    zero_copy_batch=True)
    elif cust_mode == "shuffle":
        orders = (orders.join(cust, join_type="inner",
                     num_partitions=_nparts(sf_dir, "orders"),
                              on=("o_custkey",), right_on=("c_custkey",))
                  .map_batches(
                      lambda b: pa.Table.from_pydict({
                          "o_orderkey": b["o_orderkey"],
                          "cust_nation": pc.cast(b["c_nationkey"],
                                                 pa.int64())}),
                      batch_format="pyarrow", zero_copy_batch=True))
    else:
        raise ValueError(f"unknown cust_mode: {cust_mode!r}")

    def lane_proj(b: pa.Table) -> pa.Table:
        keys, nats = ray.get(sup_ref)
        sk = b["l_suppkey"].to_numpy(zero_copy_only=False)
        pos = np.searchsorted(keys, sk)
        pos_c = np.clip(pos, 0, max(len(keys) - 1, 0))
        m = (keys[pos_c] == sk) if len(keys) else np.zeros(len(sk), bool)
        mask = pa.array(m)
        return pa.Table.from_pydict({
            "l_orderkey": b["l_orderkey"].filter(mask),
            "rev_e4": _rev_e4(b).filter(mask),
            "supp_nation": pa.array(nats[pos_c[m]], pa.int64())})

    lane = read_table(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice",
                 "l_discount"]).map_batches(
        lane_proj, batch_format="pyarrow", zero_copy_batch=True)

    if join_mode == "auto":
        join_mode = ("broadcast"
                     if orders.count() <= _BROADCAST_MAX_ROWS
                     else "shuffle")
    if join_mode == "broadcast":
        joined = _attach_order_attrs(lane, orders, ["cust_nation"])
    elif join_mode == "shuffle":
        joined = lane.join(orders, join_type="inner",
                   num_partitions=_nparts(sf_dir, "lineitem"),
                           on=("l_orderkey",), right_on=("o_orderkey",))
    else:
        raise ValueError(f"unknown join_mode: {join_mode!r}")

    def local_only(b: pa.Table) -> pa.Table:
        m = pc.equal(b["supp_nation"], pc.cast(b["cust_nation"],
                                               pa.int64()))
        return b.filter(pc.fill_null(m, False))

    joined = joined.map_batches(local_only, batch_format="pyarrow",
                                zero_copy_batch=True)
    g = grouped_agg(joined, ["supp_nation"],
                    {"rev_sum": ("rev_e4", "sum")})
    g["revenue"] = _cents(g.pop("rev_sum"))
    g["n_name"] = g["supp_nation"].map(name_map)
    g = g.sort_values(["revenue", "n_name"],
                      ascending=[False, True]).reset_index(drop=True)
    return pa.Table.from_pandas(g[["n_name", "revenue"]],
                                preserve_index=False)


def q7_volume_shipping(sf_dir: str, *, nation_a: str = "NATION_3",
                       nation_b: str = "NATION_8",
                       date_lo: str = "1996-01-01",
                       date_hi: str = "1998-01-01",
                       cust_mode: str = "auto",
                       join_mode: str = "auto") -> pa.Table:
    """Volume shipping (Q7 shape): revenue shipped between two nations
    in either direction, by ship year — supplier's nation ≠ customer's
    nation with both restricted to the pair. → (supp_nation,
    cust_nation, l_year, revenue) ordered by the three keys.

    Scale plan: nation/supplier maps broadcast (dimensions); the
    pair-filtered customer map rides the broadcast-vs-native planner;
    lineitem is date-filtered AT THE READ and semi-joined to the pair's
    suppliers per batch; orders⋈lineitem reuses the Q3/Q5 fact-join
    planner; the rollup is bounded by 2×2×years."""
    import pyarrow.dataset as pads

    lo, hi = pd.Timestamp(date_lo), pd.Timestamp(date_hi)
    nation = read_table(f"{sf_dir}/nation.parquet",
                        columns=["n_nationkey", "n_name"]).to_pandas()
    pair = nation[nation["n_name"].isin([nation_a, nation_b])]
    if len(pair) != 2:
        raise ValueError(f"nations {nation_a!r}/{nation_b!r} not found")
    nkeys = np.sort(pair["n_nationkey"].to_numpy())
    name_map = dict(zip(pair["n_nationkey"], pair["n_name"]))

    sup = read_table(f"{sf_dir}/supplier.parquet",
                     columns=["s_suppkey", "s_nationkey"]).to_pandas()
    sup = sup[sup["s_nationkey"].isin(nkeys)]
    skeys = sup["s_suppkey"].to_numpy()
    srt = np.argsort(skeys, kind="mergesort")
    sup_ref = ray.put((skeys[srt], sup["s_nationkey"].to_numpy()[srt]))

    cust = read_table(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_nationkey"],
        filter=pads.field("c_nationkey").isin(nkeys.tolist()))
    if cust_mode == "auto":
        cust_mode = ("broadcast" if cust.count() <= _BROADCAST_MAX_ROWS
                     else "shuffle")
    orders = read_table(f"{sf_dir}/orders.parquet",
                        columns=["o_orderkey", "o_custkey"])
    if cust_mode == "broadcast":
        cdf = cust.to_pandas()
        ck = cdf["c_custkey"].to_numpy()
        csrt = np.argsort(ck, kind="mergesort")
        cref = ray.put((ck[csrt], cdf["c_nationkey"].to_numpy()[csrt]))

        def attach_cn(b: pa.Table) -> pa.Table:
            keys, nats = ray.get(cref)
            ok = b["o_custkey"].to_numpy(zero_copy_only=False)
            pos = np.searchsorted(keys, ok)
            pos_c = np.clip(pos, 0, max(len(keys) - 1, 0))
            m = (keys[pos_c] == ok) if len(keys) else np.zeros(
                len(ok), bool)
            return pa.Table.from_pydict({
                "o_orderkey": b["o_orderkey"].filter(pa.array(m)),
                "cust_nation": pa.array(nats[pos_c[m]], pa.int64())})

        orders = orders.map_batches(attach_cn, batch_format="pyarrow",
                                    zero_copy_batch=True)
    elif cust_mode == "shuffle":
        orders = (orders.join(cust, join_type="inner",
                     num_partitions=_nparts(sf_dir, "orders"),
                              on=("o_custkey",), right_on=("c_custkey",))
                  .map_batches(
                      lambda b: pa.Table.from_pydict({
                          "o_orderkey": b["o_orderkey"],
                          "cust_nation": pc.cast(b["c_nationkey"],
                                                 pa.int64())}),
                      batch_format="pyarrow", zero_copy_batch=True))
    else:
        raise ValueError(f"unknown cust_mode: {cust_mode!r}")

    def lane_proj(b: pa.Table) -> pa.Table:
        keys, nats = ray.get(sup_ref)
        sk = b["l_suppkey"].to_numpy(zero_copy_only=False)
        pos = np.searchsorted(keys, sk)
        pos_c = np.clip(pos, 0, max(len(keys) - 1, 0))
        m = (keys[pos_c] == sk) if len(keys) else np.zeros(len(sk), bool)
        mask = pa.array(m)
        years = b["l_shipdate"].to_numpy(zero_copy_only=False) \
            .astype("datetime64[Y]").astype(np.int64) + 1970
        return pa.Table.from_pydict({
            "l_orderkey": b["l_orderkey"].filter(mask),
            "rev_e4": _rev_e4(b).filter(mask),
            "l_year": pa.array(years[m], pa.int64()),
            "supp_nation": pa.array(nats[pos_c[m]], pa.int64())})

    lane = read_table(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_shipdate",
                 "l_extendedprice", "l_discount"],
        filter=(pads.field("l_shipdate") >= lo)
        & (pads.field("l_shipdate") < hi)).map_batches(
        lane_proj, batch_format="pyarrow", zero_copy_batch=True)

    if join_mode == "auto":
        join_mode = ("broadcast"
                     if orders.count() <= _BROADCAST_MAX_ROWS
                     else "shuffle")
    if join_mode == "broadcast":
        joined = _attach_order_attrs(lane, orders, ["cust_nation"])
    elif join_mode == "shuffle":
        joined = lane.join(orders, join_type="inner",
                   num_partitions=_nparts(sf_dir, "lineitem"),
                           on=("l_orderkey",), right_on=("o_orderkey",))
    else:
        raise ValueError(f"unknown join_mode: {join_mode!r}")

    def cross_only(b: pa.Table) -> pa.Table:
        m = pc.not_equal(b["supp_nation"],
                         pc.cast(b["cust_nation"], pa.int64()))
        return b.filter(pc.fill_null(m, False))

    joined = joined.map_batches(cross_only, batch_format="pyarrow",
                                zero_copy_batch=True)
    g = grouped_agg(joined, ["supp_nation", "cust_nation", "l_year"],
                    {"rev_sum": ("rev_e4", "sum")})
    g["revenue"] = _cents(g.pop("rev_sum"))
    g["supp_nation"] = g["supp_nation"].map(name_map)
    g["cust_nation"] = g["cust_nation"].map(name_map)
    g = g.sort_values(["supp_nation", "cust_nation", "l_year"],
                      ignore_index=True)
    return pa.Table.from_pandas(
        g[["supp_nation", "cust_nation", "l_year", "revenue"]],
        preserve_index=False)


def q8_market_share(sf_dir: str, *, region: str = "ASIA",
                    target_nation: str = "NATION_8",
                    p_type: str = "ECONOMY",
                    date_lo: str = "1996-01-01",
                    date_hi: str = "1998-01-01",
                    join_mode: str = "auto") -> pa.Table:
    """National market share (Q8 shape): the target nation's share of
    revenue for one part type sold to customers in one region, by order
    year — the eight-table join. → (o_year, mkt_share).

    Scale plan: region/nation/part-type/supplier maps broadcast
    (dimensions; the part filter ships as a sorted key array and the
    lineitem semi-join is one searchsorted per batch); the
    region-filtered customer map rides the broadcast-vs-native planner;
    orders are date-filtered AT THE READ and carry o_year through the
    fact join (Q3/Q5 planner reuse); the rollup is bounded by
    years × 25 nations. Share = ratio of two exact integer-unit sums —
    bit-comparable to the DuckDB oracle's e4-units division."""
    import pyarrow.dataset as pads

    lo, hi = pd.Timestamp(date_lo), pd.Timestamp(date_hi)
    nation = read_table(f"{sf_dir}/nation.parquet",
                        columns=["n_nationkey", "n_name",
                                 "n_regionkey"]).to_pandas()
    tgt = nation.loc[nation["n_name"] == target_nation, "n_nationkey"]
    if not len(tgt):
        raise ValueError(f"nation {target_nation!r} not found")
    tgt_key = int(tgt.iloc[0])
    reg = read_table(f"{sf_dir}/region.parquet",
                     columns=["r_regionkey", "r_name"]).to_pandas()
    rkeys = set(reg.loc[reg["r_name"] == region, "r_regionkey"])
    cnkeys = np.sort(nation.loc[nation["n_regionkey"].isin(rkeys),
                                "n_nationkey"].to_numpy())

    parts = read_table(
        f"{sf_dir}/part.parquet", columns=["p_partkey"],
        filter=pads.field("p_type") == p_type).to_pandas()
    pkeys_ref = ray.put(np.sort(parts["p_partkey"].to_numpy()))

    sup = read_table(f"{sf_dir}/supplier.parquet",
                     columns=["s_suppkey", "s_nationkey"]).to_pandas()
    skeys = sup["s_suppkey"].to_numpy()
    srt = np.argsort(skeys, kind="mergesort")
    sup_ref = ray.put((skeys[srt], sup["s_nationkey"].to_numpy()[srt]))

    cust = read_table(
        f"{sf_dir}/customer.parquet", columns=["c_custkey"],
        filter=pads.field("c_nationkey").isin(cnkeys.tolist()))
    ckeys_ref = ray.put(np.sort(cust.to_pandas()["c_custkey"]
                                .to_numpy()))

    def orders_proj(b: pa.Table) -> pa.Table:
        ck = ray.get(ckeys_ref)
        ok = b["o_custkey"].to_numpy(zero_copy_only=False)
        pos = np.searchsorted(ck, ok)
        pos_c = np.clip(pos, 0, max(len(ck) - 1, 0))
        m = (ck[pos_c] == ok) if len(ck) else np.zeros(len(ok), bool)
        years = b["o_orderdate"].to_numpy(zero_copy_only=False) \
            .astype("datetime64[Y]").astype(np.int64) + 1970
        return pa.Table.from_pydict({
            "o_orderkey": b["o_orderkey"].filter(pa.array(m)),
            "o_year": pa.array(years[m], pa.int64())})

    orders = read_table(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
        filter=(pads.field("o_orderdate") >= lo)
        & (pads.field("o_orderdate") < hi)).map_batches(
        orders_proj, batch_format="pyarrow", zero_copy_batch=True)

    def lane_proj(b: pa.Table) -> pa.Table:
        pk = ray.get(pkeys_ref)
        skeys_s, snats = ray.get(sup_ref)
        lp = b["l_partkey"].to_numpy(zero_copy_only=False)
        pos = np.searchsorted(pk, lp)
        pos_c = np.clip(pos, 0, max(len(pk) - 1, 0))
        m = (pk[pos_c] == lp) if len(pk) else np.zeros(len(lp), bool)
        sk = b["l_suppkey"].to_numpy(zero_copy_only=False)
        sp = np.clip(np.searchsorted(skeys_s, sk), 0,
                     max(len(skeys_s) - 1, 0))
        mask = pa.array(m)
        return pa.Table.from_pydict({
            "l_orderkey": b["l_orderkey"].filter(mask),
            "rev_e4": _rev_e4(b).filter(mask),
            "supp_nation": pa.array(snats[sp[m]], pa.int64())})

    lane = read_table(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_partkey", "l_suppkey",
                 "l_extendedprice", "l_discount"]).map_batches(
        lane_proj, batch_format="pyarrow", zero_copy_batch=True)

    if join_mode == "auto":
        join_mode = ("broadcast"
                     if orders.count() <= _BROADCAST_MAX_ROWS
                     else "shuffle")
    if join_mode == "broadcast":
        joined = _attach_order_attrs(lane, orders, ["o_year"])
    elif join_mode == "shuffle":
        joined = lane.join(orders, join_type="inner",
                   num_partitions=_nparts(sf_dir, "lineitem"),
                           on=("l_orderkey",), right_on=("o_orderkey",))
    else:
        raise ValueError(f"unknown join_mode: {join_mode!r}")

    g = grouped_agg(joined, ["o_year", "supp_nation"],
                    {"rev_sum": ("rev_e4", "sum")})
    tot = g.groupby("o_year", sort=True)["rev_sum"].sum()
    hit = (g[g["supp_nation"] == tgt_key]
           .set_index("o_year")["rev_sum"].reindex(tot.index)
           .fillna(0).astype(np.int64))
    out = pd.DataFrame({
        "o_year": tot.index.astype(np.int64),
        "mkt_share": (hit.to_numpy(dtype=np.float64)
                      / tot.to_numpy(dtype=np.float64))})
    return pa.Table.from_pandas(out, preserve_index=False)
