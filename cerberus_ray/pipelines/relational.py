"""Relational rule-pack + query suite over the driver's TPC-H-ish tables.

Every public ``q_*`` function takes ``sf_dir`` and returns a Dataset /
pyarrow Table whose column names match the DuckDB oracle SQL in
``ORACLE_SQL`` exactly (driver contract). Reads always prune columns at
the scan. Reference-parity notes per query:

- rule_counts_*        ≙ schema/enum/range constraint surface
                         (cerberus/models/pet.py:50-63, booking.py:267-275)
- unique_custkey       ≙ unique_together duplicate detection
                         (cerberus/models/booking.py:50; tests
                         cerberus/tests/test_bookings.py:108-117)
- ref_*                ≙ PROTECT FK integrity (cerberus/models/pet.py:68-72;
                         serializers.fix_nested_object, serializers.py:52-72)
- order_totalprice_check ≙ Invoice.total dual-path consistency
                         (cerberus/models/invoice.py:37-47 vs :283-297;
                         tests test_invoices.py:107-131)
- events_weekly        ≙ weekly invoice report (cerberus/reports.py:19-35)
- orders_per_month     ≙ bookings per month (cerberus/views/booking.py:62-68)
- events_daily_minmax  ≙ per-day Min/Max aggregate
                         (cerberus/models/booking.py:305-314)
- events_users_per_type ≙ distinct-count aggregates
                         (cerberus/models/customer.py:40-56 Count(distinct),
                         booking.py:165-176 customer_count)
- events_close_pairs   ≙ interval-overlap detection per key
                         (cerberus/models/booking.py:72-83)
- doc_nchars_check     ≙ GeneratedField parity (cerberus/models/customer.py:76-80;
                         test cerberus/tests/test_customer.py:19-21)
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..determinism import round_away
import ray

from ..rules.core import RuleSet, enum_domain, range_rule
from ..sources.io import read_table

_R2 = dict(ndigits=2, round_mode="half_towards_infinity")


def _t(sf_dir: str, name: str, columns=None):
    return read_table(f"{sf_dir}/{name}.parquet", columns=columns)


# ---------------------------------------------------------------------------
# rule packs (row-local) + violation counting
# ---------------------------------------------------------------------------

def lineitem_ruleset() -> RuleSet:
    k = "l_orderkey"
    return RuleSet(
        [
            range_rule(k, "l_quantity", lo=0, lo_strict=True),
            range_rule(k, "l_discount", lo=0, hi=1),
            range_rule(k, "l_tax", lo=0),
            enum_domain(k, "l_returnflag", ["A", "N", "R"]),
            enum_domain(k, "l_linestatus", ["F", "O"]),
        ],
        name="lineitem",
    )


def orders_ruleset() -> RuleSet:
    k = "o_orderkey"
    return RuleSet(
        [
            range_rule(k, "o_totalprice", lo=0, lo_strict=True),
            enum_domain(k, "o_orderstatus", ["F", "O", "P"]),
            enum_domain(k, "o_orderpriority",
                        ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED",
                         "5-LOW"]),
        ],
        name="orders",
    )


def rule_violation_counts(ds, ruleset: RuleSet) -> pa.Table:
    """(rule, n_violations) — one row per rule, zeros included.

    Partial rule-hit counts per batch → groupby(rule).sum: the shuffle
    carries at most (#rules × #blocks) tiny rows.
    """

    def cnt(batch: pa.Table) -> pa.Table:
        v = ruleset.evaluate(batch)
        if v.num_rows == 0:
            return pa.Table.from_pydict(
                {"rule": pa.array([], type=pa.string()),
                 "c": pa.array([], type=pa.int64())})
        g = v.select(["rule"]).group_by("rule").aggregate([([], "count_all")])
        return pa.Table.from_arrays([g["rule"], g["count_all"]], names=["rule", "c"])

    partial = ds.map_batches(cnt, batch_format="pyarrow",
                             zero_copy_batch=True).to_pandas()
    if "rule" in partial.columns and len(partial):
        pdf = (partial.groupby("rule", as_index=False)["c"].sum()
               .rename(columns={"c": "n_violations"}))
    else:
        pdf = pd.DataFrame({"rule": [], "n_violations": []})
    names = sorted(r.name for r in ruleset.row_rules())
    pdf = (pdf.set_index("rule").reindex(names).fillna(0).reset_index())
    pdf["n_violations"] = pdf["n_violations"].astype("int64")
    return pa.Table.from_pandas(pdf, preserve_index=False)


def q_rule_counts_lineitem(sf_dir: str) -> pa.Table:
    ds = _t(sf_dir, "lineitem", ["l_orderkey", "l_quantity", "l_discount",
                                 "l_tax", "l_returnflag", "l_linestatus"])
    return rule_violation_counts(ds, lineitem_ruleset())


def q_rule_counts_orders(sf_dir: str) -> pa.Table:
    ds = _t(sf_dir, "orders", ["o_orderkey", "o_totalprice", "o_orderstatus",
                               "o_orderpriority"])
    return rule_violation_counts(ds, orders_ruleset())


# ---------------------------------------------------------------------------
# uniqueness / referential
# ---------------------------------------------------------------------------

def q_unique_custkey(sf_dir: str) -> pa.Table:
    """Duplicate c_custkey values with multiplicities (usually empty)."""
    from ..stages.uniqueness import duplicate_key_counts

    ds = _t(sf_dir, "customer", ["c_custkey"])
    out = duplicate_key_counts(ds, ["c_custkey"])
    return pa.Table.from_arrays(
        [pc.cast(out["c_custkey"], pa.int64()), pc.cast(out["n"], pa.int64())],
        names=["c_custkey", "n"])


def _orphans(child_ds, parent_ds, child_cols, fk_col, parent_key) -> pa.Table:
    """Rows of child whose fk has no parent — broadcast parent key set.

    Returns an explicitly-schema'd Arrow table (an all-empty Ray Dataset
    loses its schema through to_pandas, which would break the driver's
    column comparison)."""
    from ..stages.referential import collect_parent_keys

    keys = collect_parent_keys(parent_ds, parent_key)
    ref = ray.put(keys)
    child_schema = child_ds.schema()
    out_schema = pa.schema(
        [pa.field(c, child_schema.base_schema.field(c).type) for c in child_cols])

    def check(batch: pa.Table) -> pa.Table:
        pk = ray.get(ref)
        # null fks are NOT violations (SQL `NOT IN` excludes null rows)
        valid = pc.is_valid(batch[fk_col]).to_numpy(zero_copy_only=False)
        fk = pc.cast(batch[fk_col], pa.string()).to_numpy(zero_copy_only=False)
        fk = np.where(valid, fk, "").astype(str)
        if len(pk):
            pos = np.clip(np.searchsorted(pk, fk), 0, len(pk) - 1)
            miss = (pk[pos] != fk) & valid
        else:
            miss = valid.copy()
        return batch.select(child_cols).filter(pa.array(miss))

    out = child_ds.map_batches(check, batch_format="pyarrow",
                               zero_copy_batch=True).to_pandas()
    if not set(child_cols) <= set(out.columns):
        return out_schema.empty_table()
    return pa.Table.from_pandas(out[child_cols], preserve_index=False,
                                schema=out_schema)


def q_ref_orders_custkey(sf_dir: str):
    child = _t(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    parent = _t(sf_dir, "customer", ["c_custkey"])
    return _orphans(child, parent, ["o_orderkey", "o_custkey"], "o_custkey",
                    "c_custkey")


def q_ref_lineitem_orderkey(sf_dir: str):
    child = _t(sf_dir, "lineitem", ["l_orderkey", "l_linenumber"])
    parent = _t(sf_dir, "orders", ["o_orderkey"])
    return _orphans(child, parent, ["l_orderkey", "l_linenumber"], "l_orderkey",
                    "o_orderkey")


def q_ref_supplier_nation(sf_dir: str):
    child = _t(sf_dir, "supplier", ["s_suppkey", "s_nationkey"])
    parent = _t(sf_dir, "nation", ["n_nationkey"])
    return _orphans(child, parent, ["s_suppkey", "s_nationkey"], "s_nationkey",
                    "n_nationkey")


# ---------------------------------------------------------------------------
# aggregate consistency (dual-path totals)
# ---------------------------------------------------------------------------

def _totalprice_child_partial(b: pa.Table) -> pa.Table:
    """Map-side combine of lineitem → one (k, v, n) row per distinct order
    per block — shared by both execution modes."""
    v = pc.multiply(
        pc.multiply(b["l_extendedprice"], pc.subtract(1.0, b["l_discount"])),
        pc.add(1.0, b["l_tax"]))
    t = pa.Table.from_arrays(
        [pc.cast(b["l_orderkey"], pa.int64()), pc.cast(v, pa.float64())],
        names=["k", "v"])
    g = t.group_by("k").aggregate([("v", "sum"), ([], "count_all")])
    return pa.Table.from_arrays(
        [g["k"], g["v_sum"], pc.cast(g["count_all"], pa.int64())],
        names=["k", "v", "n"])


def q_order_totalprice_check(sf_dir: str, mode: str = "auto"):
    """(o_orderkey, n_items, consistent) for every order.

    Mode planner (same philosophy as uniqueness's driver/hash/shuffle
    split — pick the plan BEFORE any structure outgrows its home):

    - 'driver' (≤ ~5M orders): per-block partials merge on the driver
      (int64-keyed pandas at C speed), broadcast once, compared in a
      streaming pass over orders. No all-to-all — the fast plan while
      per-key sums fit driver memory.
    - 'shuffle' (beyond): ONE hash-partitioned exchange — lineitem
      partials and (key, stored_price, is_order=1) order tag rows ride
      the same ``groupby(k)`` (the join-as-groupby trick), so nothing
      driver-side is proportional to the order count. This is the plan
      that survives billions of orders.

    Both modes are output-identical (tests assert agreement).
    """
    li = _t(sf_dir, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount",
                                 "l_tax"])
    orders = _t(sf_dir, "orders", ["o_orderkey", "o_totalprice"])
    if mode == "auto":
        mode = "driver" if orders.count() <= 5_000_000 else "shuffle"

    if mode == "driver":
        partials = li.map_batches(_totalprice_child_partial,
                                  batch_format="pyarrow",
                                  zero_copy_batch=True).to_pandas()
        sums = partials.groupby("k").agg(v=("v", "sum"), n=("n", "sum"))
        ref = ray.put((sums["v"], sums["n"]))

        def compare_bcast(b: pa.Table) -> pa.Table:
            v_by_key, n_by_key = ray.get(ref)
            keys = pd.Series(b["o_orderkey"].to_numpy(zero_copy_only=False))
            stored = b["o_totalprice"].to_numpy(zero_copy_only=False)
            total = keys.map(v_by_key).fillna(0.0).to_numpy()
            n_items = keys.map(n_by_key).fillna(0).to_numpy().astype(np.int64)
            ok = np.abs(total - stored) <= 0.01
            return pa.Table.from_arrays(
                [pc.cast(b["o_orderkey"], pa.int64()),
                 pa.array(n_items, type=pa.int64()),
                 pa.array(ok, type=pa.bool_())],
                names=["o_orderkey", "n_items", "consistent"])

        return orders.map_batches(compare_bcast, batch_format="pyarrow",
                                  zero_copy_batch=True)

    if mode != "shuffle":
        raise ValueError(f"unknown mode {mode!r}")

    from ray.data.aggregate import Max, Sum

    def tag_partial(b: pa.Table) -> pa.Table:
        g = _totalprice_child_partial(b)
        n = g.num_rows
        return pa.Table.from_arrays(
            [g["k"], g["v"], g["n"], pa.nulls(n, pa.float64()),
             pa.array(np.zeros(n, dtype=np.int64))],
            names=["k", "v", "n", "stored", "is_order"])

    def order_rows(b: pa.Table) -> pa.Table:
        n = b.num_rows
        return pa.Table.from_arrays(
            [pc.cast(b["o_orderkey"], pa.int64()),
             pa.array(np.zeros(n)), pa.array(np.zeros(n, dtype=np.int64)),
             pc.cast(b["o_totalprice"], pa.float64()),
             pa.array(np.ones(n, dtype=np.int64))],
            names=["k", "v", "n", "stored", "is_order"])

    tagged = (li.map_batches(tag_partial, batch_format="pyarrow",
                             zero_copy_batch=True)
                .union(orders.map_batches(order_rows, batch_format="pyarrow",
                                          zero_copy_batch=True)))
    merged = tagged.groupby("k").aggregate(
        Sum("v", alias_name="v"), Sum("n", alias_name="n"),
        Max("stored", alias_name="stored"),
        Sum("is_order", alias_name="is_order"))

    def compare(b: pa.Table) -> pa.Table:
        t = b.filter(pc.greater(b["is_order"], 0))  # drop orphan lineitems
        stored = pc.fill_null(pc.cast(t["stored"], pa.float64()),
                              0.0).to_numpy(zero_copy_only=False)
        total = pc.fill_null(pc.cast(t["v"], pa.float64()),
                             0.0).to_numpy(zero_copy_only=False)
        n_items = pc.fill_null(pc.cast(t["n"], pa.int64()),
                               0).to_numpy(zero_copy_only=False)
        ok = np.abs(total - stored) <= 0.01
        return pa.Table.from_arrays(
            [pc.cast(t["k"], pa.int64()),
             pa.array(n_items, type=pa.int64()), pa.array(ok, type=pa.bool_())],
            names=["o_orderkey", "n_items", "consistent"])

    return merged.map_batches(compare, batch_format="pyarrow",
                              zero_copy_batch=True)


# ---------------------------------------------------------------------------
# aggregations / reports
# ---------------------------------------------------------------------------

def q_q1_pricing_summary(sf_dir: str) -> pa.Table:
    """TPC-H Q1 shape: map-side combined partials → driver merge (6 groups
    — bounded cardinality, stages/groupagg.py pattern)."""
    from ..stages.groupagg import grouped_agg

    ds = _t(sf_dir, "lineitem", ["l_returnflag", "l_linestatus", "l_quantity",
                                 "l_extendedprice", "l_discount", "l_tax"])

    def derive(b: pa.Table) -> pa.Table:
        disc = pc.multiply(b["l_extendedprice"], pc.subtract(1.0, b["l_discount"]))
        chg = pc.multiply(disc, pc.add(1.0, b["l_tax"]))
        return (b.append_column("disc_price", disc).append_column("charge", chg))

    g = grouped_agg(
        ds.map_batches(derive, batch_format="pyarrow", zero_copy_batch=True),
        ["l_returnflag", "l_linestatus"],
        {"sum_qty": ("l_quantity", "sum"),
         "sum_base_price": ("l_extendedprice", "sum"),
         "sum_disc_price": ("disc_price", "sum"),
         "sum_charge": ("charge", "sum"),
         "avg_qty": ("l_quantity", "mean"),
         "avg_price": ("l_extendedprice", "mean"),
         "avg_disc": ("l_discount", "mean"),
         "count_order": ("", "count")})
    t = pa.Table.from_pandas(g, preserve_index=False)
    for col in ["sum_qty", "sum_base_price", "sum_disc_price", "sum_charge",
                "avg_qty", "avg_price", "avg_disc"]:
        t = t.set_column(t.schema.get_field_index(col), col,
                         pa.array(round_away(np.asarray(t[col]))))
    return t


def q_events_weekly(sf_dir: str) -> pa.Table:
    """(week, n, total_value) — the weekly-report aggregate shape."""
    ds = _t(sf_dir, "events", ["ts", "value"])

    def wk(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"week": b["ts"].dt.strftime("%Y-%W"),
                             "value": b["value"]})

    from ..stages.groupagg import grouped_agg

    g = grouped_agg(ds.map_batches(wk, batch_format="pandas"), ["week"],
                    {"n": ("", "count"), "total_value": ("value", "sum")})
    t = pa.Table.from_pandas(g, preserve_index=False)
    return t.set_column(t.schema.get_field_index("total_value"), "total_value",
                        pa.array(round_away(np.asarray(t["total_value"]))))


def q_events_by_type(sf_dir: str) -> pa.Table:
    from ..stages.groupagg import grouped_agg

    ds = _t(sf_dir, "events", ["event_type", "value"])
    g = grouped_agg(ds, ["event_type"],
                    {"n": ("", "count"), "total_value": ("value", "sum"),
                     "avg_value": ("value", "mean")})
    t = pa.Table.from_pandas(g, preserve_index=False)
    t = t.set_column(t.schema.get_field_index("total_value"), "total_value",
                     pa.array(round_away(np.asarray(t["total_value"]))))
    return t.set_column(t.schema.get_field_index("avg_value"), "avg_value",
                        pa.array(round_away(np.asarray(t["avg_value"]))))


def q_events_users_per_type(sf_dir: str, mode: str = "auto") -> pa.Table:
    """Distinct-count per group. Per-block distinct (event_type, user_id)
    pairs (map-side combine — the exchange carries distinct pairs per
    block, never raw events), then the planner picks the global-distinct
    plan: 'driver' dedups the pair partials on the driver (fits while
    #users × #types is driver-sized), 'shuffle' routes them through a
    hash-partitioned ``groupby`` so nothing driver-side is proportional
    to the user count — the plan for unbounded user populations. Both
    plans are output-identical (agreement test)."""
    from ..stages.groupagg import grouped_agg

    ds = _t(sf_dir, "events", ["event_type", "user_id"])
    if mode == "auto":
        mode = "driver" if ds.count() <= 5_000_000 else "shuffle"

    def pairs(b: pa.Table) -> pa.Table:
        return b.group_by(["event_type", "user_id"]).aggregate([])

    partials = ds.map_batches(pairs, batch_format="pyarrow",
                              zero_copy_batch=True)
    if mode == "driver":
        pdf = partials.to_pandas().drop_duplicates(["event_type", "user_id"])
        g = (pdf.groupby("event_type", as_index=False)["user_id"].nunique()
                .rename(columns={"user_id": "n_users"}))
        g["n_users"] = g["n_users"].astype("int64")
    elif mode == "shuffle":
        distinct = partials.groupby(["event_type", "user_id"]).count()
        g = grouped_agg(distinct.select_columns(["event_type"]),
                        ["event_type"], {"n_users": ("", "count")})
    else:
        raise ValueError(f"unknown mode {mode!r}")
    g = g.sort_values("event_type").reset_index(drop=True)
    return pa.Table.from_pandas(g[["event_type", "n_users"]],
                                preserve_index=False)


def q_events_quantiles(sf_dir: str) -> pa.Table:
    """EXACT distributed quantiles (p50/p95/p99 per event_type) over a
    bounded-resolution measure: per-block (type, value) histogram counts
    (pyarrow hash aggregate) → driver merge bounded by the VALUE DOMAIN
    (2-decimal measures ⇒ ≤ ~100k bins regardless of row count) →
    cumulative-count lookup with DuckDB's quantile_disc index rule
    (1-based ceil(q·n)). The exact-quantile counterpart of the t-digest
    approximate path in stages/drift.py."""
    import math

    ds = _t(sf_dir, "events", ["event_type", "value"])

    def partial(b: pa.Table) -> pa.Table:
        return b.group_by(["event_type", "value"]).aggregate([([], "count_all")])

    pdf = ds.map_batches(partial, batch_format="pyarrow",
                         zero_copy_batch=True).to_pandas()
    if "event_type" not in pdf.columns or not len(pdf):
        return pa.Table.from_pydict(
            {"event_type": pa.array([], pa.string()),
             "p50": pa.array([], pa.float64()),
             "p95": pa.array([], pa.float64()),
             "p99": pa.array([], pa.float64())})
    hist = pdf.groupby(["event_type", "value"], as_index=False)["count_all"].sum()
    rows = []
    for et, g in hist.groupby("event_type"):
        g = g.sort_values("value")
        cum = g["count_all"].cumsum().to_numpy()
        vals = g["value"].to_numpy()
        n = int(cum[-1])

        def qd(q):
            target = math.ceil(round(q * n, 9))
            return float(vals[np.searchsorted(cum, target)])

        rows.append({"event_type": et, "p50": qd(0.5), "p95": qd(0.95),
                     "p99": qd(0.99)})
    out = pd.DataFrame(rows).sort_values("event_type").reset_index(drop=True)
    return pa.Table.from_pandas(out, preserve_index=False)


def q_events_daily_minmax(sf_dir: str) -> pa.Table:
    ds = _t(sf_dir, "events", ["ts", "value"])

    def day(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"day": b["ts"].dt.strftime("%Y-%m-%d"),
                             "value": b["value"]})

    from ..stages.groupagg import grouped_agg

    pdf = grouped_agg(ds.map_batches(day, batch_format="pandas"), ["day"],
                      {"min_value": ("value", "min"),
                       "max_value": ("value", "max"), "n": ("", "count")})
    return pa.Table.from_pandas(pdf[["day", "min_value", "max_value", "n"]],
                                preserve_index=False)


def q_orders_per_month(sf_dir: str) -> pa.Table:
    ds = _t(sf_dir, "orders", ["o_orderdate"])

    def mo(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"month": b["o_orderdate"].dt.strftime("%Y-%m")})

    from ..stages.groupagg import grouped_agg

    pdf = grouped_agg(ds.map_batches(mo, batch_format="pandas"), ["month"],
                      {"n": ("", "count")})
    return pa.Table.from_pandas(pdf[["month", "n"]], preserve_index=False)


def q_events_close_pairs(sf_dir: str) -> pa.Table:
    """Per user: # of consecutive events closer than 300 s — the
    interval-overlap rule shape (cerberus/models/booking.py:72-83:
    partition by key, order by time within key).

    Vectorized keyed-window plan: hash-bucket user_id → one pandas call
    per BUCKET that sorts by (user_id, ts) and computes the diff sweep
    with a group-boundary mask — no per-user Python (keyed_apply)."""
    from ..stages.keyed_window import group_boundary_mask, keyed_apply

    ds = _t(sf_dir, "events", ["user_id", "ts"])

    def sweep(d: pd.DataFrame) -> pd.DataFrame:
        d = d.sort_values(["user_id", "ts"], kind="stable")
        gaps = d["ts"].diff().dt.total_seconds().to_numpy()
        first = group_boundary_mask(d["user_id"])
        close = (gaps < 300) & ~first
        res = (d.assign(_close=close)
                .groupby("user_id", sort=False)["_close"]
                .agg(n_close="sum", n_events="size").reset_index())
        res["user_id"] = res["user_id"].astype("int64")
        res["n_close"] = res["n_close"].astype("int64")
        res["n_events"] = res["n_events"].astype("int64")
        return res

    pdf = keyed_apply(ds, "user_id", sweep).to_pandas()
    if "user_id" not in pdf.columns:  # all-empty input loses the schema
        return pa.Table.from_pydict({"user_id": pa.array([], pa.int64()),
                                     "n_close": pa.array([], pa.int64()),
                                     "n_events": pa.array([], pa.int64())})
    pdf = pdf.sort_values("user_id").reset_index(drop=True)
    return pa.Table.from_pandas(pdf, preserve_index=False)


# ---------------------------------------------------------------------------
# documents: generated-column parity + per-group stats
# ---------------------------------------------------------------------------

def q_doc_nchars_check(sf_dir: str) -> pa.Table:
    """(source, n_docs, n_mismatch): stored n_chars vs recomputed length —
    the GeneratedField dual-path parity rule."""
    ds = _t(sf_dir, "documents", ["source", "text", "n_chars"])

    def chk(b: pa.Table) -> pa.Table:
        ln = pc.utf8_length(b["text"])
        bad = pc.cast(pc.not_equal(ln, b["n_chars"]), pa.int64())
        t = pa.Table.from_arrays([b["source"], bad], names=["source", "bad"])
        g = t.group_by("source").aggregate([("bad", "sum"), ([], "count_all")])
        return pa.Table.from_arrays([g["source"], g["count_all"], g["bad_sum"]],
                                    names=["source", "c", "m"])

    from ..stages.groupagg import grouped_agg

    pdf = grouped_agg(
        ds.map_batches(chk, batch_format="pyarrow", zero_copy_batch=True),
        ["source"], {"n_docs": ("c", "sum"), "n_mismatch": ("m", "sum")})
    return pa.Table.from_pandas(pdf[["source", "n_docs", "n_mismatch"]],
                                preserve_index=False)


def q_doc_stats(sf_dir: str) -> pa.Table:
    from ..stages.groupagg import grouped_agg

    ds = _t(sf_dir, "documents", ["lang", "n_chars"])
    g = grouped_agg(ds, ["lang"],
                    {"n_docs": ("", "count"), "avg_chars": ("n_chars", "mean"),
                     "max_chars": ("n_chars", "max")})
    t = pa.Table.from_pandas(g, preserve_index=False)
    return t.set_column(t.schema.get_field_index("avg_chars"), "avg_chars",
                        pa.array(round_away(np.asarray(t["avg_chars"]))))


# ---------------------------------------------------------------------------
# registry
# ---------------------------------------------------------------------------

QUERIES = {
    "rule_counts_lineitem": q_rule_counts_lineitem,
    "rule_counts_orders": q_rule_counts_orders,
    "unique_custkey": q_unique_custkey,
    "ref_orders_custkey": q_ref_orders_custkey,
    "ref_lineitem_orderkey": q_ref_lineitem_orderkey,
    "ref_supplier_nation": q_ref_supplier_nation,
    "order_totalprice_check": q_order_totalprice_check,
    "q1_pricing_summary": q_q1_pricing_summary,
    "events_weekly": q_events_weekly,
    "events_by_type": q_events_by_type,
    "events_users_per_type": q_events_users_per_type,
    "events_daily_minmax": q_events_daily_minmax,
    "events_quantiles": q_events_quantiles,
    "orders_per_month": q_orders_per_month,
    "events_close_pairs": q_events_close_pairs,
    "doc_nchars_check": q_doc_nchars_check,
    "doc_stats": q_doc_stats,
}

ORACLE_SQL = {
    "rule_counts_lineitem": """
        WITH rules(rule) AS (VALUES ('enum-l_linestatus'), ('enum-l_returnflag'),
            ('range-l_discount'), ('range-l_quantity'), ('range-l_tax')),
        v AS (
            SELECT 'range-l_quantity' AS rule, COUNT(*) FILTER (l_quantity IS NOT NULL AND l_quantity <= 0) AS n FROM lineitem
            UNION ALL SELECT 'range-l_discount', COUNT(*) FILTER (l_discount IS NOT NULL AND (l_discount < 0 OR l_discount > 1)) FROM lineitem
            UNION ALL SELECT 'range-l_tax', COUNT(*) FILTER (l_tax IS NOT NULL AND l_tax < 0) FROM lineitem
            UNION ALL SELECT 'enum-l_returnflag', COUNT(*) FILTER (l_returnflag IS NOT NULL AND l_returnflag NOT IN ('A','N','R')) FROM lineitem
            UNION ALL SELECT 'enum-l_linestatus', COUNT(*) FILTER (l_linestatus IS NOT NULL AND l_linestatus NOT IN ('F','O')) FROM lineitem)
        SELECT rules.rule, COALESCE(v.n, 0) AS n_violations
        FROM rules LEFT JOIN v ON rules.rule = v.rule ORDER BY rules.rule
    """,
    "rule_counts_orders": """
        WITH rules(rule) AS (VALUES ('enum-o_orderpriority'), ('enum-o_orderstatus'),
            ('range-o_totalprice')),
        v AS (
            SELECT 'range-o_totalprice' AS rule, COUNT(*) FILTER (o_totalprice IS NOT NULL AND o_totalprice <= 0) AS n FROM orders
            UNION ALL SELECT 'enum-o_orderstatus', COUNT(*) FILTER (o_orderstatus IS NOT NULL AND o_orderstatus NOT IN ('F','O','P')) FROM orders
            UNION ALL SELECT 'enum-o_orderpriority', COUNT(*) FILTER (o_orderpriority IS NOT NULL AND o_orderpriority NOT IN ('1-URGENT','2-HIGH','3-MEDIUM','4-NOT SPECIFIED','5-LOW')) FROM orders)
        SELECT rules.rule, COALESCE(v.n, 0) AS n_violations
        FROM rules LEFT JOIN v ON rules.rule = v.rule ORDER BY rules.rule
    """,
    "unique_custkey": """
        SELECT c_custkey, COUNT(*) AS n FROM customer
        GROUP BY c_custkey HAVING COUNT(*) > 1 ORDER BY c_custkey
    """,
    "ref_orders_custkey": """
        SELECT o_orderkey, o_custkey FROM orders
        WHERE o_custkey NOT IN (SELECT c_custkey FROM customer)
        ORDER BY o_orderkey
    """,
    "ref_lineitem_orderkey": """
        SELECT l_orderkey, l_linenumber FROM lineitem
        WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders)
        ORDER BY l_orderkey, l_linenumber
    """,
    "ref_supplier_nation": """
        SELECT s_suppkey, s_nationkey FROM supplier
        WHERE s_nationkey NOT IN (SELECT n_nationkey FROM nation)
        ORDER BY s_suppkey
    """,
    "order_totalprice_check": """
        SELECT o.o_orderkey,
               COUNT(l.l_orderkey) AS n_items,
               (ABS(COALESCE(SUM(l.l_extendedprice * (1 - l.l_discount) * (1 + l.l_tax)), 0)
                    - ANY_VALUE(o.o_totalprice)) <= 0.01) AS consistent
        FROM orders o LEFT JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        GROUP BY o.o_orderkey ORDER BY o.o_orderkey
    """,
    "q1_pricing_summary": """
        SELECT l_returnflag, l_linestatus,
               ROUND(SUM(l_quantity), 2) AS sum_qty,
               ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
               ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
               ROUND(AVG(l_quantity), 2) AS avg_qty,
               ROUND(AVG(l_extendedprice), 2) AS avg_price,
               ROUND(AVG(l_discount), 2) AS avg_disc,
               COUNT(*) AS count_order
        FROM lineitem GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
    """,
    "events_weekly": """
        SELECT strftime(ts, '%Y-%W') AS week, COUNT(*) AS n,
               ROUND(SUM(value), 2) AS total_value
        FROM events GROUP BY 1 ORDER BY 1
    """,
    "events_by_type": """
        SELECT event_type, COUNT(*) AS n, ROUND(SUM(value), 2) AS total_value,
               ROUND(AVG(value), 2) AS avg_value
        FROM events GROUP BY 1 ORDER BY 1
    """,
    "events_users_per_type": """
        SELECT event_type, COUNT(DISTINCT user_id) AS n_users
        FROM events GROUP BY 1 ORDER BY 1
    """,
    "events_daily_minmax": """
        SELECT strftime(ts, '%Y-%m-%d') AS day, MIN(value) AS min_value,
               MAX(value) AS max_value, COUNT(*) AS n
        FROM events GROUP BY 1 ORDER BY 1
    """,
    "events_quantiles": """
        SELECT event_type,
               quantile_disc(value, 0.5) AS p50,
               quantile_disc(value, 0.95) AS p95,
               quantile_disc(value, 0.99) AS p99
        FROM events GROUP BY 1 ORDER BY 1
    """,
    "orders_per_month": """
        SELECT strftime(o_orderdate, '%Y-%m') AS month, COUNT(*) AS n
        FROM orders GROUP BY 1 ORDER BY 1
    """,
    "events_close_pairs": """
        SELECT user_id,
               COUNT(*) FILTER (gap < 300) AS n_close,
               COUNT(*) AS n_events
        FROM (SELECT user_id,
                     EPOCH(ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)) AS gap
              FROM events)
        GROUP BY user_id ORDER BY user_id
    """,
    "doc_nchars_check": """
        SELECT source, COUNT(*) AS n_docs,
               COUNT(*) FILTER (LENGTH(text) <> n_chars) AS n_mismatch
        FROM documents GROUP BY 1 ORDER BY 1
    """,
    "doc_stats": """
        SELECT lang, COUNT(*) AS n_docs, ROUND(AVG(n_chars), 2) AS avg_chars,
               MAX(n_chars) AS max_chars
        FROM documents GROUP BY 1 ORDER BY 1
    """,
}
