"""Second query tranche: joins, anti-joins, top-k, pagination, filters,
window aggregates — SURVEY.md §2.5 (J1-J9), §2.7 (O1-O5), §2.2 (M14-M17).

Join strategy notes (SURVEY.md §4): every join here has a dimension-sized
side (customer/nation at the scale the key cardinality allows), so the
engine broadcasts it (ray.put once, numpy/dict lookup per batch) — the
"broadcast small sides" rule. The aggregate sides use map-side partial
combine before any driver merge.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..determinism import round_away
import ray

from ..sources.io import read_table

_R2 = dict(ndigits=2, round_mode="half_towards_infinity")


def _t(sf_dir, name, columns=None):
    return read_table(f"{sf_dir}/{name}.parquet", columns=columns)


from ..scale import fact_join_partitions as _nparts  # noqa: E402



#: broadcast a lookup side only while it plausibly fits every worker's
#: heap; beyond this the planner switches to the native hash-partitioned
#: Dataset.join (customer is a FACT table at target scale, not a dim)
_BROADCAST_MAX_ROWS = 5_000_000


def q_revenue_per_nation(sf_dir: str, *, mode: str = "auto") -> pa.Table:
    """Multi-hop join (orders→customer→nation) + grouped sum (J1-shape:
    join through a chain of keys).

    Join-side planner (mirrors the uniqueness/minhash mode planners):

    - 'broadcast' (lookup ≤ ~5M rows): ship the customer→nation map once
      (ray.put) and resolve per batch — zero shuffle.
    - 'shuffle': native hash-partitioned ``Dataset.join`` orders⋈customer
      — the path once customer outgrows worker heaps; only nation (a true
      25-row dimension) is broadcast.
    Both modes end in the same bounded per-nation partial-combine +
    driver merge and are output-identical (agreement-tested)."""
    if mode == "auto":
        n_cust = _t(sf_dir, "customer", ["c_custkey"]).count()
        mode = "broadcast" if n_cust <= _BROADCAST_MAX_ROWS else "shuffle"
    if mode not in ("broadcast", "shuffle"):
        raise ValueError(f"unknown join mode: {mode!r}")

    nation = _t(sf_dir, "nation", ["n_nationkey", "n_name"]).to_pandas()
    nation_name = nation.set_index("n_nationkey")["n_name"]

    if mode == "broadcast":
        cust = _t(sf_dir, "customer", ["c_custkey", "c_nationkey"]).to_pandas()
        cust_to_nation = cust.set_index("c_custkey")["c_nationkey"]
        ref = ray.put((cust_to_nation, nation_name))

        def partial(b: pa.Table) -> pa.Table:
            c2n, n2name = ray.get(ref)
            keys = pd.Series(b["o_custkey"].to_numpy(zero_copy_only=False))
            names = keys.map(c2n).map(n2name).fillna("UNKNOWN")
            t = pa.Table.from_arrays(
                [pa.array(names.to_numpy(), type=pa.string()),
                 pc.cast(b["o_totalprice"], pa.float64())],
                names=["n_name", "v"])
            return t.group_by("n_name").aggregate(
                [("v", "sum"), ([], "count_all")])

        parts = _t(sf_dir, "orders", ["o_custkey", "o_totalprice"]).map_batches(
            partial, batch_format="pyarrow", zero_copy_batch=True).to_pandas()
    else:
        orders = _t(sf_dir, "orders", ["o_custkey", "o_totalprice"])
        cust_ds = _t(sf_dir, "customer", ["c_custkey", "c_nationkey"])
        joined = orders.join(cust_ds, join_type="left_outer",
                             num_partitions=_nparts(sf_dir, "orders"),
                             on=("o_custkey",),
                             right_on=("c_custkey",))
        nref = ray.put(nation_name)

        def partial_joined(b: pa.Table) -> pa.Table:
            n2name = ray.get(nref)
            nk = pd.Series(b["c_nationkey"].to_numpy(zero_copy_only=False))
            names = nk.map(n2name).fillna("UNKNOWN")
            t = pa.Table.from_arrays(
                [pa.array(names.to_numpy(), type=pa.string()),
                 pc.cast(b["o_totalprice"], pa.float64())],
                names=["n_name", "v"])
            return t.group_by("n_name").aggregate(
                [("v", "sum"), ([], "count_all")])

        parts = joined.map_batches(partial_joined,
                                   batch_format="pyarrow").to_pandas()
    g = parts.groupby("n_name", as_index=False).agg(
        revenue=("v_sum", "sum"), n_orders=("count_all", "sum"))
    g["revenue"] = g["revenue"].round(2)
    g["n_orders"] = g["n_orders"].astype("int64")
    g = g.sort_values("n_name").reset_index(drop=True)
    return pa.Table.from_pandas(g[["n_name", "n_orders", "revenue"]],
                                preserve_index=False)


def q_customers_without_orders(sf_dir: str) -> pa.Table:
    """Anti-join (J2 uninvoiced-lookup shape): customers with no orders —
    broadcast the distinct order custkey set, filter the customer stream."""
    from ..stages.referential import collect_parent_keys

    have = collect_parent_keys(_t(sf_dir, "orders", ["o_custkey"]), "o_custkey")
    ref = ray.put(have)

    def anti(b: pa.Table) -> pa.Table:
        keys = ray.get(ref)
        ck = pc.cast(b["c_custkey"], pa.string()).to_numpy(zero_copy_only=False)
        ck = ck.astype(str)
        if len(keys):
            pos = np.clip(np.searchsorted(keys, ck), 0, len(keys) - 1)
            miss = keys[pos] != ck
        else:
            miss = np.ones(len(ck), dtype=bool)
        return b.select(["c_custkey"]).filter(pa.array(miss))

    pdf = _t(sf_dir, "customer", ["c_custkey"]).map_batches(
        anti, batch_format="pyarrow", zero_copy_batch=True).to_pandas()
    if "c_custkey" not in pdf.columns:
        return pa.Table.from_pydict({"c_custkey": pa.array([], pa.int64())})
    pdf = pdf.sort_values("c_custkey").reset_index(drop=True)
    return pa.Table.from_pandas(pdf, preserve_index=False)


def q_top_customers_by_revenue(sf_dir: str) -> pa.Table:
    """Grouped sum → top-10 with deterministic tie-break (O3: ordering on
    a computed aggregate)."""

    def partial(b: pa.Table) -> pa.Table:
        t = pa.Table.from_arrays(
            [b["o_custkey"], pc.cast(b["o_totalprice"], pa.float64())],
            names=["k", "v"])
        return t.group_by("k").aggregate([("v", "sum")])

    parts = _t(sf_dir, "orders", ["o_custkey", "o_totalprice"]).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True).to_pandas()
    g = parts.groupby("k", as_index=False)["v_sum"].sum()
    g["revenue"] = g["v_sum"].round(2)
    g = g.sort_values(["revenue", "k"], ascending=[False, True]).head(10)
    out = g.rename(columns={"k": "c_custkey"})[["c_custkey", "revenue"]]
    out["c_custkey"] = out["c_custkey"].astype("int64")
    return pa.Table.from_pandas(out.reset_index(drop=True), preserve_index=False)


def q_orders_page(sf_dir: str) -> pa.Table:
    """Pagination (O4: LIMIT/OFFSET over a deterministic order)."""
    ds = _t(sf_dir, "orders", ["o_orderkey", "o_totalprice"])
    page = (ds.sort("o_orderkey")
              .limit(75))  # rows 0..74; page 3 = 50..74
    pdf = page.to_pandas().iloc[50:75].reset_index(drop=True)
    pdf["o_totalprice"] = pdf["o_totalprice"].round(2)
    return pa.Table.from_pandas(pdf, preserve_index=False)


def q_filter_combo(sf_dir: str) -> pa.Table:
    """Combined predicates (M14 state filter + M16 date range + M17 numeric
    range) → deterministic top-25."""
    ds = _t(sf_dir, "orders", ["o_orderkey", "o_orderstatus", "o_orderdate",
                               "o_totalprice"])

    def f(b: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.and_(pc.equal(b["o_orderstatus"], "O"),
                    pc.greater_equal(b["o_orderdate"],
                                     pa.scalar(pd.Timestamp("1995-01-01")))),
            pc.and_(pc.greater_equal(b["o_totalprice"], 100.0),
                    pc.less_equal(b["o_totalprice"], 50000.0)))
        return b.filter(keep).select(["o_orderkey", "o_totalprice"])

    top = (ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)
             .sort(["o_totalprice", "o_orderkey"], descending=[True, False])
             .limit(25).to_pandas())
    top["o_totalprice"] = top["o_totalprice"].round(2)
    return pa.Table.from_pandas(top.reset_index(drop=True), preserve_index=False)


def q_name_contains(sf_dir: str) -> pa.Table:
    """Case-insensitive substring filter (M14 icontains)."""
    ds = _t(sf_dir, "part", ["p_partkey", "p_name"])

    def f(b: pa.Table) -> pa.Table:
        keep = pc.match_substring(pc.utf8_lower(b["p_name"]), "blue")
        return b.filter(keep)

    pdf = ds.map_batches(f, batch_format="pyarrow",
                         zero_copy_batch=True).to_pandas()
    if "p_partkey" not in pdf.columns:
        return pa.Table.from_pydict({"p_partkey": pa.array([], pa.int64()),
                                     "p_name": pa.array([], pa.string())})
    pdf = pdf.sort_values("p_partkey").reset_index(drop=True)
    return pa.Table.from_pandas(pdf, preserve_index=False)


def q_events_hourly_windows(sf_dir: str) -> pa.Table:
    """Tumbling 1-hour window aggregate (streaming-shaped workload over an
    event-time column: window = floor(ts to hour))."""
    from ..stages.groupagg import grouped_agg

    ds = _t(sf_dir, "events", ["ts", "value"])

    def win(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"hour": b["ts"].dt.strftime("%Y-%m-%d %H:00"),
                             "value": b["value"]})

    g = grouped_agg(ds.map_batches(win, batch_format="pandas"), ["hour"],
                    {"n": ("", "count"), "total_value": ("value", "sum")})
    t = pa.Table.from_pandas(g, preserve_index=False)
    return t.set_column(t.schema.get_field_index("total_value"), "total_value",
                        pa.array(round_away(np.asarray(t["total_value"]))))


def q_events_sessions(sf_dir: str) -> pa.Table:
    """Session windows per user (gap > 1800 s starts a new session) —
    groupby(user) → sorted sweep in-group; the ordered-log pattern for
    stream-shaped references (partition by key, sort by ts within)."""
    from ..stages.keyed_window import group_boundary_mask, keyed_apply

    ds = _t(sf_dir, "events", ["user_id", "ts"])

    def sessions(d: pd.DataFrame) -> pd.DataFrame:
        # vectorized multi-group kernel: sort once per bucket, session
        # starts = gap > 1800 s AND not a group boundary (keyed_apply —
        # no per-user Python)
        d = d.sort_values(["user_id", "ts"], kind="stable")
        gaps = d["ts"].diff().dt.total_seconds().to_numpy()
        first = group_boundary_mask(d["user_id"])
        starts = (gaps > 1800) & ~first
        res = (d.assign(_s=starts)
                .groupby("user_id", sort=False)["_s"]
                .agg(n_events="size", n_starts="sum").reset_index())
        out = pd.DataFrame({"user_id": res["user_id"].astype("int64"),
                            "n_events": res["n_events"].astype("int64"),
                            "n_sessions": (res["n_starts"] + 1).astype("int64")})
        return out

    pdf = keyed_apply(ds, "user_id", sessions).to_pandas()
    if "user_id" not in pdf.columns:  # all-empty input loses the schema
        return pa.Table.from_pydict({"user_id": pa.array([], pa.int64()),
                                     "n_events": pa.array([], pa.int64()),
                                     "n_sessions": pa.array([], pa.int64())})
    pdf = pdf.sort_values("user_id").reset_index(drop=True)
    return pa.Table.from_pandas(pdf, preserve_index=False)


def q_events_rolling_1h(sf_dir: str) -> pa.Table:
    """Sliding event-time window: per event, the mean value of the same
    user's events in the preceding hour (inclusive of the current event).
    Ray shape: groupby(user) → time-indexed pandas rolling inside each
    sorted group — the sliding-window counterpart of the tumbling/session
    windows."""
    from ..stages.keyed_window import keyed_apply

    ds = _t(sf_dir, "events", ["event_id", "user_id", "ts", "value"])

    def roll(d: pd.DataFrame) -> pd.DataFrame:
        # groupby(...).rolling is a cython kernel over the whole sorted
        # bucket — group order in its output equals the sorted row order,
        # so values align positionally with d (keyed_apply: one call per
        # bucket, no per-user Python). The window mean is computed in
        # integer CENTS (exact float64 sums, order-independent) and
        # divided once, so the oracle — same cents formula in SQL —
        # produces the bit-identical double: no accumulation-order
        # rounding ties at any scale (342/100k rows flipped at sf0.1
        # under the naive float mean).
        d = d.sort_values(["user_id", "ts"], kind="stable").set_index("ts")
        cents = np.rint(d["value"].to_numpy() * 100.0)
        g = (d.assign(_cents=cents).groupby("user_id", sort=False)
              ["_cents"].rolling("3600s", closed="both"))
        avg = g.sum().to_numpy() / (100.0 * g.count().to_numpy())
        return pd.DataFrame({"event_id": d["event_id"].to_numpy(),
                             "rolling_avg": avg})

    pdf = keyed_apply(ds, "user_id", roll).to_pandas()
    if "event_id" not in pdf.columns:  # all-empty input loses the schema
        return pa.Table.from_pydict(
            {"event_id": pa.array([], pa.int64()),
             "rolling_avg": pa.array([], pa.float64())})
    pdf = pdf.sort_values("event_id").reset_index(drop=True)
    pdf["event_id"] = pdf["event_id"].astype("int64")
    t = pa.Table.from_pandas(pdf, preserve_index=False)
    # 2-decimal inputs make window means land EXACTLY on .005 — round
    # half-away like SQL ROUND, not pandas/numpy banker's rounding.
    # (Residual cross-engine float noise can still flip ~1e-4 of rows at
    # much larger scales; the sf0.01 oracle gate is exact.)
    return t.set_column(t.schema.get_field_index("rolling_avg"),
                        "rolling_avg",
                        pa.array(round_away(np.asarray(t["rolling_avg"]))))


def q_top_orders_per_nation(sf_dir: str, *, mode: str = "auto") -> pa.Table:
    """Grouped top-k (top-3 orders by totalprice per nation): per-block
    partial top-3 per group (each block forwards at most #groups × k rows
    — the map-side combine for top-k) → driver merge of the tiny
    partials. Deterministic tie-break (price DESC, orderkey ASC) matches
    the ROW_NUMBER oracle.

    Join-side planner: 'broadcast' ships the customer→nation-name map
    once while customer fits worker heaps (≤ ~5M rows); 'shuffle' is the
    native hash-partitioned orders⋈customer join with only the 25-row
    nation dim broadcast. Output-identical (agreement-tested)."""
    if mode == "auto":
        n_cust = _t(sf_dir, "customer", ["c_custkey"]).count()
        mode = "broadcast" if n_cust <= _BROADCAST_MAX_ROWS else "shuffle"
    if mode not in ("broadcast", "shuffle"):
        raise ValueError(f"unknown join mode: {mode!r}")

    nation = _t(sf_dir, "nation", ["n_nationkey", "n_name"]).to_pandas()

    def _partial_top3(pdf: pd.DataFrame) -> pd.DataFrame:
        return (pdf.sort_values(["n_name", "o_totalprice", "o_orderkey"],
                                ascending=[True, False, True])
                   .groupby("n_name", as_index=False).head(3))

    if mode == "broadcast":
        cust = _t(sf_dir, "customer", ["c_custkey", "c_nationkey"]).to_pandas()
        if "c_custkey" in cust.columns and "n_nationkey" in nation.columns:
            c2name = cust.set_index("c_custkey")["c_nationkey"].map(
                nation.set_index("n_nationkey")["n_name"])
        else:  # fully-empty dims lose their schema through to_pandas
            c2name = pd.Series(dtype=object)
        ref = ray.put(c2name)

        def partial(b: pa.Table) -> pd.DataFrame:
            lut = ray.get(ref)
            pdf = pd.DataFrame({
                "n_name": pd.Series(
                    b["o_custkey"].to_numpy(zero_copy_only=False)).map(lut),
                "o_orderkey": b["o_orderkey"].to_numpy(zero_copy_only=False),
                "o_totalprice": b["o_totalprice"].to_numpy(zero_copy_only=False),
            }).dropna(subset=["n_name"])
            return _partial_top3(pdf)

        parts = (_t(sf_dir, "orders",
                    ["o_orderkey", "o_custkey", "o_totalprice"])
                 .map_batches(partial, batch_format="pyarrow",
                              zero_copy_batch=True).to_pandas())
    else:
        orders = _t(sf_dir, "orders",
                    ["o_orderkey", "o_custkey", "o_totalprice"])
        cust_ds = _t(sf_dir, "customer", ["c_custkey", "c_nationkey"])
        joined = orders.join(cust_ds, join_type="inner",
                             num_partitions=_nparts(sf_dir, "orders"),
                             on=("o_custkey",), right_on=("c_custkey",))
        nref = ray.put(nation.set_index("n_nationkey")["n_name"]
                       if "n_nationkey" in nation.columns
                       else pd.Series(dtype=object))

        def partial_joined(b: pa.Table) -> pd.DataFrame:
            n2name = ray.get(nref)
            pdf = pd.DataFrame({
                "n_name": pd.Series(
                    b["c_nationkey"].to_numpy(zero_copy_only=False)).map(n2name),
                "o_orderkey": b["o_orderkey"].to_numpy(zero_copy_only=False),
                "o_totalprice": b["o_totalprice"].to_numpy(zero_copy_only=False),
            }).dropna(subset=["n_name"])
            return _partial_top3(pdf)

        parts = joined.map_batches(partial_joined,
                                   batch_format="pyarrow").to_pandas()
    if "n_name" not in parts.columns or not len(parts):
        return pa.Table.from_pydict(
            {"n_name": pa.array([], pa.string()),
             "o_orderkey": pa.array([], pa.int64()),
             "o_totalprice": pa.array([], pa.float64())})
    top = (parts.sort_values(["n_name", "o_totalprice", "o_orderkey"],
                             ascending=[True, False, True])
                .groupby("n_name", as_index=False).head(3)
                .reset_index(drop=True))
    top["o_orderkey"] = top["o_orderkey"].astype("int64")
    top["o_totalprice"] = top["o_totalprice"].round(2)
    return pa.Table.from_pandas(top, preserve_index=False)


def q_orders_sorted_view(sf_dir: str) -> pa.Table:
    """O2 whitelisted dynamic sort at the driver surface: the caller's
    sort key is validated against the whitelist (unknown keys raise
    SortableFieldError — tested in tests/test_ordering.py), then applied
    as a distributed Dataset.sort."""
    from .ordering import sorted_view

    ds = _t(sf_dir, "orders", ["o_orderkey", "o_totalprice"])
    out = (sorted_view(ds, "o_orderkey", "asc",
                       sortable_fields=["o_orderkey", "o_totalprice"])
           .limit(20).to_pandas())
    out["o_totalprice"] = out["o_totalprice"].round(2)
    return pa.Table.from_pandas(out.reset_index(drop=True),
                                preserve_index=False)


def q_nation_region_rollup(sf_dir: str) -> pa.Table:
    """Distinct counts per region over a fact-sized table (J9 shape).

    nation/region are true dimensions → broadcast once (ray.put). The
    supplier FACT streams through map_batches: per-block distinct
    (r_name, s_suppkey, nationkey) → hash-partitioned ``groupby`` shuffle
    for the global supplier distinct → bounded partial rollup per
    (r_name, nationkey) merged on the driver (≤ #regions × #nations
    rows — bounded by the dimension domain, not the data)."""
    n = _t(sf_dir, "nation", ["n_nationkey", "n_regionkey"]).to_pandas()
    r = _t(sf_dir, "region", ["r_regionkey", "r_name"]).to_pandas()
    n2r = n.set_index("n_nationkey")["n_regionkey"].map(
        r.set_index("r_regionkey")["r_name"]).to_dict()
    ref = ray.put(n2r)

    def to_pairs(b: pa.Table) -> pa.Table:
        lut = ray.get(ref)
        nk = b["s_nationkey"].to_numpy(zero_copy_only=False)
        names = pa.array([lut.get(k) for k in nk], type=pa.string())
        t = pa.Table.from_arrays(
            [names, pc.cast(b["s_suppkey"], pa.int64()),
             pc.cast(b["s_nationkey"], pa.int64())],
            names=["r_name", "s_suppkey", "nationkey"])
        t = t.filter(pc.is_valid(t["r_name"]))
        # map-side distinct: dedupe inside the block before the exchange
        g = t.group_by(["r_name", "s_suppkey"]).aggregate([("nationkey", "min")])
        return g.rename_columns(["r_name", "s_suppkey", "nationkey"])

    distinct = (_t(sf_dir, "supplier", ["s_suppkey", "s_nationkey"])
                .map_batches(to_pairs, batch_format="pyarrow",
                             zero_copy_batch=True)
                .groupby(["r_name", "s_suppkey"]).min("nationkey"))

    def rollup_partial(b: pa.Table) -> pa.Table:
        g = b.group_by(["r_name", "min(nationkey)"]).aggregate([([], "count_all")])
        return g.rename_columns(["r_name", "nationkey", "c"])

    parts = distinct.map_batches(rollup_partial,
                                 batch_format="pyarrow").to_pandas()
    per_nation = parts.groupby(["r_name", "nationkey"], as_index=False)["c"].sum()
    g = per_nation.groupby("r_name", as_index=False).agg(
        n_suppliers=("c", "sum"), n_nations=("nationkey", "nunique"))
    g["n_suppliers"] = g["n_suppliers"].astype("int64")
    g["n_nations"] = g["n_nations"].astype("int64")
    g = g.sort_values("r_name").reset_index(drop=True)
    return pa.Table.from_pandas(g, preserve_index=False)


def q_asof_click_before_purchase(sf_dir: str) -> pa.Table:
    """As-of join: for each purchase event, the most recent click by the
    same user at-or-before it (inner — purchases with no prior click drop).

    Ray shape: key-partitioned merge_asof — groupby(user_id) →
    pd.merge_asof inside each sorted group (the guide's prescribed as-of
    pattern: sort both sides by (key, ts) within buckets)."""
    from ..stages.keyed_window import keyed_apply

    ds = _t(sf_dir, "events", ["event_id", "user_id", "event_type", "ts",
                               "value"])

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        # one vectorized merge_asof per bucket: by="user_id" scopes the
        # backward search to the key, both sides globally ts-sorted
        # (keyed_apply — no per-user Python)
        p = g[g["event_type"] == "purchase"].sort_values("ts", kind="stable")
        c = g[g["event_type"] == "click"].sort_values("ts", kind="stable")
        if len(p) == 0 or len(c) == 0:
            return pd.DataFrame(
                {"event_id": pd.Series(dtype="int64"),
                 "click_id": pd.Series(dtype="int64"),
                 "click_value": pd.Series(dtype="float64")})
        m = pd.merge_asof(p[["ts", "user_id", "event_id"]],
                          c[["ts", "user_id", "event_id", "value"]],
                          on="ts", by="user_id", suffixes=("", "_c"),
                          direction="backward")
        m = m.dropna(subset=["event_id_c"])
        return pd.DataFrame({"event_id": m["event_id"].astype("int64"),
                             "click_id": m["event_id_c"].astype("int64"),
                             "click_value": m["value"].round(2)})

    pdf = keyed_apply(ds, "user_id", per_bucket).to_pandas()
    if "event_id" not in pdf.columns or not len(pdf):
        return pa.Table.from_pydict({"event_id": pa.array([], pa.int64()),
                                     "click_id": pa.array([], pa.int64()),
                                     "click_value": pa.array([], pa.float64())})
    pdf = pdf.sort_values("event_id").reset_index(drop=True)
    pdf["event_id"] = pdf["event_id"].astype("int64")
    pdf["click_id"] = pdf["click_id"].astype("int64")
    return pa.Table.from_pandas(pdf, preserve_index=False)


def q_native_join_orders_nation(sf_dir: str) -> pa.Table:
    """The large×large path: Ray's native hash-partitioned Dataset.join
    (orders ⋈ customer on custkey), then a bounded-cardinality rollup.
    Complements the broadcast joins — use this shape when BOTH sides
    exceed broadcast size (num_partitions keys the exchange)."""
    from ..stages.groupagg import grouped_agg

    orders = _t(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    cust = _t(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    joined = orders.join(cust, join_type="inner",
                         num_partitions=_nparts(sf_dir, "orders"),
                         on=("o_custkey",), right_on=("c_custkey",))
    nation = _t(sf_dir, "nation", ["n_nationkey", "n_name"]).to_pandas()
    n2name = nation.set_index("n_nationkey")["n_name"]
    ref = ray.put(n2name)

    def name_col(b: pa.Table) -> pa.Table:
        nn = ray.get(ref)
        names = pd.Series(b["c_nationkey"].to_numpy(zero_copy_only=False)).map(nn)
        return pa.Table.from_arrays(
            [pa.array(names.to_numpy(), type=pa.string())], names=["n_name"])

    g = grouped_agg(joined.map_batches(name_col, batch_format="pyarrow"),
                    ["n_name"], {"n_orders": ("", "count")})
    return pa.Table.from_pandas(g, preserve_index=False)


def q_events_props_stats(sf_dir: str) -> pa.Table:
    """JSON-field extraction (the reference's JSONField surface,
    cerberus/models/user_settings.py:10) — props is a JSON blob; extract
    $.k vectorized (RE2 extract_regex) and aggregate per event_type."""
    from ..stages.groupagg import grouped_agg

    ds = _t(sf_dir, "events", ["event_type", "props"])

    def extract(b: pa.Table) -> pa.Table:
        m = pc.extract_regex(pc.fill_null(b["props"], ""),
                             pattern=r'"k":\s*(?P<k>-?\d+)')
        k = pc.cast(pc.struct_field(m, "k"), pa.float64())
        return pa.Table.from_arrays([b["event_type"], k],
                                    names=["event_type", "k"])

    g = grouped_agg(
        ds.map_batches(extract, batch_format="pyarrow", zero_copy_batch=True),
        ["event_type"],
        {"n": ("", "count"), "total_k": ("k", "sum"), "avg_k": ("k", "mean")})
    t = pa.Table.from_pandas(g, preserve_index=False)
    t = t.set_column(t.schema.get_field_index("total_k"), "total_k",
                     pc.cast(t["total_k"], pa.int64()))
    return t.set_column(t.schema.get_field_index("avg_k"), "avg_k",
                        pa.array(round_away(np.asarray(t["avg_k"]))))


QUERIES = {
    "asof_click_before_purchase": q_asof_click_before_purchase,
    "events_props_stats": q_events_props_stats,
    "native_join_orders_nation": q_native_join_orders_nation,
    "revenue_per_nation": q_revenue_per_nation,
    "customers_without_orders": q_customers_without_orders,
    "top_customers_by_revenue": q_top_customers_by_revenue,
    "orders_page": q_orders_page,
    "orders_sorted_view": q_orders_sorted_view,
    "top_orders_per_nation": q_top_orders_per_nation,
    "filter_combo": q_filter_combo,
    "name_contains": q_name_contains,
    "events_hourly_windows": q_events_hourly_windows,
    "events_sessions": q_events_sessions,
    "nation_region_rollup": q_nation_region_rollup,
    "events_rolling_1h": q_events_rolling_1h,
}

ORACLE_SQL = {
    "asof_click_before_purchase": """
        SELECT p.event_id AS event_id, c.event_id AS click_id,
               ROUND(c.value, 2) AS click_value
        FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        ASOF JOIN (SELECT * FROM events WHERE event_type = 'click') c
            ON p.user_id = c.user_id AND c.ts <= p.ts
        ORDER BY event_id
    """,
    "native_join_orders_nation": """
        SELECT n.n_name AS n_name, COUNT(*) AS n_orders
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        GROUP BY 1 ORDER BY 1
    """,
    "events_props_stats": """
        SELECT event_type, COUNT(*) AS n,
               CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT))
                    AS BIGINT) AS total_k,
               ROUND(AVG(CAST(json_extract(props, '$.k') AS BIGINT)), 2) AS avg_k
        FROM events GROUP BY 1 ORDER BY 1
    """,
    "revenue_per_nation": """
        SELECT COALESCE(n.n_name, 'UNKNOWN') AS n_name,
               COUNT(*) AS n_orders,
               ROUND(SUM(o.o_totalprice), 2) AS revenue
        FROM orders o
        LEFT JOIN customer c ON o.o_custkey = c.c_custkey
        LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
        GROUP BY 1 ORDER BY 1
    """,
    "customers_without_orders": """
        SELECT c_custkey FROM customer
        WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
        ORDER BY 1
    """,
    "top_customers_by_revenue": """
        SELECT o_custkey AS c_custkey, ROUND(SUM(o_totalprice), 2) AS revenue
        FROM orders GROUP BY 1
        ORDER BY revenue DESC, c_custkey LIMIT 10
    """,
    "orders_page": """
        SELECT o_orderkey, ROUND(o_totalprice, 2) AS o_totalprice
        FROM orders ORDER BY o_orderkey LIMIT 25 OFFSET 50
    """,
    "orders_sorted_view": """
        SELECT o_orderkey, ROUND(o_totalprice, 2) AS o_totalprice
        FROM orders ORDER BY o_orderkey LIMIT 20
    """,
    "top_orders_per_nation": """
        SELECT n_name, o_orderkey, o_totalprice FROM (
            SELECT n.n_name AS n_name, o.o_orderkey AS o_orderkey,
                   ROUND(o.o_totalprice, 2) AS o_totalprice,
                   ROW_NUMBER() OVER (
                       PARTITION BY n.n_name
                       ORDER BY o.o_totalprice DESC, o.o_orderkey) AS rn
            FROM orders o
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN nation n ON c.c_nationkey = n.n_nationkey)
        WHERE rn <= 3 ORDER BY n_name, o_totalprice DESC, o_orderkey
    """,
    "filter_combo": """
        SELECT o_orderkey, ROUND(o_totalprice, 2) AS o_totalprice
        FROM orders
        WHERE o_orderstatus = 'O' AND o_orderdate >= TIMESTAMP '1995-01-01'
          AND o_totalprice BETWEEN 100.0 AND 50000.0
        ORDER BY o_totalprice DESC, o_orderkey LIMIT 25
    """,
    "name_contains": """
        SELECT p_partkey, p_name FROM part
        WHERE lower(p_name) LIKE '%blue%' ORDER BY p_partkey
    """,
    "events_hourly_windows": """
        SELECT strftime(ts, '%Y-%m-%d %H:00') AS hour, COUNT(*) AS n,
               ROUND(SUM(value), 2) AS total_value
        FROM events GROUP BY 1 ORDER BY 1
    """,
    "events_sessions": """
        SELECT user_id, COUNT(*) AS n_events,
               1 + COUNT(*) FILTER (gap > 1800) AS n_sessions
        FROM (SELECT user_id,
                     EPOCH(ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)) AS gap
              FROM events)
        GROUP BY user_id ORDER BY user_id
    """,
    "events_rolling_1h": """
        SELECT event_id,
               ROUND(SUM(CAST(ROUND(value * 100) AS BIGINT)) OVER w
                     / (100.0 * COUNT(value) OVER w), 2) AS rolling_avg
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts
                     RANGE BETWEEN INTERVAL 1 HOUR PRECEDING
                               AND CURRENT ROW)
        ORDER BY event_id
    """,
    "nation_region_rollup": """
        SELECT r.r_name AS r_name,
               COUNT(DISTINCT s.s_suppkey) AS n_suppliers,
               COUNT(DISTINCT s.s_nationkey) AS n_nations
        FROM supplier s
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        GROUP BY 1 ORDER BY 1
    """,
}
