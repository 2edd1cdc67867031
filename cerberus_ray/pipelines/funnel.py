"""Ordered-funnel analysis over an event stream — how many users
progressed view → click → purchase, with each stage STRICTLY after the
previous one (the product-analytics conversion funnel; relational
grounding: the per-customer upcoming/overdue progression filters of
`cerberus/models/customer.py:146-150` / `filters.py:82-93` lifted to
ordered event sequences).

Semantics: a user reaches stage k when an event of type ``stages[k]``
exists with ``ts`` strictly greater than the user's stage-(k-1) reach
time; the reach time is the EARLIEST such event (so the count is
maximal — the standard funnel definition).

Ray shape: filter to funnel event types at the scan, then ONE keyed
exchange (`stages/keyed_window.keyed_apply` — whole users land in one
bucket) with a vectorized per-bucket kernel: per stage, a pandas
groupby-min over the bucket joined against the previous stage's reach
times — O(#stages) vectorized passes per bucket, no per-user Python.
Bucket outputs are per-stage partial user counts; the driver sums
O(#buckets × #stages) tiny rows.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def funnel_counts(events_ds, stages: Sequence[str], *,
                  user_col: str = "user_id", type_col: str = "event_type",
                  ts_col: str = "ts", n_buckets: int = 32) -> pa.Table:
    """→ (stage, n_users) in funnel order; n_users is non-increasing."""
    from ..stages.keyed_window import keyed_apply

    stages = list(stages)
    if len(stages) < 1:
        raise ValueError("need at least one funnel stage")
    if len(set(stages)) != len(stages):
        raise ValueError("funnel stages must be distinct")

    def only_funnel(b: pa.Table) -> pa.Table:
        m = pc.is_in(b[type_col], value_set=pa.array(stages, pa.string()))
        return b.select([user_col, type_col, ts_col]).filter(m)

    ev = events_ds.map_batches(only_funnel, batch_format="pyarrow",
                               zero_copy_batch=True)

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        # reach[user] = time the user reached the previous stage
        first = df[df[type_col] == stages[0]]
        reach = first.groupby(user_col)[ts_col].min()
        counts = [len(reach)]
        for st in stages[1:]:
            nxt = df[df[type_col] == st]
            if not len(nxt) or not len(reach):
                reach = reach.iloc[0:0]
                counts.append(0)
                continue
            prev = nxt[user_col].map(reach)
            ok = nxt[prev.notna() & (nxt[ts_col] > prev)]
            reach = ok.groupby(user_col)[ts_col].min()
            counts.append(len(reach))
        return pd.DataFrame({"stage_idx": np.arange(len(stages)),
                             "n": np.asarray(counts, dtype=np.int64)})

    parts = keyed_apply(ev, user_col, kernel,
                        n_buckets=n_buckets).to_pandas()
    if not len(parts):
        totals = np.zeros(len(stages), dtype=np.int64)
    else:
        totals = (parts.groupby("stage_idx")["n"].sum()
                  .reindex(range(len(stages)), fill_value=0)
                  .to_numpy(dtype=np.int64))
    return pa.Table.from_pydict({
        "stage": pa.array(stages, pa.string()),
        "n_users": pa.array(totals, pa.int64())})


def retention_cohorts(events_ds, *, user_col: str = "user_id",
                      ts_col: str = "ts", max_weeks: int = 8,
                      n_buckets: int = 32) -> pa.Table:
    """Weekly retention cohorts: cohort = ISO week of a user's FIRST
    event; retention k = distinct cohort users active in cohort-week+k
    (k = 0 is the cohort size by construction). The standard
    product-analytics retention triangle; grounding: the weekly report
    shape of `cerberus/reports.py:19-35` keyed by first-seen week.

    One keyed exchange (whole users per bucket), then a vectorized
    per-bucket kernel: per-user min-week + distinct (user, week) pairs →
    (cohort_week, offset) partial distinct-user counts. Distinctness is
    per-user and users never span buckets, so bucket partials sum
    exactly. → (cohort_week, week_offset, n_users) sorted, offsets
    0..max_weeks.
    """
    from ..stages.keyed_window import keyed_apply

    def only_cols(b: pa.Table) -> pa.Table:
        return b.select([user_col, ts_col])

    ev = events_ds.map_batches(only_cols, batch_format="pyarrow",
                               zero_copy_batch=True)

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        ts = pd.to_datetime(df[ts_col])
        iso = ts.dt.isocalendar()
        # yyyyww label for display; arithmetic runs on a true week index
        # (days-since-epoch of the week's Monday // 7) because yyyyww
        # keys are not subtractable across year boundaries
        wk = (iso["year"].astype(np.int64) * 100
              + iso["week"].astype(np.int64))
        monday = (ts - pd.to_timedelta(ts.dt.weekday, unit="D")).dt.normalize()
        week_idx = monday.astype(np.int64) // (7 * 24 * 3600 * 10**9)
        d = pd.DataFrame({"u": df[user_col].to_numpy(),
                          "wi": week_idx.to_numpy(),
                          "wk": wk.to_numpy()}).drop_duplicates(["u", "wi"])
        first_wi = d.groupby("u")["wi"].transform("min")
        first_wk = d.groupby("u")["wk"].transform("min")
        off = (d["wi"] - first_wi).astype(np.int64)
        keep = off <= max_weeks
        return (pd.DataFrame({"cohort_week": first_wk[keep].to_numpy(),
                              "week_offset": off[keep].to_numpy()})
                .groupby(["cohort_week", "week_offset"], as_index=False)
                .size().rename(columns={"size": "n"}))

    parts = keyed_apply(ev, user_col, kernel,
                        n_buckets=n_buckets).to_pandas()
    if not len(parts):
        return pa.Table.from_pydict({
            "cohort_week": pa.array([], pa.int64()),
            "week_offset": pa.array([], pa.int64()),
            "n_users": pa.array([], pa.int64())})
    g = (parts.groupby(["cohort_week", "week_offset"], as_index=False)["n"]
         .sum().rename(columns={"n": "n_users"})
         .sort_values(["cohort_week", "week_offset"])
         .reset_index(drop=True))
    for c in g.columns:
        g[c] = g[c].astype("int64")
    return pa.Table.from_pandas(g, preserve_index=False)
