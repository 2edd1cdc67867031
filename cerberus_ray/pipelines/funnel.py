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
