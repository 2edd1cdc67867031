"""Generic per-key window functions: the SQL
``OVER (PARTITION BY key ORDER BY ...)`` family as one keyed exchange.

The specialized keyed sweeps (sessions, rolling windows, as-of merges,
monotonicity checks) each hand-roll their kernel; this stage exposes the
general surface — ``ROW_NUMBER / RANK / DENSE_RANK / LAG / LEAD /
running SUM|MIN|MAX`` — as a spec dict so pipelines can add ranked /
offset / cumulative columns without writing a kernel.

Execution shape (the scale contract): one :func:`keyed_apply` hash
exchange co-locates whole partitions, then a SINGLE pandas kernel per
bucket computes every requested column via C-level ``groupby`` primitives
(``cumcount`` / ``rank`` / ``shift`` / ``cumsum`` / ``cummax``) — no
per-key Python, driver holds nothing. Python invocations are
O(n_buckets), exactly like the sessionization path it generalizes.

Reference shape: the per-booking ordered sweeps
(cerberus/models/booking.py:72-83 — partition by key, order within) and
the reporting rank queries the reference expresses as annotated ORDER BY
slices (cerberus/crm/views.py top-N listings).

Null semantics (documented contract, verified in tests):
- ``lag`` / ``lead`` emit null beyond the partition edge (SQL default);
- running ``sum`` skips null inputs and emits null until the first
  non-null value (matches DuckDB ``SUM() OVER``);
- ``rank`` / ``dense_rank`` give null rank to null sort values (SQL
  instead sorts them NULLS LAST — use a COALESCE'd column when SQL
  parity on nulls matters).
"""

from __future__ import annotations

from typing import Mapping, Sequence, Tuple

import numpy as np
import pandas as pd

from .keyed_window import keyed_apply

__all__ = ["window_columns", "WINDOW_KINDS"]

#: kind → (needs_src, needs_offset)
WINDOW_KINDS = {
    "row_number": (False, False),
    "rank": (True, False),
    "dense_rank": (True, False),
    "lag": (True, True),
    "lead": (True, True),
    "cumsum": (True, False),
    "cummax": (True, False),
    "cummin": (True, False),
    "delta": (True, False),  # src - LAG(src, 1): the adjacent-step diff
    "ntile": (True, True),   # ("ntile", n) — n buckets in window order
    "percent_rank": (True, False),
    "cume_dist": (True, False),
}


def _validate(specs: Mapping[str, Tuple]) -> None:
    for out, spec in specs.items():
        if not spec or spec[0] not in WINDOW_KINDS:
            raise ValueError(
                f"unknown window kind for column {out!r}: {spec!r}; "
                f"one of {sorted(WINDOW_KINDS)}")
        needs_src, _ = WINDOW_KINDS[spec[0]]
        if needs_src and len(spec) < 2:
            raise ValueError(f"{spec[0]} needs a source column: {out!r}")


def window_columns(ds, key_col: str, order_cols: Sequence[str],
                   specs: Mapping[str, Tuple], *, n_buckets: int = 32):
    """Add one column per ``specs`` entry, each computed over the rows of
    its ``key_col`` partition in ``order_cols`` order (make the order
    unique within a key — e.g. append the row key — for deterministic
    offset/row_number output). Spec forms::

        {"rn":    ("row_number",),
         "r":     ("rank", "value"),          # RANK() ... ORDER BY value
         "dr":    ("dense_rank", "value"),
         "prev":  ("lag", "ts", 1),
         "nxt":   ("lead", "value", 2),
         "run":   ("cumsum", "value"),        # running sum, null-skipping
         "peak":  ("cummax", "value"),
         "step":  ("delta", "value"),         # value - lag(value, 1)
         "tile":  ("ntile", 4),               # NTILE(4) in window order
         "pr":    ("percent_rank", "value"),
         "cd":    ("cume_dist", "value")}

    Output preserves every input column; row order within the result is
    partition-grouped (not globally sorted — sort downstream if needed).
    """
    _validate(specs)
    order_cols = list(order_cols)

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key_col, *order_cols],
                          kind="mergesort").reset_index(drop=True)
        gb = g.groupby(key_col, sort=False)
        for out, spec in specs.items():
            kind = spec[0]
            if kind == "row_number":
                g[out] = (gb.cumcount() + 1).astype(np.int64)
            elif kind in ("rank", "dense_rank"):
                method = "min" if kind == "rank" else "dense"
                g[out] = gb[spec[1]].rank(method=method)
            elif kind in ("lag", "lead"):
                n = int(spec[2]) if len(spec) > 2 else 1
                g[out] = gb[spec[1]].shift(n if kind == "lag" else -n)
            elif kind == "cumsum":
                src = g[spec[1]]
                filled = src.fillna(0.0)
                run = filled.groupby(g[key_col], sort=False).cumsum()
                seen = src.notna().groupby(g[key_col], sort=False).cumsum()
                g[out] = run.where(seen > 0)
            elif kind == "cummax":
                g[out] = gb[spec[1]].cummax()
            elif kind == "cummin":
                g[out] = gb[spec[1]].cummin()
            elif kind == "delta":
                g[out] = g[spec[1]] - gb[spec[1]].shift(1)
            elif kind == "ntile":
                n_t = int(spec[1])
                rn = gb.cumcount().to_numpy()
                sz = gb[order_cols[0]].transform("size").to_numpy()
                q, r = sz // n_t, sz % n_t
                cut = r * (q + 1)
                g[out] = np.where(
                    rn < cut, rn // np.maximum(q + 1, 1),
                    r + (rn - cut) // np.maximum(q, 1)).astype(
                        np.int64) + 1
            elif kind == "percent_rank":
                rnk = gb[spec[1]].rank(method="min").to_numpy()
                sz = gb[order_cols[0]].transform("size").to_numpy()
                g[out] = np.where(sz > 1, (rnk - 1) / np.maximum(
                    sz - 1, 1), 0.0)
            elif kind == "cume_dist":
                rnk = gb[spec[1]].rank(method="max").to_numpy()
                sz = gb[order_cols[0]].transform("size").to_numpy()
                g[out] = rnk / sz
        return g

    return keyed_apply(ds, key_col, kernel, n_buckets=n_buckets)
