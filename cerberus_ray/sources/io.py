"""Storage adapter: Lance when available, Parquet otherwise.

The north_rule targets Lance-backed tables; this sandbox has no pylance, so
the adapter resolves at import time and everything runs on Parquet with an
identical logical schema (SURVEY.md §7 step 0). Reads always push column
pruning (and, for parquet, row-group predicate filters) into the scan —
"prune at the read".
"""

from __future__ import annotations

from typing import Optional, Sequence

import ray.data as rd

try:  # pragma: no cover - not installed in this sandbox
    import lance  # noqa: F401

    HAVE_LANCE = True
except ImportError:
    HAVE_LANCE = False


def read_table(path: str, *, columns: Optional[Sequence[str]] = None,
               filter=None, **kwargs) -> "rd.Dataset":
    """Read a logical table as a Ray Dataset with column/predicate pushdown."""
    if HAVE_LANCE and path.endswith(".lance"):  # pragma: no cover
        return rd.read_lance(path, columns=list(columns) if columns else None,
                             **kwargs)
    return rd.read_parquet(path, columns=list(columns) if columns else None,
                           filter=filter, **kwargs)


def write_table(ds: "rd.Dataset", path: str, **kwargs) -> None:
    """Write a Dataset as a directory of files (resumable layout: the caller
    picks one directory per partition/fragment; see state.checkpoint)."""
    if HAVE_LANCE and path.endswith(".lance"):  # pragma: no cover
        ds.write_lance(path, **kwargs)
        return
    ds.write_parquet(path, **kwargs)
