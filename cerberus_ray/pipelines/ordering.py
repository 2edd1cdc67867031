"""Whitelisted dynamic ordering (O2) — the reference's SortableViewMixin
surface (cerberus/views/crud_views.py:75-94): a caller-supplied sort key
is honored only if whitelisted; the literal string "None" is ignored; any
other unknown key raises SortableFieldError with the same message shape.
"""

from __future__ import annotations

from typing import Optional, Sequence


class SortableFieldError(Exception):
    pass


def sorted_view(ds, sort: Optional[str] = None, sort_order: str = "desc", *,
                sortable_fields: Sequence[str]):
    """Apply a validated dynamic sort to a Dataset.

    - ``sort`` empty/None or the literal "None" → dataset unchanged
    - ``sort`` in ``sortable_fields`` → ds.sort(sort), descending unless
      ``sort_order`` == "asc" (the reference defaults to desc)
    - anything else → SortableFieldError (the driver-error surface)
    """
    if not sort or sort == "None":
        return ds
    if sort not in sortable_fields:
        raise SortableFieldError(
            f"Invalid sort field '{sort}', must be one of "
            f"{', '.join(sortable_fields)}")
    return ds.sort(sort, descending=(sort_order == "desc"))
