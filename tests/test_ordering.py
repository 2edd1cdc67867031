"""O2 whitelisted dynamic sort: valid keys sort (desc default), "None"
is a no-op, unknown keys raise the validation error — the reference's
SortableViewMixin contract (crud_views.py:75-94)."""

import pandas as pd
import pytest
import ray.data as rd

from cerberus_ray.pipelines.ordering import SortableFieldError, sorted_view

FIELDS = ["amount", "name"]


def _ds():
    return rd.from_pandas(pd.DataFrame(
        {"amount": [3.0, 1.0, 2.0], "name": ["b", "c", "a"]}))


def test_sorts_desc_by_default(ray_session):
    out = sorted_view(_ds(), "amount", sortable_fields=FIELDS).to_pandas()
    assert out["amount"].tolist() == [3.0, 2.0, 1.0]


def test_sorts_asc(ray_session):
    out = sorted_view(_ds(), "name", "asc", sortable_fields=FIELDS).to_pandas()
    assert out["name"].tolist() == ["a", "b", "c"]


def test_none_is_noop(ray_session):
    for s in (None, "", "None"):
        out = sorted_view(_ds(), s, sortable_fields=FIELDS).to_pandas()
        assert out["amount"].tolist() == [3.0, 1.0, 2.0]


def test_unknown_key_raises(ray_session):
    with pytest.raises(SortableFieldError, match="Invalid sort field 'nope'.*amount, name"):
        sorted_view(_ds(), "nope", sortable_fields=FIELDS)
