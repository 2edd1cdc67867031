"""Generic aggregate-consistency stage (union → groupby → map_groups hash
join) — the fully-distributed alternative to the broadcast compare used by
order_totalprice_check; must find exactly the injected mismatches."""

import pandas as pd
import pytest
import ray.data as rd

from cerberus_ray.stages.aggcheck import aggregate_consistency


def test_aggregate_consistency_finds_mismatches(ray_session):
    children = pd.DataFrame({
        "parent_id": [1, 1, 2, 2, 3],
        "amount": [10.0, 5.0, 7.0, 3.0, 4.0],
    })
    parents = pd.DataFrame({
        "parent_id": [1, 2, 3, 4],
        "total": [15.0, 99.0, 4.0, 0.0],   # parent 2 wrong; 4 has no children
    })
    out = aggregate_consistency(
        rd.from_pandas(children), rd.from_pandas(parents),
        child_key="parent_id", parent_key="parent_id",
        child_value=lambda b: b["amount"], parent_col="total",
        rule="total-mismatch").to_pandas()
    assert list(out["doc_id"]) == ["2"]
    assert "stored 99.00 != recomputed 10.00" in out["detail"].iloc[0]


def test_aggregate_consistency_missing_parent_flag(ray_session):
    children = pd.DataFrame({"parent_id": [9], "amount": [1.0]})
    parents = pd.DataFrame({"parent_id": [1], "total": [0.0]})
    out = aggregate_consistency(
        rd.from_pandas(children), rd.from_pandas(parents),
        child_key="parent_id", parent_key="parent_id",
        child_value=lambda b: b["amount"], parent_col="total",
        rule="total-mismatch", missing_parent_ok=False).to_pandas()
    assert list(out["doc_id"]) == ["9"]
    assert "no parent row" in out["detail"].iloc[0]
