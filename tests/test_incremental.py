"""Incremental validation: the delta-scoping exactness property — the
violations computed on the added/changed subset must equal the full
re-validation's violations restricted to those docs (row-local +
referential), with uniqueness always full-corpus."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pytest

from cerberus_ray.datagen import (DEFAULT_FRACTIONS, GenConfig,
                                  docs_dataset, media_dataset)
from cerberus_ray.pipelines.incremental import (content_view, delta_keys,
                                                filter_to_keys,
                                                incremental_validate)

# unique-doc-id injection off: snapshot_diff's contract (and incremental
# validation's premise) is key-unique snapshots — exact dedup runs first
# in any real funnel
_FR = {k: (0.0 if k == "unique-doc-id" else v)
       for k, v in DEFAULT_FRACTIONS.items()}
CFG = GenConfig(n_docs=600, n_media=200, fractions=_FR)


@pytest.fixture(scope="module")
def snaps(ray_session):
    max_len = CFG.text_max_len

    def perturb(b: pa.Table) -> pa.Table:
        """Deterministic v2: drop ids ending in 0 (removed), oversize the
        first span's text for ids ending in 7 (changed + new violation)."""
        ids = b["doc_id"].to_pylist()
        keep = [not i.endswith("0") for i in ids]
        b = b.filter(pa.array(keep))
        rows = b.to_pylist()
        for r in rows:
            if r["doc_id"].endswith("7") and r["spans"]:
                r["spans"][0]["text"] = "x" * (max_len + 5)
        return pa.Table.from_pylist(rows, schema=b.schema)

    v1 = docs_dataset(CFG, fragment_size=200).materialize()
    v2 = v1.map_batches(perturb, batch_format="pyarrow").materialize()
    media = media_dataset(CFG).materialize()
    return v1, v2, media


def test_delta_keys_classify_exactly(snaps):
    v1, v2, _ = snaps
    ov = content_view(v1)
    nv = content_view(v2)
    keys = delta_keys(ov, nv)
    ids1 = set(np.concatenate(
        [b["doc_id"].to_pylist() for b in
         v1.iter_batches(batch_format="pyarrow")]))
    # v2 ⊂ v1 by construction → no added docs; changed = the '7' docs
    # that survive the drop and whose content actually changed
    changed = {i for i in ids1
               if i.endswith("7") and not i.endswith("0")}
    assert set(keys) == changed
    sub = filter_to_keys(v2, keys).to_pandas()
    assert set(sub["doc_id"]) == changed


def test_incremental_equals_full_restricted(snaps):
    v1, v2, media = snaps
    res = incremental_validate(v1, v2, media, text_max_len=CFG.text_max_len)
    # ground truth: full re-validation of v2, restricted to delta keys
    from cerberus_ray.rules.row_rules import interleaved_ruleset
    from cerberus_ray.stages.referential import (referential_violations,
                                                 span_media_keys)
    from cerberus_ray.stages.validate import validate
    keep = ["doc_id", "rule", "path", "detail"]
    rs = interleaved_ruleset(text_max_len=CFG.text_max_len)
    full = (validate(v2, rs).select_columns(keep)
            .union(referential_violations(
                v2, media, extract=span_media_keys,
                parent_key="media_ref", rule="fk-missing",
                parent_name="media_catalog").select_columns(keep))
            .to_pandas())
    keys = set(delta_keys(content_view(v1), content_view(v2)))
    restricted = (full[full["doc_id"].isin(keys)]
                  .sort_values(keep).reset_index(drop=True))
    assert res["delta_violations"].equals(restricted)
    # every changed doc got the planted oversize violation
    planted = res["delta_violations"]
    assert (planted["rule"] == "span-text-maxlen").any()
    assert res["n_revalidated"] == len(keys)


def test_summary_and_uniqueness_full_scope(snaps):
    v1, v2, media = snaps
    res = incremental_validate(v1, v2, media, text_max_len=CFG.text_max_len)
    s = {r["status"]: r["n_docs"] for r in res["summary"].to_pylist()}
    assert s.get("added", 0) == 0
    assert s.get("removed", 0) > 0
    assert s.get("changed", 0) == res["n_revalidated"]
    # uniqueness ran over the FULL new corpus (datagen injects dup ids)
    assert isinstance(res["uniqueness_violations"], pd.DataFrame)


def test_extras_report_pin(ray_session):
    from cerberus_ray.pipelines.training_queries import (
        q_incremental_validation_report)
    t = q_incremental_validation_report("").to_pydict()
    assert t == {"n_removed": [200], "n_changed": [200],
                 "n_unchanged": [1600], "n_revalidated": [200],
                 "n_delta_violations": [208], "n_unique_violations": [0]}
