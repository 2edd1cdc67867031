"""Flagship pipeline: full validation of an interleaved document table.

Stage order mirrors the reference's richest validation path —
Booking.save(): normalize → local rules → keyed/grouped rules → global
constraints (cerberus/models/booking.py:280-293,365-383; SURVEY.md §3.3):

    read/generate docs
      → row-local span rules      (stateless map_batches, zero-copy Arrow)
      → uniqueness(doc_id)        (partial counts → tiny shuffle)
      → referential(media_ref)    (broadcast parent keys / bloom at scale)
      → violations union, per-fragment verdicts, optional parquet sink

The validated docs stream is pass-through: the engine never mutates spans,
preserving per-row span-sequence equality (kind, text, media_ref, order) —
the driver invariant from BASELINE.json input_hint.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import pyarrow as pa

from ..rules.row_rules import interleaved_ruleset
from ..schema import SPAN_TEXT_MAX_LEN
from ..stages.referential import referential_violations, span_media_keys
from ..stages.uniqueness import unique_violations
from ..stages.validate import FRAGMENT_COL, fragment_verdicts, validate


@dataclass
class FlagshipResult:
    violations: "pa.Table"  # sorted, materialized (small relative to input)
    verdicts: Optional[pa.Table]
    n_docs: int


def run_flagship(docs_ds, media_ds, *, text_max_len: int = SPAN_TEXT_MAX_LEN,
                 ref_mode: str = "broadcast", out_dir: Optional[str] = None,
                 with_verdicts: bool = True,
                 batch_size: int = 16384) -> FlagshipResult:
    rs = interleaved_ruleset(text_max_len=text_max_len)
    has_frag = FRAGMENT_COL in docs_ds.schema().names

    row_v = validate(docs_ds, rs, batch_size=batch_size)
    ref_v = referential_violations(
        docs_ds, media_ds, extract=span_media_keys, parent_key="media_ref",
        rule="fk-missing", parent_name="media_catalog", mode=ref_mode)
    uniq_v = unique_violations(docs_ds, ["doc_id"], rule="unique-doc-id")

    # row_v carries fragment_id (for verdicts); strip it before the union so
    # both branches stream the same violation schema.
    row_v_plain = (row_v.drop_columns([FRAGMENT_COL]) if has_frag else row_v)
    if out_dir is not None:
        import ray.data as rd

        row_v_plain.union(ref_v).write_parquet(f"{out_dir}/violations")
        viol = rd.read_parquet(f"{out_dir}/violations")
    else:
        viol = row_v_plain.union(ref_v)

    import pandas as pd

    from ..schema import VIOLATIONS

    cols = ["doc_id", "rule", "path", "detail"]
    vt = viol.to_pandas()
    if not set(cols) <= set(vt.columns):  # fully-empty union loses the schema
        vt = VIOLATIONS.empty_table().to_pandas()
    vt = vt[cols]
    uq = uniq_v.to_pandas()
    allv = pd.concat([vt, uq], ignore_index=True) if len(uq) else vt
    allv = allv.sort_values(["doc_id", "rule", "path"]).reset_index(drop=True)
    viol_table = pa.Table.from_pandas(allv, preserve_index=False)

    verdicts = None
    if with_verdicts and has_frag:
        verdicts = fragment_verdicts(docs_ds, row_v)

    return FlagshipResult(violations=viol_table, verdicts=verdicts,
                          n_docs=docs_ds.count())
