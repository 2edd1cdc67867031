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
    violations: Optional[pa.Table]  # sorted table (collect=True) else None
    verdicts: Optional[pa.Table]
    n_docs: int
    violations_ds: object = None  # streaming Dataset handle (collect=False)


def run_flagship(docs_ds, media_ds, *, text_max_len: int = SPAN_TEXT_MAX_LEN,
                 ref_mode: str = "broadcast", out_dir: Optional[str] = None,
                 with_verdicts: bool = True, collect: bool = True,
                 batch_size: int = 65536) -> FlagshipResult:
    """``collect=False`` keeps the violation stream a Dataset end-to-end:
    union → (optional) partitioned parquet sink, nothing driver-side is
    proportional to the violation count — the path for pathological
    inputs where most rows violate. ``collect=True`` materializes the
    (normally small) violation table on the driver for the bench/driver
    return surface."""
    rs = interleaved_ruleset(text_max_len=text_max_len)
    has_frag = FRAGMENT_COL in docs_ds.schema().names

    row_v = validate(docs_ds, rs, batch_size=batch_size)
    if with_verdicts and has_frag:
        # row_v feeds BOTH the violation union and fragment_verdicts;
        # materialize once (bounded by the violation count, not the
        # input) so the validate pass doesn't run twice
        row_v = row_v.materialize()
    ref_v = referential_violations(
        docs_ds, media_ds, extract=span_media_keys, parent_key="media_ref",
        rule="fk-missing", parent_name="media_catalog", mode=ref_mode)
    uniq_v = unique_violations(docs_ds, ["doc_id"], rule="unique-doc-id")

    # row_v carries fragment_id (for verdicts); strip it before the union so
    # both branches stream the same violation schema.
    row_v_plain = (row_v.drop_columns([FRAGMENT_COL]) if has_frag else row_v)
    import ray.data as rd

    viol = row_v_plain.union(ref_v)
    if uniq_v.num_rows:  # one row per duplicated key — small by construction
        viol = viol.union(rd.from_arrow(uniq_v))
    if out_dir is not None:
        viol.write_parquet(f"{out_dir}/violations")
        viol = rd.read_parquet(f"{out_dir}/violations")

    verdicts = None
    if with_verdicts and has_frag:
        verdicts = fragment_verdicts(docs_ds, row_v)

    if not collect:
        return FlagshipResult(violations=None, verdicts=verdicts,
                              n_docs=docs_ds.count(), violations_ds=viol)

    import pandas as pd

    from ..schema import VIOLATIONS

    cols = ["doc_id", "rule", "path", "detail"]
    vt = viol.to_pandas()
    if not set(cols) <= set(vt.columns):  # fully-empty union loses the schema
        vt = VIOLATIONS.empty_table().to_pandas()
    allv = vt[cols].sort_values(["doc_id", "rule", "path"]).reset_index(drop=True)
    viol_table = pa.Table.from_pandas(allv, preserve_index=False)

    return FlagshipResult(violations=viol_table, verdicts=verdicts,
                          n_docs=docs_ds.count())


def run_flagship_checkpointed(cfg, ckpt_dir: str, *, fragment_size: int = 1000,
                              run_id: str = "run-0",
                              ref_mode: str = "broadcast") -> dict:
    """Resumable flagship run over the generated interleaved table.

    Row-local rules are fragment-local: completed fragments (manifest with
    matching rule-set hash) are SKIPPED — the source is filtered to the
    incomplete fragment set before any validation work runs, so a resumed
    run streams only the missing partitions. Global rules (uniqueness,
    referential) are cross-fragment by nature and checkpoint under a
    single global key each.

    Returns {"violations": pa.Table, "verdicts": pa.Table,
             "processed_fragments": [...], "skipped_fragments": [...],
             "run_manifest": {...}}.
    """
    import math

    import numpy as np
    import pyarrow.compute as pc

    from ..datagen import docs_dataset, media_dataset
    from ..state.checkpoint import CheckpointManager

    rs = interleaved_ruleset(text_max_len=cfg.text_max_len)
    mgr = CheckpointManager(ckpt_dir, rs.hash, run_id=run_id,
                            layout=f"fs-{fragment_size}")

    n_frags = math.ceil(cfg.n_docs / fragment_size)
    all_frags = [f"frag-{i:06d}" for i in range(n_frags)]
    done = mgr.completed_fragments()
    todo = [f for f in all_frags if f not in done]

    if todo:
        ds = docs_dataset(cfg, fragment_size=fragment_size)
        todo_arr = pa.array(todo, type=pa.string())

        def keep_todo(batch: pa.Table) -> pa.Table:
            return batch.filter(pc.is_in(batch[FRAGMENT_COL], value_set=todo_arr))

        sub = ds.map_batches(keep_todo, batch_format="pyarrow",
                             zero_copy_batch=True)
        viol = validate(sub, rs).to_pandas()
        rows_per_frag = sub.groupby(FRAGMENT_COL).count().to_pandas()
        rows_per_frag = dict(zip(rows_per_frag.get(FRAGMENT_COL, []),
                                 rows_per_frag.get("count()", [])))
        from ..schema import VIOLATIONS

        for frag in todo:
            if FRAGMENT_COL in viol.columns and len(viol):
                fv = viol[viol[FRAGMENT_COL] == frag][
                    ["doc_id", "rule", "path", "detail"]]
                ft = pa.Table.from_pandas(fv.reset_index(drop=True),
                                          preserve_index=False,
                                          schema=VIOLATIONS)
            else:
                ft = VIOLATIONS.empty_table()
            mgr.record_fragment(frag, ft, int(rows_per_frag.get(frag, 0)))

    # global rules — skipped entirely when their checkpoint is current
    if not mgr.global_completed("unique-doc-id"):
        uniq = unique_violations(docs_dataset(cfg), ["doc_id"],
                                 rule="unique-doc-id")
        mgr.record_global("unique-doc-id", uniq)
    if not mgr.global_completed("fk-missing"):
        ref = referential_violations(
            docs_dataset(cfg), media_dataset(cfg), extract=span_media_keys,
            parent_key="media_ref", rule="fk-missing",
            parent_name="media_catalog", mode=ref_mode,
            n_keys_hint=cfg.n_media)
        pdf = ref.to_pandas()
        from ..schema import VIOLATIONS

        ft = (pa.Table.from_pandas(pdf, preserve_index=False, schema=VIOLATIONS)
              if len(pdf) else VIOLATIONS.empty_table())
        mgr.record_global("fk-missing", ft)

    # assemble full result from durable state only (proves resumability)
    import pandas as pd

    parts = [mgr.read_fragment_violations(f).to_pandas() for f in all_frags]
    parts += [mgr.read_global("unique-doc-id").to_pandas(),
              mgr.read_global("fk-missing").to_pandas()]
    allv = pd.concat(parts, ignore_index=True)
    allv = allv.sort_values(["doc_id", "rule", "path"]).reset_index(drop=True)

    manifests = {m["fragment_id"]: m
                 for m in mgr.fragment_manifests(set(all_frags))}
    verdicts = pa.Table.from_pydict({
        "fragment_id": all_frags,
        "pass": [manifests[f]["pass"] for f in all_frags],
        "n_rows": [manifests[f]["n_rows"] for f in all_frags],
        "n_violations": [manifests[f]["n_violations"] for f in all_frags],
    })
    from ..schema import VIOLATIONS

    return {
        "violations": pa.Table.from_pandas(allv, preserve_index=False,
                                           schema=VIOLATIONS),
        "verdicts": verdicts,
        "processed_fragments": todo,
        "skipped_fragments": sorted(done),
        "run_manifest": mgr.run_manifest(set(all_frags)),
    }
