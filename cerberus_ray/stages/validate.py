"""Stateless row-local validation stage.

``validate(ds, ruleset)`` maps the RuleSet's vectorized row rules over
zero-copy Arrow batches; output is a stream of violation rows. No shuffle,
no state — Ray Data schedules it as elastic stateless tasks and pipelines
it with the read (SURVEY.md §7 step 1).

If the input carries a ``fragment_id`` column, violations keep it so
per-partition verdicts can be computed without re-keying (north_rule:
per-partition pass/fail). ``assign_fragments`` adds a deterministic
hash-based fragment id when the source has none.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..determinism import hash_strings
from ..rules.core import RuleSet

FRAGMENT_COL = "fragment_id"


def assign_fragments(ds, key_col: str, n_fragments: int):
    """Deterministically bucket rows into fragments by hashing key_col."""

    def add(batch: pa.Table) -> pa.Table:
        keys = batch[key_col]
        if not pa.types.is_string(keys.type):
            keys = pc.cast(keys, pa.string())
        h = hash_strings(keys.to_numpy(zero_copy_only=False))
        frag = np.char.mod("frag-%04d", (h % np.uint64(n_fragments)).astype(np.int64))
        return batch.append_column(FRAGMENT_COL, pa.array(frag.astype(object)))

    return ds.map_batches(add, batch_format="pyarrow", zero_copy_batch=True)


def validate(ds, ruleset: RuleSet, *, batch_size: int = 65536):
    """ds -> Dataset of violation rows (+ fragment_id when input has it)."""
    has_frag = FRAGMENT_COL in ds.schema().names

    def run(batch: pa.Table) -> pa.Table:
        if not has_frag:
            return ruleset.evaluate(batch)
        out = []
        frags = batch[FRAGMENT_COL]
        for fv in pc.unique(frags):  # typically 1-2 fragments per block
            sub = batch.filter(pc.equal(frags, fv))
            v = ruleset.evaluate(sub)
            out.append(v.append_column(
                FRAGMENT_COL, pa.array([fv.as_py()] * v.num_rows, type=pa.string())))
        return pa.concat_tables(out)

    return ds.map_batches(run, batch_format="pyarrow", batch_size=batch_size,
                          zero_copy_batch=True)


def fragment_verdicts(input_ds, violations_ds) -> pa.Table:
    """Per-fragment verdict rows (fragment_id, pass, n_rows, n_violations).

    Both aggregates are map-side partial counts → tiny shuffle of partials;
    the join of the two small results happens on the driver (≤ #fragments
    rows). Mirrors the reference's per-save atomic accept/reject, lifted to
    partition granularity (north_rule).
    """
    rows = input_ds.groupby(FRAGMENT_COL).count().to_pandas()
    rows = rows.rename(columns={"count()": "n_rows"})
    nv = violations_ds.groupby(FRAGMENT_COL).count().to_pandas()
    nv = nv.rename(columns={"count()": "n_violations"})
    if FRAGMENT_COL not in nv.columns:  # no violations at all → empty frame
        import pandas as pd

        nv = pd.DataFrame({FRAGMENT_COL: [], "n_violations": []})
    merged = rows.merge(nv, on=FRAGMENT_COL, how="left")
    merged["n_violations"] = merged["n_violations"].fillna(0).astype("int64")
    merged["pass"] = merged["n_violations"] == 0
    merged = merged.sort_values(FRAGMENT_COL).reset_index(drop=True)
    return pa.Table.from_pandas(
        merged[[FRAGMENT_COL, "pass", "n_rows", "n_violations"]],
        preserve_index=False,
    )
