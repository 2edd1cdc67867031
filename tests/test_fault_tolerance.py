"""Fault tolerance: injected per-task failures recover under Ray's
retry machinery and reproduce the fault-free output exactly.

The 100-TB contract is that a flaky stage (OOM-killed worker, transient
I/O error) re-executes its task without corrupting results. Application
exceptions are NOT retried by default (``max_errored_blocks = 0`` fails
the job — the right default: silent data loss is worse than a crash);
opting a stage into retries is ``retry_exceptions=True, max_retries=N``
passed straight through ``map_batches``'s remote-args kwargs. These tests pin
both behaviors and the exactly-once output semantics under retry."""

import os
import uuid

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray
import ray.data as rd


def _flaky_factory(marker_dir: str):
    """A batch fn that fails the FIRST attempt of every task (marker
    file keyed by the batch's first row id) and succeeds on retry."""
    def flaky(b: pa.Table) -> pa.Table:
        key = int(b["k"][0].as_py())
        marker = os.path.join(marker_dir, f"attempt_{key}")
        if not os.path.exists(marker):
            with open(marker, "w"):
                pass
            raise RuntimeError("injected transient failure")
        return b.append_column(
            "double", pa.array(
                b["k"].to_numpy(zero_copy_only=False) * 2, pa.int64()))
    return flaky


def test_retry_exceptions_reproduces_clean_output(ray_session, tmp_path):
    df = pd.DataFrame({"k": np.arange(1000, dtype=np.int64)})
    ds = rd.from_pandas(df, override_num_blocks=8)
    out = (ds.map_batches(_flaky_factory(str(tmp_path)),
                          batch_format="pyarrow",
                          retry_exceptions=True, max_retries=3)
           .to_pandas().sort_values("k").reset_index(drop=True))
    # every task failed once (one marker per executed task) and retried
    assert len(os.listdir(tmp_path)) >= 1
    want = df.assign(double=df["k"] * 2)
    pd.testing.assert_frame_equal(out, want)


def test_unretried_exception_fails_loudly(ray_session, tmp_path):
    # without opting in, an application exception fails the job — no
    # silent row drops
    def always_fail(b: pa.Table) -> pa.Table:
        raise RuntimeError("permanent failure")

    ds = rd.from_pandas(pd.DataFrame({"k": [1, 2, 3]}))
    with pytest.raises(Exception):
        ds.map_batches(always_fail, batch_format="pyarrow").to_pandas()


def test_flagship_pipeline_survives_injected_failure(ray_session,
                                                     tmp_path):
    """End-to-end: a flaky pre-stage ahead of the flagship rule engine
    retries into the exact fault-free violation set."""
    from cerberus_ray.datagen import GenConfig, docs_dataset
    from cerberus_ray.rules.row_rules import interleaved_ruleset
    from cerberus_ray.stages.validate import validate

    cfg = GenConfig(n_docs=500, n_media=100)
    rules = interleaved_ruleset()
    docs = docs_dataset(cfg, fragment_size=250).materialize()
    clean = validate(docs, rules).to_pandas()

    run_id = uuid.uuid4().hex

    def flaky_passthrough(b: pa.Table) -> pa.Table:
        key = str(b["doc_id"][0].as_py()).replace("/", "_")
        marker = os.path.join(str(tmp_path), f"{run_id}_{key}")
        if not os.path.exists(marker):
            with open(marker, "w"):
                pass
            raise RuntimeError("injected")
        return b

    flaky_docs = docs.map_batches(
        flaky_passthrough, batch_format="pyarrow",
        retry_exceptions=True, max_retries=3)
    got = validate(flaky_docs, rules).to_pandas()
    cols = list(clean.columns)
    a = clean.sort_values(cols).reset_index(drop=True)
    b = got.sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    assert len(os.listdir(tmp_path)) >= 1   # failures really happened
