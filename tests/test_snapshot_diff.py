"""Snapshot diff: DuckDB FULL-OUTER-JOIN parity, driver/shuffle mode
agreement, and the bounded summary rollup."""

import duckdb
import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from cerberus_ray.pipelines.snapshot_diff import (snapshot_diff,
                                                  snapshot_diff_summary)

SQL = """
SELECT COALESCE(a.doc_id, b.doc_id) AS key,
       CASE WHEN a.doc_id IS NULL THEN 'added'
            WHEN b.doc_id IS NULL THEN 'removed'
            WHEN a.text <> b.text THEN 'changed'
            ELSE 'unchanged' END AS status
FROM a FULL OUTER JOIN b ON a.doc_id = b.doc_id
ORDER BY key
"""


def snapshots(n=300, seed=5):
    rng = np.random.default_rng(seed)
    a = pd.DataFrame({"doc_id": [f"d{i:04d}" for i in range(n)],
                      "text": [f"text body number {i} stable words"
                               for i in range(n)]})
    b = a.copy()
    b = b[~b["doc_id"].isin([f"d{i:04d}" for i in range(0, n, 7)])]  # removed
    changed = [f"d{i:04d}" for i in range(3, n, 11)
               if i % 7 != 0]
    b.loc[b["doc_id"].isin(changed), "text"] += " EDITED"
    new = pd.DataFrame({"doc_id": [f"n{i:03d}" for i in range(17)],
                        "text": [f"brand new doc {i}" for i in range(17)]})
    return a, pd.concat([b, new], ignore_index=True)


def oracle(a, b):
    con = duckdb.connect()
    con.register("a", a)
    con.register("b", b)
    return con.execute(SQL).df()


@pytest.mark.parametrize("mode", ["driver", "shuffle"])
def test_duckdb_full_outer_parity(ray_session, mode):
    a, b = snapshots()
    got = snapshot_diff(rd.from_pandas(a).repartition(4).materialize(),
                        rd.from_pandas(b).repartition(3).materialize(),
                        mode=mode).to_pandas()
    got = got.sort_values("key").reset_index(drop=True)
    exp = oracle(a, b)
    pd.testing.assert_frame_equal(got, exp)


def test_report_pin_sf0001(ray_session):
    """Driver-surface pin: the perturbation arithmetic is exact —
    500 docs, ids%13 removed (39), ids%17 edited minus the 3 overlaps
    (27), 20 synthetic adds."""
    from cerberus_ray.pipelines.training_queries import q_snapshot_diff_report

    t = q_snapshot_diff_report("/root/testdata/sf0.001").to_pydict()
    assert t == {"status": ["added", "changed", "removed", "unchanged"],
                 "n_docs": [20, 27, 39, 434]}


def test_summary_counts(ray_session):
    a, b = snapshots()
    t = snapshot_diff_summary(rd.from_pandas(a).materialize(),
                              rd.from_pandas(b).materialize()).to_pydict()
    exp = oracle(a, b)["status"].value_counts().sort_index()
    assert t == {"status": list(exp.index),
                 "n_docs": [int(v) for v in exp.to_numpy()]}
    with pytest.raises(ValueError):
        snapshot_diff(rd.from_pandas(a), rd.from_pandas(b), mode="bogus")
