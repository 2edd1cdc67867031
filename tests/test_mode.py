"""Grouped mode with deterministic min-value tie-break: ROW_NUMBER
oracle parity, explicit tie case, events-table check, invariance."""

import duckdb
import numpy as np
import pandas as pd
import ray.data as rd

from cerberus_ray.stages.groupagg import mode_by

SF = "/root/testdata/sf0.001"

SQL = """
WITH c AS (SELECT {g} AS g, {v} AS v, CAST(COUNT(*) AS BIGINT) AS n
           FROM {src} GROUP BY 1, 2),
r AS (SELECT g, v, n, ROW_NUMBER() OVER
        (PARTITION BY g ORDER BY n DESC, v ASC) AS rn FROM c)
SELECT g, v, n FROM r WHERE rn = 1 ORDER BY g
"""


def test_duckdb_parity_synthetic(ray_session):
    rng = np.random.default_rng(21)
    df = pd.DataFrame({"g": rng.choice(["a", "b", "c", "d"], 1000),
                       "v": rng.integers(0, 12, 1000)})
    got = mode_by(rd.from_pandas(df, override_num_blocks=7), "g", "v")
    want = duckdb.sql(SQL.format(g="g", v="v", src="df")).fetchdf()
    assert got["g"].tolist() == want["g"].tolist()
    assert got["v"].astype("int64").tolist() == want["v"].tolist()
    assert got["n"].tolist() == want["n"].tolist()


def test_tie_breaks_to_smallest_value(ray_session):
    df = pd.DataFrame({"g": ["x"] * 4, "v": [9, 9, 2, 2]})
    got = mode_by(rd.from_pandas(df, override_num_blocks=2), "g", "v")
    assert got.values.tolist() == [["x", 2, 2]]


def test_events_modal_hour(ray_session):
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{SF}/events.parquet')")
    want = con.execute(SQL.format(
        g="event_type", v="CAST(EXTRACT(hour FROM ts) AS BIGINT)",
        src="events")).fetchdf()
    ev = rd.read_parquet(f"{SF}/events.parquet",
                         columns=["event_type", "ts"])

    import pyarrow as pa
    import pyarrow.compute as pc

    def add_hour(b: pa.Table) -> pa.Table:
        return pa.Table.from_pydict({
            "event_type": b["event_type"],
            "hour": pc.cast(pc.hour(b["ts"]), pa.int64())})

    got = mode_by(ev.map_batches(add_hour, batch_format="pyarrow",
                                 zero_copy_batch=True),
                  "event_type", "hour")
    assert got["event_type"].tolist() == want["g"].tolist()
    assert got["hour"].tolist() == want["v"].tolist()
    assert got["n"].tolist() == want["n"].tolist()


def test_partition_invariance(ray_session):
    rng = np.random.default_rng(5)
    df = pd.DataFrame({"g": rng.choice(list("pqrs"), 500),
                       "v": rng.integers(0, 6, 500)})
    outs = [mode_by(rd.from_pandas(df, override_num_blocks=b), "g", "v")
            for b in (1, 9)]
    pd.testing.assert_frame_equal(outs[0], outs[1])
