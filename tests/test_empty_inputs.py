"""Every core stage must handle empty inputs without error (driver edge:
empty partitions / fully-filtered streams)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from cerberus_ray.schema import DOCUMENTS_INTERLEAVED, MEDIA_CATALOG


def empty_docs():
    return rd.from_arrow(DOCUMENTS_INTERLEAVED.empty_table())


def test_validate_empty(ray_session):
    from cerberus_ray.rules.row_rules import interleaved_ruleset
    from cerberus_ray.stages.validate import validate

    assert validate(empty_docs(), interleaved_ruleset()).count() == 0


def test_uniqueness_empty(ray_session):
    from cerberus_ray.stages.uniqueness import duplicate_key_counts

    for mode in ["driver", "hash", "cms"]:
        out = duplicate_key_counts(empty_docs(), ["doc_id"], mode=mode)
        assert out.num_rows == 0, mode
        assert out.schema.names == ["doc_id", "n"], mode


def test_referential_empty_child(ray_session):
    from cerberus_ray.datagen import GenConfig, media_dataset
    from cerberus_ray.stages.referential import (
        referential_violations,
        span_media_keys,
    )

    media = media_dataset(GenConfig(n_docs=1, n_media=10))
    out = referential_violations(empty_docs(), media, extract=span_media_keys,
                                 parent_key="media_ref")
    assert out.count() == 0


def test_referential_empty_parent(ray_session):
    from cerberus_ray.datagen import GenConfig, docs_dataset
    from cerberus_ray.stages.referential import (
        referential_violations,
        span_media_keys,
    )

    docs = docs_dataset(GenConfig(n_docs=50, fractions={}))
    empty_media = rd.from_arrow(MEDIA_CATALOG.empty_table())
    out = referential_violations(docs, empty_media, extract=span_media_keys,
                                 parent_key="media_ref").to_pandas()
    # every media ref is missing when the parent table is empty
    assert len(out) > 0
    assert (out["rule"] == "fk-missing").all()


def test_dedup_empty(ray_session):
    from cerberus_ray.pipelines.dedup import (
        exact_dup_stats,
        minhash_near_dup_pairs,
        simhash_near_dup_pairs,
    )

    empty = rd.from_pandas(pd.DataFrame({"doc_id": pd.Series(dtype=str),
                                         "text": pd.Series(dtype=str)}))
    assert exact_dup_stats(empty).to_pandas()["n_docs"][0] == 0
    assert minhash_near_dup_pairs(empty).num_rows == 0
    assert simhash_near_dup_pairs(empty).num_rows == 0


def test_drift_empty_profile(ray_session):
    from cerberus_ray.stages.drift import drift_violations, profile_dataset

    empty = rd.from_pandas(pd.DataFrame({"v": pd.Series(dtype=float)}))
    p = profile_dataset(empty, numeric=["v"])
    full = profile_dataset(
        rd.from_pandas(pd.DataFrame({"v": np.arange(100.0)})), numeric=["v"])
    v = drift_violations(p, full)
    assert v.num_rows == 0  # empty side yields nan stats → no verdict


def test_grouped_agg_empty(ray_session):
    from cerberus_ray.stages.groupagg import grouped_agg

    empty = rd.from_pandas(pd.DataFrame({"g": pd.Series(dtype=str),
                                         "v": pd.Series(dtype=float)}))
    out = grouped_agg(empty, ["g"], {"n": ("", "count"), "s": ("v", "sum")})
    assert len(out) == 0
    assert list(out.columns) == ["g", "n", "s"]


def test_new_queries_empty_safe(ray_session, tmp_path):
    """events_quantiles / top_orders_per_nation on EMPTY tables return
    typed empty results (an all-empty Dataset loses its schema)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = str(tmp_path)
    pq.write_table(pa.Table.from_pydict(
        {"event_id": pa.array([], pa.int64()),
         "event_type": pa.array([], pa.string()),
         "user_id": pa.array([], pa.int64()),
         "value": pa.array([], pa.float64())}), f"{d}/events.parquet")
    pq.write_table(pa.Table.from_pydict(
        {"o_orderkey": pa.array([], pa.int64()),
         "o_custkey": pa.array([], pa.int64()),
         "o_totalprice": pa.array([], pa.float64())}), f"{d}/orders.parquet")
    pq.write_table(pa.Table.from_pydict(
        {"c_custkey": pa.array([], pa.int64()),
         "c_nationkey": pa.array([], pa.int64())}), f"{d}/customer.parquet")
    pq.write_table(pa.Table.from_pydict(
        {"n_nationkey": pa.array([], pa.int64()),
         "n_name": pa.array([], pa.string())}), f"{d}/nation.parquet")

    from cerberus_ray.pipelines.relational import q_events_quantiles
    from cerberus_ray.pipelines.relational2 import q_top_orders_per_nation

    assert q_events_quantiles(d).num_rows == 0
    assert q_top_orders_per_nation(d).num_rows == 0


def test_keyed_window_queries_empty_safe(ray_session, tmp_path):
    """The keyed-window family on an EMPTY events table returns typed
    empty results (bucket column append + groupby on zero rows)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = str(tmp_path)
    pq.write_table(pa.Table.from_pydict(
        {"event_id": pa.array([], pa.int64()),
         "event_type": pa.array([], pa.string()),
         "user_id": pa.array([], pa.int64()),
         "ts": pa.array([], pa.timestamp("us")),
         "value": pa.array([], pa.float64())}), f"{d}/events.parquet")

    from cerberus_ray.pipelines.relational import q_events_close_pairs
    from cerberus_ray.pipelines.relational2 import (
        q_asof_click_before_purchase,
        q_events_rolling_1h,
        q_events_sessions,
    )

    assert q_events_sessions(d).num_rows == 0
    assert q_events_rolling_1h(d).num_rows == 0
    assert q_asof_click_before_purchase(d).num_rows == 0
    assert q_events_close_pairs(d).num_rows == 0
