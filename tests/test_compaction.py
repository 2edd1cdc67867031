"""Partition compaction: footer-only planning, row preservation per
partition, file-count reduction, and marker-gated resume."""

import os

import pandas as pd
import pyarrow.parquet as pq

from cerberus_ray.stages.compaction import compact_dataset, plan_compaction


def _fragmented_hive(ray_session, tmp_path, n=3000, blocks=24):
    import ray.data as rd

    df = pd.DataFrame({
        "k": range(n),
        "lang": [["en", "de", "fr"][i % 3] for i in range(n)],
        "v": [i * 0.5 for i in range(n)],
    })
    src = str(tmp_path / "src")
    rd.from_pandas(df).repartition(blocks).write_parquet(
        src, partition_cols=["lang"])
    return src, df


def test_plan_is_footer_only_and_counts_rows(ray_session, tmp_path):
    src, df = _fragmented_hive(ray_session, tmp_path)
    plan = plan_compaction(src, target_rows_per_file=1000)
    assert sorted(p["partition"] for p in plan) == [
        "lang=de", "lang=en", "lang=fr"]
    assert sum(p["rows"] for p in plan) == len(df)
    assert all(p["files_before"] > p["files_target"] for p in plan)


def test_compact_preserves_rows_and_reduces_files(ray_session, tmp_path):
    src, df = _fragmented_hive(ray_session, tmp_path)
    out = str(tmp_path / "out")
    summary = compact_dataset(src, out,
                              target_rows_per_file=1000).to_pandas()
    assert (summary["files_after"] < summary["files_before"]).all()
    assert not summary["skipped"].any()
    # hive partition columns are not stored in the files; rows survive
    # per partition
    for rel in summary["partition"]:
        lang = rel.split("=")[1]
        got = pq.read_table(os.path.join(out, rel)).to_pandas()
        want = df[df.lang == lang]
        assert sorted(got["k"]) == sorted(want["k"])


def test_resume_skips_finished_partitions(ray_session, tmp_path):
    src, _ = _fragmented_hive(ray_session, tmp_path)
    out = str(tmp_path / "out")
    compact_dataset(src, out, target_rows_per_file=1000)
    before = {rel: sorted(os.listdir(os.path.join(out, rel)))
              for rel in os.listdir(out)}
    summary2 = compact_dataset(src, out,
                               target_rows_per_file=1000).to_pandas()
    assert summary2["skipped"].all()
    after = {rel: sorted(os.listdir(os.path.join(out, rel)))
             for rel in os.listdir(out)}
    assert before == after  # untouched, not rewritten


def test_sort_by_clusters_rows_for_pruning(ray_session, tmp_path):
    import numpy as np
    import ray.data as rd

    from cerberus_ray.stages.layout import rowgroups_overlapping

    rng = np.random.default_rng(5)
    n = 3000
    df = pd.DataFrame({
        "k": range(n),
        "lang": [["en", "de", "fr"][i % 3] for i in range(n)],
        "v": rng.permutation(n).astype("float64"),  # scattered in row order
    })
    src = str(tmp_path / "src")
    rd.from_pandas(df).repartition(24).write_parquet(
        src, partition_cols=["lang"])
    plain, clustered = str(tmp_path / "plain"), str(tmp_path / "clus")
    compact_dataset(src, plain, target_rows_per_file=250)
    summary = compact_dataset(src, clustered, target_rows_per_file=250,
                              sort_by=["v"]).to_pandas()
    # clustering never changes the row set
    for rel in summary["partition"]:
        lang = rel.split("=")[1]
        got = pq.read_table(os.path.join(clustered, rel)).to_pandas()
        assert sorted(got["k"]) == sorted(df[df.lang == lang]["k"])
    # ... but tightens v-statistics: a v-band scan prunes row groups
    band = {"v": (1200.0, 1400.0)}
    tot_p, hit_p = rowgroups_overlapping(plain, band)
    tot_c, hit_c = rowgroups_overlapping(clustered, band)
    assert hit_c / tot_c < hit_p / tot_p, (hit_c, tot_c, hit_p, tot_p)


def test_flat_directory_compacts_as_one_partition(ray_session, tmp_path):
    import ray.data as rd

    src, out = str(tmp_path / "flat"), str(tmp_path / "flat_out")
    rd.range(5000).repartition(20).write_parquet(src)
    summary = compact_dataset(src, out,
                              target_rows_per_file=2500).to_pandas()
    assert summary["partition"].tolist() == ["."]
    assert summary["files_after"].tolist()[0] <= 3
    assert pq.read_table(out).num_rows == 5000
