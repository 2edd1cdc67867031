"""Regression tests for the round-5 profiling-family review findings:
typed-det FD repair, NULL-dep violation counting, empty-string distinct
merge, NULL-group aggregates, dtype-preserving grouped quantiles,
null-skipping grouped HLL, NULL-aware inclusion, and the
relationship-profile shuffle path."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd


def test_fd_repair_float_bool_and_null_dets(ray_session):
    """Driver-side and batch-side composite keys must agree for float,
    bool, and NULL determinant components (pandas str formatting used
    to differ from the Arrow cast, silently skipping every repair)."""
    from cerberus_ray.stages.profile import fd_repair, fd_violations

    df = pd.DataFrame({
        "doc_id": range(6),
        "det_f": [1.0, 1.0, 2.5, 2.5, None, None],
        "det_b": [True, True, False, False, True, True],
        "dep": ["a", "b", "c", "c", "x", "y"],
    })
    ds = rd.from_pandas(df, override_num_blocks=2)
    repaired, log = fd_repair(ds, ["det_f", "det_b"], "dep",
                              key_col="doc_id")
    out = repaired.to_pandas().sort_values("doc_id")
    # group (1.0, True): majority tie a/b → smallest 'a' wins both rows
    assert list(out["dep"][:2]) == ["a", "a"]
    # group (None, True): tie x/y → 'x'
    assert list(out["dep"][4:]) == ["x", "x"]
    assert len(log) == 2  # one 'b'→'a' rewrite + one 'y'→'x'
    v = fd_violations(rd.from_arrow(pa.Table.from_pandas(
        out, preserve_index=False)), ["det_f", "det_b"], "dep")
    assert len(v) == 0


def test_fd_violations_counts_null_dep_as_value(ray_session):
    """det → {NULL, x} is a violation (fd_profile counts it; this stage
    used nunique(dropna=True) and silently missed it)."""
    from cerberus_ray.stages.profile import fd_profile, fd_violations

    df = pd.DataFrame({"det": ["a", "a", "b"],
                       "dep": [None, "x", "y"]})
    ds = rd.from_pandas(df)
    prof = fd_profile(rd.from_pandas(df), [(["det"], "dep")])
    assert not bool(prof["fd_holds"][0])
    v = fd_violations(rd.from_pandas(df), ["det"], "dep")
    assert len(v) == 1 and v["det"][0] == "a"
    assert int(v["n_dep_values"][0]) == 2


def test_completeness_counts_empty_string_distinct(ray_session):
    """'' is a value: an all-empty-string column has n_distinct 1 (the
    old merge encoding collapsed it with the no-values marker)."""
    from cerberus_ray.stages.stats import completeness_report

    df = pd.DataFrame({"s": ["", "", "a", ""]})
    out = completeness_report(rd.from_pandas(df, override_num_blocks=2),
                              cols=["s"])
    assert int(out["n_distinct"][0]) == 2
    df2 = pd.DataFrame({"s": ["", "", ""]})
    out2 = completeness_report(rd.from_pandas(df2), cols=["s"])
    assert int(out2["n_distinct"][0]) == 1


def test_mode_by_keeps_null_group(ray_session):
    from cerberus_ray.stages.groupagg import mode_by

    df = pd.DataFrame({"g": ["a", None, None, None],
                       "v": ["x", "y", "y", "z"]})
    out = mode_by(rd.from_pandas(df), "g", "v")
    assert len(out) == 2  # the NULL group is a group (SQL GROUP BY)
    null_row = out[out["g"].isna()]
    assert list(null_row["v"]) == ["y"] and list(null_row["n"]) == [2]


def test_grouped_quantiles_preserve_group_dtype(ray_session):
    from cerberus_ray.stages.groupagg import approx_quantiles_by_group

    df = pd.DataFrame({"g": [2] * 50 + [10] * 50,
                       "v": list(range(50)) * 2})
    out = approx_quantiles_by_group(
        rd.from_pandas(df, override_num_blocks=3), "g", "v", qs=(0.5,))
    # numeric order (2 before 10), original dtype — not '10' < '2'
    assert list(out["g"]) == [2, 10]
    assert out["g"].dtype.kind in "iu"


def test_grouped_hll_skips_null_values(ray_session):
    from cerberus_ray.stages.groupagg import grouped_approx_distinct

    df = pd.DataFrame({"g": ["a"] * 4 + ["b"] * 2,
                       "v": [1.0, 2.0, None, None, None, None]})
    out = grouped_approx_distinct(rd.from_pandas(df), "g", "v", p=12)
    est = dict(zip(out["g"], out["approx_distinct"]))
    assert round(est["a"]) == 2          # NULLs not counted as a value
    assert est["b"] == 0.0               # all-null group still reported


def test_spearman_keeps_null_group(ray_session):
    from cerberus_ray.stages.stats import spearman_by_group

    df = pd.DataFrame({
        "g": ["a"] * 5 + [None] * 5,
        "x": list(range(5)) * 2,
        "y": list(range(5)) + list(range(5, 0, -1)),
    })
    out = spearman_by_group(rd.from_pandas(df), "g", "x", "y")
    assert len(out) == 2
    null_rho = out[out["g"].isna()]["rho"].iloc[0]
    assert null_rho == -1.0


def test_kmv_sketch_float_column(ray_session):
    from cerberus_ray.stages.profile import inclusion_sketch_profile

    a = rd.from_pandas(pd.DataFrame({"k": [1.5, 2.5, 3.5]}))
    b = rd.from_pandas(pd.DataFrame({"k": [1.5, 2.5, 3.5, 4.5]}))
    out = inclusion_sketch_profile([("f", a, "k", b, "k")], k=64)
    assert float(out["est_containment"][0]) == 1.0


def test_inclusion_null_fk_surfaces(ray_session):
    """A NULL in the child column must profile as containment < 1 even
    when the parent column ALSO contains a NULL (SQL: NULL matches
    nothing)."""
    from cerberus_ray.stages.profile import inclusion_profile

    a = rd.from_pandas(pd.DataFrame({"fk": [1, 2, None]}))
    b = rd.from_pandas(pd.DataFrame({"pk": [1, 2, None]}))
    out = inclusion_profile([("p", a, "fk", b, "pk")])
    assert int(out["n_missing"][0]) == 1
    assert not bool(out["is_subset"][0])


def test_relationship_profile_mode_agreement(ray_session):
    from cerberus_ray.stages.profile import relationship_profile

    child = pd.DataFrame({"fk": [1, 1, 2, 2, 2, None, 9]})
    parent = pd.DataFrame({"pk": [1, 2, 3]})
    a = relationship_profile(rd.from_pandas(child), "fk",
                             rd.from_pandas(parent), "pk", mode="driver")
    b = relationship_profile(rd.from_pandas(child), "fk",
                             rd.from_pandas(parent), "pk",
                             mode="shuffle")
    assert a == b
    assert a["class"] == "N:1" and a["n_orphans"] == 1
    assert a["n_null_fk"] == 1
