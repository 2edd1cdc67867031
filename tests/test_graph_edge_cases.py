"""Regression tests for the round-5 graph-family review findings:
64-bit node ids in the triangle closing-edge test, null-endpoint
phantom nodes, driver/shuffle BFS contract agreement, Inf coordinates
in grid DBSCAN, and slow-mixing pagerank defaults."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd


def test_triangles_64bit_node_ids(ray_session):
    """Ids ≥ 2^32 used to collide in the 32-bit packed closing-edge
    key — a triangle-free graph counted 1 triangle."""
    from cerberus_ray.pipelines.triangles import triangle_count

    big = 2 ** 32 + 5
    edges = [(0, 1), (0, 5), (0, big)]
    # pendant edges give 1 and 5 higher degree than 0 so the wedge
    # (1, 5) forms at hub 0 and probes the packed key space
    edges += [(1, 100 + i) for i in range(3)]
    edges += [(5, 200 + i) for i in range(3)]
    df = pd.DataFrame(edges, columns=["src", "dst"])
    out = triangle_count(rd.from_pandas(df).materialize(), mode="driver")
    assert out["n_triangles"] == 0
    # and a REAL triangle containing the big id is still found
    df2 = pd.DataFrame([(1, 2), (2, big), (1, big)],
                       columns=["src", "dst"])
    out2 = triangle_count(rd.from_pandas(df2).materialize(),
                          mode="driver")
    assert out2["n_triangles"] == 1


def test_null_edge_endpoints_are_dropped(ray_session):
    """A null endpoint is NO edge — not the phantom node INT64_MIN
    bridging every null-FK row."""
    import pyarrow as pa

    from cerberus_ray.pipelines.bfs import hop_distance
    from cerberus_ray.pipelines.kcore import core_decomposition
    from cerberus_ray.pipelines.triangles import triangle_count

    t = pa.table({
        "src": pa.array([1, 2, None, None, 7], pa.int64()),
        "dst": pa.array([2, 3, 9, None, None], pa.int64())})
    ds = rd.from_arrow(t).materialize()
    tri = triangle_count(ds, mode="driver")
    assert tri["n_nodes"] == 3 and tri["n_edges"] == 2
    core = core_decomposition(ds, mode="driver")
    assert set(core["node"]) == {1, 2, 3}
    d = hop_distance(ds, 1, mode="driver")
    # nodes 9 and 7 must NOT be reachable through a phantom null node
    assert set(d["node"]) == {1, 2, 3}


def test_bfs_driver_raises_on_max_rounds(ray_session):
    """Driver mode honors the raise-on-non-convergence contract the
    shuffle mode already had (no silently partial distances)."""
    from cerberus_ray.pipelines.bfs import hop_distance

    n = 30
    df = pd.DataFrame({"src": range(n - 1), "dst": range(1, n)})
    ds = rd.from_pandas(df).materialize()
    with pytest.raises(RuntimeError, match="max_rounds"):
        hop_distance(ds, 0, mode="driver", max_rounds=5)
    full = hop_distance(ds, 0, mode="driver", max_rounds=50)
    assert len(full) == n and int(full["dist"].max()) == n - 1


def test_grid_dbscan_inf_rows_are_noise(ray_session):
    from cerberus_ray.pipelines.griddbscan import grid_density_clusters

    rng = np.random.default_rng(0)
    df = pd.DataFrame({
        "x": np.r_[rng.normal(0, 0.1, 30), [np.inf] * 10],
        "y": np.r_[rng.normal(0, 0.1, 30), rng.normal(5, 0.1, 10)]})
    labeled, summary = grid_density_clusters(
        rd.from_pandas(df).materialize(), ["x", "y"], eps=1.0,
        min_pts=5)
    lab = labeled.to_pandas()
    assert (lab.loc[~np.isfinite(df["x"]), "cluster"] == -1).all()


def test_pagerank_slow_mixing_defaults_converge(ray_session):
    """Hub-and-spoke graphs contract at ~damping per round; the default
    round budget must cover the tol=1e-10 floor (the old 100 raised)."""
    from cerberus_ray.pipelines.pagerank import pagerank

    n = 120
    edges = [(i, 0) for i in range(1, n)] + [(0, 1)]
    df = pd.DataFrame(edges, columns=["src", "dst"])
    out = pagerank(rd.from_pandas(df).materialize())
    assert abs(out["rank"].sum() - 1.0) < 1e-6
    top = out.sort_values("rank", ascending=False).iloc[0]["node"]
    assert int(top) == 0   # the hub dominates
