"""PageRank: exact linear-solve parity, analytic ring uniformity,
dangling-node mass conservation, driver/shuffle mode agreement."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from cerberus_ray.pipelines.pagerank import pagerank


def _edges_ds(edges, blocks=3):
    df = pd.DataFrame(edges, columns=["src", "dst"])
    return rd.from_pandas(df, override_num_blocks=blocks)


def _exact(edges, d):
    """Independent reference: solve the stationary system directly.
    new = (1-d)/n + d*(M r + dangling_mass/n)  =>  (I - dK) r = (1-d)/n."""
    nodes = sorted({v for e in edges for v in e})
    ix = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    out = np.zeros(n)
    for s, _ in edges:
        out[ix[s]] += 1
    M = np.zeros((n, n))
    for s, t in edges:
        M[ix[t], ix[s]] += 1.0 / out[ix[s]]
    K = M + np.outer(np.ones(n), (out == 0).astype(float)) / n
    r = np.linalg.solve(np.eye(n) - d * K, np.full(n, (1 - d) / n))
    return nodes, r


GRAPH = [("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"), ("d", "c"),
         ("e", "a"), ("e", "d"), ("c", "f")]  # f is dangling


def test_exact_solve_parity(ray_session):
    got = pagerank(_edges_ds(GRAPH), damping=0.85, tol=1e-13,
                   max_rounds=2000)
    nodes, want = _exact(GRAPH, 0.85)
    assert got["node"].tolist() == nodes
    np.testing.assert_allclose(got["rank"].to_numpy(), want, atol=1e-10)
    assert abs(got["rank"].sum() - 1.0) < 1e-12


def test_ring_is_uniform(ray_session):
    ring = [(str(i), str((i + 1) % 7)) for i in range(7)]
    got = pagerank(_edges_ds(ring), damping=0.85, tol=1e-13,
                   max_rounds=2000)
    np.testing.assert_allclose(got["rank"].to_numpy(), np.full(7, 1 / 7),
                               atol=1e-12)


def test_dangling_mass_conserved(ray_session):
    # star: every leaf points at a dangling center
    star = [(f"leaf{i}", "center") for i in range(5)]
    got = pagerank(_edges_ds(star), damping=0.85, tol=1e-13,
                   max_rounds=2000)
    assert abs(got["rank"].sum() - 1.0) < 1e-12
    center = float(got.loc[got["node"] == "center", "rank"].iloc[0])
    leaf = float(got.loc[got["node"] == "leaf0", "rank"].iloc[0])
    assert center > leaf
    nodes, want = _exact(star, 0.85)
    np.testing.assert_allclose(
        got.set_index("node").loc[nodes, "rank"].to_numpy(), want,
        atol=1e-10)


def test_mode_agreement(ray_session):
    a = pagerank(_edges_ds(GRAPH), damping=0.5, tol=1e-4, max_rounds=100,
                 mode="driver")
    b = pagerank(_edges_ds(GRAPH), damping=0.5, tol=1e-4, max_rounds=100,
                 mode="shuffle")
    pd.testing.assert_frame_equal(a, b, check_exact=False, atol=1e-12)


def test_nonconvergence_raises(ray_session):
    with pytest.raises(RuntimeError, match="did not converge"):
        pagerank(_edges_ds(GRAPH), damping=0.85, tol=1e-15, max_rounds=2)


def test_larger_random_graph_matches_exact(ray_session):
    rng = np.random.default_rng(5)
    edges = list({(str(a), str(b)) for a, b in
                  zip(rng.integers(0, 60, 400), rng.integers(0, 60, 400))
                  if a != b})
    got = pagerank(_edges_ds(edges, blocks=5), damping=0.85, tol=1e-13,
                   max_rounds=5000)
    nodes, want = _exact(edges, 0.85)
    np.testing.assert_allclose(
        got.set_index("node").loc[nodes, "rank"].to_numpy(), want,
        atol=1e-9)


def test_null_endpoints_dropped(ray_session):
    df = pd.DataFrame({"src": ["a", "b", None], "dst": ["b", None, "a"]})
    got = pagerank(rd.from_pandas(df), damping=0.5, tol=1e-10,
                   max_rounds=200)
    assert got["node"].tolist() == ["a", "b"]
    assert abs(got["rank"].sum() - 1.0) < 1e-12
