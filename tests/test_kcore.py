"""k-core decomposition: peeling-reference parity, closed-form graphs,
driver/shuffle mode agreement, dup-edge/self-loop hygiene, unconverged
guard, layout invariance."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from cerberus_ray.pipelines.kcore import core_decomposition


def _peel_reference(edges) -> dict:
    """Textbook min-degree peeling (Batagelj–Zaveršnik semantics)."""
    adj = {}
    for u, v in edges:
        if u == v:
            continue
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    deg = {u: len(ns) for u, ns in adj.items()}
    core, remaining, k = {}, set(adj), 0
    while remaining:
        u = min(remaining, key=lambda x: (deg[x], x))
        k = max(k, deg[u])
        core[u] = k
        remaining.remove(u)
        for v in adj[u]:
            if v in remaining:
                deg[v] -= 1
    return core


def _ds(edges, blocks=3):
    df = pd.DataFrame(edges, columns=["src", "dst"])
    return rd.from_pandas(df, override_num_blocks=min(blocks, len(df)))


def test_closed_form_graphs(ray_session):
    # 5-clique (+dup edges, + a self-loop) → every node core 4
    clique = [(i, j) for i in range(5) for j in range(i + 1, 5)]
    noisy = clique + [(1, 0), (2, 2), (3, 1)]
    got = core_decomposition(_ds(noisy), mode="driver")
    assert list(got["core"]) == [4] * 5

    # 6-cycle → core 2; star → core 1 everywhere
    cyc = [(i, (i + 1) % 6) for i in range(6)]
    assert list(core_decomposition(_ds(cyc), mode="driver")["core"]) \
        == [2] * 6
    star = [(0, i) for i in range(1, 7)]
    assert list(core_decomposition(_ds(star), mode="driver")["core"]) \
        == [1] * 7

    # clique with a pendant chain: chain nodes 1, clique nodes 4
    chain = clique + [(4, 10), (10, 11), (11, 12)]
    g = core_decomposition(_ds(chain), mode="driver").set_index("node")
    assert list(g.loc[[0, 1, 2, 3, 4], "core"]) == [4] * 5
    assert list(g.loc[[10, 11, 12], "core"]) == [1] * 3


def test_random_graph_reference_parity(ray_session):
    rng = np.random.default_rng(11)
    edges = [tuple(e) for e in rng.integers(0, 60, (400, 2)).tolist()]
    want = _peel_reference(edges)
    got = core_decomposition(_ds(edges, blocks=5), mode="driver")
    assert dict(zip(got["node"], got["core"])) == want


def test_mode_agreement_and_layout(ray_session):
    rng = np.random.default_rng(3)
    edges = [tuple(e) for e in rng.integers(0, 40, (250, 2)).tolist()]
    a = core_decomposition(_ds(edges, blocks=1), mode="driver")
    b = core_decomposition(_ds(edges, blocks=6), mode="shuffle",
                           n_buckets=4)
    pd.testing.assert_frame_equal(a, b)


def test_unconverged_guard(ray_session):
    # a long path needs ~length/2 rounds; max_rounds=2 must raise,
    # never return partial labels (the connected-components lesson)
    path = [(i, i + 1) for i in range(14)]
    with pytest.raises(RuntimeError, match="did not converge"):
        core_decomposition(_ds(path), mode="shuffle", max_rounds=2,
                           n_buckets=2)
    ok = core_decomposition(_ds(path), mode="shuffle", max_rounds=30,
                            n_buckets=2)
    assert list(ok["core"]) == [1] * 15


def test_empty_and_self_loops_only(ray_session):
    got = core_decomposition(_ds([(7, 7), (3, 3)]), mode="driver")
    assert len(got) == 0
