"""Grid-density clustering: planted-blob recovery with noise, exact
in-memory reference parity, border assignment, determinism/layout
invariance, guards."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from cerberus_ray.pipelines.griddbscan import grid_density_clusters


def _blobs(n=600, seed=4):
    rng = np.random.default_rng(seed)
    a = rng.normal([0, 0], 0.5, size=(n // 2, 2))
    b = rng.normal([10, 10], 0.5, size=(n // 2, 2))
    noise = rng.uniform(-5, 15, size=(20, 2))
    df = pd.DataFrame(np.vstack([a, b, noise]), columns=["x", "y"])
    df["true"] = [0] * (n // 2) + [1] * (n // 2) + [-1] * 20
    return df


def _reference(df, cols, eps, min_pts):
    """Same grid algorithm, single numpy/python process."""
    X = df[cols].to_numpy(np.float64)
    cells = np.floor(X / eps).astype(np.int64)
    keys = [tuple(r) for r in cells]
    from collections import Counter
    counts = Counter(keys)
    core = sorted(c for c, n in counts.items() if n >= min_pts)
    idx = {c: i for i, c in enumerate(core)}
    parent = list(range(len(core)))

    def find(i):
        while parent[i] != i:
            parent[i] = parent[parent[i]]
            i = parent[i]
        return i

    from itertools import product
    offs = [o for o in product((-1, 0, 1), repeat=len(cols)) if any(o)]
    for c in core:
        for o in offs:
            nb = tuple(x + dx for x, dx in zip(c, o))
            if nb in idx:
                ri, rj = find(idx[c]), find(idx[nb])
                if ri != rj:
                    parent[max(ri, rj)] = min(ri, rj)
    root = [find(i) for i in range(len(core))]
    sizes = {}
    skey = {c: "\x1f".join(map(str, c)) for c in core}
    for c, r in zip(core, root):
        sizes.setdefault(r, [0, skey[c]])
        sizes[r][0] += counts[c]
        sizes[r][1] = min(sizes[r][1], skey[c])
    order = sorted(sizes, key=lambda r: (-sizes[r][0], sizes[r][1]))
    renum = {r: i for i, r in enumerate(order)}
    cmap = {c: renum[r] for c, r in zip(core, root)}
    border = {}
    for c in counts:
        if c in cmap:
            continue
        cands = [cmap[tuple(x + dx for x, dx in zip(c, o))]
                 for o in offs
                 if tuple(x + dx for x, dx in zip(c, o)) in cmap]
        if cands:
            border[c] = min(cands)
    full = cmap | border
    return np.array([full.get(k, -1) for k in keys])


def test_recovers_blobs_and_noise(ray_session):
    df = _blobs()
    labeled, summary = grid_density_clusters(
        rd.from_pandas(df, override_num_blocks=5), ["x", "y"],
        eps=1.0, min_pts=5)
    out = labeled.to_pandas()
    assert set(summary["cluster"]) == {0, 1}
    # each true blob lands in exactly one cluster
    for t in (0, 1):
        labs = out[out["true"] == t]["cluster"]
        assert labs.nunique() == 1 and labs.iloc[0] >= 0
    # far-out uniform noise mostly labeled -1
    assert (out[out["true"] == -1]["cluster"] == -1).mean() > 0.5
    assert summary["n_rows"].sum() == (out["cluster"] >= 0).sum()


def test_matches_reference(ray_session):
    df = _blobs(n=300, seed=9)
    labeled, _ = grid_density_clusters(
        rd.from_pandas(df, override_num_blocks=4), ["x", "y"],
        eps=0.8, min_pts=4)
    got = (labeled.to_pandas().sort_values(["x", "y"])["cluster"]
           .to_numpy())
    want = _reference(df, ["x", "y"], 0.8, 4)
    want = df.assign(w=want).sort_values(["x", "y"])["w"].to_numpy()
    np.testing.assert_array_equal(got, want)


def test_border_points_join_adjacent_cluster(ray_session):
    # dense cell [0,1)² with 6 pts; single point in adjacent cell
    pts = [(0.5, 0.5)] * 6 + [(1.2, 0.5)]
    df = pd.DataFrame(pts, columns=["x", "y"])
    labeled, summary = grid_density_clusters(
        rd.from_pandas(df), ["x", "y"], eps=1.0, min_pts=5)
    out = labeled.to_pandas()
    assert (out["cluster"] == 0).all()
    assert summary.iloc[0]["n_rows"] == 7


def test_layout_invariance(ray_session):
    df = _blobs(n=400, seed=2)
    a = grid_density_clusters(rd.from_pandas(df, override_num_blocks=2),
                              ["x", "y"], eps=1.0, min_pts=5)
    b = grid_density_clusters(rd.from_pandas(df, override_num_blocks=9),
                              ["x", "y"], eps=1.0, min_pts=5)
    pd.testing.assert_frame_equal(a[1], b[1])
    ga = a[0].to_pandas().sort_values(["x", "y"])["cluster"].to_numpy()
    gb = b[0].to_pandas().sort_values(["x", "y"])["cluster"].to_numpy()
    np.testing.assert_array_equal(ga, gb)


def test_guards(ray_session):
    df = _blobs(n=50)
    with pytest.raises(ValueError):
        grid_density_clusters(rd.from_pandas(df), ["x", "y"], eps=0)
    with pytest.raises(ValueError):
        grid_density_clusters(rd.from_pandas(df), [], eps=1.0)
    with pytest.raises(Exception, match="max_cells"):
        grid_density_clusters(rd.from_pandas(df), ["x", "y"],
                              eps=0.001, max_cells=3)
