"""Sequence packing: capacity invariants, exhaustiveness, FFD parity
with a pure-pandas reference, determinism under row reordering, and the
oversized-item overflow path."""

import hashlib

import numpy as np
import pandas as pd
import pytest
import ray
import ray.data as rd

from cerberus_ray.pipelines.mixing import pack_sequences


def items(n=400, seed=3, lo=10, hi=200):
    rng = np.random.default_rng(seed)
    return pd.DataFrame({
        "doc_id": [f"i{k:05d}" for k in range(n)],
        "n_tokens": rng.integers(lo, hi, size=n).astype("int64")})


def ffd_reference(df, capacity):
    """Pure-pandas first-fit-decreasing over one block: → {seq_id: [keys]}."""
    order = df.sort_values(["n_tokens", "doc_id"],
                           ascending=[False, True]).reset_index(drop=True)
    bins, rem = [], []
    for _, row in order.iterrows():
        s = int(row["n_tokens"])
        for b in range(len(bins)):
            if rem[b] >= s:
                bins[b].append(row["doc_id"])
                rem[b] -= s
                break
        else:
            bins.append([row["doc_id"]])
            rem.append(capacity - s)
    return {hashlib.md5("|".join(b).encode()).hexdigest()[:16]: b
            for b in bins}


def test_ffd_matches_pandas_reference(ray_session):
    df = items()
    cap = 512
    got = pack_sequences(rd.from_pandas(df).repartition(1), capacity=cap,
                         emit="assignments").to_pandas()
    want = ffd_reference(df, cap)
    # exhaustive: every item exactly once
    assert sorted(got["doc_id"]) == sorted(df["doc_id"])
    # identical bin membership AND slot order (seq_id is order-sensitive)
    got_bins = {s: list(g.sort_values("slot")["doc_id"])
                for s, g in got.groupby("seq_id")}
    assert got_bins == want


def test_capacity_and_summary_invariants(ray_session):
    df = items(n=600, seed=8)
    cap = 300
    summ = pack_sequences(rd.from_pandas(df).repartition(2),
                          capacity=cap).to_pandas()
    assert not summ["overflow"].any()
    assert (summ["total_tokens"] <= cap).all()
    assert (summ["fill_ratio"] <= 1.0).all()
    assert summ["total_tokens"].sum() == df["n_tokens"].sum()
    assert summ["n_items"].sum() == len(df)
    # FFD on many small items should fill sequences well
    assert summ["fill_ratio"].mean() > 0.8


def test_row_order_invariance_and_determinism(ray_session):
    df = items(n=300, seed=11)
    shuffled = df.sample(frac=1.0, random_state=4).reset_index(drop=True)
    a = pack_sequences(rd.from_pandas(df).repartition(1),
                       capacity=256).to_pandas()
    b = pack_sequences(rd.from_pandas(shuffled).repartition(1),
                       capacity=256).to_pandas()
    key = ["seq_id", "n_items", "total_tokens"]
    assert a.sort_values("seq_id")[key].reset_index(drop=True).equals(
        b.sort_values("seq_id")[key].reset_index(drop=True))


def test_oversized_items_overflow(ray_session):
    df = pd.DataFrame({"doc_id": ["big", "s1", "s2"],
                       "n_tokens": [900, 100, 100]})
    summ = pack_sequences(rd.from_pandas(df).repartition(1),
                          capacity=256).to_pandas()
    big = summ[summ["overflow"]]
    assert len(big) == 1 and int(big["n_items"].iloc[0]) == 1
    assert int(big["total_tokens"].iloc[0]) == 900
    rest = summ[~summ["overflow"]]
    assert rest["n_items"].sum() == 2 and (rest["total_tokens"] <= 256).all()


def test_nextfit_and_zero_token_items(ray_session):
    df = pd.DataFrame({"doc_id": [f"k{i}" for i in range(8)],
                       "n_tokens": [50, 0, 60, 70, 0, 80, 90, 100]})
    got = pack_sequences(rd.from_pandas(df).repartition(1), capacity=128,
                         strategy="nextfit", emit="assignments").to_pandas()
    # zero-token items are dropped; the rest appear exactly once
    assert sorted(got["doc_id"]) == sorted(
        df[df["n_tokens"] > 0]["doc_id"])
    per_seq = got.groupby("seq_id")["n_tokens"].sum()
    assert (per_seq <= 128).all()
    # nextfit preserves key order inside each sequence
    for _, g in got.groupby("seq_id"):
        g = g.sort_values("slot")
        assert list(g["doc_id"]) == sorted(g["doc_id"])


def test_packing_argument_errors(ray_session):
    ds = rd.from_pandas(items(n=5))
    with pytest.raises(ValueError):
        pack_sequences(ds, capacity=0)
    with pytest.raises(ValueError):
        pack_sequences(ds, emit="rows")
    with pytest.raises(ray.exceptions.RayTaskError):
        pack_sequences(ds, strategy="bestfit").to_pandas()
