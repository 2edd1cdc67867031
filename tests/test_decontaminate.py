"""Benchmark decontamination: planted-overlap exactness, the drop
filter, and edge cases (short docs, empty benchmark)."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from cerberus_ray.pipelines import decontaminate as DC

BENCH_SENT = ("the capital of france is paris and the capital of spain "
              "is madrid as every schoolchild knows")


def corpus():
    rng = np.random.default_rng(3)
    words = [f"tok{i}" for i in range(300)]
    rows = []
    for i in range(60):
        rows.append({"doc_id": f"c{i:03d}",
                     "text": " ".join(rng.choice(words, size=50))})
    # planted contamination: full benchmark sentence embedded mid-doc
    rows.append({"doc_id": "bad1",
                 "text": "irrelevant prefix " + BENCH_SENT + " and a suffix"})
    # partial overlap below the shingle width: only 4 shared tokens
    rows.append({"doc_id": "ok1",
                 "text": "the capital of france differs entirely here "
                         + " ".join(f"x{i}" for i in range(20))})
    # too-short doc (fewer tokens than n): never flagged
    rows.append({"doc_id": "short1", "text": "tiny doc"})
    return pd.DataFrame(rows)


def benchmark():
    return pd.DataFrame({"doc_id": ["b1"], "text": [BENCH_SENT]})


@pytest.fixture(scope="module")
def scan(ray_session):
    return DC.contamination_scan(
        rd.from_pandas(corpus(), override_num_blocks=4),
        rd.from_pandas(benchmark()), n=8).to_pandas().set_index("doc_id")


def test_planted_overlap_flagged(scan):
    assert bool(scan.loc["bad1", "contaminated"])
    assert scan.loc["bad1", "n_hits"] >= 1


def test_clean_docs_not_flagged(scan):
    flagged = set(scan[scan["contaminated"]].index)
    assert flagged == {"bad1"}
    assert not bool(scan.loc["ok1", "contaminated"])  # sub-shingle overlap
    assert scan.loc["short1", "n_shingles"] == 0


def test_scan_covers_every_doc(scan):
    assert len(scan) == len(corpus())


def test_drop_filter_keeps_clean_only(ray_session):
    kept = DC.drop_contaminated(
        rd.from_pandas(corpus()), rd.from_pandas(benchmark()),
        n=8).to_pandas()
    ids = set(kept["doc_id"])
    assert "bad1" not in ids
    assert {"ok1", "short1"} <= ids
    assert len(ids) == len(corpus()) - 1
    assert set(kept.columns) == {"doc_id", "text"}  # original columns


def test_empty_benchmark_flags_nothing(ray_session):
    empty = pd.DataFrame({"doc_id": pd.Series(dtype=object),
                          "text": pd.Series(dtype=object)})
    out = DC.contamination_scan(rd.from_pandas(corpus()),
                                rd.from_pandas(empty)).to_pandas()
    assert not out["contaminated"].any()
