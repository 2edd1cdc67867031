"""Exact repeated-substring detection: planted-passage recall with exact
span bounds, per-doc self-repetition exclusion, driver/shuffle mode
agreement, and sampled-mode behavior."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from cerberus_ray.pipelines.substring_dedup import (
    cut_duplicated_substrings, duplicated_shingle_hashes, duplicated_spans,
    repeated_substring_scan)


PASSAGE = " ".join(f"boiler{j}" for j in range(30))  # 30-token passage


def corpus():
    rows = []
    for i in range(20):
        body = " ".join(f"u{i}w{j}" for j in range(40))
        rows.append({"doc_id": f"d{i:02d}", "text": body})
    # plant the passage mid-doc in two documents at known offsets
    rows[3]["text"] = ("intro3 words here " + PASSAGE + " tail3 x y")
    rows[7]["text"] = (" ".join(f"pre{j}" for j in range(10)) + " "
                       + PASSAGE + " post7")
    # a doc that repeats its OWN phrase twice — must NOT count as dup
    rows[12]["text"] = PASSAGE.replace("boiler", "self") + " mid " + \
        PASSAGE.replace("boiler", "self")
    return pd.DataFrame(rows)


def test_planted_passage_spans_exact(ray_session):
    df = corpus()
    ds = rd.from_pandas(df).repartition(3).materialize()
    dup, spans = repeated_substring_scan(ds, n=20, min_docs=2)
    got = spans.to_pandas().sort_values("doc_id").reset_index(drop=True)
    # exactly the two planted docs, one maximal span each
    assert list(got["doc_id"]) == ["d03", "d07"]
    # d03: passage tokens start after 3 intro tokens, 30 tokens long
    r3 = got[got["doc_id"] == "d03"].iloc[0]
    assert (r3["start_tok"], r3["end_tok"]) == (3, 33)
    r7 = got[got["doc_id"] == "d07"].iloc[0]
    assert (r7["start_tok"], r7["end_tok"]) == (10, 40)
    assert len(dup) == 30 - 20 + 1  # every window of the passage is shared


def test_self_repetition_not_cross_doc(ray_session):
    df = corpus()
    ds = rd.from_pandas(df).repartition(2).materialize()
    dup = duplicated_shingle_hashes(ds, n=20, min_docs=2)
    spans = duplicated_spans(ds, dup, n=20).to_pandas()
    assert "d12" not in set(spans["doc_id"])


def test_driver_shuffle_mode_agreement(ray_session):
    df = corpus()
    ds = rd.from_pandas(df).repartition(4).materialize()
    a = duplicated_shingle_hashes(ds, n=20, min_docs=2, mode="driver")
    b = duplicated_shingle_hashes(ds, n=20, min_docs=2, mode="shuffle")
    assert np.array_equal(a, b)
    with pytest.raises(ValueError):
        duplicated_shingle_hashes(ds, mode="salted")


def test_sampled_mode_subset_and_long_passage_survives(ray_session):
    df = corpus()
    ds = rd.from_pandas(df).repartition(2).materialize()
    full = duplicated_shingle_hashes(ds, n=20, min_docs=2, sample_mod=1)
    samp = duplicated_shingle_hashes(ds, n=20, min_docs=2, sample_mod=4)
    assert set(samp) <= set(full)
    assert np.all(samp % 4 == 0)
    # spans from sampled hashes still land inside the true passage
    spans = duplicated_spans(ds, samp, n=20).to_pandas()
    for _, r in spans.iterrows():
        assert r["doc_id"] in ("d03", "d07")


def test_cut_removes_planted_passage_only(ray_session):
    """cut_duplicated_substrings rewrites exactly the spans that
    duplicated_spans reports: planted passages vanish from d03/d07,
    every other doc (incl. the self-repeating d12) is byte-identical."""
    df = corpus()
    ds = rd.from_pandas(df).repartition(3).materialize()
    dup = duplicated_shingle_hashes(ds, n=20, min_docs=2)
    out = (cut_duplicated_substrings(ds, dup, n=20).to_pandas()
           .set_index("doc_id")["text"])
    orig = df.set_index("doc_id")["text"]
    assert out["d03"] == "intro3 words here tail3 x y"
    assert out["d07"] == " ".join(f"pre{j}" for j in range(10)) + " post7"
    for did in orig.index:
        if did not in ("d03", "d07"):
            assert out[did] == orig[did]


def test_cut_is_noop_with_no_duplicates(ray_session):
    df = corpus()
    ds = rd.from_pandas(df).materialize()
    out = cut_duplicated_substrings(
        ds, np.array([], dtype=np.uint64), n=20).to_pandas()
    assert (out.set_index("doc_id")["text"]
            .equals(df.set_index("doc_id")["text"]))


def test_no_duplication_no_rows(ray_session):
    df = pd.DataFrame({"doc_id": ["a", "b"],
                       "text": [" ".join(f"a{j}" for j in range(50)),
                                " ".join(f"b{j}" for j in range(50))]})
    ds = rd.from_pandas(df).materialize()
    dup, spans = repeated_substring_scan(ds, n=20)
    assert len(dup) == 0
    assert len(spans.to_pandas()) == 0
