"""Incremental near-dedup: probe-vs-batch agreement (pairs involving a
new doc match the full-corpus batch run exactly), new-old/new-new
classification, old-old suppression, parameter-manifest guard."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from cerberus_ray.pipelines import dedup as DD
from cerberus_ray.pipelines.incremental_dedup import (IndexParamsMismatch,
                                                      build_minhash_index,
                                                      probe_minhash_index)

BASE = ("the quick brown fox jumps over the lazy dog while the rain "
        "falls gently on the quiet village roofs every single evening")
ALT = ("completely different content about distributed dataset engines "
       "processing arrow blocks with streaming backpressure and spilling "
       "under memory pressure across many worker nodes tonight")


def old_corpus() -> pd.DataFrame:
    rng = np.random.default_rng(7)
    words = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
             "lambda mu nu xi omicron pi rho sigma tau upsilon").split()
    rows = [{"doc_id": f"o{i:03d}",
             "text": " ".join(rng.choice(words, size=30))}
            for i in range(25)]
    # an old near-dup pair (must NOT be re-reported by a probe)
    rows.append({"doc_id": "oavy1", "text": ALT})
    rows.append({"doc_id": "oavy2", "text": ALT + " indeed"})
    rows.append({"doc_id": "obase", "text": BASE})
    return pd.DataFrame(rows)


def new_batch() -> pd.DataFrame:
    return pd.DataFrame([
        # near-copy of an OLD doc → new-old pair
        {"doc_id": "n001", "text": BASE.replace("quiet", "noisy")},
        # near-dup pair WITHIN the new batch → new-new pair
        {"doc_id": "n002", "text": ALT.replace("tonight", "today")},
        {"doc_id": "n003", "text": ALT.replace("tonight", "tonite")},
        # unrelated
        {"doc_id": "n004", "text": "nothing like anything else here at "
                                   "all in any way whatsoever truly"},
    ])


@pytest.fixture(scope="module")
def index_dir(ray_session, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("mh_index"))
    build_minhash_index(rd.from_pandas(old_corpus(),
                                       override_num_blocks=3), d)
    return d


def test_probe_finds_new_pairs_and_suppresses_old(index_dir, ray_session):
    out = probe_minhash_index(
        rd.from_pandas(new_batch(), override_num_blocks=2), index_dir,
        threshold=0.5).to_pandas()
    pairs = set(zip(out["doc_id_a"], out["doc_id_b"], out["pair_kind"]))
    assert ("n001", "obase", "new-old") in {
        (min(a, b), max(a, b), k) for a, b, k in pairs}
    assert ("n002", "n003", "new-new") in pairs
    # the old-old near-dup never reappears
    assert not any(a.startswith("o") and b.startswith("o")
                   for a, b, _ in pairs)
    # unrelated doc pairs with nothing
    assert "n004" not in set(out["doc_id_a"]) | set(out["doc_id_b"])


def test_probe_agrees_with_batch_run(index_dir, ray_session):
    """Pairs-with-a-new-member from the full-corpus batch run ==
    probe output (ignoring orientation and pair_kind)."""
    full = pd.concat([old_corpus(), new_batch()], ignore_index=True)
    batch_pairs = DD.minhash_near_dup_pairs(
        rd.from_pandas(full, override_num_blocks=4),
        threshold=0.5).to_pandas()
    news = set(new_batch()["doc_id"])
    want = {frozenset((a, b)) for a, b in
            zip(batch_pairs["doc_id_a"], batch_pairs["doc_id_b"])
            if a in news or b in news}
    got_t = probe_minhash_index(
        rd.from_pandas(new_batch(), override_num_blocks=1), index_dir,
        threshold=0.5).to_pandas()
    got = {frozenset((a, b)) for a, b in
           zip(got_t["doc_id_a"], got_t["doc_id_b"])}
    assert got == want


def test_param_mismatch_raises(index_dir, ray_session):
    with pytest.raises(IndexParamsMismatch):
        probe_minhash_index(rd.from_pandas(new_batch()), index_dir,
                            bands=8)


def test_probe_hot_bucket_linear_path(ray_session, tmp_path):
    """A bucket with more members than hot_bucket must not expand
    C(n,2) pairs — the linear new×all path still finds every pair with
    a new member (exact for the probe contract)."""
    flood = pd.DataFrame({
        "doc_id": [f"o{i:04d}" for i in range(40)],
        "text": ["identical boilerplate text repeated verbatim"] * 40})
    idx = str(tmp_path / "hotidx")
    build_minhash_index(rd.from_pandas(flood, override_num_blocks=3), idx)
    new = pd.DataFrame({
        "doc_id": ["n1"],
        "text": ["identical boilerplate text repeated verbatim"]})
    out = probe_minhash_index(rd.from_pandas(new), idx,
                              hot_bucket=8).to_pandas()
    # every pair involves the new doc; all 40 old members found
    assert len(out) == 40
    assert set(out["pair_kind"]) == {"new-old"}
    assert (out["jaccard_est"] == 1.0).all()
    assert set(out["doc_id_b"]) <= {"n1"} or set(out["doc_id_a"]) <= {"n1"}
