"""Document clustering: planted-topic separation, vector kernel
reference, summary exactness, partition invariance, determinism."""

import numpy as np
import pandas as pd
import ray.data as rd

from cerberus_ray.pipelines.doc_cluster import (
    _doc_vectors,
    cluster_documents,
    hashed_tf_vectors,
)


def _topics(n_per=60, seed=19):
    rng = np.random.default_rng(seed)
    cooking = ["recipe", "oven", "bake", "flour", "sugar", "dough"]
    sports = ["match", "goal", "team", "league", "score", "coach"]
    code = ["python", "function", "variable", "compile", "debug", "loop"]
    rows = []
    for words, tag in ((cooking, "cook"), (sports, "sport"),
                       (code, "code")):
        for i in range(n_per):
            rows.append((f"{tag}{i}",
                         " ".join(rng.choice(words, 12)), tag))
    return pd.DataFrame(rows, columns=["doc_id", "text", "topic"])


def test_vector_kernel_reference():
    X = _doc_vectors(np.array(["a b a", "c", ""], dtype=object), 64)
    assert X.shape == (3, 64)
    np.testing.assert_allclose(np.linalg.norm(X[0]), 1.0)
    np.testing.assert_allclose(np.linalg.norm(X[2]), 0.0)
    # identical text → identical vector; tf weighting visible
    Y = _doc_vectors(np.array(["a b a"], dtype=object), 64)
    np.testing.assert_allclose(X[0], Y[0])
    assert (X[0] > 0).sum() <= 2 and X[0].max() > X[0][X[0] > 0].min()


def test_planted_topics_separate(ray_session):
    df = _topics()
    ds = rd.from_pandas(df, override_num_blocks=4)
    assignments, summary = cluster_documents(
        ds, n_clusters=3, n_features=512, top_tokens=4)
    a = assignments.to_pandas().merge(df[["doc_id", "topic"]], on="doc_id")
    # every planted topic maps (almost) entirely into one cluster
    purity = (a.groupby("topic")["cluster"]
              .agg(lambda s: s.value_counts().iloc[0] / len(s)))
    assert (purity > 0.95).all(), purity
    # and the three topics land in three DIFFERENT clusters
    majors = a.groupby("topic")["cluster"].agg(
        lambda s: s.value_counts().index[0])
    assert majors.nunique() == 3
    # summaries: sizes sum to n, top tokens come from the right topic
    assert summary["n_docs"].sum() == len(df)
    cook_cluster = int(majors["cook"])
    toks = summary.loc[summary["cluster"] == cook_cluster,
                       "top_tokens"].iloc[0].split()
    assert set(toks) <= {"recipe", "oven", "bake", "flour", "sugar",
                         "dough"}


def test_partition_invariance_and_determinism(ray_session):
    df = _topics(n_per=40)
    outs = []
    for blocks in (2, 7):
        ds = rd.from_pandas(df, override_num_blocks=blocks)
        asg, summ = cluster_documents(ds, n_clusters=3, n_features=256)
        outs.append((asg.to_pandas().sort_values("doc_id")
                     .reset_index(drop=True), summ))
    pd.testing.assert_frame_equal(outs[0][0], outs[1][0])
    pd.testing.assert_frame_equal(outs[0][1], outs[1][1])


def test_vectors_dataset_surface(ray_session):
    df = _topics(n_per=10)
    vecs = hashed_tf_vectors(rd.from_pandas(df), n_features=128).to_pandas()
    assert len(vecs) == len(df)
    v0 = np.array(vecs["vec"].iloc[0])
    assert v0.shape == (128,) and abs(np.linalg.norm(v0) - 1) < 1e-12
