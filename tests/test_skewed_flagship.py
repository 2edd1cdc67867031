"""Flagship correctness under skewed media keys (hot_media_frac routes a
large share of span refs to a handful of keys) — results must equal the
unskewed-machinery golden regardless of key distribution."""

import pyarrow.compute as pc

from cerberus_ray.datagen import (
    GenConfig,
    docs_dataset,
    expected_violations,
    media_dataset,
)
from cerberus_ray.pipelines.flagship import run_flagship


def rows(t):
    return sorted(zip(t["doc_id"].to_pylist(), t["rule"].to_pylist(),
                      t["path"].to_pylist(), t["detail"].to_pylist()))


def test_flagship_with_hot_keys(ray_session):
    cfg = GenConfig(n_docs=3000, n_media=300, hot_media_frac=0.7,
                    hot_media_n=2)
    res = run_flagship(docs_dataset(cfg, fragment_size=1000),
                       media_dataset(cfg), text_max_len=cfg.text_max_len)
    golden = expected_violations(cfg)
    assert rows(res.violations) == rows(golden)


def test_hot_key_distribution_is_actually_skewed():
    import numpy as np
    import pyarrow as pa

    from cerberus_ray.datagen import gen_docs_batch

    cfg = GenConfig(n_docs=3000, n_media=300, hot_media_frac=0.7,
                    hot_media_n=2)
    t = gen_docs_batch(np.arange(cfg.n_docs), cfg)
    flat = pc.list_flatten(t["spans"])
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    refs = [r for r in flat.field("media_ref").to_pylist() if r]
    top2 = sum(v for _, v in
               sorted(((r, refs.count(r)) for r in set(refs)),
                      key=lambda kv: -kv[1])[:2])
    assert top2 / len(refs) > 0.5  # hot keys dominate
