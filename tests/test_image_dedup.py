"""Image dHash near-dup: brute-force recall parity (pigeonhole is
exact at max_hamming ≤ 3), brightness invariance, planted duplicates,
driver/shuffle agreement over the real PNG codec path."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from cerberus_ray.datagen import GenConfig, media_dataset
from cerberus_ray.functions.png import decode_png, encode_png
from cerberus_ray.pipelines.image_dedup import (dhash64,
                                                image_near_dup_pairs)
from cerberus_ray.pipelines.multimodal import synthesize_payloads


def _image_corpus(ray_session_unused=None, n_media: int = 120):
    """Deterministic PNG corpus + planted duplicates: for every 5th
    image an exact re-encode ('<ref>#re') and a low-bit perturbation
    ('<ref>#lo', every pixel ±1 → tiny gray shift, gradient signs
    almost everywhere preserved)."""
    media = media_dataset(GenConfig(n_docs=1, n_media=n_media))
    pdf = synthesize_payloads(media).to_pandas()
    pdf = pdf[pdf["kind"] == "image"][["media_ref",
                                       "payload"]].reset_index(drop=True)
    extra = []
    for i in range(0, len(pdf), 5):
        ref, payload = pdf.loc[i, "media_ref"], pdf.loc[i, "payload"]
        img = decode_png(bytes(payload))
        extra.append({"media_ref": f"{ref}#re",
                      "payload": encode_png(img)})
        lo = (img & 0xFE) | 1  # ±1 per pixel, no clipping cliff
        extra.append({"media_ref": f"{ref}#lo",
                      "payload": encode_png(lo)})
    return pd.concat([pdf, pd.DataFrame(extra)], ignore_index=True)


def test_dhash_brightness_invariance(ray_session):
    rng = np.random.default_rng(2)
    img = rng.integers(0, 200, (15, 21, 3), dtype=np.uint8)
    h0 = dhash64(img)
    assert h0 == dhash64(img + 40)  # constant shift, no clipping
    # a structural change (transpose) moves the hash far
    flipped = np.transpose(img, (1, 0, 2))
    x = int(h0) ^ int(dhash64(flipped))
    assert bin(x).count("1") > 8
    # grayscale input accepted
    assert dhash64(img.mean(axis=2).astype(np.uint8)) is not None


def test_planted_duplicates_and_bruteforce_recall(ray_session):
    corpus = _image_corpus()
    ds = rd.from_pandas(corpus, override_num_blocks=4)
    got = image_near_dup_pairs(ds, mode="driver").to_pandas()
    # brute-force reference over the same dHashes
    hashes = {r: dhash64(decode_png(bytes(p)))
              for r, p in zip(corpus["media_ref"], corpus["payload"])}
    refs = sorted(hashes)
    want = set()
    for i, a in enumerate(refs):
        for b in refs[i + 1:]:
            d = bin(int(hashes[a]) ^ int(hashes[b])).count("1")
            if d <= 3:
                want.add((min(a, b), max(a, b), d))
    gotset = set(zip(got["doc_id_a"], got["doc_id_b"],
                     got["hamming"]))
    assert gotset == want
    # every exact re-encode is found at hamming 0
    re_pairs = {(a, b) for a, b, d in gotset if d == 0
                and b == f"{a}#re"}
    n_planted = sum(1 for r in corpus["media_ref"]
                    if r.endswith("#re"))
    assert n_planted > 0 and len(re_pairs) == n_planted


def test_modes_agree(ray_session):
    corpus = _image_corpus(n_media=60)
    ds = rd.from_pandas(corpus, override_num_blocks=3)
    d = image_near_dup_pairs(ds, mode="driver").to_pandas()
    s = image_near_dup_pairs(ds, mode="shuffle").to_pandas()
    pd.testing.assert_frame_equal(d, s)
    assert len(d) > 0


def test_non_png_payloads_dropped(ray_session):
    corpus = _image_corpus(n_media=30)
    junk = pd.DataFrame({"media_ref": ["j1", "j2"],
                         "payload": [b"not a png", b""]})
    ds = rd.from_pandas(pd.concat([corpus, junk], ignore_index=True))
    got = image_near_dup_pairs(ds, mode="driver").to_pandas()
    assert not set(got["doc_id_a"]) & {"j1", "j2"}
    assert not set(got["doc_id_b"]) & {"j1", "j2"}
