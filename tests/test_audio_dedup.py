"""Audio spectral-hash near-dup: gain invariance, brute-force recall
parity at max_hamming ≤ 3, planted duplicates over the real WAV codec,
driver/shuffle agreement."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from cerberus_ray.datagen import GenConfig, media_dataset
from cerberus_ray.functions.wav import decode_wav, encode_wav
from cerberus_ray.pipelines.audio_dedup import (audio_near_dup_pairs,
                                                spectral_hash64)
from cerberus_ray.pipelines.multimodal import synthesize_payloads


def _audio_corpus(n_media: int = 150):
    """Deterministic WAV corpus + planted duplicates: for every 4th
    clip an exact re-encode ('<ref>#re') and a half-gain variant
    ('<ref>#ga', int16 //2 — spectral shape preserved)."""
    media = media_dataset(GenConfig(n_docs=1, n_media=n_media))
    pdf = synthesize_payloads(media).to_pandas()
    pdf = pdf[pdf["kind"] == "audio"][["media_ref",
                                       "payload"]].reset_index(drop=True)
    extra = []
    for i in range(0, len(pdf), 4):
        ref, payload = pdf.loc[i, "media_ref"], pdf.loc[i, "payload"]
        samples, sr = decode_wav(bytes(payload))
        extra.append({"media_ref": f"{ref}#re",
                      "payload": encode_wav(samples, sr)})
        extra.append({"media_ref": f"{ref}#ga",
                      "payload": encode_wav(
                          (samples // 2).astype(np.int16), sr)})
    return pd.concat([pdf, pd.DataFrame(extra)], ignore_index=True)


def test_gain_invariance_and_discrimination(ray_session):
    sr = 16_000
    t = np.arange(2000) / sr
    clip = (np.sin(2 * np.pi * 440 * t)
            + 0.3 * np.sin(2 * np.pi * 1320 * t))
    s16 = (clip * 20_000).astype(np.int16)
    h = spectral_hash64(s16, sr)
    # exact float gain scaling -> identical hash
    assert h == spectral_hash64(s16.astype(np.float64) * 0.37, sr)
    # int16 half-gain (re-quantized) -> within a few bits
    d = bin(int(h) ^ int(spectral_hash64(
        (s16 // 2).astype(np.int16), sr))).count("1")
    assert d <= 3
    # a different pitch is far away
    other = (np.sin(2 * np.pi * 700 * t) * 20_000).astype(np.int16)
    far = bin(int(h) ^ int(spectral_hash64(other, sr))).count("1")
    assert far > 3
    # stereo accepted (mono mix)
    st = np.stack([s16, s16], axis=1)
    assert spectral_hash64(st, sr) == h


def test_planted_duplicates_bruteforce_recall(ray_session):
    corpus = _audio_corpus()
    ds = rd.from_pandas(corpus, override_num_blocks=4)
    got = audio_near_dup_pairs(ds, mode="driver").to_pandas()
    hashes = {}
    for r, p in zip(corpus["media_ref"], corpus["payload"]):
        samples, sr = decode_wav(bytes(p))
        hashes[r] = spectral_hash64(samples, sr)
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
    # every exact re-encode found at hamming 0
    re_pairs = {(a, b) for a, b, d in gotset
                if d == 0 and b == f"{a}#re"}
    n_planted = sum(1 for r in corpus["media_ref"]
                    if r.endswith("#re"))
    assert n_planted > 0 and len(re_pairs) == n_planted


def test_modes_agree_and_non_wav_dropped(ray_session):
    corpus = _audio_corpus(n_media=80)
    junk = pd.DataFrame({"media_ref": ["j1"], "payload": [b"nope"]})
    ds = rd.from_pandas(pd.concat([corpus, junk], ignore_index=True),
                        override_num_blocks=3)
    d = audio_near_dup_pairs(ds, mode="driver").to_pandas()
    s = audio_near_dup_pairs(ds, mode="shuffle").to_pandas()
    pd.testing.assert_frame_equal(d, s)
    assert len(d) > 0
    assert "j1" not in set(d["doc_id_a"]) | set(d["doc_id_b"])
