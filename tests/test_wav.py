"""Pure-stdlib WAV codec: round trips, chunk-walk robustness,
out-of-scope rejection, signal features, and the real decode path
through the multimodal actor pool."""

import struct

import numpy as np
import pytest

from cerberus_ray.functions.wav import (audio_features, decode_wav,
                                        encode_wav, is_wav)


def test_roundtrip_mono_and_stereo():
    rng = np.random.default_rng(9)
    mono = rng.integers(-32768, 32767, size=500, dtype=np.int16)
    out, rate = decode_wav(encode_wav(mono, 8_000))
    assert rate == 8_000 and out.shape == (500, 1)
    assert (out[:, 0] == mono).all()
    stereo = rng.integers(-32768, 32767, size=(300, 2), dtype=np.int16)
    out2, rate2 = decode_wav(encode_wav(stereo, 44_100))
    assert rate2 == 44_100 and (out2 == stereo).all()


def test_is_wav_and_rejections():
    assert is_wav(encode_wav(np.zeros(10, np.int16)))
    assert not is_wav(b"RIFFxxxxNOPE")
    with pytest.raises(ValueError, match="RIFF"):
        decode_wav(b"garbage")
    # float format tag -> rejected with reason
    data = bytearray(encode_wav(np.zeros(10, np.int16)))
    data[20] = 3  # fmt tag IEEE float
    with pytest.raises(ValueError, match="format tag"):
        decode_wav(bytes(data))
    data = bytearray(encode_wav(np.zeros(10, np.int16)))
    data[34] = 8  # bits per sample
    with pytest.raises(ValueError, match="bit depth"):
        decode_wav(bytes(data))


def test_extra_chunk_walk():
    """Decoder must skip unknown (odd-length, word-aligned) chunks."""
    base = encode_wav(np.arange(100, dtype=np.int16), 16_000)
    # splice a 5-byte LIST chunk (padded to 6) between fmt and data
    fmt_end = 12 + 8 + 16
    extra = b"LIST" + struct.pack("<I", 5) + b"hello" + b"\x00"
    spliced = bytearray(base[:fmt_end] + extra + base[fmt_end:])
    new_len = len(spliced) - 8
    spliced[4:8] = struct.pack("<I", new_len)
    out, rate = decode_wav(bytes(spliced))
    assert rate == 16_000
    assert (out[:, 0] == np.arange(100, dtype=np.int16)).all()


def test_audio_features_math():
    # full-scale square wave: rms == peak == 1, zcr ~ alternating
    sq = np.tile(np.array([32767, -32768], np.int16), 100)
    f = audio_features(sq, 16_000, feature_dim=8)
    assert f[0] == pytest.approx(1.0, abs=2e-4)   # rms
    assert f[1] == pytest.approx(1.0, abs=2e-4)   # peak
    assert f[3] == pytest.approx(1.0, abs=2e-2)   # zcr: flips every sample
    silent = audio_features(np.zeros(100, np.int16), 16_000)
    assert (silent[:4] == 0).all()


def test_media_decoder_real_wav_path(ray_session):
    from cerberus_ray.datagen import GenConfig, media_dataset
    from cerberus_ray.pipelines import multimodal as MM

    media = media_dataset(GenConfig(n_docs=1, n_media=60))
    with_payload = MM.synthesize_payloads(media).materialize()
    pdf_p = with_payload.to_pandas()
    aud = pdf_p[pdf_p["kind"] == "audio"]
    assert len(aud) > 0
    samples, rate = decode_wav(bytes(aud["payload"].iloc[0]))
    feats = MM.decode_media(with_payload, concurrency=2,
                            batch_size=16).to_pandas()
    row = feats[feats["media_ref"] == aud["media_ref"].iloc[0]].iloc[0]
    assert row["decoder"] == "wav"
    assert row["width"] == rate
    assert row["height"] == samples.shape[1]
    assert row["n_frames"] == len(samples)
    want = audio_features(samples, rate, feature_dim=8)
    np.testing.assert_allclose(np.asarray(row["feature"]), want, atol=1e-6)
