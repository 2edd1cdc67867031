"""Minimal pure-stdlib WAV (RIFF PCM) codec — a REAL audio decode kernel
for the multimodal pipeline.

PCM WAV needs no codec library at all: the container is RIFF chunks and
the samples are raw little-endian integers, so ``struct`` + numpy decode
it exactly. Scope (documented, validated):

- PCM (format tag 1), 16-bit signed samples, any channel count / rate.
- Encode writes canonical 44-byte-header mono/stereo PCM16.
- Compressed/float/24-bit formats raise ``ValueError`` with the reason
  (the honest boundary — those DO need external codecs).
"""

from __future__ import annotations

import struct

import numpy as np


def is_wav(data: bytes) -> bool:
    return (len(data) >= 12 and data[:4] == b"RIFF"
            and data[8:12] == b"WAVE")


def encode_wav(samples: np.ndarray, sample_rate: int = 16_000) -> bytes:
    """(n,) or (n, channels) int16 → PCM16 WAV bytes."""
    a = np.asarray(samples)
    if a.dtype != np.int16:
        raise ValueError(f"encode_wav wants int16, got {a.dtype}")
    if a.ndim == 1:
        a = a[:, None]
    if a.ndim != 2:
        raise ValueError(f"unsupported sample shape {a.shape}")
    n, ch = a.shape
    body = a.astype("<i2").tobytes()
    byte_rate = sample_rate * ch * 2
    fmt = struct.pack("<HHIIHH", 1, ch, sample_rate, byte_rate, ch * 2, 16)
    data_hdr = b"data" + struct.pack("<I", len(body))
    riff_body = b"WAVEfmt " + struct.pack("<I", len(fmt)) + fmt + data_hdr + body
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


def decode_wav(data: bytes):
    """WAV bytes → ((n_samples, channels) int16 array, sample_rate).
    Raises ValueError on non-WAV or non-PCM16 streams."""
    if not is_wav(data):
        raise ValueError("not a RIFF/WAVE stream")
    pos, fmt, body = 12, None, None
    while pos + 8 <= len(data):
        tag = data[pos:pos + 4]
        (ln,) = struct.unpack("<I", data[pos + 4:pos + 8])
        chunk = data[pos + 8:pos + 8 + ln]
        if tag == b"fmt ":
            if ln < 16:
                raise ValueError("malformed fmt chunk")
            fmt = struct.unpack("<HHIIHH", chunk[:16])
        elif tag == b"data":
            body = chunk
        pos += 8 + ln + (ln & 1)  # chunks are word-aligned
    if fmt is None or body is None:
        raise ValueError("missing fmt/data chunk")
    tag_, ch, rate, _br, _ba, bits = fmt
    if tag_ != 1:
        raise ValueError(f"unsupported WAV format tag {tag_} (PCM only)")
    if bits != 16:
        raise ValueError(f"unsupported bit depth {bits} (16-bit only)")
    if ch < 1:
        raise ValueError("zero channels")
    usable = (len(body) // (2 * ch)) * 2 * ch
    a = np.frombuffer(body[:usable], dtype="<i2").reshape(-1, ch)
    return a.astype(np.int16), int(rate)


def audio_features(samples: np.ndarray, sample_rate: int,
                   feature_dim: int = 8) -> np.ndarray:
    """Real signal statistics: RMS, peak, mean, zero-crossing rate,
    duration — normalized float32, padded/trimmed to feature_dim."""
    x = samples.astype(np.float64) / 32768.0
    mono = x.mean(axis=1) if x.ndim == 2 else x
    n = max(len(mono), 1)
    zc = float(np.count_nonzero(np.diff(np.signbit(mono)))) / n
    feats = np.array([
        float(np.sqrt((mono ** 2).mean())) if len(mono) else 0.0,  # rms
        float(np.abs(mono).max()) if len(mono) else 0.0,           # peak
        float(mono.mean()) if len(mono) else 0.0,                  # dc
        zc,                                                        # zcr
        min(len(mono) / max(sample_rate, 1) / 60.0, 1.0),          # minutes
    ], dtype=np.float64)
    out = np.zeros(feature_dim, dtype=np.float32)
    out[:min(len(feats), feature_dim)] = feats[:feature_dim]
    return out
