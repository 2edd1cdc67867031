"""Audio near-duplicate detection: a 64-bit spectral-shape fingerprint
over the REAL PCM-WAV decode path (`functions/wav.py`), paired by the
same 64-bit band/pigeonhole engine as text SimHash and image dHash
(`dedup.simhash_near_dup_pairs(hash_col=)`). Public method family:
spectral gradient-sign fingerprints (Chromaprint-style, radically
simplified to one frame).

Fingerprint: mono mix → |rfft|² → 65 log-spaced frequency bins →
bit_i = energy[i+1] > energy[i]. GAIN-INVARIANT by construction
(scaling every sample scales every bin energy by the same factor).
Near-silent bins are floored at ε·max(energy) so the empty half of a
sparse spectrum compares EQUAL (stable False bits) instead of flipping
on numerical noise under re-quantization.

Completes the modality triangle: text (token SimHash), image (pixel
dHash), audio (spectral hash) — one pair machinery, three codecs, all
real. Scale shape identical to image_dedup: per-payload decode kernel,
then 8-byte fingerprints through the shared planner.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.wav import decode_wav, is_wav
from .dedup import simhash_near_dup_pairs

__all__ = ["spectral_hash64", "audio_hash_rows",
           "audio_near_dup_pairs"]

_N_BINS = 65  # 64 comparison bits
_FLOOR = 1e-6


def spectral_hash64(samples: np.ndarray, sample_rate: int
                    ) -> np.uint64:
    """64-bit spectral-shape hash of a PCM clip ((n,) or (n, ch)
    int16/float). Deterministic; gain-invariant; log-spaced bins so
    low-frequency structure gets resolution."""
    x = np.asarray(samples, dtype=np.float64)
    if x.ndim == 2:
        x = x.mean(axis=1)
    spec = np.abs(np.fft.rfft(x)) ** 2
    m = len(spec)
    # log-spaced bin edges over [1, m): DC excluded (gain offset bin)
    edges = np.unique(np.rint(np.logspace(
        0, np.log10(max(m - 1, 2)), _N_BINS + 1)).astype(np.int64))
    # pad degenerate edge sets (tiny clips) to keep 65 bins
    while len(edges) < _N_BINS + 1:
        edges = np.r_[edges, edges[-1] + 1]
    edges = np.clip(edges[:_N_BINS + 1], 1, m)
    e = np.add.reduceat(np.r_[spec, 0.0], edges[:-1])
    e[np.diff(edges) == 0] = 0.0
    e = np.maximum(e, _FLOOR * e.max() if e.max() > 0 else 1.0)
    bits = (e[1:] > e[:-1]).astype(np.uint8)
    return np.packbits(bits, bitorder="little").view(np.uint64)[0]


def audio_hash_rows(payload_ds, *, key_col: str = "media_ref",
                    payload_col: str = "payload"):
    """→ Dataset (key_col, ahash int64-bit-pattern, sample_rate,
    n_samples) for every WAV payload; non-WAV payloads drop."""

    def kernel(b: pa.Table) -> pa.Table:
        keys = b[key_col].to_numpy(zero_copy_only=False)
        payloads = b[payload_col].to_pylist()
        out_k, out_h, out_sr, out_n = [], [], [], []
        for k, p in zip(keys, payloads):
            if not (p and is_wav(bytes(p))):
                continue
            samples, sr = decode_wav(bytes(p))
            out_k.append(k)
            out_h.append(int(spectral_hash64(samples, sr)))
            out_sr.append(sr)
            out_n.append(samples.shape[0])
        return pa.Table.from_pydict({
            key_col: pa.array(out_k, pa.string()),
            "ahash": pa.array(np.array(out_h, dtype=np.uint64)
                              .view(np.int64), pa.int64()),
            "sample_rate": pa.array(out_sr, pa.int32()),
            "n_samples": pa.array(out_n, pa.int64())})

    return payload_ds.map_batches(kernel, batch_format="pyarrow",
                                  zero_copy_batch=True)


def audio_near_dup_pairs(payload_ds, *, key_col: str = "media_ref",
                         payload_col: str = "payload",
                         max_hamming: int = 3, mode: str = "auto",
                         hot_bucket_cap: int = 256,
                         shuffle_buckets: int = 64) -> pa.Table:
    """→ (doc_id_a, doc_id_b, hamming) pairs of clips whose spectral
    hash differs by ≤ max_hamming bits (≤3 keeps the 4-chunk
    pigeonhole recall guarantee)."""
    hashes = audio_hash_rows(payload_ds, key_col=key_col,
                             payload_col=payload_col)
    return simhash_near_dup_pairs(
        hashes, key_col=key_col, hash_col="ahash",
        max_hamming=max_hamming, mode=mode,
        hot_bucket_cap=hot_bucket_cap,
        shuffle_buckets=shuffle_buckets)
