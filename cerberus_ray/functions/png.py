"""Minimal pure-stdlib PNG codec (zlib + numpy) — a REAL image decode
kernel for the multimodal pipeline.

The sandbox has no PIL/cv2/libpng bindings, but PNG itself needs only
DEFLATE (stdlib ``zlib``) plus the per-scanline filter algebra (numpy),
so the engine's image path can decode and re-encode actual images rather
than stubbing. Scope (documented, validated):

- 8-bit depth; color types 0 (grayscale), 2 (RGB), 6 (RGBA).
- All five scanline filters on decode (None/Sub/Up/Average/Paeth —
  spec §6; Sub is vectorized as a per-channel modulo-256 cumsum, Up as a
  previous-row add; Average/Paeth fall back to a per-pixel loop, which
  only runs on lines an external encoder filtered that way).
- Encode uses filter 0 on every line (valid PNG, simplest stream).
- No interlacing, palettes, 16-bit, or ancillary-chunk interpretation —
  out-of-scope streams raise ``ValueError`` with the reason.

This is a correctness-first demonstration kernel: the Ray-side contract
(actor pools, batch sizing, schema) is unchanged, and a libpng-backed
kernel swaps in behind the same two functions.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 6: 4}
_COLOR_TYPE = {1: 0, 3: 2, 4: 6}


def is_png(data: bytes) -> bool:
    return data[:8] == _SIG


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF))


def encode_png(img: np.ndarray) -> bytes:
    """(H, W) or (H, W, {1,3,4}) uint8 → PNG bytes (filter 0, one IDAT)."""
    a = np.asarray(img)
    if a.dtype != np.uint8:
        raise ValueError(f"encode_png wants uint8, got {a.dtype}")
    if a.ndim == 2:
        a = a[:, :, None]
    if a.ndim != 3 or a.shape[2] not in _COLOR_TYPE:
        raise ValueError(f"unsupported image shape {a.shape}")
    h, w, c = a.shape
    color_type = _COLOR_TYPE[c]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    # filter byte 0 prepended to every scanline
    raw = np.concatenate(
        [np.zeros((h, 1), dtype=np.uint8),
         a.reshape(h, w * c)], axis=1).tobytes()
    return (_SIG + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(raw, 6))
            + _chunk(b"IEND", b""))


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa_, pb, pc_ = abs(p - a), abs(p - b), abs(p - c)
    if pa_ <= pb and pa_ <= pc_:
        return a
    return b if pb <= pc_ else c


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes → (H, W, C) uint8 (C ∈ {1,3,4}). Raises ValueError on
    non-PNG input or out-of-scope streams."""
    if not is_png(data):
        raise ValueError("not a PNG stream")
    pos, ihdr, idat = 8, None, []
    while pos + 8 <= len(data):
        (ln,) = struct.unpack(">I", data[pos:pos + 4])
        tag = data[pos + 4:pos + 8]
        body = data[pos + 8:pos + 8 + ln]
        if len(body) != ln:
            raise ValueError("truncated PNG chunk")
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif tag == b"IDAT":
            idat.append(body)
        elif tag == b"IEND":
            break
        pos += 12 + ln
    if ihdr is None or not idat:
        raise ValueError("missing IHDR/IDAT")
    w, h, depth, color_type, comp, filt, interlace = ihdr
    if depth != 8:
        raise ValueError(f"unsupported bit depth {depth} (only 8)")
    if color_type not in _CHANNELS:
        raise ValueError(f"unsupported color type {color_type}")
    if interlace != 0:
        raise ValueError("interlaced PNG not supported")
    if comp != 0 or filt != 0:
        raise ValueError("nonstandard compression/filter method")
    c = _CHANNELS[color_type]
    stride = w * c
    raw = zlib.decompress(b"".join(idat))
    if len(raw) != h * (stride + 1):
        raise ValueError("IDAT length mismatch")
    lines = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride + 1)
    ftypes = lines[:, 0]
    out = np.zeros((h, stride), dtype=np.uint8)
    for y in range(h):
        f = int(ftypes[y])
        cur = lines[y, 1:].astype(np.int32)
        prev = out[y - 1].astype(np.int32) if y else np.zeros(stride,
                                                              np.int32)
        if f == 0:
            rec = cur
        elif f == 1:  # Sub — per-channel modulo-256 cumulative sum
            rec = np.cumsum(cur.reshape(w, c), axis=0,
                            dtype=np.int64).reshape(stride) % 256
        elif f == 2:  # Up
            rec = (cur + prev) % 256
        elif f == 3:  # Average — left-dependence: per-pixel loop
            rec = np.zeros(stride, dtype=np.int32)
            for x in range(stride):
                left = rec[x - c] if x >= c else 0
                rec[x] = (cur[x] + (left + prev[x]) // 2) % 256
        elif f == 4:  # Paeth — left-dependence: per-pixel loop
            rec = np.zeros(stride, dtype=np.int32)
            for x in range(stride):
                left = rec[x - c] if x >= c else 0
                ul = prev[x - c] if x >= c else 0
                rec[x] = (cur[x] + _paeth(int(left), int(prev[x]),
                                          int(ul))) % 256
        else:
            raise ValueError(f"unknown scanline filter {f}")
        out[y] = rec.astype(np.uint8)
    return out.reshape(h, w, c)


def resize_nearest(img: np.ndarray, target_h: int, target_w: int) -> np.ndarray:
    """Nearest-neighbor resize (the classic index-gather) — real kernel,
    no interpolation libraries needed."""
    h, w = img.shape[:2]
    ys = np.minimum((np.arange(target_h) * h) // target_h, h - 1)
    xs = np.minimum((np.arange(target_w) * w) // target_w, w - 1)
    return img[ys][:, xs]
