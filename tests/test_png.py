"""Pure-stdlib PNG codec: encode/decode round trips, all five scanline
filters, out-of-scope rejection, nearest-neighbor resize, and the real
decode path through the multimodal actor pool."""

import struct
import zlib

import numpy as np
import pytest

from cerberus_ray.functions.png import (decode_png, encode_png, is_png,
                                        resize_nearest)


def _rand_img(h, w, c, seed=3):
    rng = np.random.default_rng(seed)
    a = rng.integers(0, 256, size=(h, w, c), dtype=np.uint8)
    return a[:, :, 0] if c == 1 else a


def test_roundtrip_all_color_types():
    for c in (1, 3, 4):
        img = _rand_img(13, 17, c, seed=c)
        out = decode_png(encode_png(img))
        want = img[:, :, None] if img.ndim == 2 else img
        assert out.shape == want.shape
        assert (out == want).all()


def test_is_png_and_reject_garbage():
    assert is_png(encode_png(_rand_img(4, 4, 3)))
    assert not is_png(b"\x00" * 100)
    with pytest.raises(ValueError):
        decode_png(b"not a png at all")


def _apply_filter(f, cur, prev, c):
    """Forward scanline filter (spec §6) — reference implementation used
    to craft non-zero-filter streams for the decoder."""
    cur = cur.astype(np.int32)
    prev = prev.astype(np.int32)
    out = np.zeros_like(cur)
    for x in range(len(cur)):
        left = cur[x - c] if x >= c else 0
        up = prev[x]
        ul = prev[x - c] if x >= c else 0
        if f == 0:
            out[x] = cur[x]
        elif f == 1:
            out[x] = cur[x] - left
        elif f == 2:
            out[x] = cur[x] - up
        elif f == 3:
            out[x] = cur[x] - (left + up) // 2
        elif f == 4:
            p = left + up - ul
            pa_, pb, pc_ = abs(p - left), abs(p - up), abs(p - ul)
            pred = left if (pa_ <= pb and pa_ <= pc_) else \
                (up if pb <= pc_ else ul)
            out[x] = cur[x] - pred
    return (out % 256).astype(np.uint8)


def _encode_with_filters(img, filters):
    """Valid PNG whose scanline y uses filters[y]."""
    h, w, c = img.shape
    flat = img.reshape(h, w * c)
    lines = []
    prev = np.zeros(w * c, dtype=np.uint8)
    for y in range(h):
        f = filters[y % len(filters)]
        lines.append(bytes([f]) + _apply_filter(f, flat[y], prev, c).tobytes())
        prev = flat[y]
    raw = b"".join(lines)
    sig = b"\x89PNG\r\n\x1a\n"
    ihdr = struct.pack(">IIBBBBB", w, h, 8, {1: 0, 3: 2, 4: 6}[c], 0, 0, 0)

    def chunk(tag, body):
        return (struct.pack(">I", len(body)) + tag + body
                + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF))

    return (sig + chunk(b"IHDR", ihdr) + chunk(b"IDAT", zlib.compress(raw))
            + chunk(b"IEND", b""))


@pytest.mark.parametrize("filters", [(1,), (2,), (3,), (4,), (0, 1, 2, 3, 4)])
def test_decode_every_scanline_filter(filters):
    img = _rand_img(9, 7, 3, seed=sum(filters) + 1)
    data = _encode_with_filters(img, filters)
    out = decode_png(data)
    assert (out == img).all()


def test_reject_out_of_scope():
    img = _rand_img(4, 4, 3)
    data = bytearray(encode_png(img))
    # flip bit depth to 16 inside IHDR (offset: 8 sig + 8 hdr + 8 w/h)
    data[24] = 16
    with pytest.raises(ValueError, match="bit depth"):
        decode_png(bytes(data))
    data = bytearray(encode_png(img))
    data[28] = 1  # interlace flag
    with pytest.raises(ValueError, match="interlaced"):
        decode_png(bytes(data))


def test_resize_nearest():
    img = _rand_img(10, 10, 3)
    up = resize_nearest(img, 20, 20)
    assert up.shape == (20, 20, 3)
    assert (up[::2, ::2] == img).all()  # exact 2x: every other pixel
    down = resize_nearest(img, 5, 5)
    assert (down == img[::2, ::2]).all()


def test_media_decoder_real_png_path(ray_session):
    from cerberus_ray.datagen import GenConfig, media_dataset
    from cerberus_ray.pipelines import multimodal as MM

    media = media_dataset(GenConfig(n_docs=1, n_media=40))
    with_payload = MM.synthesize_payloads(media).materialize()
    pdf_payload = with_payload.to_pandas()
    img_rows = pdf_payload[pdf_payload["kind"] == "image"]
    assert len(img_rows) > 0
    # payloads for images are genuine PNGs; features carry true pixel means
    p = img_rows["payload"].iloc[0]
    arr = decode_png(bytes(p))
    feats = MM.decode_media(with_payload, concurrency=2,
                            batch_size=16).to_pandas()
    row = feats[feats["media_ref"] == img_rows["media_ref"].iloc[0]].iloc[0]
    assert row["decoder"] == "png"
    assert (row["width"], row["height"]) == (arr.shape[1], arr.shape[0])
    chan = arr.reshape(-1, arr.shape[2]).mean(axis=0) / 255.0
    np.testing.assert_allclose(row["feature"][:3], chan, atol=1e-6)


def test_resize_media_reencodes(ray_session):
    import ray.data as rd
    import pandas as pd
    import pyarrow as pa

    from cerberus_ray.pipelines import multimodal as MM

    img = _rand_img(12, 9, 3)
    t = pa.table({
        "media_ref": pa.array(["a", "b"], pa.string()),
        "kind": pa.array(["image", "audio"], pa.string()),
        "payload": pa.array([encode_png(img), b"rawbytes"], pa.binary())})
    out = MM.resize_media(rd.from_arrow(t), target=6,
                          concurrency=2).to_pandas()
    out = out.set_index("media_ref")
    resized = decode_png(bytes(out.loc["a", "payload"]))
    assert resized.shape == (6, 6, 3)
    assert (resized == resize_nearest(img, 6, 6)).all()
    assert bytes(out.loc["b", "payload"]) == b"rawbytes"  # passthrough
