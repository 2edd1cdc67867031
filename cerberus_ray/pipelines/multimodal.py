"""Multimodal (image/audio/video) plumbing.

Media payloads are opaque ``binary`` columns with typed metadata — the
engine's schema treatment of the interleaved ``media_ref`` spans.

Every kind the catalog emits decodes for REAL: image payloads are actual PNG
streams decoded by the engine's pure-stdlib PNG codec (`functions/png.py`
— zlib inflate + scanline unfilter; true dimensions + per-channel pixel
statistics, and ``resize_media`` re-encodes through a real
nearest-neighbor resample); audio payloads are actual PCM WAV streams
decoded by `functions/wav.py` (true sample rate/channels/duration + RMS/
peak/zero-crossing features); table payloads are actual Arrow IPC
streams decoded by pyarrow (true row/column counts + numeric-column
means). Compressed video/image/audio codecs genuinely need libraries NOT
in this container, so unrecognized payloads keep the clearly-marked
deterministic fake derived from the payload hash. The ``decoder`` column
says which kernel ran ('png' / 'wav' / 'arrow' / 'stub'). For audio rows the
image-shaped metadata columns carry (width=sample_rate,
height=n_channels, n_frames=n_samples) — documented mapping, schema
unchanged. Everything Ray-side — schema, actor-pool signature, batch
sizing, output layout — is identical across kernels, so a libav-backed
video decoder swaps in behind one method.

Actor-pool pattern: heavyweight setup (codec init) in __init__ (once per
actor), per-batch work in __call__ — the engine's ST2/ST5 stateful-stage
idiom (SURVEY.md §2.3).
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..determinism import hash_strings
from ..functions.png import decode_png, encode_png, is_png, resize_nearest
from ..functions.wav import audio_features, decode_wav, encode_wav, is_wav

MEDIA_FEATURES_SCHEMA = pa.schema([
    pa.field("media_ref", pa.string()),
    pa.field("kind", pa.string()),
    pa.field("n_bytes", pa.int64()),
    pa.field("width", pa.int32()),
    pa.field("height", pa.int32()),
    pa.field("n_frames", pa.int32()),
    pa.field("decoder", pa.string()),
    pa.field("feature", pa.list_(pa.float32())),
])


def _synth_image(h: np.uint64) -> bytes:
    """Deterministic small REAL PNG derived from the catalog hash: dims
    8–23 px, an RGB gradient + hash-offset pattern."""
    hi = int(h)
    w = 8 + (hi & 0xF)
    ht = 8 + ((hi >> 4) & 0xF)
    yy, xx = np.mgrid[0:ht, 0:w]
    r = (xx * 255 // max(w - 1, 1) + (hi & 0xFF)) % 256
    g = (yy * 255 // max(ht - 1, 1) + ((hi >> 8) & 0xFF)) % 256
    b = (xx + yy + ((hi >> 16) & 0xFF)) % 256
    return encode_png(np.stack([r, g, b], axis=2).astype(np.uint8))


def _synth_audio(h: np.uint64) -> bytes:
    """Deterministic small REAL PCM WAV derived from the catalog hash:
    400-2447 samples of a hash-pitched sine + second harmonic, mono or
    stereo by a hash bit."""
    hi = int(h)
    n = 400 + (hi & 0x7FF)
    freq = 110.0 * (1 + ((hi >> 12) & 0x7))
    sr = 16_000
    t = np.arange(n) / sr
    x = (0.6 * np.sin(2 * np.pi * freq * t)
         + 0.25 * np.sin(2 * np.pi * 2 * freq * t + (hi & 0xFF) / 40.0))
    s = (x * 20_000).astype(np.int16)
    if (hi >> 20) & 1:
        s = np.stack([s, s[::-1]], axis=1)  # stereo variant
    return encode_wav(s, sr)


def _synth_table(h: np.uint64) -> bytes:
    """Deterministic small REAL Arrow IPC stream derived from the hash:
    2-17 rows of (id int64, value float64, tag string)."""
    import pyarrow.ipc as ipc

    hi = int(h)
    n = 2 + (hi & 0xF)
    ids = np.arange(n, dtype=np.int64) + (hi & 0xFFFF)
    vals = ((ids * 2654435761) % 1000) / 10.0
    tags = np.array([f"t{(hi >> (i % 32)) & 7}" for i in range(n)],
                    dtype=object)
    t = pa.table({"id": pa.array(ids), "value": pa.array(vals),
                  "tag": pa.array(tags, pa.string())})
    sink = pa.BufferOutputStream()
    with ipc.new_stream(sink, t.schema) as w:
        w.write_table(t)
    return sink.getvalue().to_pybytes()


def synthesize_payloads(media_ds, *, max_bytes: int = 4096):
    """Deterministic binary payload per media_ref. Every catalog kind is
    a REAL stream: images are PNG, audio is PCM WAV, tables are Arrow
    IPC. Unknown kinds fall back to opaque hash-expanded blobs whose size
    follows the catalog's ``bytes`` column capped at max_bytes."""

    def gen(batch: pa.Table) -> pa.Table:
        refs = batch["media_ref"].to_numpy(zero_copy_only=False)
        kinds = batch["kind"].to_numpy(zero_copy_only=False)
        sizes = np.minimum(batch["bytes"].to_numpy(zero_copy_only=False),
                           max_bytes).astype(np.int64)
        h = hash_strings(refs)
        payloads = []
        for i, n in enumerate(sizes):
            if kinds[i] == "image":
                payloads.append(_synth_image(h[i]))
                continue
            if kinds[i] == "audio":
                payloads.append(_synth_audio(h[i]))
                continue
            if kinds[i] == "table":
                payloads.append(_synth_table(h[i]))
                continue
            reps = int(n // 8) + 1
            seq = (np.arange(reps, dtype=np.uint64) * np.uint64(0x9E3779B97F4A7C15)
                   ^ h[i])
            payloads.append(seq.tobytes()[: int(n)])
        return batch.append_column("payload", pa.array(payloads, type=pa.binary()))

    return media_ds.map_batches(gen, batch_format="pyarrow", zero_copy_batch=True)


class MediaDecoder:
    """Actor-pool decode/feature-extract stage.

    PNG and PCM-WAV payloads decode for REAL (pure-stdlib codecs):
    ``decoder='png'`` rows carry true width/height + per-channel pixel
    means; ``decoder='wav'`` rows carry (width=sample_rate,
    height=n_channels, n_frames=n_samples) + RMS/peak/ZCR features.
    Arrow-IPC payloads (the 'table' kind) decode with pyarrow itself:
    (width=n_cols, height=1, n_frames=n_rows) + numeric-column-mean
    features, ``decoder='arrow'``. Unrecognized payloads (e.g. a video
    codec) take the deterministic fake path (``decoder='stub'``);
    ``strict=True`` raises NotImplementedError for them instead (the
    contract a real deployment fills)."""

    def __init__(self, feature_dim: int = 8, strict: bool = False):
        self.feature_dim = feature_dim
        self.strict = strict

    def _decode_arrow(self, payload: bytes):
        import pyarrow.ipc as ipc

        t = ipc.open_stream(payload).read_all()
        feat = np.zeros(self.feature_dim, dtype=np.float64)
        j = 0
        for col in t.columns:
            if j >= self.feature_dim:
                break
            if pa.types.is_integer(col.type) or pa.types.is_floating(col.type):
                v = col.to_numpy(zero_copy_only=False).astype(np.float64)
                feat[j] = float(np.nanmean(v)) if len(v) else 0.0
                j += 1
        return t.num_columns, 1, t.num_rows, feat.astype(np.float32)

    def _decode_png(self, payload: bytes):
        img = decode_png(payload)
        h, w, c = img.shape
        px = img.astype(np.float64)
        chan = px.reshape(-1, c).mean(axis=0)
        feat = np.zeros(self.feature_dim, dtype=np.float64)
        feat[:min(c, self.feature_dim)] = chan[:self.feature_dim]
        extras = [px.std(), px.min(), px.max()]
        for j, v in enumerate(extras):
            if c + j < self.feature_dim:
                feat[c + j] = v
        return w, h, 1, (feat / 255.0).astype(np.float32)

    def _decode_fake(self, payload: bytes, kind: str):
        if self.strict:
            raise NotImplementedError(
                "real media decode requires codec libraries not present; "
                "install PIL/soundfile/av and implement _decode_real")
        b = np.frombuffer(payload, dtype=np.uint8)
        h = int(hash_strings(np.array([payload.hex()], dtype=object))[0])
        width = 16 + (h & 0xFF)
        height = 16 + ((h >> 8) & 0xFF)
        n_frames = 1 if kind == "image" else 1 + ((h >> 16) & 0x3F)
        pad = (-len(b)) % self.feature_dim
        bb = np.pad(b, (0, pad)).reshape(-1, self.feature_dim)
        feat = (bb.mean(axis=0) / 255.0).astype(np.float32) if len(bb) else \
            np.zeros(self.feature_dim, dtype=np.float32)
        return width, height, n_frames, feat

    def __call__(self, batch: pa.Table) -> pa.Table:
        refs = batch["media_ref"].to_pylist()
        kinds = batch["kind"].to_pylist()
        payloads = batch["payload"].to_pylist()
        W, H, F, feats, decs = [], [], [], [], []
        for p, k in zip(payloads, kinds):
            p = p or b""
            if is_png(p):
                w, h, nf, ft = self._decode_png(p)
                decs.append("png")
            elif is_wav(p):
                samples, rate = decode_wav(p)
                ft = audio_features(samples, rate, self.feature_dim)
                w, h, nf = rate, samples.shape[1], len(samples)
                decs.append("wav")
            elif p[:4] == b"\xff\xff\xff\xff":  # Arrow IPC stream marker
                w, h, nf, ft = self._decode_arrow(p)
                decs.append("arrow")
            else:
                w, h, nf, ft = self._decode_fake(p, k or "image")
                decs.append("stub")
            W.append(w); H.append(h); F.append(nf); feats.append(ft)
        return pa.Table.from_arrays(
            [pa.array(refs, type=pa.string()),
             pa.array(kinds, type=pa.string()),
             pa.array([len(p or b"") for p in payloads], type=pa.int64()),
             pa.array(W, type=pa.int32()), pa.array(H, type=pa.int32()),
             pa.array(F, type=pa.int32()),
             pa.array(decs, type=pa.string()),
             pa.array([f.tolist() for f in feats], type=pa.list_(pa.float32()))],
            schema=MEDIA_FEATURES_SCHEMA)


_DECODER_SINGLETON: dict = {}


def decode_media(ds, *, concurrency: Optional[int] = None,
                 batch_size: int = 256, num_cpus: float = 1,
                 feature_dim: int = 8, actors: bool = False):
    """Decode/feature-extract. Small batch_size by design: media rows are
    big; batch × concurrency must fit worker heap — pass ``concurrency``
    to cap in-flight tasks when payloads are large (None lets Ray
    schedule by CPU). Default is a TASK pool with a per-worker decoder
    singleton — MediaDecoder's setup is two attribute assignments, so an
    actor pool only pays startup per execution; actors=True restores the
    pool for decoders whose setup loads real codec state."""
    if actors:
        return ds.map_batches(
            MediaDecoder, fn_constructor_kwargs={"feature_dim": feature_dim},
            batch_format="pyarrow", batch_size=batch_size,
            concurrency=concurrency or 2, num_cpus=num_cpus)

    def decode(batch: pa.Table) -> pa.Table:
        dec = _DECODER_SINGLETON.get(feature_dim)
        if dec is None:
            dec = _DECODER_SINGLETON[feature_dim] = MediaDecoder(
                feature_dim=feature_dim)
        return dec(batch)

    kw = {"concurrency": concurrency} if concurrency else {}
    return ds.map_batches(decode, batch_format="pyarrow",
                          batch_size=batch_size, num_cpus=num_cpus, **kw)


class ImageResizer:
    """STUB resize stage (kernel swaps in for a real PIL/cv2 resize). The
    fake deterministically rescales the fake feature payload."""

    def __init__(self, target: int = 224):
        self.target = target

    def __call__(self, batch: pa.Table) -> pa.Table:
        t = np.int32(self.target)
        n = batch.num_rows
        return (batch.set_column(batch.schema.get_field_index("width"), "width",
                                 pa.array(np.full(n, t), type=pa.int32()))
                     .set_column(batch.schema.get_field_index("height"), "height",
                                 pa.array(np.full(n, t), type=pa.int32())))


def resize_images(features_ds, *, target: int = 224, concurrency: int = 2):
    only_images = features_ds.filter(expr="kind == 'image'")
    return only_images.map_batches(
        ImageResizer, fn_constructor_kwargs={"target": target},
        batch_format="pyarrow", concurrency=concurrency)


def sample_frames(features_ds, *, every_n: int = 10):
    """Frame-sampling stub: expands each multi-frame row into sampled frame
    rows (flat_map shape) — real decoders emit one row per kept frame."""

    def expand(batch: pa.Table) -> pa.Table:
        refs = batch["media_ref"].to_pylist()
        frames = batch["n_frames"].to_pylist()
        out_ref, out_idx = [], []
        for r, nf in zip(refs, frames):
            for i in range(0, int(nf), every_n):
                out_ref.append(r)
                out_idx.append(i)
        return pa.Table.from_pydict({
            "media_ref": pa.array(out_ref, type=pa.string()),
            "frame_idx": pa.array(out_idx, type=pa.int32()),
        })

    return features_ds.map_batches(expand, batch_format="pyarrow")


def resize_media(payload_ds, *, target: int = 64, concurrency: int = 2,
                 batch_size: int = 256):
    """REAL payload-level image resize: decode PNG → nearest-neighbor
    resample to target×target → re-encode PNG; non-PNG payloads pass
    through untouched. Actor-pool stage, small batches (payload-heavy
    rows × concurrency must fit the worker heap)."""

    class Resizer:
        def __init__(self, t: int):
            self.t = t

        def __call__(self, batch: pa.Table) -> pa.Table:
            payloads = batch["payload"].to_pylist()
            out = []
            for p in payloads:
                p = p or b""
                if is_png(p):
                    img = resize_nearest(decode_png(p), self.t, self.t)
                    out.append(encode_png(img))
                else:
                    out.append(p)
            i = batch.schema.get_field_index("payload")
            return batch.set_column(i, "payload",
                                    pa.array(out, type=pa.binary()))

    return payload_ds.map_batches(
        Resizer, fn_constructor_kwargs={"t": target},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency, num_cpus=1)
