"""Multimodal (image/audio/video) plumbing.

Media payloads are opaque ``binary`` columns with typed metadata — the
engine's schema treatment of the interleaved ``media_ref`` spans. The
decode/resize/frame-sample kernels need codec libraries that are NOT in
this container, so the decode step is STUBBED: ``MediaDecoder`` tries the
real libraries (PIL / soundfile) and otherwise produces a clearly-marked
deterministic fake derived from the payload hash. Everything Ray-side —
schema, actor-pool signature, batch sizing, output layout — is real and
tested, so swapping the kernel for a real decoder changes one method.

Actor-pool pattern: heavyweight setup (codec init) in __init__ (once per
actor), per-batch work in __call__ — the engine's ST2/ST5 stateful-stage
idiom (SURVEY.md §2.3).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..determinism import hash_strings

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


def synthesize_payloads(media_ds, *, max_bytes: int = 4096):
    """Deterministic opaque binary payload per media_ref (hash-expanded).

    Stands in for reading real blobs; payload size follows the catalog's
    ``bytes`` column capped at max_bytes so blocks stay bounded."""

    def gen(batch: pa.Table) -> pa.Table:
        refs = batch["media_ref"].to_numpy(zero_copy_only=False)
        sizes = np.minimum(batch["bytes"].to_numpy(zero_copy_only=False),
                           max_bytes).astype(np.int64)
        h = hash_strings(refs)
        payloads = []
        for i, n in enumerate(sizes):
            reps = int(n // 8) + 1
            seq = (np.arange(reps, dtype=np.uint64) * np.uint64(0x9E3779B97F4A7C15)
                   ^ h[i])
            payloads.append(seq.tobytes()[: int(n)])
        return batch.append_column("payload", pa.array(payloads, type=pa.binary()))

    return media_ds.map_batches(gen, batch_format="pyarrow", zero_copy_batch=True)


class MediaDecoder:
    """Actor-pool decode/feature-extract stage.

    STUB: real decoding requires PIL/soundfile/av, absent here. The fake
    path is deterministic in the payload bytes; ``strict=True`` raises
    NotImplementedError instead (the contract a real deployment fills)."""

    def __init__(self, feature_dim: int = 8, strict: bool = False):
        self.feature_dim = feature_dim
        self.strict = strict
        try:  # pragma: no cover - libs not installed in this sandbox
            from PIL import Image  # noqa: F401

            self.real_image = True
        except ImportError:
            self.real_image = False

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
        W, H, F, feats = [], [], [], []
        for p, k in zip(payloads, kinds):
            w, h, nf, ft = self._decode_fake(p or b"", k or "image")
            W.append(w); H.append(h); F.append(nf); feats.append(ft)
        return pa.Table.from_arrays(
            [pa.array(refs, type=pa.string()),
             pa.array(kinds, type=pa.string()),
             pa.array([len(p or b"") for p in payloads], type=pa.int64()),
             pa.array(W, type=pa.int32()), pa.array(H, type=pa.int32()),
             pa.array(F, type=pa.int32()),
             pa.array(["stub"] * len(refs), type=pa.string()),
             pa.array([f.tolist() for f in feats], type=pa.list_(pa.float32()))],
            schema=MEDIA_FEATURES_SCHEMA)


def decode_media(ds, *, concurrency: int = 2, batch_size: int = 256,
                 num_cpus: float = 1, feature_dim: int = 8):
    """Decode/feature-extract as an actor pool. Small batch_size by design:
    media rows are big; batch × concurrency must fit worker heap."""
    return ds.map_batches(
        MediaDecoder, fn_constructor_kwargs={"feature_dim": feature_dim},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency, num_cpus=num_cpus)


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
