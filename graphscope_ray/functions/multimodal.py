"""Multimodal (image/audio/video) column plumbing.

Media are opaque ``binary`` columns with typed metadata.  The decode stage
is REAL for every probed format — PNG (pure-Python zlib+unfilter) and BMP
in functions/imaging.py, baseline-DCT JPEG in functions/jpeg.py, PCM WAV
audio (functions/audio.py), and animated-GIF video (pure-Python LZW with
container-level frame sampling, functions/video.py).  Only unknown byte
blobs (or unsupported format variants, e.g. progressive JPEG) fall back to
the deterministic hash stub — or raise under ``strict=True``.  The stage
contract (binary in → fixed-shape float features out, actor-pool
``map_batches``, SMALL batch sizes for payload-dominated blocks) is the
production shape — heavier codecs swap into the kernel, nothing else
changes.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from graphscope_ray.functions.imaging import (
    UnsupportedImageError,
    decode_png,
    encode_png,
    mean_pool_features,
    probe_image,
)


def _decode_stub(payload: bytes, feat_dim: int) -> np.ndarray:
    """Deterministic fake 'decoded features': hash-seeded pseudo-pixels.
    Stands in for decode→resize→embed; replace with a real codec."""
    seed = int.from_bytes(hashlib.blake2b(payload, digest_size=4).digest(), "little")
    rng = np.random.RandomState(seed)
    return rng.rand(feat_dim).astype(np.float32)


class MediaFeatureExtractor:
    """Actor-pool stage: (id, media binary) → (id, n_bytes, media_sha256,
    feature list<float32>).  batch_size must stay SMALL for large payloads
    (blocks are payload-dominated); concurrency × num_cpus sized per node."""

    def __init__(self, feat_dim: int = 16, strict: bool = False, frame_stride: int = 2):
        # real impl would load the model / codec here, once per actor
        self.feat_dim = feat_dim
        self.strict = strict
        self.frame_stride = frame_stride  # video frame-sampling stride

    def __call__(self, batch: pa.Table) -> pa.Table:
        from graphscope_ray.functions.audio import (
            UnsupportedAudioError,
            decode_wav,
            frame_energy_features,
            probe_wav,
        )

        from graphscope_ray.functions.video import (
            UnsupportedVideoError,
            decode_gif_frames,
            frame_sample_features,
            probe_gif,
        )

        payloads = batch["media"].to_pylist()
        feats, fmts, widths, heights, nframes = [], [], [], [], []
        for p in payloads:
            meta = probe_image(p) or probe_wav(p)
            if meta and meta["format"] == "gif":
                meta = probe_gif(p) or meta  # container-level frame count
            fmts.append(meta["format"] if meta else None)
            widths.append(meta.get("width") if meta else None)
            heights.append(meta.get("height") if meta else None)
            nframes.append(meta.get("n_frames") if meta else None)
            if meta and meta["format"] == "gif":
                try:
                    # REAL frames: LZW decode of every frame_stride-th frame
                    frames = decode_gif_frames(p, frame_stride=self.frame_stride)
                    feats.append(frame_sample_features(frames, self.feat_dim))
                    continue
                except UnsupportedVideoError:
                    pass
            if meta and meta["format"] == "png":
                try:
                    img = decode_png(p)  # REAL pixels (pure-Python zlib+unfilter)
                    feats.append(mean_pool_features(img, self.feat_dim))
                    continue
                except UnsupportedImageError:
                    pass
            if meta and meta["format"] == "bmp":
                try:
                    from graphscope_ray.functions.imaging import decode_bmp

                    img = decode_bmp(p)  # REAL pixels (byte parse + reshape)
                    feats.append(mean_pool_features(img, self.feat_dim))
                    continue
                except UnsupportedImageError:
                    pass
            if meta and meta["format"] == "jpeg":
                try:
                    from graphscope_ray.functions.jpeg import decode_jpeg

                    img = decode_jpeg(p)  # REAL pixels (baseline-DCT decode)
                    feats.append(mean_pool_features(img, self.feat_dim))
                    continue
                except UnsupportedImageError:
                    pass
            if meta and meta["format"] == "wav":
                try:
                    samples, _rate = decode_wav(p)  # REAL waveform (PCM parse)
                    feats.append(frame_energy_features(samples, self.feat_dim))
                    continue
                except UnsupportedAudioError:
                    pass
            if self.strict:
                raise NotImplementedError(
                    "only PNG/BMP/baseline-JPEG images, PCM WAV audio and GIF "
                    "video decode natively here; this payload is an unknown "
                    "blob or an unsupported variant (e.g. progressive JPEG) "
                    f"(format={fmts[-1]!r})"
                )
            feats.append(_decode_stub(p, self.feat_dim))
        shas = [hashlib.sha256(p).hexdigest() for p in payloads]
        return pa.table(
            {
                "media_id": batch["media_id"],
                "n_bytes": pa.array([len(p) for p in payloads], pa.int64()),
                "media_sha256": pa.array(shas, pa.string()),
                "format": pa.array(fmts, pa.string()),
                "width": pa.array(widths, pa.int64()),
                "height": pa.array(heights, pa.int64()),
                "n_frames": pa.array(nframes, pa.int64()),
                "feature": pa.array(
                    [np.asarray(f, np.float32).tolist() for f in feats],
                    pa.list_(pa.float32(), self.feat_dim),
                ),
            }
        )


def extract_media_features(
    ds: ray.data.Dataset,
    feat_dim: int = 16,
    concurrency=(1, 4),
    batch_size: int = 64,
    strict: bool = False,
    frame_stride: int = 2,
) -> ray.data.Dataset:
    """ds must have columns (media_id: int64, media: binary)."""
    return ds.map_batches(
        MediaFeatureExtractor,
        fn_constructor_kwargs={
            "feat_dim": feat_dim,
            "strict": strict,
            "frame_stride": frame_stride,
        },
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def fake_media_table(n: int = 32, seed: int = 0, kind: str = "blob") -> pa.Table:
    """Deterministic synthetic binary payloads for plumbing tests.
    kind="blob" → opaque random bytes (exercises the stub/strict path);
    kind="png"/"jpeg" → REAL deterministic images (exercise the decoders)."""
    rng = np.random.RandomState(seed)
    if kind == "png":
        payloads = [
            encode_png(rng.randint(0, 256, (8 + int(rng.randint(8)), 8, 3), dtype=np.uint8))
            for _ in range(n)
        ]
    elif kind == "jpeg":
        from graphscope_ray.functions.jpeg import encode_jpeg

        payloads = [
            encode_jpeg(
                rng.randint(0, 256, (8 + int(rng.randint(8)), 8, 3), dtype=np.uint8),
                quality=90,
                subsampling="4:2:0" if i % 2 else "4:4:4",
            )
            for i in range(n)
        ]
    else:
        payloads = [rng.bytes(64 + int(rng.randint(256))) for _ in range(n)]
    return pa.table(
        {
            "media_id": pa.array(np.arange(n, dtype=np.int64)),
            "media": pa.array(payloads, pa.binary()),
        }
    )
