"""Multimodal (image/audio/video) column plumbing.

Media are opaque ``binary`` columns with typed metadata.  The decode kernels
themselves are STUBBED (no image/audio libraries in this environment): each
stage is a real actor-pool ``map_batches`` stage with the production batch
size / schema / actor signature, but the pixel-level work is either a
deterministic fake (so the plumbing is testable end-to-end) or raises
``NotImplementedError`` when ``strict=True``.

Swap ``_decode_stub`` for PIL/ffmpeg in a real deployment — nothing else
changes: the stage contract is binary in → fixed-shape float features out.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data


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

    def __init__(self, feat_dim: int = 16, strict: bool = False):
        # real impl would load the model / codec here, once per actor
        self.feat_dim = feat_dim
        self.strict = strict

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.strict:
            raise NotImplementedError(
                "media decode requires an image/audio library not present in this environment"
            )
        payloads = batch["media"].to_pylist()
        feats = [_decode_stub(p, self.feat_dim) for p in payloads]
        shas = [hashlib.sha256(p).hexdigest() for p in payloads]
        return pa.table(
            {
                "media_id": batch["media_id"],
                "n_bytes": pa.array([len(p) for p in payloads], pa.int64()),
                "media_sha256": pa.array(shas, pa.string()),
                "feature": pa.array(
                    [f.tolist() for f in feats], pa.list_(pa.float32(), self.feat_dim)
                ),
            }
        )


def extract_media_features(
    ds: ray.data.Dataset,
    feat_dim: int = 16,
    concurrency=(1, 4),
    batch_size: int = 64,
    strict: bool = False,
) -> ray.data.Dataset:
    """ds must have columns (media_id: int64, media: binary)."""
    return ds.map_batches(
        MediaFeatureExtractor,
        fn_constructor_kwargs={"feat_dim": feat_dim, "strict": strict},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def fake_media_table(n: int = 32, seed: int = 0) -> pa.Table:
    """Deterministic synthetic binary payloads for plumbing tests."""
    rng = np.random.RandomState(seed)
    payloads = [rng.bytes(64 + int(rng.randint(256))) for _ in range(n)]
    return pa.table(
        {
            "media_id": pa.array(np.arange(n, dtype=np.int64)),
            "media": pa.array(payloads, pa.binary()),
        }
    )
