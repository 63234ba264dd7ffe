"""Baseline JPEG codec (functions/jpeg.py): round-trip accuracy across
quality / subsampling / restart intervals, strict-mode format boundary
(progressive raises), and the multimodal pipeline integration."""

import numpy as np
import pytest
import ray.data

from graphscope_ray.functions.imaging import UnsupportedImageError, probe_image
from graphscope_ray.functions.jpeg import decode_jpeg, encode_jpeg
from graphscope_ray.functions.multimodal import (
    extract_media_features,
    fake_media_table,
)


def _gradient(h=40, w=56):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack(
        [(yy * 3 + 10) % 256, (xx * 2 + 50) % 256, ((yy + xx) * 2) % 256], axis=-1
    ).astype(np.uint8)


def test_roundtrip_accuracy_color():
    img = _gradient()
    for q, sub, tol in [(95, "4:4:4", 2), (75, "4:4:4", 5), (95, "4:2:0", 4)]:
        dec = decode_jpeg(encode_jpeg(img, quality=q, subsampling=sub))
        assert dec.shape == img.shape
        assert np.abs(dec.astype(int) - img.astype(int)).max() <= tol, (q, sub)


def test_roundtrip_grayscale_and_odd_sizes():
    rng = np.random.RandomState(3)
    for h, w in [(8, 8), (9, 13), (17, 24), (40, 56)]:
        yy, xx = np.mgrid[0:h, 0:w]
        g = ((yy * 2 + xx) % 200 + 20).astype(np.uint8)
        dec = decode_jpeg(encode_jpeg(g, quality=95))
        assert dec.shape == (h, w, 1)
        assert np.abs(dec[:, :, 0].astype(int) - g.astype(int)).max() <= 3
    noisy = rng.randint(0, 256, (24, 24, 3), dtype=np.uint8)
    dec = decode_jpeg(encode_jpeg(noisy, quality=98))
    assert np.abs(dec.astype(int) - noisy.astype(int)).max() <= 16


def test_restart_markers_bit_identical():
    img = _gradient()
    base = decode_jpeg(encode_jpeg(img, quality=90))
    for ri in (1, 2, 5):
        dec = decode_jpeg(encode_jpeg(img, quality=90, restart_interval=ri))
        assert (dec == base).all(), ri
    dec = decode_jpeg(encode_jpeg(img, quality=90, subsampling="4:2:0", restart_interval=2))
    assert np.abs(dec.astype(int) - img.astype(int)).max() <= 6


def test_probe_reports_dimensions():
    img = _gradient(23, 31)
    meta = probe_image(encode_jpeg(img))
    assert meta == {"format": "jpeg", "width": 31, "height": 23}


def test_progressive_raises_unsupported():
    enc = bytearray(encode_jpeg(_gradient(16, 16), quality=80))
    # flip SOF0 (0xFFC0) to SOF2 (progressive) — the documented boundary
    i = enc.find(b"\xff\xc0")
    enc[i + 1] = 0xC2
    with pytest.raises(UnsupportedImageError, match="baseline"):
        decode_jpeg(bytes(enc))
    with pytest.raises(UnsupportedImageError):
        decode_jpeg(b"\x00\x01not a jpeg")


def test_multimodal_pipeline_decodes_jpeg_strict():
    # strict=True: every payload must REALLY decode — no stub fallback
    ds = ray.data.from_arrow(fake_media_table(n=12, seed=4, kind="jpeg"))
    out = extract_media_features(ds, feat_dim=9, strict=True, batch_size=4).to_pandas()
    assert len(out) == 12
    assert (out["format"] == "jpeg").all()
    assert out["width"].notna().all()
    # features are real mean-pooled pixels: deterministic across runs
    out2 = extract_media_features(ds, feat_dim=9, strict=True, batch_size=4).to_pandas()
    a = np.stack(out.sort_values("media_id")["feature"].to_numpy())
    b = np.stack(out2.sort_values("media_id")["feature"].to_numpy())
    assert (a == b).all()
