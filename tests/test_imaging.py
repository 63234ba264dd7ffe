"""Pure-Python image kernels: PNG decode vs forward-filtered fixtures,
header probing, featurization, and the multimodal pipeline on real PNGs.
(No Ray needed for the pure kernels; the pipeline test uses the session.)"""

import struct
import zlib

import numpy as np
import pytest

import ray.data
from graphscope_ray.functions import multimodal
from graphscope_ray.functions.imaging import (
    PNG_MAGIC,
    UnsupportedImageError,
    decode_png,
    encode_png,
    mean_pool_features,
    probe_image,
)


def test_png_roundtrip_all_channel_counts():
    rng = np.random.RandomState(0)
    for c in (1, 2, 3, 4):
        img = rng.randint(0, 256, (11, 7, c), dtype=np.uint8)
        out = decode_png(encode_png(img))
        assert out.shape == (11, 7, c)
        assert np.array_equal(out, img), c


def _forward_filter(img: np.ndarray, ftypes: list[int]) -> bytes:
    """Apply PNG forward filters row by row (spec §9) to build a fixture."""
    h, w, c = img.shape
    stride = w * c
    flat = img.reshape(h, stride).astype(np.int64)
    prev = np.zeros(stride, dtype=np.int64)
    out = bytearray()
    for y in range(h):
        cur = flat[y]
        ft = ftypes[y % len(ftypes)]
        enc = np.zeros(stride, dtype=np.int64)
        for x in range(stride):
            a = cur[x - c] if x >= c else 0
            b = prev[x]
            cc = prev[x - c] if x >= c else 0
            if ft == 0:
                pred = 0
            elif ft == 1:
                pred = a
            elif ft == 2:
                pred = b
            elif ft == 3:
                pred = (a + b) >> 1
            else:
                p = a + b - cc
                pa_, pb, pc_ = abs(p - a), abs(p - b), abs(p - cc)
                pred = a if (pa_ <= pb and pa_ <= pc_) else (b if pb <= pc_ else cc)
            enc[x] = (cur[x] - pred) & 0xFF
        out += bytes([ft]) + enc.astype(np.uint8).tobytes()
        prev = cur
    return bytes(out)


def test_png_decode_every_filter_type():
    rng = np.random.RandomState(5)
    img = rng.randint(0, 256, (10, 6, 3), dtype=np.uint8)
    raw = _forward_filter(img, [0, 1, 2, 3, 4])

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    payload = (
        PNG_MAGIC
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 6, 10, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    assert np.array_equal(decode_png(payload), img)


def test_probe_formats():
    png = encode_png(np.zeros((3, 5, 3), np.uint8))
    assert probe_image(png) == {"format": "png", "width": 5, "height": 3}
    gif = b"GIF89a" + struct.pack("<HH", 320, 200) + b"\0" * 10
    assert probe_image(gif) == {"format": "gif", "width": 320, "height": 200}
    bmp = b"BM" + b"\0" * 16 + struct.pack("<ii", 640, -480) + b"\0" * 10
    assert probe_image(bmp) == {"format": "bmp", "width": 640, "height": 480}
    # minimal JPEG: SOI + APP0(len 4) + SOF0
    jpeg = (
        b"\xff\xd8\xff\xe0" + struct.pack(">H", 4) + b"JF"
        + b"\xff\xc0" + struct.pack(">H", 11) + b"\x08" + struct.pack(">HH", 240, 360)
        + b"\x03" + b"\0" * 20
    )
    assert probe_image(jpeg) == {"format": "jpeg", "width": 360, "height": 240}
    assert probe_image(b"not an image at all....") is None


def test_unsupported_png_variants_raise():
    # 16-bit depth
    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    p16 = PNG_MAGIC + chunk(b"IHDR", struct.pack(">IIBBBBB", 4, 4, 16, 2, 0, 0, 0))
    with pytest.raises(UnsupportedImageError):
        decode_png(p16)
    with pytest.raises(UnsupportedImageError):
        decode_png(b"junkjunkjunk")


def test_mean_pool_features_shape_and_range():
    img = np.full((16, 16, 3), 128, np.uint8)
    f = mean_pool_features(img, 16)
    assert f.shape == (16,) and f.dtype == np.float32
    assert np.allclose(f, 128 / 255.0, atol=1e-6)


def test_pipeline_decodes_real_pngs_strict():
    t = multimodal.fake_media_table(n=12, seed=1, kind="png")
    ds = ray.data.from_arrow(t)
    out = multimodal.extract_media_features(ds, feat_dim=9, strict=True).to_pandas()
    assert len(out) == 12
    assert (out["format"] == "png").all()
    assert (out["width"] == 8).all()
    assert out["height"].between(8, 15).all()
    # features are real pixel means, not hash noise: re-derive one row
    row = out.sort_values("media_id").iloc[0]
    img = decode_png(t["media"][0].as_py())
    assert np.allclose(row["feature"], mean_pool_features(img, 9), atol=1e-6)


def test_wav_roundtrip_and_probe():
    from graphscope_ray.functions.audio import decode_wav, encode_wav, probe_wav

    t = np.linspace(0, 1, 8000)
    stereo = np.stack([np.sin(2 * np.pi * 440 * t), np.sin(2 * np.pi * 220 * t)], axis=1)
    wav = encode_wav(stereo, sample_rate=8000)
    meta = probe_wav(wav)
    assert meta == {
        "format": "wav", "channels": 2, "sample_rate": 8000, "bits": 16, "n_frames": 8000,
    }
    samples, rate = decode_wav(wav)
    assert rate == 8000 and samples.shape == (8000, 2)
    # int16 truncation + the 32767/32768 scale mismatch ≈ 2 LSB
    assert np.allclose(samples, stereo, atol=1e-4)
    assert probe_wav(b"not audio at all...........................................") is None


def test_pipeline_decodes_wav_strict():
    from graphscope_ray.functions.audio import encode_wav, frame_energy_features, decode_wav

    rng = np.random.RandomState(4)
    payloads = [encode_wav(rng.randn(1000) * 0.2, sample_rate=4000) for _ in range(6)]
    import pyarrow as pa

    t = pa.table(
        {
            "media_id": pa.array(list(range(6)), pa.int64()),
            "media": pa.array(payloads, pa.binary()),
        }
    )
    out = multimodal.extract_media_features(
        ray.data.from_arrow(t), feat_dim=6, strict=True
    ).to_pandas()
    assert (out["format"] == "wav").all()
    row = out.sort_values("media_id").iloc[0]
    want = frame_energy_features(decode_wav(payloads[0])[0], 6)
    assert np.allclose(row["feature"], want, atol=1e-6)


def test_bmp_roundtrip_and_variants():
    from graphscope_ray.functions.imaging import (
        UnsupportedImageError,
        decode_bmp,
        encode_bmp,
        probe_image,
    )

    rng = np.random.RandomState(7)
    for h, w in [(1, 1), (3, 5), (8, 8), (5, 7)]:  # odd widths exercise padding
        img = rng.randint(0, 256, (h, w, 3), dtype=np.uint8)
        b = encode_bmp(img)
        assert probe_image(b) == {"format": "bmp", "width": w, "height": h}
        assert (decode_bmp(b) == img).all()
    # top-down variant (negative height)
    img = rng.randint(0, 256, (4, 3, 3), dtype=np.uint8)
    b = bytearray(encode_bmp(img[::-1]))
    import struct

    b[22:26] = struct.pack("<i", -4)
    assert (decode_bmp(bytes(b)) == img[::-1][::-1]).all()
    import pytest

    with pytest.raises(UnsupportedImageError):
        decode_bmp(b"BM" + b"\0" * 60)  # bpp=0


def test_pipeline_decodes_bmp_strict():
    from graphscope_ray.functions.imaging import encode_bmp, mean_pool_features, decode_bmp

    rng = np.random.RandomState(9)
    payloads = [
        encode_bmp(rng.randint(0, 256, (6, 5, 3), dtype=np.uint8)) for _ in range(5)
    ]
    import pyarrow as pa

    t = pa.table(
        {
            "media_id": pa.array(list(range(5)), pa.int64()),
            "media": pa.array(payloads, pa.binary()),
        }
    )
    out = multimodal.extract_media_features(
        ray.data.from_arrow(t), feat_dim=8, strict=True
    ).to_pandas()
    assert (out["format"] == "bmp").all()
    row = out.sort_values("media_id").iloc[0]
    want = mean_pool_features(decode_bmp(payloads[0]), 8)
    assert np.allclose(row["feature"], want, atol=1e-6)
