"""GIF video codec: LZW roundtrip, frame sampling, multimodal wiring."""

import numpy as np
import pyarrow as pa
import ray.data

from graphscope_ray.functions.video import (
    _lzw_decode,
    _lzw_encode,
    decode_gif_frames,
    encode_gif,
    frame_sample_features,
    probe_gif,
)

_LV = np.array([0, 51, 102, 153, 204, 255], dtype=np.uint8)


def test_lzw_roundtrip_stress():
    rng = np.random.RandomState(1)
    streams = [
        rng.randint(0, 256, 20000),  # random → dict overflow + CLEAR resets
        np.tile(np.arange(256), 40),  # periodic → deep chains, width bumps
        np.zeros(10000, dtype=int),  # max KwKwK stress
        np.repeat(np.arange(50), 123),
        np.array([7]),  # single-pixel stream
    ]
    for arr in streams:
        enc = _lzw_encode(arr.astype(np.int64), 8)
        assert (_lzw_decode(8, enc, len(arr)) == arr).all()
    # compression actually compresses structured input
    assert len(_lzw_encode(np.zeros(10000, dtype=np.int64), 8)) < 400


def test_gif_roundtrip_and_frame_sampling():
    rng = np.random.RandomState(2)
    frames = _LV[rng.randint(0, 6, (6, 24, 32, 3))]
    payload = encode_gif(frames, delay_cs=5)
    meta = probe_gif(payload)
    assert meta == {
        "format": "gif", "width": 32, "height": 24,
        "n_frames": 6, "total_delay_cs": 30,
    }
    assert (decode_gif_frames(payload) == frames).all()
    # stride sampling decodes only frames 0,2,4; max_frames caps
    assert (decode_gif_frames(payload, frame_stride=2) == frames[[0, 2, 4]]).all()
    assert decode_gif_frames(payload, frame_stride=2, max_frames=2).shape[0] == 2
    f = frame_sample_features(frames, 16)
    assert f.shape == (16,) and f.dtype == np.float32


def test_video_through_media_extractor():
    from graphscope_ray.functions.multimodal import extract_media_features

    rng = np.random.RandomState(3)
    payloads = [
        encode_gif(_LV[rng.randint(0, 6, (3 + i, 8, 8, 3))]) for i in range(4)
    ]
    ds = ray.data.from_arrow(
        pa.table(
            {"media_id": pa.array(np.arange(4, dtype=np.int64)),
             "media": pa.array(payloads, pa.binary())}
        )
    )
    out = extract_media_features(ds, strict=True).to_pandas().sort_values("media_id")
    assert out["format"].tolist() == ["gif"] * 4
    assert out["n_frames"].tolist() == [3, 4, 5, 6]
    assert out["width"].tolist() == [8] * 4
    assert all(len(f) == 16 for f in out["feature"])
