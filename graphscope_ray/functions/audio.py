"""Pure-Python audio kernels: WAV (RIFF/PCM) probing and decoding.

PCM WAV needs no codec — the RIFF container is plain struct parsing and the
samples are a numpy ``frombuffer`` — so the multimodal audio path decodes
REAL waveforms for WAV payloads (8/16/32-bit integer and float32 PCM);
compressed formats (mp3/aac/...) stay behind the stub.
"""

from __future__ import annotations

import struct

import numpy as np


class UnsupportedAudioError(ValueError):
    pass


def probe_wav(payload: bytes) -> dict | None:
    """Sniff a RIFF/WAVE header: returns {"format", "channels", "sample_rate",
    "bits", "n_frames"} or None for non-WAV bytes."""
    if len(payload) < 44 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        return None
    pos = 12
    fmt = None
    data_len = None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (clen,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        if cid == b"fmt ":
            (audio_fmt, ch, rate, _br, _ba, bits) = struct.unpack(
                "<HHIIHH", payload[pos + 8 : pos + 24]
            )
            fmt = (audio_fmt, ch, rate, bits)
        elif cid == b"data":
            data_len = clen
        pos += 8 + clen + (clen & 1)
    if fmt is None:
        return None
    audio_fmt, ch, rate, bits = fmt
    frames = (
        data_len // max(1, ch * (bits // 8)) if data_len is not None else None
    )
    return {
        "format": "wav",
        "channels": int(ch),
        "sample_rate": int(rate),
        "bits": int(bits),
        "n_frames": int(frames) if frames is not None else None,
    }


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """Decode PCM WAV to (samples float64 in [-1, 1] shaped (frames,
    channels), sample_rate).  Supports integer PCM 8/16/32 and float32."""
    meta = probe_wav(payload)
    if meta is None:
        raise UnsupportedAudioError("not a RIFF/WAVE payload")
    pos = 12
    audio_fmt = None
    raw = None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (clen,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        if cid == b"fmt ":
            (audio_fmt, _ch, _rate, _br, _ba, _bits) = struct.unpack(
                "<HHIIHH", payload[pos + 8 : pos + 24]
            )
        elif cid == b"data":
            raw = payload[pos + 8 : pos + 8 + clen]
        pos += 8 + clen + (clen & 1)
    ch, bits = meta["channels"], meta["bits"]
    if raw is None:
        raise UnsupportedAudioError("missing data chunk")
    if audio_fmt == 1:  # integer PCM
        if bits == 8:  # unsigned
            x = np.frombuffer(raw, dtype=np.uint8).astype(np.float64)
            x = (x - 128.0) / 128.0
        elif bits == 16:
            x = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
        elif bits == 32:
            x = np.frombuffer(raw, dtype="<i4").astype(np.float64) / 2147483648.0
        else:
            raise UnsupportedAudioError(f"PCM bits={bits}")
    elif audio_fmt == 3 and bits == 32:  # IEEE float
        x = np.frombuffer(raw, dtype="<f4").astype(np.float64)
    else:
        raise UnsupportedAudioError(f"audio format {audio_fmt} (need PCM or float32)")
    n = (len(x) // ch) * ch
    return x[:n].reshape(-1, ch), meta["sample_rate"]


def encode_wav(samples: np.ndarray, sample_rate: int = 8000) -> bytes:
    """Minimal 16-bit PCM WAV writer (test/synthetic-media fixture)."""
    s = np.asarray(samples)
    if s.ndim == 1:
        s = s[:, None]
    x = np.clip(s, -1.0, 1.0)
    pcm = (x * 32767.0).astype("<i2").tobytes()
    ch = s.shape[1]
    ba = ch * 2
    hdr = (
        b"RIFF"
        + struct.pack("<I", 36 + len(pcm))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<IHHIIHH", 16, 1, ch, sample_rate, sample_rate * ba, ba, 16)
        + b"data"
        + struct.pack("<I", len(pcm))
    )
    return hdr + pcm


def frame_energy_features(
    samples: np.ndarray, feat_dim: int
) -> np.ndarray:
    """Fixed-length RMS-energy profile: the (frames, ch) waveform is
    mono-mixed and split into feat_dim equal windows, one RMS per window —
    a real, deterministic decode→feature stage."""
    mono = np.asarray(samples, dtype=np.float64).mean(axis=1)
    if mono.size == 0:
        return np.zeros(feat_dim, dtype=np.float32)
    bounds = np.linspace(0, mono.size, feat_dim + 1).astype(int)
    out = np.empty(feat_dim, dtype=np.float32)
    for i in range(feat_dim):
        seg = mono[bounds[i] : max(bounds[i + 1], bounds[i] + 1)]
        out[i] = np.sqrt((seg**2).mean()) if seg.size else 0.0
    return out
