"""Pure-Python image kernels: format probing + real PNG/BMP decoders.

No codec libraries exist in this environment, but PNG needs only ``zlib``
(stdlib) plus per-scanline unfiltering, BMP is plain byte parsing, and
baseline-DCT JPEG is implemented from the public spec in
functions/jpeg.py — so the multimodal pipeline's decode stage is REAL for
every probed format, with the hash-stub only as the fallback for unknown
bytes.

Decoder scope (documented limits, asserted): 8-bit depth, color types
0 (gray), 2 (RGB), 4 (gray+alpha), 6 (RGBA), non-interlaced — the standard
output of virtually every PNG encoder.  Palette / 16-bit / Adam7 raise
``UnsupportedImageError``.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


class UnsupportedImageError(ValueError):
    pass


def probe_image(payload: bytes) -> dict | None:
    """Sniff format + dimensions from the header bytes (no full decode).
    Returns {"format", "width", "height"} or None for unknown bytes."""
    if payload[:8] == PNG_MAGIC and len(payload) >= 24 and payload[12:16] == b"IHDR":
        w, h = struct.unpack(">II", payload[16:24])
        return {"format": "png", "width": int(w), "height": int(h)}
    if payload[:6] in (b"GIF87a", b"GIF89a") and len(payload) >= 10:
        w, h = struct.unpack("<HH", payload[6:10])
        return {"format": "gif", "width": int(w), "height": int(h)}
    if payload[:2] == b"BM" and len(payload) >= 26:
        w, h = struct.unpack("<ii", payload[18:26])
        return {"format": "bmp", "width": int(w), "height": abs(int(h))}
    if payload[:3] == b"\xff\xd8\xff":
        # JPEG: walk the marker stream to the first SOF0-SOF15 frame header
        i = 2
        n = len(payload)
        while i + 9 < n:
            if payload[i] != 0xFF:
                i += 1
                continue
            marker = payload[i + 1]
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                i += 2
                continue
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                h, w = struct.unpack(">HH", payload[i + 5 : i + 9])
                return {"format": "jpeg", "width": int(w), "height": int(h)}
            seg_len = struct.unpack(">H", payload[i + 2 : i + 4])[0]
            i += 2 + seg_len
        return {"format": "jpeg", "width": None, "height": None}
    return None


_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def decode_png(payload: bytes) -> np.ndarray:
    """Decode a PNG to an (h, w, channels) uint8 array: parse chunks,
    zlib-inflate the IDAT stream, reverse the per-scanline filters
    (None/Sub/Up/Average/Paeth) with vectorized row math."""
    if payload[:8] != PNG_MAGIC:
        raise UnsupportedImageError("not a PNG")
    pos = 8
    ihdr = None
    idat = bytearray()
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + type + data + crc
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"IDAT":
            idat.extend(data)
        elif ctype == b"IEND":
            break
    if ihdr is None:
        raise UnsupportedImageError("missing IHDR")
    w, h, depth, color, comp, filt, interlace = ihdr
    if depth != 8 or color not in _CHANNELS or interlace != 0:
        raise UnsupportedImageError(
            f"unsupported PNG variant (depth={depth}, color={color}, interlace={interlace})"
        )
    c = _CHANNELS[color]
    raw = zlib.decompress(bytes(idat))
    stride = w * c
    if len(raw) != h * (stride + 1):
        raise UnsupportedImageError("IDAT length mismatch")
    rows = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride + 1)
    ftypes = rows[:, 0]
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int64)
    for y in range(h):
        cur = rows[y, 1:].astype(np.int64)
        ft = ftypes[y]
        if ft == 0:
            line = cur
        elif ft == 2:  # Up
            line = (cur + prev) & 0xFF
        elif ft == 1:  # Sub: mod-256 prefix sum along x per channel
            line = (cur.reshape(w, c).cumsum(axis=0) & 0xFF).reshape(stride)
        elif ft == 3:  # Average
            line = cur.copy()
            for x in range(stride):
                left = line[x - c] if x >= c else 0
                line[x] = (line[x] + ((left + prev[x]) >> 1)) & 0xFF
        elif ft == 4:  # Paeth
            line = cur.copy()
            for x in range(stride):
                a = line[x - c] if x >= c else 0
                b = prev[x]
                cc = prev[x - c] if x >= c else 0
                p = a + b - cc
                pa_, pb, pc_ = abs(p - a), abs(p - b), abs(p - cc)
                pred = a if (pa_ <= pb and pa_ <= pc_) else (b if pb <= pc_ else cc)
                line[x] = (line[x] + pred) & 0xFF
        else:
            raise UnsupportedImageError(f"bad filter {ft}")
        out[y] = line.astype(np.uint8)
        prev = line
    return out.reshape(h, w, c)


def encode_png(img: np.ndarray) -> bytes:
    """Minimal PNG writer (filter 0 rows, one IDAT) — the deterministic
    fixture generator for tests and synthetic media tables."""
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, c = img.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}[c]

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    raw = b"".join(b"\x00" + img[y].tobytes() for y in range(h))
    return (
        PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def mean_pool_features(img: np.ndarray, feat_dim: int) -> np.ndarray:
    """Resize-by-block-mean to a fixed-length float32 feature vector: the
    image is partitioned into ~feat_dim cells (per channel averaged first),
    each cell mean-pooled — a real, deterministic decode→resize→featurize."""
    gray = img.astype(np.float32).mean(axis=2) / 255.0
    h, w = gray.shape
    g = int(np.ceil(np.sqrt(feat_dim)))
    ys = np.linspace(0, h, g + 1).astype(int)
    xs = np.linspace(0, w, g + 1).astype(int)
    cells = []
    for i in range(g):
        for j in range(g):
            block = gray[ys[i] : max(ys[i + 1], ys[i] + 1), xs[j] : max(xs[j + 1], xs[j] + 1)]
            cells.append(block.mean() if block.size else 0.0)
    return np.asarray(cells[:feat_dim], dtype=np.float32)


# ---------------------------------------------------------------------------
# BMP (uncompressed 24-bit BI_RGB) — a real decoder: plain byte parsing +
# one numpy reshape; no codec library involved.


def decode_bmp(payload: bytes) -> np.ndarray:
    """Decode an uncompressed 24-bit BI_RGB BMP to an (h, w, 3) uint8 RGB
    array.  Top-down (negative height) and bottom-up row orders both
    handled; rows are 4-byte padded per the spec.  Other bit depths /
    compressions raise ``UnsupportedImageError``."""
    if payload[:2] != b"BM" or len(payload) < 54:
        raise UnsupportedImageError("not a BMP")
    data_off = struct.unpack("<I", payload[10:14])[0]
    hdr_size = struct.unpack("<I", payload[14:18])[0]
    if hdr_size < 40:
        raise UnsupportedImageError("BITMAPCOREHEADER not supported")
    w, h = struct.unpack("<ii", payload[18:26])
    planes, bpp = struct.unpack("<HH", payload[26:30])
    compression = struct.unpack("<I", payload[30:34])[0]
    if bpp != 24 or compression != 0:
        raise UnsupportedImageError(f"only 24-bit BI_RGB supported (bpp={bpp})")
    top_down = h < 0
    h = abs(h)
    stride = (w * 3 + 3) & ~3
    need = data_off + stride * h
    if len(payload) < need:
        raise UnsupportedImageError("truncated BMP")
    rows = np.frombuffer(payload, dtype=np.uint8, count=stride * h, offset=data_off)
    img = rows.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    if not top_down:
        img = img[::-1]
    return img[:, :, ::-1].copy()  # BGR → RGB


def encode_bmp(img: np.ndarray) -> bytes:
    """Encode an (h, w, 3) uint8 RGB array as a bottom-up 24-bit BI_RGB BMP."""
    h, w, c = img.shape
    assert c == 3 and img.dtype == np.uint8
    stride = (w * 3 + 3) & ~3
    body = np.zeros((h, stride), dtype=np.uint8)
    body[:, : w * 3] = img[::-1, :, ::-1].reshape(h, w * 3)  # RGB → BGR, bottom-up
    raw = body.tobytes()
    file_size = 54 + len(raw)
    hdr = (
        b"BM"
        + struct.pack("<IHHI", file_size, 0, 0, 54)
        + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(raw), 2835, 2835, 0, 0)
    )
    return hdr + raw
