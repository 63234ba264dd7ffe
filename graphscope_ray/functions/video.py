"""Pure-Python "video" kernels: an animated-GIF codec with frame sampling.

No video codec libraries exist in this environment, but animated GIF needs
only bit-twiddling (LZW) and palette lookups — all stdlib+numpy — so the
multimodal pipeline's VIDEO path is REAL: multi-frame payloads decode to
actual pixel arrays, frame-sampled at the container level (unsampled
frames are skipped via sub-block lengths WITHOUT LZW decode, the property
that makes stride-sampling cheap on long clips).

Decoder scope (documented limits, asserted): GIF87a/GIF89a, global and
local color tables, disposal methods 0/1 (draw-over; frames composite onto
the running canvas), non-interlaced frames.  Interlaced frames raise
``UnsupportedVideoError``.  The reference's engine treats media as opaque
binary columns end-to-end; decode/feature-extract stages are new surface
required by the 100-TB training-data pipeline brief.
"""

from __future__ import annotations

import struct

import numpy as np


class UnsupportedVideoError(ValueError):
    pass


def probe_gif(payload: bytes) -> dict | None:
    """Container-level probe: dimensions + frame count + total delay (cs)
    by walking block lengths only — no pixel decode."""
    if payload[:6] not in (b"GIF87a", b"GIF89a") or len(payload) < 13:
        return None
    w, h = struct.unpack("<HH", payload[6:10])
    flags = payload[10]
    pos = 13 + (3 * (2 << (flags & 7)) if flags & 0x80 else 0)
    n_frames, total_delay = 0, 0
    try:
        while pos < len(payload):
            b = payload[pos]
            if b == 0x3B:  # trailer
                break
            if b == 0x21:  # extension
                if payload[pos + 1] == 0xF9 and payload[pos + 2] >= 4:
                    total_delay += struct.unpack("<H", payload[pos + 4 : pos + 6])[0]
                pos += 2
                while payload[pos]:  # sub-blocks
                    pos += 1 + payload[pos]
                pos += 1
            elif b == 0x2C:  # image descriptor
                n_frames += 1
                lflags = payload[pos + 9]
                pos += 10 + (3 * (2 << (lflags & 7)) if lflags & 0x80 else 0)
                pos += 1  # LZW min code size
                while payload[pos]:
                    pos += 1 + payload[pos]
                pos += 1
            else:
                raise UnsupportedVideoError(f"bad GIF block 0x{b:02x}")
    except IndexError:
        raise UnsupportedVideoError("truncated GIF")
    return {
        "format": "gif",
        "width": int(w),
        "height": int(h),
        "n_frames": n_frames,
        "total_delay_cs": total_delay,
    }


def _lzw_decode(min_code_size: int, data: bytes, n_pixels: int) -> np.ndarray:
    """GIF LZW: variable-width codes (min+1 .. 12 bits, LSB-first), CLEAR
    resets the dictionary.  Output = palette indices (uint8)."""
    clear = 1 << min_code_size
    end = clear + 1
    out = np.empty(n_pixels, dtype=np.uint8)
    n_out = 0
    # dictionary as flat arrays: prefix link + last byte (fast append)
    prefix = np.full(4096, -1, dtype=np.int32)
    suffix = np.zeros(4096, dtype=np.uint8)
    for i in range(clear):
        suffix[i] = i
    next_code = end + 1
    width = min_code_size + 1
    acc = 0
    nbits = 0
    prev = -1
    buf = bytearray()
    for byte in data:
        acc |= byte << nbits
        nbits += 8
        while nbits >= width:
            code = acc & ((1 << width) - 1)
            acc >>= width
            nbits -= width
            if code == clear:
                next_code = end + 1
                width = min_code_size + 1
                prev = -1
                continue
            if code == end:
                return out[:n_out] if n_out < n_pixels else out
            if code < next_code:
                # expand code → byte string (walk prefix links)
                buf.clear()
                c = code
                while c >= 0:
                    buf.append(suffix[c])
                    c = prefix[c] if c >= clear else -1
                first = buf[-1]
                entry = bytes(reversed(buf))
            elif code == next_code and prev >= 0:
                # KwKwK case: prev string + its first byte
                buf.clear()
                c = prev
                while c >= 0:
                    buf.append(suffix[c])
                    c = prefix[c] if c >= clear else -1
                first = buf[-1]
                entry = bytes(reversed(buf)) + bytes([first])
            else:
                raise UnsupportedVideoError("corrupt LZW stream")
            n = len(entry)
            if n_out + n > n_pixels:
                n = n_pixels - n_out
            out[n_out : n_out + n] = np.frombuffer(entry[:n], dtype=np.uint8)
            n_out += n
            if prev >= 0 and next_code < 4096:
                prefix[next_code] = prev
                suffix[next_code] = first
                next_code += 1
                if next_code == (1 << width) and width < 12:
                    width += 1
            prev = code
            if n_out >= n_pixels:
                return out
    return out[:n_out]


def decode_gif_frames(
    payload: bytes, frame_stride: int = 1, max_frames: int | None = None
) -> np.ndarray:
    """Decode an animated GIF to an (n, h, w, 3) uint8 array, LZW-decoding
    only every ``frame_stride``-th frame (others are skipped via sub-block
    lengths — the container-level frame-sampling path).  Sampled frames
    composite draw-over onto the running canvas of sampled frames."""
    meta = probe_gif(payload)
    if meta is None:
        raise UnsupportedVideoError("not a GIF")
    w, h = meta["width"], meta["height"]
    flags = payload[10]
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 7)
        gct = np.frombuffer(payload[pos : pos + 3 * n], dtype=np.uint8).reshape(n, 3)
        pos += 3 * n
    canvas = np.zeros((h, w, 3), dtype=np.uint8)
    if gct is not None:
        canvas[:] = gct[payload[11] if payload[11] < len(gct) else 0]
    frames = []
    transparent = -1
    fidx = 0
    while pos < len(payload):
        b = payload[pos]
        if b == 0x3B:
            break
        if b == 0x21:
            if payload[pos + 1] == 0xF9 and payload[pos + 2] >= 4:
                gce_flags = payload[pos + 3]
                transparent = payload[pos + 6] if gce_flags & 1 else -1
                if (gce_flags >> 2) & 7 not in (0, 1):
                    raise UnsupportedVideoError("unsupported disposal method")
            pos += 2
            while payload[pos]:
                pos += 1 + payload[pos]
            pos += 1
            continue
        if b != 0x2C:
            raise UnsupportedVideoError(f"bad GIF block 0x{b:02x}")
        left, top, fw, fh = struct.unpack("<HHHH", payload[pos + 1 : pos + 9])
        lflags = payload[pos + 9]
        pos += 10
        if lflags & 0x40:
            raise UnsupportedVideoError("interlaced GIF frames unsupported")
        ct = gct
        if lflags & 0x80:
            n = 2 << (lflags & 7)
            ct = np.frombuffer(payload[pos : pos + 3 * n], dtype=np.uint8).reshape(n, 3)
            pos += 3 * n
        min_code = payload[pos]
        pos += 1
        sampled = fidx % frame_stride == 0 and (
            max_frames is None or len(frames) < max_frames
        )
        if sampled:
            chunks = []
            while payload[pos]:
                ln = payload[pos]
                chunks.append(payload[pos + 1 : pos + 1 + ln])
                pos += 1 + ln
            pos += 1
            if ct is None:
                raise UnsupportedVideoError("frame without color table")
            idx = _lzw_decode(min_code, b"".join(chunks), fw * fh).astype(np.int64)
            if len(idx) < fw * fh:  # short stream: pad with background
                idx = np.concatenate([idx, np.zeros(fw * fh - len(idx), dtype=np.int64)])
            idx = idx.reshape(fh, fw)
            region = canvas[top : top + fh, left : left + fw]
            rgb = ct[np.minimum(idx, len(ct) - 1)]
            if transparent >= 0:
                mask = idx != transparent
                region[mask] = rgb[mask]
            else:
                region[:] = rgb
            frames.append(canvas.copy())
        else:  # skip pixel data without decoding
            while payload[pos]:
                pos += 1 + payload[pos]
            pos += 1
        fidx += 1
    if not frames:
        raise UnsupportedVideoError("no frames sampled")
    return np.stack(frames)


def _lzw_encode(idx: np.ndarray, min_code_size: int) -> bytes:
    """Real GIF LZW compression (hash-dict greedy longest-match, 12-bit cap
    with CLEAR on overflow) — exercises the decoder's dictionary-growth and
    KwKwK paths in the fixture roundtrip."""
    clear = 1 << min_code_size
    end = clear + 1
    out = bytearray()
    acc = nbits = 0
    width = min_code_size + 1

    def emit_raw(code: int):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    # The decoder adds one dict entry while PROCESSING every data code after
    # the first (then maybe widens), which changes the width it READS the
    # following code at.  Mirror that exactly: before emitting any code,
    # account for the decoder's processing of the previous data code.
    table: dict = {}
    enc_next = end + 1  # value for the entry the ENCODER adds per emission
    dec_next = end + 1  # the DECODER's table counter (width-bump sync)
    seg_emits = 0  # data codes emitted since the last CLEAR

    def emit(code: int):
        nonlocal dec_next, width, seg_emits
        if seg_emits >= 2:
            dec_next += 1
            if dec_next == (1 << width) and width < 12:
                width += 1
        if code != clear and code != end:
            seg_emits += 1
        emit_raw(code)

    emit_raw(clear)
    prev = -1
    for px in idx:
        px = int(px)
        if prev < 0:
            prev = px
            continue
        key = (prev, px)
        cur = table.get(key, -1)
        if cur >= 0:
            prev = cur
            continue
        emit(prev)
        if enc_next < 4096:
            table[key] = enc_next
            enc_next += 1
        else:
            emit(clear)
            table.clear()
            enc_next = dec_next = end + 1
            width = min_code_size + 1
            seg_emits = 0
        prev = px
    if prev >= 0:
        emit(prev)
    emit(end)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def encode_gif(frames: np.ndarray, delay_cs: int = 4) -> bytes:
    """Minimal animated-GIF writer for deterministic fixtures: one global
    216-color web-safe palette, draw-over frames, real LZW compression."""
    frames = np.asarray(frames, dtype=np.uint8)
    if frames.ndim == 3:
        frames = frames[None]
    n, h, w, c = frames.shape
    assert c == 3, "RGB frames"
    # web-safe 6x6x6 cube in a 256-entry table
    lv = np.array([0, 51, 102, 153, 204, 255], dtype=np.uint8)
    cube = np.stack(np.meshgrid(lv, lv, lv, indexing="ij"), axis=-1).reshape(216, 3)
    table = np.vstack([cube, np.zeros((40, 3), dtype=np.uint8)])
    out = bytearray()
    out += b"GIF89a"
    out += struct.pack("<HH", w, h)
    out += bytes([0x80 | 7, 0, 0])  # GCT present, 256 entries
    out += table.tobytes()
    # NETSCAPE loop extension
    out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"
    min_code = 8
    for f in frames:
        q = (f.astype(np.int64) + 25) // 51  # nearest web-safe level
        idx = (q[..., 0] * 36 + q[..., 1] * 6 + q[..., 2]).astype(np.int64).ravel()
        out += b"\x21\xf9\x04\x00" + struct.pack("<H", delay_cs) + b"\x00\x00"
        out += b"\x2c" + struct.pack("<HHHH", 0, 0, w, h) + b"\x00"
        out += bytes([min_code])
        bits = _lzw_encode(idx, min_code)
        for i in range(0, len(bits), 255):
            chunk = bits[i : i + 255]
            out += bytes([len(chunk)]) + bytes(chunk)
        out += b"\x00"
    out += b"\x3b"
    return bytes(out)


def frame_sample_features(
    frames: np.ndarray, feat_dim: int = 16
) -> np.ndarray:
    """Temporal features from sampled frames: per-frame block-mean grids
    (spatial pooling), then mean+std over time — fixed-length float32."""
    from graphscope_ray.functions.imaging import mean_pool_features

    half = max(feat_dim // 2, 1)
    per = np.stack([mean_pool_features(f, half) for f in frames])
    feat = np.concatenate([per.mean(axis=0), per.std(axis=0)])
    if len(feat) < feat_dim:
        feat = np.concatenate([feat, np.zeros(feat_dim - len(feat), dtype=feat.dtype)])
    return feat[:feat_dim].astype(np.float32)
