"""Pure-numpy baseline JPEG codec (no codec library).

Completes the "REAL decode" family (PNG/GIF/WAV/BMP in imaging.py, video.py,
audio.py): `decode_jpeg` is a full baseline-sequential-DCT decoder —
marker/segment parsing, DHT canonical-Huffman tables (16-bit LUT), entropy
decoding with byte unstuffing and DRI/RSTn restart handling, dequantize →
inverse zigzag → batched 8×8 IDCT (one einsum over all blocks), chroma
upsampling for sampling factors up to 2×2, YCbCr→RGB (JFIF/BT.601 full
range).  `encode_jpeg` is the matching baseline encoder (Annex K quant +
Huffman tables, IJG quality scaling, optional 4:2:0) used to produce
deterministic fixtures — this sandbox ships no JPEG files.

Scope (documented, asserted): baseline DCT (SOF0) and extended-sequential
(SOF1) 8-bit scans, grayscale or YCbCr, interleaved single scan.
Progressive (SOF2), arithmetic coding, 12-bit, and hierarchical modes raise
``UnsupportedImageError`` — the explicit format boundary the strict decode
path reports.

Everything here derives from the public ITU-T T.81 spec (Annex K tables).
"""

from __future__ import annotations

import struct

import numpy as np

from graphscope_ray.functions.imaging import UnsupportedImageError

# zigzag position k → raster index (T.81 Figure 5)
ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10,
        17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34,
        27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36,
        29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46,
        53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

# Annex K quantization tables (raster order)
_Q_LUMA = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int64,
)
_Q_CHROMA = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int64,
)

# Annex K Huffman table specs: (BITS[1..16], HUFFVAL)
_DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_LUMA_VALS = list(range(12))
_DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
_DC_CHROMA_VALS = list(range(12))
_AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]
_AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
_AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]

# orthonormal 8-point DCT-II matrix: fwd F = C @ B @ C.T, inv B = C.T @ F @ C
_C = np.zeros((8, 8))
for _k in range(8):
    _a = np.sqrt(0.125) if _k == 0 else 0.5
    _C[_k] = _a * np.cos((2 * np.arange(8) + 1) * _k * np.pi / 16.0)


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol → (code, length), canonical assignment in length order."""
    out = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _decode_lut(bits: list[int], vals: list[int]) -> tuple[np.ndarray, np.ndarray]:
    """16-bit peek → (symbol, code length) lookup arrays."""
    sym = np.zeros(1 << 16, dtype=np.int16)
    ln = np.zeros(1 << 16, dtype=np.uint8)
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            lo = code << (16 - length)
            hi = lo + (1 << (16 - length))
            sym[lo:hi] = vals[k]
            ln[lo:hi] = length
            code += 1
            k += 1
        code <<= 1
    return sym, ln


def _quality_scale(table: np.ndarray, quality: int) -> np.ndarray:
    quality = min(100, max(1, quality))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((table * scale + 50) // 100, 1, 255).astype(np.int64)


def _rgb_to_ycbcr(img: np.ndarray) -> np.ndarray:
    r, g, b = (img[..., i].astype(np.float64) for i in range(3))
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.stack([y, cb, cr], axis=-1)


def _ycbcr_to_rgb(y: np.ndarray, cb: np.ndarray, cr: np.ndarray) -> np.ndarray:
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(np.stack([r, g, b], axis=-1).round(), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# encoder


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            byte = (self.acc >> (self.n - 8)) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:
                self.buf.append(0x00)  # byte stuffing
            self.n -= 8
            self.acc &= (1 << self.n) - 1

    def flush(self) -> bytes:
        if self.n:
            pad = 8 - self.n
            self.write((1 << pad) - 1, pad)
        return bytes(self.buf)


def _category(v: int) -> int:
    return int(abs(v)).bit_length()


def _block_coeffs(plane: np.ndarray, q: np.ndarray) -> np.ndarray:
    """All 8×8 blocks of a (H,W) plane → (n_blocks, 64) quantized zigzag
    coefficients (row-major block order), via one batched DCT einsum."""
    H, W = plane.shape
    blocks = (
        plane.reshape(H // 8, 8, W // 8, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    ) - 128.0
    coeffs = np.einsum("ij,njk,lk->nil", _C, blocks, _C)
    quant = np.round(coeffs.reshape(-1, 64) / q[None, :]).astype(np.int64)
    return quant[:, ZIGZAG]


def _encode_block(bw: _BitWriter, zz: np.ndarray, pred: int, dc_codes, ac_codes) -> int:
    diff = int(zz[0]) - pred
    cat = _category(diff)
    code, ln = dc_codes[cat]
    bw.write(code, ln)
    if cat:
        bw.write(diff if diff >= 0 else diff + (1 << cat) - 1, cat)
    run = 0
    nz = np.flatnonzero(zz[1:])
    last = nz[-1] + 1 if nz.size else 0
    for k in range(1, last + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_codes[0xF0]  # ZRL
            bw.write(code, ln)
            run -= 16
        cat = _category(v)
        code, ln = ac_codes[(run << 4) | cat]
        bw.write(code, ln)
        bw.write(v if v >= 0 else v + (1 << cat) - 1, cat)
        run = 0
    if last < 63:
        code, ln = ac_codes[0x00]  # EOB
        bw.write(code, ln)
    return int(zz[0])


def encode_jpeg(
    img: np.ndarray,
    quality: int = 75,
    subsampling: str = "4:4:4",
    restart_interval: int = 0,
) -> bytes:
    """Baseline-sequential JPEG encoder (Annex K tables, IJG quality scale).
    img: (h, w) or (h, w, 1) grayscale, or (h, w, 3) RGB uint8.
    subsampling: "4:4:4" (no chroma subsampling) or "4:2:0" (2×2).
    restart_interval: MCUs per restart segment (0 = no DRI/RSTn markers)."""
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim == 3 and img.shape[2] == 1:
        img = img[:, :, 0]
    gray = img.ndim == 2
    h, w = img.shape[:2]
    ql = _quality_scale(_Q_LUMA, quality)
    qc = _quality_scale(_Q_CHROMA, quality)
    sub = (2, 2) if (subsampling == "4:2:0" and not gray) else (1, 1)

    def _pad(p: np.ndarray, my: int, mx: int) -> np.ndarray:
        H = -(-p.shape[0] // my) * my
        W = -(-p.shape[1] // mx) * mx
        return np.pad(p, ((0, H - p.shape[0]), (0, W - p.shape[1])), mode="edge")

    if gray:
        planes = [_pad(img.astype(np.float64), 8, 8)]
        samp = [(1, 1)]
        qsel = [0]
    else:
        ycc = _rgb_to_ycbcr(img)
        mcu_h, mcu_w = 8 * sub[1], 8 * sub[0]
        y = _pad(ycc[..., 0], mcu_h, mcu_w)
        cb_full = _pad(ycc[..., 1], mcu_h, mcu_w)
        cr_full = _pad(ycc[..., 2], mcu_h, mcu_w)
        if sub == (2, 2):
            H, W = cb_full.shape
            cb = cb_full.reshape(H // 2, 2, W // 2, 2).mean(axis=(1, 3))
            cr = cr_full.reshape(H // 2, 2, W // 2, 2).mean(axis=(1, 3))
        else:
            cb, cr = cb_full, cr_full
        planes = [y, cb, cr]
        samp = [sub, (1, 1), (1, 1)]
        qsel = [0, 1, 1]

    coeffs = [
        _block_coeffs(p, ql if qs == 0 else qc) for p, qs in zip(planes, qsel)
    ]

    dc_l = _canonical_codes(_DC_LUMA_BITS, _DC_LUMA_VALS)
    ac_l = _canonical_codes(_AC_LUMA_BITS, _AC_LUMA_VALS)
    dc_c = _canonical_codes(_DC_CHROMA_BITS, _DC_CHROMA_VALS)
    ac_c = _canonical_codes(_AC_CHROMA_BITS, _AC_CHROMA_VALS)

    bw = _BitWriter()
    preds = [0] * len(planes)
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    scan_parts: list[bytes] = []
    n_mcus = mcus_x * mcus_y
    for mcu_idx in range(n_mcus):
        if restart_interval and mcu_idx and mcu_idx % restart_interval == 0:
            scan_parts.append(bw.flush())
            m = (mcu_idx // restart_interval - 1) % 8
            scan_parts.append(bytes([0xFF, 0xD0 + m]))
            bw = _BitWriter()
            preds = [0] * len(planes)
        my, mx = divmod(mcu_idx, mcus_x)
        for ci, (p, (sh, sv)) in enumerate(zip(planes, samp)):
            bw_per_row = p.shape[1] // 8
            for by in range(sv):
                for bx in range(sh):
                    bidx = (my * sv + by) * bw_per_row + (mx * sh + bx)
                    preds[ci] = _encode_block(
                        bw,
                        coeffs[ci][bidx],
                        preds[ci],
                        dc_l if qsel[ci] == 0 else dc_c,
                        ac_l if qsel[ci] == 0 else ac_c,
                    )
    scan_parts.append(bw.flush())
    scan = b"".join(scan_parts)

    def seg(marker: int, payload: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload

    def dht(tc: int, th: int, bits: list[int], vals: list[int]) -> bytes:
        return seg(0xC4, bytes([tc << 4 | th]) + bytes(bits) + bytes(vals))

    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xDB, bytes([0x00]) + bytes(ql[ZIGZAG].astype(np.uint8)))
    if not gray:
        out += seg(0xDB, bytes([0x01]) + bytes(qc[ZIGZAG].astype(np.uint8)))
    ncomp = 1 if gray else 3
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([ncomp])
    for ci in range(ncomp):
        sh, sv = samp[ci]
        sof += bytes([ci + 1, (sh << 4) | sv, qsel[ci]])
    out += seg(0xC0, sof)  # SOF0 baseline
    out += dht(0, 0, _DC_LUMA_BITS, _DC_LUMA_VALS)
    out += dht(1, 0, _AC_LUMA_BITS, _AC_LUMA_VALS)
    if not gray:
        out += dht(0, 1, _DC_CHROMA_BITS, _DC_CHROMA_VALS)
        out += dht(1, 1, _AC_CHROMA_BITS, _AC_CHROMA_VALS)
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([ncomp])
    for ci in range(ncomp):
        t = 0 if qsel[ci] == 0 else 1
        sos += bytes([ci + 1, (t << 4) | t])
    sos += bytes([0, 63, 0])
    out += seg(0xDA, sos)
    out += scan
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# decoder


class _BitReader:
    def __init__(self, data: bytes):
        self.data = np.frombuffer(data, dtype=np.uint8)
        self.pos = 0
        self.acc = 0
        self.n = 0

    def _fill(self, need: int) -> None:
        while self.n < need:
            byte = int(self.data[self.pos]) if self.pos < len(self.data) else 0xFF
            self.pos += 1
            self.acc = (self.acc << 8) | byte
            self.n += 8

    def peek16(self) -> int:
        self._fill(16)
        return (self.acc >> (self.n - 16)) & 0xFFFF

    def skip(self, k: int) -> None:
        self.n -= k
        self.acc &= (1 << self.n) - 1

    def read(self, k: int) -> int:
        if k == 0:
            return 0
        self._fill(k)
        v = (self.acc >> (self.n - k)) & ((1 << k) - 1)
        self.skip(k)
        return v


def _extend(v: int, cat: int) -> int:
    return v if v >= (1 << (cat - 1)) else v - (1 << cat) + 1


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline-DCT JPEG → (h, w, 3) RGB or (h, w, 1) grayscale uint8."""
    if payload[:2] != b"\xff\xd8":
        raise UnsupportedImageError("not a JPEG")
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], tuple[np.ndarray, np.ndarray]] = {}
    frame = None
    dri = 0
    i = 2
    n = len(payload)
    scan_comps = None
    while i + 4 <= n:
        if payload[i] != 0xFF:
            i += 1
            continue
        marker = payload[i + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        if marker == 0xD9:
            break
        (seg_len,) = struct.unpack(">H", payload[i + 2 : i + 4])
        body = payload[i + 4 : i + 2 + seg_len]
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            j = 0
            while j < len(body):
                pq, tq = body[j] >> 4, body[j] & 0xF
                if pq == 0:
                    tab = np.frombuffer(body[j + 1 : j + 65], dtype=np.uint8).astype(np.int64)
                    j += 65
                else:
                    tab = np.frombuffer(body[j + 1 : j + 129], dtype=">u2").astype(np.int64)
                    j += 129
                raster = np.zeros(64, dtype=np.int64)
                raster[ZIGZAG] = tab
                qt[tq] = raster
        elif marker in (0xC0, 0xC1):  # SOF0 baseline / SOF1 extended seq
            prec = body[0]
            if prec != 8:
                raise UnsupportedImageError(f"{prec}-bit JPEG not supported")
            fh, fw = struct.unpack(">HH", body[1:5])
            ncomp = body[5]
            comps = []
            for c in range(ncomp):
                cid, hv, tq = body[6 + 3 * c : 9 + 3 * c]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq})
            frame = {"h": fh, "w": fw, "comps": comps}
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise UnsupportedImageError(
                f"only baseline/extended-sequential DCT supported (SOF marker 0x{marker:X})"
            )
        elif marker == 0xC4:  # DHT (possibly several tables)
            j = 0
            while j < len(body):
                tc, th = body[j] >> 4, body[j] & 0xF
                bits = list(body[j + 1 : j + 17])
                nv = sum(bits)
                vals = list(body[j + 17 : j + 17 + nv])
                huff[(tc, th)] = _decode_lut(bits, vals)
                j += 17 + nv
        elif marker == 0xDD:  # DRI
            (dri,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:  # SOS — entropy data follows
            ns = body[0]
            scan_comps = []
            for c in range(ns):
                cid, tt = body[1 + 2 * c : 3 + 2 * c]
                scan_comps.append({"id": cid, "dc": tt >> 4, "ac": tt & 0xF})
            i = i + 2 + seg_len
            break
        i += 2 + seg_len
    if frame is None or scan_comps is None:
        raise UnsupportedImageError("no frame/scan found")
    if len(scan_comps) != len(frame["comps"]):
        # legal T.81 variant we don't decode: non-interleaved multi-scan
        # baseline (one SOS per component) — refusing keeps the "strict mode
        # never produces wrong pixels" contract (ADVICE r3)
        raise UnsupportedImageError(
            f"non-interleaved scan (SOS ns={len(scan_comps)} != SOF ncomp={len(frame['comps'])})"
        )

    # entropy-coded data: up to the next non-RST marker; record RST cuts
    cuts = []
    j = i
    while j + 1 < n:
        if payload[j] == 0xFF:
            m = payload[j + 1]
            if m == 0x00:
                j += 2
                continue
            if 0xD0 <= m <= 0xD7:
                cuts.append((i, j))
                i = j + 2
                j = i
                continue
            break
        j += 1
    cuts.append((i, j))
    segments = [payload[a:b].replace(b"\xff\x00", b"\xff") for a, b in cuts]

    comps = frame["comps"]
    by_id = {c["id"]: c for c in comps}
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if hmax > 2 or vmax > 2:
        raise UnsupportedImageError("sampling factors above 2 not supported")
    fh, fw = frame["h"], frame["w"]
    mcus_x = -(-fw // (8 * hmax))
    mcus_y = -(-fh // (8 * vmax))
    order = [by_id[sc["id"]] for sc in scan_comps]
    for sc, c in zip(scan_comps, order):
        c["dc_lut"] = huff.get((0, sc["dc"]))
        c["ac_lut"] = huff.get((1, sc["ac"]))
        if c["dc_lut"] is None or c["ac_lut"] is None:
            raise UnsupportedImageError("missing Huffman table")
        c["coef"] = np.zeros(
            (mcus_y * c["v"] * mcus_x * c["h"], 64), dtype=np.int64
        )
        c["bw"] = mcus_x * c["h"]  # blocks per row

    n_mcus = mcus_x * mcus_y
    per_seg = dri if dri else n_mcus
    mcu = 0
    for seg_data in segments:
        br = _BitReader(seg_data)
        preds = {c["id"]: 0 for c in comps}
        for _ in range(min(per_seg, n_mcus - mcu)):
            my, mx = divmod(mcu, mcus_x)
            for c in order:
                dc_sym, dc_len = c["dc_lut"]
                ac_sym, ac_len = c["ac_lut"]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        zz = c["coef"][(my * c["v"] + by) * c["bw"] + (mx * c["h"] + bx)]
                        p16 = br.peek16()
                        s, ln = int(dc_sym[p16]), int(dc_len[p16])
                        if ln == 0:
                            raise UnsupportedImageError("bad Huffman code")
                        br.skip(ln)
                        diff = _extend(br.read(s), s) if s else 0
                        preds[c["id"]] += diff
                        zz[0] = preds[c["id"]]
                        k = 1
                        while k < 64:
                            p16 = br.peek16()
                            s, ln = int(ac_sym[p16]), int(ac_len[p16])
                            if ln == 0:
                                raise UnsupportedImageError("bad Huffman code")
                            br.skip(ln)
                            run, cat = s >> 4, s & 0xF
                            if cat == 0:
                                if run == 15:
                                    k += 16  # ZRL
                                    continue
                                break  # EOB
                            k += run
                            if k > 63:
                                raise UnsupportedImageError("AC run overflow")
                            zz[k] = _extend(br.read(cat), cat)
                            k += 1
            mcu += 1

    # dequantize → inverse zigzag → batched IDCT → plane assembly
    planes = []
    for c in order:
        q = qt.get(c["tq"])
        if q is None:
            raise UnsupportedImageError("missing quant table")
        raster = np.zeros_like(c["coef"])
        raster[:, ZIGZAG] = c["coef"]
        deq = (raster * q[None, :]).reshape(-1, 8, 8).astype(np.float64)
        pix = np.einsum("ji,njk,kl->nil", _C, deq, _C) + 128.0
        H = mcus_y * c["v"] * 8
        W = mcus_x * c["h"] * 8
        plane = (
            pix.reshape(H // 8, W // 8, 8, 8).transpose(0, 2, 1, 3).reshape(H, W)
        )
        # upsample to full resolution and crop
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1:
            plane = np.repeat(plane, ry, axis=0)
        if rx > 1:
            plane = np.repeat(plane, rx, axis=1)
        planes.append(plane[:fh, :fw])

    if len(planes) == 1:
        return np.clip(planes[0].round(), 0, 255).astype(np.uint8)[:, :, None]
    if len(planes) != 3:
        raise UnsupportedImageError(f"{len(planes)}-component JPEG not supported")
    return _ycbcr_to_rgb(planes[0], planes[1], planes[2])
