"""Baseline-profile JPEG codec in pure Python/numpy — closes the last
multimodal decode gate without Pillow (the container ships no imaging
library; PNG/BMP/PPM/WAV/npy already have library-free codecs in
operators/multimodal.py).

Scope: ITU T.81 baseline sequential DCT, 8-bit, Huffman entropy coding.
Decoder handles arbitrary quant/Huffman tables, chroma subsampling
(h/v factors 1-2), restart intervals, and 1- or 3-component scans —
the shape of the overwhelming majority of real-world JPEGs. Progressive
and arithmetic-coded JPEGs raise NotImplementedError with a clear
message. Encoder writes 4:4:4 (or grayscale) baseline JPEGs with
flat-quality quant tables and simple valid Huffman tables — enough for
round-trip tests and for materializing thumbnails in the media
pipeline; it is not meant to beat libjpeg's rate-distortion.

This runs inside mapInPandas batches (see multimodal.image_stats /
resize_images): per-row Python is sanctioned there because the work is
per-blob numeric decode, not relational logic. At 100 TB the decode
parallelism is the partition parallelism of the binary scan.

Reference parity note: the reference repo has no image codecs at all
(its media handling stops at file paths); this surface exists because
the training-data brief makes multimodal columns first-class.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["decode_jpeg", "encode_jpeg"]

# ---------------------------------------------------------------- constants

ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int32)

# 8x8 DCT-II basis matrix: C[u, x] = a(u)/2 * cos((2x+1) u pi / 16)
_C = np.zeros((8, 8))
for _u in range(8):
    _a = (1 / np.sqrt(2)) if _u == 0 else 1.0
    for _x in range(8):
        _C[_u, _x] = 0.5 * _a * np.cos((2 * _x + 1) * _u * np.pi / 16)


def _idct2(block: np.ndarray) -> np.ndarray:
    return _C.T @ block @ _C


def _fdct2(block: np.ndarray) -> np.ndarray:
    return _C @ block @ _C.T


# ---------------------------------------------------------------- decoder


class _BitReader:
    """MSB-first bit reader over the entropy-coded segment with 0xFF00
    un-stuffing; stops at any non-RST marker (left for the caller)."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.n = 0
        self.marker: int | None = None

    def _fill(self) -> None:
        while self.n <= 24:
            if self.marker is not None:
                self.acc = (self.acc << 8) & 0xFFFFFFFF
                self.n += 8
                continue
            if self.pos >= len(self.data):
                self.marker = 0xD9
                continue
            b = self.data[self.pos]
            if b == 0xFF:
                nxt = self.data[self.pos + 1] if self.pos + 1 < len(self.data) else 0xD9
                if nxt == 0x00:
                    self.pos += 2
                elif 0xD0 <= nxt <= 0xD7:  # RSTn handled by caller
                    self.marker = nxt
                    continue
                else:
                    self.marker = nxt
                    continue
            else:
                self.pos += 1
            self.acc = ((self.acc << 8) | b) & 0xFFFFFFFF
            self.n += 8

    def bits(self, k: int) -> int:
        if k == 0:
            return 0
        self._fill()
        v = (self.acc >> (self.n - k)) & ((1 << k) - 1)
        self.n -= k
        return v

    def restart(self) -> None:
        """Re-align to the byte boundary and consume the next RST marker.
        Buffered-but-unread bits are the segment's 1-padding — dropped.
        Works whether or not read-ahead already stopped at the marker."""
        self.acc = 0
        self.n = 0
        self.marker = None
        while self.pos + 1 < len(self.data):
            if (self.data[self.pos] == 0xFF
                    and 0xD0 <= self.data[self.pos + 1] <= 0xD7):
                self.pos += 2
                return
            self.pos += 1


class _Huff:
    """Canonical Huffman table: (length -> first code) fast decode."""

    def __init__(self, bits: list[int], vals: bytes):
        self.maxcode = [-1] * 17
        self.mincode = [0] * 17
        self.valptr = [0] * 17
        code = 0
        k = 0
        for length in range(1, 17):
            if bits[length - 1] == 0:
                self.maxcode[length] = -1
            else:
                self.valptr[length] = k
                self.mincode[length] = code
                code += bits[length - 1]
                k += bits[length - 1]
                self.maxcode[length] = code - 1
            code <<= 1
        self.vals = vals

    def decode(self, br: _BitReader) -> int:
        code = br.bits(1)
        length = 1
        while length <= 16:
            mc = self.maxcode[length]
            if mc >= 0 and code <= mc:
                return self.vals[self.valptr[length] + code - self.mincode[length]]
            code = (code << 1) | br.bits(1)
            length += 1
        raise ValueError("corrupt JPEG: invalid Huffman code")


def _extend(v: int, s: int) -> int:
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def decode_jpeg(blob: bytes) -> np.ndarray:
    """Decode a baseline JPEG to uint8 (H, W) grayscale or (H, W, 3) RGB."""
    if blob[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    hdc: dict[int, _Huff] = {}
    hac: dict[int, _Huff] = {}
    comps: list[dict] = []
    h = w = 0
    restart_interval = 0
    data = blob

    while pos < len(data):
        if data[pos] != 0xFF:
            pos += 1
            continue
        marker = data[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:  # EOI
            break
        (seglen,) = struct.unpack(">H", data[pos:pos + 2])
        seg = data[pos + 2:pos + seglen]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0xF
                p += 1
                if pq:
                    tbl = np.frombuffer(seg[p:p + 128], dtype=">u2").astype(np.int32)
                    p += 128
                else:
                    tbl = np.frombuffer(seg[p:p + 64], dtype=np.uint8).astype(np.int32)
                    p += 64
                dq = np.zeros(64, dtype=np.int32)
                dq[ZIGZAG] = tbl
                qt[tq] = dq.reshape(8, 8)
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0xF
                bits = list(seg[p + 1:p + 17])
                nv = sum(bits)
                vals = seg[p + 17:p + 17 + nv]
                (hac if tc else hdc)[th] = _Huff(bits, vals)
                p += 17 + nv
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 baseline
            h, w = struct.unpack(">HH", seg[1:5])
            n = seg[5]
            comps = []
            for i in range(n):
                cid, hv, tq = seg[6 + 3 * i], seg[7 + 3 * i], seg[8 + 3 * i]
                comps.append({
                    "id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq,
                })
        elif marker == 0xC2:
            raise NotImplementedError("progressive JPEG not supported "
                                      "(baseline sequential only)")
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"JPEG SOF marker 0x{marker:02X} not supported (baseline only)"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS — entropy data follows
            ns = seg[0]
            tabs = {}
            for i in range(ns):
                cs, t = seg[1 + 2 * i], seg[2 + 2 * i]
                tabs[cs] = (t >> 4, t & 0xF)
            pos += seglen
            return _decode_scan(
                data, pos, h, w, comps, tabs, qt, hdc, hac,
                restart_interval,
            )
        pos += seglen
    raise ValueError("corrupt JPEG: no SOS marker")


def _decode_scan(data, pos, h, w, comps, tabs, qt, hdc, hac,
                 restart_interval) -> np.ndarray:
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    planes = []
    for c in comps:
        planes.append(np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8)))
    br = _BitReader(data, pos)
    pred = [0] * len(comps)
    nmcu = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and nmcu and nmcu % restart_interval == 0:
                br.restart()
                pred = [0] * len(comps)
            for ci, c in enumerate(comps):
                td, ta = tabs[c["id"]]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        blk = _decode_block(br, hdc[td], hac[ta], qt[c["tq"]],
                                            pred, ci)
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        planes[ci][y0:y0 + 8, x0:x0 + 8] = blk
            nmcu += 1
    # upsample to full resolution, crop, color-convert
    full = []
    for ci, c in enumerate(comps):
        p = planes[ci]
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            p = np.repeat(np.repeat(p, ry, axis=0), rx, axis=1)
        full.append(p[:h, :w])
    if len(full) == 1:
        return np.clip(np.round(full[0] + 128), 0, 255).astype(np.uint8)
    y, cb, cr = full[0] + 128, full[1], full[2]
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(
        np.round(np.stack([r, g, b], axis=-1)), 0, 255
    ).astype(np.uint8)


def _decode_block(br, hd, ha, q, pred, ci) -> np.ndarray:
    zz = np.zeros(64, dtype=np.int32)
    s = hd.decode(br)
    diff = _extend(br.bits(s), s) if s else 0
    pred[ci] += diff
    zz[0] = pred[ci]
    k = 1
    while k < 64:
        rs = ha.decode(br)
        r, s = rs >> 4, rs & 0xF
        if s == 0:
            if r == 15:
                k += 16
                continue
            break  # EOB
        k += r
        if k > 63:
            raise ValueError("corrupt JPEG: AC index out of range")
        zz[k] = _extend(br.bits(s), s)
        k += 1
    coef = np.zeros(64, dtype=np.int32)
    coef[ZIGZAG] = zz
    return _idct2((coef.reshape(8, 8) * q).astype(np.float64))


# ---------------------------------------------------------------- encoder

# simple VALID Huffman tables (not rate-optimal): DC symbols 0..11 at 4
# bits; AC all 256 symbols split 200 at 8 bits + 56 at 9 bits. The
# all-ones code of each length stays unassigned, as T.81 requires.
_ENC_DC_BITS = [0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
_ENC_DC_VALS = bytes(range(12))
_ENC_AC_BITS = [0, 0, 0, 0, 0, 0, 0, 200, 56, 0, 0, 0, 0, 0, 0, 0]
_ENC_AC_VALS = bytes(range(256))


def _enc_codes(bits: list[int], vals: bytes) -> dict[int, tuple[int, int]]:
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


_DC_CODE = _enc_codes(_ENC_DC_BITS, _ENC_DC_VALS)
_AC_CODE = _enc_codes(_ENC_AC_BITS, _ENC_AC_VALS)


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            b = (self.acc >> (self.n - 8)) & 0xFF
            self.buf.append(b)
            if b == 0xFF:
                self.buf.append(0x00)
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def flush(self) -> None:
        if self.n:
            pad = 8 - self.n
            self.put((1 << pad) - 1, pad)


def _mag(v: int) -> tuple[int, int]:
    s = int(v).bit_length() if v > 0 else int(-v).bit_length()
    bits = v if v >= 0 else v + (1 << s) - 1
    return s, bits


def encode_jpeg(
    img: np.ndarray, quality: int = 90, restart_interval: int = 0
) -> bytes:
    """Encode uint8 (H, W) or (H, W, 3) to a baseline 4:4:4 JPEG.
    `restart_interval` > 0 writes DRI + RSTn markers every N MCUs
    (resync points; also exercises the decoder's restart path)."""
    img = np.asarray(img)
    if img.dtype != np.uint8:
        raise ValueError("encode_jpeg expects uint8")
    gray = img.ndim == 2
    h, w = img.shape[:2]
    # flat quant table scaled by quality: q=100 -> all ones (near-lossless)
    qv = max(1, int(round(50 * (100 - quality) / 50))) if quality < 100 else 1
    q = np.full((8, 8), qv, dtype=np.int32)
    if gray:
        planes = [img.astype(np.float64) - 128]
    else:
        r = img[..., 0].astype(np.float64)
        g = img[..., 1].astype(np.float64)
        b = img[..., 2].astype(np.float64)
        y = 0.299 * r + 0.587 * g + 0.114 * b - 128
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b
        planes = [y, cb, cr]

    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    padded = []
    for p in planes:
        pp = np.zeros((ph, pw))
        pp[:h, :w] = p
        if h < ph:
            pp[h:, :w] = p[h - 1:h, :]
        if w < pw:
            pp[:, w:] = pp[:, w - 1:w]
        padded.append(pp)

    out = bytearray(b"\xff\xd8")  # SOI
    # DQT (one table, id 0; values in zigzag order)
    dqt = bytes([0x00]) + bytes(int(q.reshape(-1)[ZIGZAG[i]]) for i in range(64))
    out += b"\xff\xdb" + struct.pack(">H", 2 + len(dqt)) + dqt
    # SOF0
    ncomp = 1 if gray else 3
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([ncomp])
    for cid in range(1, ncomp + 1):
        sof += bytes([cid, 0x11, 0])  # 4:4:4, quant table 0
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    # DHT: DC table 0 + AC table 0
    for tc, bits, vals in ((0, _ENC_DC_BITS, _ENC_DC_VALS),
                           (1, _ENC_AC_BITS, _ENC_AC_VALS)):
        seg = bytes([tc << 4]) + bytes(bits) + vals
        out += b"\xff\xc4" + struct.pack(">H", 2 + len(seg)) + seg
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    # SOS
    sos = bytes([ncomp])
    for cid in range(1, ncomp + 1):
        sos += bytes([cid, 0x00])
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos

    bw = _BitWriter()
    pred = [0] * ncomp
    nmcu = 0
    rst = 0
    for my in range(ph // 8):
        for mx in range(pw // 8):
            if restart_interval and nmcu and nmcu % restart_interval == 0:
                bw.flush()
                out += bw.buf
                bw = _BitWriter()
                out += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) % 8
                pred = [0] * ncomp
            nmcu += 1
            for ci in range(ncomp):
                blk = padded[ci][my * 8:(my + 1) * 8, mx * 8:(mx + 1) * 8]
                coef = np.round(_fdct2(blk) / q).astype(np.int32)
                zzv = coef.reshape(-1)[ZIGZAG]
                dc = int(zzv[0])
                diff = dc - pred[ci]
                pred[ci] = dc
                s, bits_ = _mag(diff) if diff else (0, 0)
                c, ln = _DC_CODE[s]
                bw.put(c, ln)
                if s:
                    bw.put(bits_, s)
                run = 0
                last_nz = 0
                for k in range(63, 0, -1):
                    if zzv[k]:
                        last_nz = k
                        break
                for k in range(1, last_nz + 1):
                    v = int(zzv[k])
                    if v == 0:
                        run += 1
                        continue
                    while run > 15:
                        c, ln = _AC_CODE[0xF0]
                        bw.put(c, ln)
                        run -= 16
                    s, bits_ = _mag(v)
                    c, ln = _AC_CODE[(run << 4) | s]
                    bw.put(c, ln)
                    bw.put(bits_, s)
                    run = 0
                if last_nz < 63:
                    c, ln = _AC_CODE[0x00]  # EOB
                    bw.put(c, ln)
    bw.flush()
    out += bw.buf
    out += b"\xff\xd9"
    return bytes(out)
