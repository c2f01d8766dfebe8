"""Pure-Python baseline JPEG codec — the second real-image leg of the
multimodal operators without PIL (functions/png.py is the first).

Implements the public ITU-T T.81 / ISO 10918-1 baseline sequential DCT
process with the Annex K reference tables: marker parse (``jpeg_meta``),
full decode (``jpeg_decode`` — Huffman entropy decode, dequantize, 8x8
IDCT, chroma upsampling, YCbCr→RGB), a matching encoder (``jpeg_encode``
— 4:4:4, standard tables with libjpeg-style quality scaling; also how the
tests make fixtures without any image library), and a nearest-neighbor
``jpeg_resize`` mirroring png.py's contract.

Supported on decode: baseline (SOF0) and extended-sequential (SOF1)
8-bit scans, 1 or 3 components, sampling factors 1-2 (4:4:4 / 4:2:2 /
4:2:0), restart intervals. Progressive (SOF2), arithmetic coding, 12-bit
and CMYK return None (fall back to the stub), never a wrong decode.

numpy is used for the 8x8 (I)DCT matrix math only (it is a baked-in
dependency of the engine); all bit/Huffman work is stdlib.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# ITU-T T.81 Annex K reference tables (public spec constants)
# ---------------------------------------------------------------------------

_QY = [
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
]
_QC = [
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
]

_ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
]

# standard Huffman tables: (BITS[1..16], HUFFVAL)
_DC_Y = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0], list(range(12)))
_DC_C = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0], list(range(12)))
_AC_Y = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
        0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
        0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
        0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
        0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
        0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
        0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
        0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
        0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)
_AC_C = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
        0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
        0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
        0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
        0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
        0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
        0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
        0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
        0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
        0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
        0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)

# orthonormal 8x8 DCT-II matrix: forward F = C B C^T, inverse B = C^T F C
_C = np.zeros((8, 8))
for _u in range(8):
    a = np.sqrt(0.125) if _u == 0 else 0.5
    for _x in range(8):
        _C[_u, _x] = a * np.cos((2 * _x + 1) * _u * np.pi / 16)


# ---------------------------------------------------------------------------
# marker walk + metadata
# ---------------------------------------------------------------------------

_SOF_BASELINE = {0xC0, 0xC1}  # baseline / extended sequential (Huffman)
_SOF_ALL = set(range(0xC0, 0xD0)) - {0xC4, 0xC8, 0xCC}  # any frame header


def _markers(payload: bytes):
    """Yield (marker, segment_offset, segment_length) for every marker
    segment; stops at SOS (whose entropy data follows) or EOI."""
    n = len(payload)
    i = 2  # past SOI
    while i + 4 <= n:
        if payload[i] != 0xFF:
            return
        m = payload[i + 1]
        if m == 0xD9:  # EOI
            return
        if 0xD0 <= m <= 0xD7 or m == 0x01:  # RSTn/TEM: no segment
            i += 2
            continue
        ln = struct.unpack(">H", payload[i + 2 : i + 4])[0]
        yield m, i + 4, ln - 2
        i += 2 + ln
        if m == 0xDA:  # SOS — entropy data next, caller takes over
            return


def jpeg_meta(payload: bytes) -> "dict | None":
    """Marker-walk to the frame header → metadata dict, or None if the
    payload is not a JPEG. Works for every SOF type (progressive included
    — metadata does not need a decodable scan)."""
    if len(payload) < 4 or payload[:2] != b"\xff\xd8":
        return None
    for m, off, ln in _markers(payload):
        if m in _SOF_ALL and ln >= 6:
            prec, h, w, ncomp = struct.unpack(">BHHB", payload[off : off + 6])
            return {
                "width": w,
                "height": h,
                "bit_depth": prec,
                "n_components": ncomp,
                "progressive": m == 0xC2,
                "n_frames": 1,
                "format": "jpeg",
            }
    return None


# ---------------------------------------------------------------------------
# Huffman machinery
# ---------------------------------------------------------------------------


def _build_decode_table(bits: "list[int]", vals: "list[int]") -> dict:
    """Canonical JPEG Huffman: {(length, code): value}."""
    table = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            table[(ln, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _build_encode_table(bits: "list[int]", vals: "list[int]") -> dict:
    """{value: (code, length)}."""
    out = {}
    for (ln, code), v in _build_decode_table(bits, vals).items():
        out[v] = (code, ln)
    return out


class _BitReader:
    """MSB-first entropy-data reader with 0xFF00 unstuffing; RST/EOI
    markers end the current run (``marker`` is then set)."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.bitbuf = 0
        self.nbits = 0
        self.marker: "int | None" = None

    def _fill(self) -> bool:
        if self.pos >= len(self.data):
            return False
        b = self.data[self.pos]
        if b == 0xFF:
            nxt = self.data[self.pos + 1] if self.pos + 1 < len(self.data) else 0xD9
            if nxt == 0x00:
                self.pos += 2
            else:
                self.marker = nxt
                return False
        else:
            self.pos += 1
        self.bitbuf = (self.bitbuf << 8) | b
        self.nbits += 8
        return True

    def read_bit(self) -> int:
        if self.nbits == 0 and not self._fill():
            raise _ScanEnd()
        self.nbits -= 1
        return (self.bitbuf >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def decode_huff(self, table: dict) -> int:
        code = 0
        for ln in range(1, 17):
            code = (code << 1) | self.read_bit()
            if (ln, code) in table:
                return table[(ln, code)]
        raise _ScanEnd()

    def sync_restart(self) -> None:
        """Discard pad bits and consume the RSTn marker, whether _fill
        already saw it (self.marker set) or it is still unread at pos."""
        self.bitbuf = 0
        self.nbits = 0
        if self.marker is None and (
            self.pos + 1 < len(self.data)
            and self.data[self.pos] == 0xFF
            and 0xD0 <= self.data[self.pos + 1] <= 0xD7
        ):
            self.marker = self.data[self.pos + 1]
        if self.marker is not None and 0xD0 <= self.marker <= 0xD7:
            self.pos += 2  # past FF Dn
            self.marker = None


class _ScanEnd(Exception):
    pass


def _extend(v: int, t: int) -> int:
    return v - (1 << t) + 1 if v < (1 << (t - 1)) else v


# ---------------------------------------------------------------------------
# decode
# ---------------------------------------------------------------------------


def jpeg_decode(payload: bytes) -> "tuple[int, int, int, bytearray] | None":
    """Full pixel decode → (width, height, channels, pixels) row-major
    interleaved (1 = grey, 3 = RGB), or None when unsupported/not a JPEG."""
    if len(payload) < 4 or payload[:2] != b"\xff\xd8":
        return None
    qt: dict[int, list[int]] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    frame = None  # (w, h, comps) — comps: [(cid, hs, vs, tq)]
    restart = 0
    sos = None
    for m, off, ln in _markers(payload):
        seg = payload[off : off + ln]
        if m == 0xDB:  # DQT
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 15
                if pq != 0:
                    return None  # 16-bit tables: not baseline
                qt[tq] = list(seg[i + 1 : i + 65])
                i += 65
        elif m in _SOF_ALL:
            if m not in _SOF_BASELINE:
                return None  # progressive/arithmetic/lossless
            prec, h, w, ncomp = struct.unpack(">BHHB", seg[:6])
            if prec != 8 or ncomp not in (1, 3):
                return None
            comps = []
            for c in range(ncomp):
                cid, hv, tq = seg[6 + 3 * c], seg[7 + 3 * c], seg[8 + 3 * c]
                hs, vs = hv >> 4, hv & 15
                if not (1 <= hs <= 2 and 1 <= vs <= 2):
                    return None
                comps.append((cid, hs, vs, tq))
            frame = (w, h, comps)
        elif m == 0xC4:  # DHT
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 15
                bits = list(seg[i + 1 : i + 17])
                nv = sum(bits)
                vals = list(seg[i + 17 : i + 17 + nv])
                (huff_ac if tc else huff_dc)[th] = _build_decode_table(bits, vals)
                i += 17 + nv
        elif m == 0xDD:  # DRI
            restart = struct.unpack(">H", seg[:2])[0]
        elif m == 0xDA:  # SOS
            ns = seg[0]
            smap = []
            for c in range(ns):
                cs, tt = seg[1 + 2 * c], seg[2 + 2 * c]
                smap.append((cs, tt >> 4, tt & 15))
            sos = (smap, off + ln)
            break
    if frame is None or sos is None:
        return None
    w, h, comps = frame
    smap, data_pos = sos
    if len(smap) != len(comps):
        return None
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    planes = []
    for _, hs, vs, _ in comps:
        planes.append(np.zeros((mcuy * vs * 8, mcux * hs * 8), dtype=np.float64))
    # per-component decode context: (dc_table, ac_table, quant as 8x8)
    ctx = []
    for (cid, hs, vs, tq), (cs, td, ta) in zip(comps, smap):
        if cs != cid or td not in huff_dc or ta not in huff_ac or tq not in qt:
            return None
        q = np.zeros(64)
        for k in range(64):
            q[_ZIGZAG[k]] = qt[tq][k]
        ctx.append((huff_dc[td], huff_ac[ta], q.reshape(8, 8)))

    r = _BitReader(payload, data_pos)
    pred = [0] * len(comps)
    mcu_count = 0
    try:
        for my in range(mcuy):
            for mx in range(mcux):
                if restart and mcu_count and mcu_count % restart == 0:
                    r.sync_restart()
                    pred = [0] * len(comps)
                mcu_count += 1
                for ci, (cid, hs, vs, tq) in enumerate(comps):
                    dc_t, ac_t, q = ctx[ci]
                    for by in range(vs):
                        for bx in range(hs):
                            zz = np.zeros(64)
                            t = r.decode_huff(dc_t)
                            diff = _extend(r.read_bits(t), t) if t else 0
                            pred[ci] += diff
                            zz[0] = pred[ci]
                            k = 1
                            while k < 64:
                                rs = r.decode_huff(ac_t)
                                rr, ss = rs >> 4, rs & 15
                                if ss == 0:
                                    if rr == 15:
                                        k += 16
                                        continue
                                    break  # EOB
                                k += rr
                                if k > 63:
                                    break
                                zz[_ZIGZAG[k]] = _extend(r.read_bits(ss), ss)
                                k += 1
                            blk = zz.reshape(8, 8) * q
                            px = _C.T @ blk @ _C + 128.0
                            y0 = (my * vs + by) * 8
                            x0 = (mx * hs + bx) * 8
                            planes[ci][y0 : y0 + 8, x0 : x0 + 8] = px
    except _ScanEnd:
        pass  # truncated tail: whatever decoded stands (same as libjpeg)
    # upsample to full grid, crop, color-convert
    full = []
    for (cid, hs, vs, tq), pl in zip(comps, planes):
        if hs != hmax or vs != vmax:
            pl = np.repeat(np.repeat(pl, vmax // vs, axis=0), hmax // hs, axis=1)
        full.append(pl[:h, :w])
    if len(comps) == 1:
        out = np.clip(full[0], 0, 255).astype(np.uint8)
        return w, h, 1, bytearray(out.tobytes())
    y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    rgb = np.stack(
        [y + 1.402 * cr, y - 0.344136 * cb - 0.714136 * cr, y + 1.772 * cb],
        axis=-1,
    )
    out = np.clip(rgb, 0, 255).astype(np.uint8)
    return w, h, 3, bytearray(out.tobytes())


# ---------------------------------------------------------------------------
# encode (baseline, 4:4:4, standard tables with quality scaling)
# ---------------------------------------------------------------------------


def _scaled_q(base: "list[int]", quality: int) -> "list[int]":
    quality = min(100, max(1, quality))
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    return [min(255, max(1, (v * s + 50) // 100)) for v in base]


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.buf = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        self.buf = (self.buf << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            self.n -= 8
            b = (self.buf >> self.n) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing

    def flush(self) -> None:
        if self.n:
            self.write(0x7F, 7 - ((self.n - 1) % 8) + 1)  # pad with 1s


def _encode_block(
    bw: _BitWriter, blk: np.ndarray, q: np.ndarray, pred: int,
    dc_t: dict, ac_t: dict,
) -> int:
    f = _C @ (blk - 128.0) @ _C.T
    zz = np.rint(f / q).astype(int).reshape(64)
    zz = zz[_ZIGZAG]
    dc = int(zz[0])
    diff = dc - pred

    def _cat(v: int) -> int:
        return 0 if v == 0 else int(v).bit_length() if v > 0 else int(-v).bit_length()

    t = _cat(diff)
    code, ln = dc_t[t]
    bw.write(code, ln)
    if t:
        bw.write(diff if diff > 0 else diff + (1 << t) - 1, t)
    run = 0
    last_nz = 0
    for k in range(63, 0, -1):
        if zz[k]:
            last_nz = k
            break
    for k in range(1, last_nz + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_t[0xF0]  # ZRL
            bw.write(code, ln)
            run -= 16
        s = _cat(v)
        code, ln = ac_t[(run << 4) | s]
        bw.write(code, ln)
        bw.write(v if v > 0 else v + (1 << s) - 1, s)
        run = 0
    if last_nz < 63:
        code, ln = ac_t[0x00]  # EOB
        bw.write(code, ln)
    return dc


def jpeg_encode(
    width: int,
    height: int,
    channels: int,
    pixels: bytes,
    quality: int = 85,
    subsample: bool = False,
) -> bytes:
    """Baseline JPEG encode of row-major interleaved pixels (1 = grey,
    3 = RGB), standard Annex K tables scaled by ``quality`` (libjpeg's
    linear scaling). ``subsample=True`` emits 4:2:0 (2x2 luma sampling,
    box-averaged chroma) — also the decoder's upsampling-path fixture;
    default is 4:4:4."""
    if channels not in (1, 3):
        raise ValueError("channels must be 1 (grey) or 3 (RGB)")
    sub = bool(subsample) and channels == 3
    arr = np.frombuffer(bytes(pixels), dtype=np.uint8).reshape(
        height, width, channels
    ).astype(np.float64)
    if channels == 3:
        r, g, b = arr[..., 0], arr[..., 1], arr[..., 2]
        comps = [
            0.299 * r + 0.587 * g + 0.114 * b,
            -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0,
            0.5 * r - 0.418688 * g - 0.081312 * b + 128.0,
        ]
    else:
        comps = [arr[..., 0]]
    # _QY/_QC are the Annex-K tables in NATURAL (raster) order; quantize
    # with them directly, and serialize the DQT field zigzag-ordered per
    # T.81 B.2.4.1 (the decoder's q[_ZIGZAG[k]] = dqt[k] then reconstructs
    # exactly this natural-order matrix — and so does libjpeg's).
    qy = _scaled_q(_QY, quality)
    qc = _scaled_q(_QC, quality)
    qmats = [np.array(t, dtype=np.float64).reshape(8, 8) for t in (qy, qc)]

    def _dqt_zigzag(tbl: "list[int]") -> bytes:
        return bytes(tbl[_ZIGZAG[k]] for k in range(64))

    out = bytearray(b"\xff\xd8")  # SOI

    def _seg(marker: int, body: bytes) -> None:
        out.extend(struct.pack(">BBH", 0xFF, marker, len(body) + 2))
        out.extend(body)

    _seg(0xDB, bytes([0]) + _dqt_zigzag(qy))  # DQT 0 (luma)
    if channels == 3:
        _seg(0xDB, bytes([1]) + _dqt_zigzag(qc))  # DQT 1 (chroma)
    sof = struct.pack(">BHHB", 8, height, width, channels)
    for c in range(channels):
        hv = 0x22 if (sub and c == 0) else 0x11
        sof += bytes([c + 1, hv, 0 if c == 0 else 1])
    _seg(0xC0, sof)
    tables = [(0x00, _DC_Y), (0x10, _AC_Y)]
    if channels == 3:
        tables += [(0x01, _DC_C), (0x11, _AC_C)]
    for tid, (bits, vals) in tables:
        _seg(0xC4, bytes([tid]) + bytes(bits) + bytes(vals))
    sos = bytes([channels])
    for c in range(channels):
        sos += bytes([c + 1, 0x00 if c == 0 else 0x11])
    sos += bytes([0, 63, 0])
    _seg(0xDA, sos)

    enc_dc_y, enc_ac_y = _build_encode_table(*_DC_Y), _build_encode_table(*_AC_Y)
    enc_dc_c, enc_ac_c = _build_encode_table(*_DC_C), _build_encode_table(*_AC_C)
    bw = _BitWriter()
    preds = [0] * channels
    samp = [(2, 2) if (sub and c == 0) else (1, 1) for c in range(channels)]
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux = -(-width // (8 * hmax))
    mcuy = -(-height // (8 * vmax))

    def _pad(comp: np.ndarray, ph: int, pw: int) -> np.ndarray:
        ch_, cw_ = comp.shape
        p = np.empty((ph, pw))
        p[:ch_, :cw_] = comp
        p[ch_:, :cw_] = comp[-1:, :]  # edge replicate
        p[:, cw_:] = p[:, cw_ - 1 : cw_]
        return p

    padded = []
    for ci, comp in enumerate(comps):
        hs, vs = samp[ci]
        if (hs, vs) != (hmax, vmax):  # chroma under 4:2:0 — box average
            ph, pw = -(-height // 2) * 2, -(-width // 2) * 2
            c2 = _pad(comp, ph, pw)
            comp = (c2[0::2, 0::2] + c2[0::2, 1::2] + c2[1::2, 0::2] + c2[1::2, 1::2]) / 4.0
        padded.append(_pad(comp, mcuy * vs * 8, mcux * hs * 8))
    for my in range(mcuy):
        for mx in range(mcux):
            for ci in range(channels):
                hs, vs = samp[ci]
                dc_t, ac_t = (
                    (enc_dc_y, enc_ac_y) if ci == 0 else (enc_dc_c, enc_ac_c)
                )
                for by in range(vs):
                    for bx in range(hs):
                        y0 = (my * vs + by) * 8
                        x0 = (mx * hs + bx) * 8
                        blk = padded[ci][y0 : y0 + 8, x0 : x0 + 8]
                        preds[ci] = _encode_block(
                            bw, blk, qmats[0 if ci == 0 else 1], preds[ci], dc_t, ac_t
                        )
    bw.flush()
    out.extend(bw.out)
    out.extend(b"\xff\xd9")  # EOI
    return bytes(out)


def jpeg_resize(payload: bytes, new_w: int, new_h: int) -> "bytes | None":
    """Nearest-neighbor resample re-encoded as baseline JPEG (the png.py
    resize contract); None when the payload cannot be decoded."""
    dec = jpeg_decode(payload)
    if dec is None:
        return None
    w, h, ch, px = dec
    arr = np.frombuffer(bytes(px), dtype=np.uint8).reshape(h, w, ch)
    ys = (np.arange(new_h) * h) // new_h
    xs = (np.arange(new_w) * w) // new_w
    out = arr[ys][:, xs]
    return jpeg_encode(new_w, new_h, ch, out.tobytes())
