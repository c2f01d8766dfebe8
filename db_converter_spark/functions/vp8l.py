"""Pure-stdlib WebP codec — the fourth real-image leg of the multimodal
operators without PIL (png.py: RFC 2083; jpeg.py: ITU-T T.81; gif.py:
GIF89a; this: the public WebP container + VP8L lossless bitstream
specification, RFC 9649).

Scope (r11, VERDICT Next #5):

- **VP8L (lossless) decode** — the complete bitstream: LSB-first bit
  reading, simple + normal (code-length-coded) canonical Huffman, meta
  Huffman groups, color cache, LZ77 backward references (2D distance
  mapping included), and all four inverse transforms (predictor ×14,
  color/cross-color, subtract-green, color-indexing incl. sub-8-bit
  pixel bundling).
- **VP8L encode** — enough to produce REAL spec-valid fixtures with no
  third-party encoder: literal path with per-channel canonical Huffman,
  optional subtract-green, optional color cache, run-length LZ77
  (direct distances), and the palette (color-indexing) path with pixel
  bundling. Encode exists so the decoder is testable round-trip on real
  bitstreams; it is not a rate-optimized coder.
- **Container**: RIFF/WEBP parse (VP8L / lossy VP8 / VP8X / ANIM / ANMF),
  ``webp_meta`` (REAL width/height for both lossless AND lossy streams —
  lossy needs only the frame header — and REAL n_frames from ANMF
  chunks), ``webp_decode`` / ``webp_frames`` (VP8L pixels; lossy VP8
  pixel decode is out of scope: boolean-arithmetic entropy decoding of
  DCT coefficients — metadata-only there, never a wrong decode),
  ``webp_encode`` (still + animated), ``webp_resize``.

Unsupported payload shapes return None (multimodal falls back to its
deterministic stub), never a wrong decode.

Two spec tables are transcribed from RFC 9649 and cross-checked by
hand-built micro-streams in tests/test_vp8l.py rather than against an
external decoder (none in this container): the 120-entry 2D
distance-code map (`_DIST_MAP`) and the 14 spatial predictors
(`_predict`). The encoder deliberately emits ONLY direct (>120)
distance codes, so fixture round-trips never mask a map error.
"""

from __future__ import annotations

import heapq
import struct

# ---------------------------------------------------------------------------
# bit I/O (LSB-first, like DEFLATE)
# ---------------------------------------------------------------------------


class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0  # bit position

    def read(self, n: int) -> int:
        v = 0
        for i in range(n):
            byte = self.pos >> 3
            if byte >= len(self.data):
                raise EOFError("VP8L: bitstream truncated")
            v |= ((self.data[byte] >> (self.pos & 7)) & 1) << i
            self.pos += 1
        return v

    def read_bit(self) -> int:
        byte = self.pos >> 3
        if byte >= len(self.data):
            raise EOFError("VP8L: bitstream truncated")
        b = (self.data[byte] >> (self.pos & 7)) & 1
        self.pos += 1
        return b


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.cur = 0
        self.nbits = 0

    def write(self, value: int, n: int) -> None:
        for i in range(n):
            self.cur |= ((value >> i) & 1) << self.nbits
            self.nbits += 1
            if self.nbits == 8:
                self.out.append(self.cur)
                self.cur = 0
                self.nbits = 0

    def write_code(self, code: int, length: int) -> None:
        """Huffman codes are canonical MSB-first on the wire (the bit that
        distinguishes shorter prefixes arrives first)."""
        for i in range(length - 1, -1, -1):
            self.write((code >> i) & 1, 1)

    def getvalue(self) -> bytes:
        out = bytes(self.out)
        if self.nbits:
            out += bytes([self.cur])
        return out


# ---------------------------------------------------------------------------
# canonical Huffman
# ---------------------------------------------------------------------------


def _canonical_codes(lengths: "list[int]") -> "dict[int, tuple[int, int]]":
    """symbol -> (code, length) per the canonical assignment (symbols of
    equal length numbered in symbol order — the DEFLATE/VP8L rule)."""
    out: "dict[int, tuple[int, int]]" = {}
    code = 0
    max_len = max(lengths, default=0)
    for ln in range(1, max_len + 1):
        for sym, sl in enumerate(lengths):
            if sl == ln:
                out[sym] = (code, ln)
                code += 1
        code <<= 1
    return out


class _HuffDecoder:
    """Bit-by-bit canonical decode. The single-symbol degenerate code
    (lengths summing under Kraft) reads ZERO bits — both the spec's
    simple-code-with-one-symbol and libwebp's normal-code tolerance."""

    def __init__(self, lengths: "list[int]"):
        nz = [(s, l) for s, l in enumerate(lengths) if l > 0]
        if len(nz) == 1:
            self.single = nz[0][0]
            self.table = {}
            return
        self.single = None
        self.table = {
            (ln, code): sym for sym, (code, ln) in _canonical_codes(lengths).items()
        }
        self.max_len = max(l for _, l in nz) if nz else 0

    @classmethod
    def simple(cls, symbols: "list[int]", alphabet: int) -> "_HuffDecoder":
        d = cls.__new__(cls)
        if len(symbols) == 1:
            d.single = symbols[0]
            d.table = {}
        else:
            d.single = None
            d.table = {(1, 0): symbols[0], (1, 1): symbols[1]}
            d.max_len = 1
        return d

    def read(self, br: _BitReader) -> int:
        if self.single is not None:
            return self.single
        code = 0
        for ln in range(1, self.max_len + 1):
            code = (code << 1) | br.read_bit()
            sym = self.table.get((ln, code))
            if sym is not None:
                return sym
        raise ValueError("VP8L: invalid Huffman code")


def _code_lengths(freqs: "dict[int, int]", max_len: int) -> "dict[int, int]":
    """Huffman code lengths from a histogram, depth-limited: heapq Huffman,
    and if the depth limit is exceeded, fall back to the flat
    ceil(log2(n))-bit code (always canonical-valid)."""
    syms = [s for s, f in freqs.items() if f > 0]
    if len(syms) <= 1:
        return {s: 1 for s in syms}
    heap = [(f, i, (s,)) for i, (s, f) in enumerate(sorted(freqs.items())) if f > 0]
    heapq.heapify(heap)
    depth = dict.fromkeys(syms, 0)
    while len(heap) > 1:
        f1, _, g1 = heapq.heappop(heap)
        f2, i2, g2 = heapq.heappop(heap)
        for s in g1 + g2:
            depth[s] += 1
        heapq.heappush(heap, (f1 + f2, i2, g1 + g2))
    if max(depth.values()) > max_len:
        flat = max(1, (len(syms) - 1).bit_length())
        if flat > max_len:
            raise ValueError("alphabet too large for depth limit")
        return dict.fromkeys(syms, flat)
    return depth


# ---------------------------------------------------------------------------
# spec tables
# ---------------------------------------------------------------------------

# code-length-code symbol order (RFC 9649 §5.2.2)
_CL_ORDER = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)

# 2D distance mapping: distance codes 1..120 address a neighborhood pixel
# (x_offset, y_offset); dist = y*width + x, clamped to >= 1 (RFC 9649
# §4.2.2). Transcribed from the spec table; the encoder never emits these
# codes (direct distances only), so round-trip tests cannot mask a
# transcription error — hand-built micro-streams pin entries instead.
_DIST_MAP = (
    (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
    (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
    (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
    (1, 4), (-1, 4), (4, 1), (-4, 1), (3, 3), (-3, 3), (2, 4), (-2, 4),
    (4, 2), (-4, 2), (0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0),
    (1, 5), (-1, 5), (5, 1), (-5, 1), (2, 5), (-2, 5), (5, 2), (-5, 2),
    (4, 4), (-4, 4), (3, 5), (-3, 5), (5, 3), (-5, 3), (0, 6), (6, 0),
    (1, 6), (-1, 6), (6, 1), (-6, 1), (2, 6), (-2, 6), (6, 2), (-6, 2),
    (4, 5), (-4, 5), (5, 4), (-5, 4), (3, 6), (-3, 6), (6, 3), (-6, 3),
    (0, 7), (7, 0), (1, 7), (-1, 7), (5, 5), (-5, 5), (7, 1), (-7, 1),
    (4, 6), (-4, 6), (6, 4), (-6, 4), (2, 7), (-2, 7), (7, 2), (-7, 2),
    (3, 7), (-3, 7), (7, 3), (-7, 3), (5, 6), (-5, 6), (6, 5), (-6, 5),
    (8, 0), (4, 7), (-4, 7), (7, 4), (-7, 4), (8, 1), (8, 2), (6, 6),
    (-6, 6), (8, 3), (5, 7), (-5, 7), (7, 5), (-7, 5), (8, 4), (6, 7),
    (-6, 7), (7, 6), (-7, 6), (8, 5), (7, 7), (-7, 7), (8, 6), (8, 7),
)
assert len(_DIST_MAP) == 120


def _prefix_decode(code: int, br: _BitReader) -> int:
    """Length/distance prefix decoding (RFC 9649 §4.2.2): codes 0..3 are
    the values 1..4; higher codes carry extra bits."""
    if code < 4:
        return code + 1
    extra = (code - 2) >> 1
    offset = (2 + (code & 1)) << extra
    return offset + br.read(extra) + 1


def _prefix_encode(value: int) -> "tuple[int, int, int]":
    """value -> (prefix_code, extra_bits_count, extra_bits_value)."""
    if value <= 4:
        return value - 1, 0, 0
    v = value - 1
    hi = v.bit_length() - 1
    extra = hi - 1
    code = 2 * hi + ((v >> extra) & 1)
    return code, extra, v & ((1 << extra) - 1)


def _sub_size(size: int, bits: int) -> int:
    return (size + (1 << bits) - 1) >> bits


# ---------------------------------------------------------------------------
# decode — entropy-coded image
# ---------------------------------------------------------------------------


def _read_huffman_code(br: _BitReader, alphabet: int) -> _HuffDecoder:
    if br.read_bit():  # simple code
        num = br.read_bit() + 1
        if br.read_bit():  # first symbol 8-bit
            s0 = br.read(8)
        else:
            s0 = br.read_bit()
        syms = [s0]
        if num == 2:
            syms.append(br.read(8))
        return _HuffDecoder.simple(syms, alphabet)
    # normal: code lengths coded with the code-length code
    num_cl = 4 + br.read(4)
    cl_lengths = [0] * 19
    for i in range(num_cl):
        cl_lengths[_CL_ORDER[i]] = br.read(3)
    cl_dec = _HuffDecoder(cl_lengths)
    if br.read_bit():  # limited number of coded symbols
        nbits = 2 + 2 * br.read(3)
        max_symbol = 2 + br.read(nbits)
    else:
        max_symbol = alphabet
    lengths = [0] * alphabet
    prev = 8
    sym = 0
    while sym < alphabet:
        if max_symbol == 0:
            break
        max_symbol -= 1
        cl = cl_dec.read(br)
        if cl < 16:
            lengths[sym] = cl
            sym += 1
            if cl:
                prev = cl
        elif cl == 16:
            rep = 3 + br.read(2)
            for _ in range(rep):
                if sym < alphabet:
                    lengths[sym] = prev
                    sym += 1
        elif cl == 17:
            sym += 3 + br.read(3)
        else:  # 18
            sym += 11 + br.read(7)
    return _HuffDecoder(lengths)


class _HuffGroup:
    __slots__ = ("green", "red", "blue", "alpha", "dist")

    def __init__(self, br: _BitReader, cache_size: int):
        self.green = _read_huffman_code(br, 256 + 24 + cache_size)
        self.red = _read_huffman_code(br, 256)
        self.blue = _read_huffman_code(br, 256)
        self.alpha = _read_huffman_code(br, 256)
        self.dist = _read_huffman_code(br, 40)


def _decode_image(br: _BitReader, w: int, h: int, is_level0: bool):
    """Decode one entropy-coded image -> (list[argb], transforms) where
    transforms (level0 only) are recorded in read order."""
    transforms = []
    if is_level0:
        seen = set()
        while br.read_bit():
            ttype = br.read(2)
            if ttype in seen:
                raise ValueError("VP8L: duplicate transform")
            seen.add(ttype)
            if ttype == 0 or ttype == 1:  # predictor / color
                bits = br.read(3) + 2
                tw, th = _sub_size(w, bits), _sub_size(h, bits)
                timg, _ = _decode_image(br, tw, th, False)
                transforms.append((ttype, bits, timg, w))
            elif ttype == 2:  # subtract green
                transforms.append((2, 0, None, w))
            else:  # 3: color indexing
                n_colors = br.read(8) + 1
                pimg, _ = _decode_image(br, n_colors, 1, False)
                palette = []
                pr = pg = pb = pa = 0
                for p in pimg:
                    pa = (pa + ((p >> 24) & 0xFF)) & 0xFF
                    pr = (pr + ((p >> 16) & 0xFF)) & 0xFF
                    pg = (pg + ((p >> 8) & 0xFF)) & 0xFF
                    pb = (pb + (p & 0xFF)) & 0xFF
                    palette.append((pa << 24) | (pr << 16) | (pg << 8) | pb)
                xbits = (
                    3 if n_colors <= 2 else 2 if n_colors <= 4
                    else 1 if n_colors <= 16 else 0
                )
                transforms.append((3, xbits, palette, w))
                w = _sub_size(w, xbits)  # subsequent reads use packed width

    # color cache
    cache_bits = br.read(4) if br.read_bit() else 0
    if cache_bits > 11:
        raise ValueError("VP8L: invalid color cache size")
    cache_size = (1 << cache_bits) if cache_bits else 0
    cache = [0] * cache_size

    # meta Huffman (main image only)
    groups: "list[_HuffGroup]"
    meta = None
    if is_level0 and br.read_bit():
        hbits = br.read(3) + 2
        mw, mh = _sub_size(w, hbits), _sub_size(h, hbits)
        mimg, _ = _decode_image(br, mw, mh, False)
        meta = (hbits, mw, mimg)
        n_groups = max(((p >> 8) & 0xFFFF) for p in mimg) + 1
    else:
        n_groups = 1
    groups = [_HuffGroup(br, cache_size) for _ in range(n_groups)]

    n = w * h
    pix = [0] * n
    pos = 0
    while pos < n:
        if meta is not None:
            x, y = pos % w, pos // w
            hbits, mw, mimg = meta
            g = groups[(mimg[(y >> hbits) * mw + (x >> hbits)] >> 8) & 0xFFFF]
        else:
            g = groups[0]
        s = g.green.read(br)
        if s < 256:  # literal
            r = g.red.read(br)
            b = g.blue.read(br)
            a = g.alpha.read(br)
            p = (a << 24) | (r << 16) | (s << 8) | b
            pix[pos] = p
            pos += 1
            if cache_size:
                cache[(0x1E35A7BD * p & 0xFFFFFFFF) >> (32 - cache_bits)] = p
        elif s < 256 + 24:  # backward reference
            length = _prefix_decode(s - 256, br)
            dist_code = _prefix_decode(g.dist.read(br), br)
            if dist_code > 120:
                dist = dist_code - 120
            else:
                dx, dy = _DIST_MAP[dist_code - 1]
                dist = max(dy * w + dx, 1)
            if dist > pos or pos + length > n:
                raise ValueError("VP8L: invalid backward reference")
            for _ in range(length):
                p = pix[pos - dist]
                pix[pos] = p
                pos += 1
                if cache_size:
                    cache[(0x1E35A7BD * p & 0xFFFFFFFF) >> (32 - cache_bits)] = p
        else:  # color cache hit
            pix[pos] = cache[s - 256 - 24]
            pos += 1
    return pix, transforms


# ---------------------------------------------------------------------------
# inverse transforms
# ---------------------------------------------------------------------------


def _avg2(a: int, b: int) -> int:
    return (
        ((((a >> 24) & 0xFF) + ((b >> 24) & 0xFF)) >> 1) << 24
        | ((((a >> 16) & 0xFF) + ((b >> 16) & 0xFF)) >> 1) << 16
        | ((((a >> 8) & 0xFF) + ((b >> 8) & 0xFF)) >> 1) << 8
        | ((a & 0xFF) + (b & 0xFF)) >> 1
    )


def _clip255(v: int) -> int:
    return 0 if v < 0 else 255 if v > 255 else v


def _predict(mode: int, left: int, top: int, tl: int, tr: int) -> int:
    if mode == 0:
        return 0xFF000000
    if mode == 1:
        return left
    if mode == 2:
        return top
    if mode == 3:
        return tr
    if mode == 4:
        return tl
    if mode == 5:
        return _avg2(_avg2(left, tr), top)
    if mode == 6:
        return _avg2(left, tl)
    if mode == 7:
        return _avg2(left, top)
    if mode == 8:
        return _avg2(tl, top)
    if mode == 9:
        return _avg2(top, tr)
    if mode == 10:
        return _avg2(_avg2(left, tl), _avg2(top, tr))
    if mode == 11:  # Select(top, left, tl)
        pa_minus_pb = 0
        for sh in (24, 16, 8, 0):
            a = (top >> sh) & 0xFF
            b = (left >> sh) & 0xFF
            c = (tl >> sh) & 0xFF
            pa_minus_pb += abs(b - c) - abs(a - c)
        return top if pa_minus_pb <= 0 else left
    if mode == 12:  # ClampAddSubtractFull(left, top, tl)
        out = 0
        for sh in (24, 16, 8, 0):
            v = _clip255(((left >> sh) & 0xFF) + ((top >> sh) & 0xFF) - ((tl >> sh) & 0xFF))
            out |= v << sh
        return out
    # 13: ClampAddSubtractHalf(Average2(left, top), tl) — the (a - b) / 2
    # term truncates toward ZERO (C semantics), not floor
    ave = _avg2(left, top)
    out = 0
    for sh in (24, 16, 8, 0):
        a = (ave >> sh) & 0xFF
        b = (tl >> sh) & 0xFF
        v = _clip255(a + int((a - b) / 2))  # int() = C truncation toward 0
        out |= v << sh
    return out


def _add_pixels(residual: int, pred: int) -> int:
    return (
        ((((residual >> 24) & 0xFF) + ((pred >> 24) & 0xFF)) & 0xFF) << 24
        | ((((residual >> 16) & 0xFF) + ((pred >> 16) & 0xFF)) & 0xFF) << 16
        | ((((residual >> 8) & 0xFF) + ((pred >> 8) & 0xFF)) & 0xFF) << 8
        | (((residual & 0xFF) + (pred & 0xFF)) & 0xFF)
    )


def _inv_predictor(pix: "list[int]", w: int, h: int, bits: int, timg: "list[int]"):
    tw = _sub_size(w, bits)
    for y in range(h):
        row = y * w
        for x in range(w):
            i = row + x
            if x == 0 and y == 0:
                pred = 0xFF000000
            elif y == 0:
                pred = pix[i - 1]  # left
            elif x == 0:
                pred = pix[i - w]  # top
            else:
                mode = (timg[(y >> bits) * tw + (x >> bits)] >> 8) & 0xFF
                left = pix[i - 1]
                top = pix[i - w]
                tl = pix[i - w - 1]
                # TR for the last column wraps (contiguous buffer) to the
                # FIRST pixel of the current row — RFC 9649 §4.2.2
                tr = pix[i - w + 1]
                pred = _predict(mode, left, top, tl, tr)
            pix[i] = _add_pixels(pix[i], pred)


def _s8(v: int) -> int:
    return v - 256 if v >= 128 else v


def _ct_delta(t: int, c: int) -> int:
    return (_s8(t) * _s8(c)) >> 5


def _inv_color_transform(pix: "list[int]", w: int, h: int, bits: int, timg: "list[int]"):
    tw = _sub_size(w, bits)
    for y in range(h):
        row = y * w
        trow = (y >> bits) * tw
        for x in range(w):
            i = row + x
            t = timg[trow + (x >> bits)]
            g2r = t & 0xFF
            g2b = (t >> 8) & 0xFF
            r2b = (t >> 16) & 0xFF
            p = pix[i]
            g = (p >> 8) & 0xFF
            r = ((p >> 16) & 0xFF) + _ct_delta(g2r, g) & 0xFF
            b = ((p & 0xFF) + _ct_delta(g2b, g) + _ct_delta(r2b, r)) & 0xFF
            pix[i] = (p & 0xFF00FF00) | (r << 16) | b


def _inv_subtract_green(pix: "list[int]"):
    for i, p in enumerate(pix):
        g = (p >> 8) & 0xFF
        r = (((p >> 16) & 0xFF) + g) & 0xFF
        b = ((p & 0xFF) + g) & 0xFF
        pix[i] = (p & 0xFF00FF00) | (r << 16) | b


def _inv_color_index(
    pix: "list[int]", w: int, xbits: int, palette: "list[int]"
) -> "list[int]":
    """Unbundle packed indices (green channel) and map through the
    palette; invalid indices decode as transparent black."""
    if xbits == 0:
        return [
            palette[(p >> 8) & 0xFF] if ((p >> 8) & 0xFF) < len(palette) else 0
            for p in pix
        ]
    packed_w = _sub_size(w, xbits)
    bpp = 8 >> xbits
    mask = (1 << bpp) - 1
    per = 1 << xbits
    h = len(pix) // packed_w
    out = [0] * (w * h)
    for y in range(h):
        src = y * packed_w
        dst = y * w
        for x in range(w):
            g = (pix[src + (x >> xbits)] >> 8) & 0xFF
            idx = (g >> (bpp * (x % per))) & mask
            out[dst + x] = palette[idx] if idx < len(palette) else 0
    return out


def vp8l_decode(data: bytes) -> "tuple[int, int, list[int]] | None":
    """Decode a VP8L chunk payload -> (width, height, ARGB pixel list),
    or None when it is not a VP8L stream / uses an unknown version."""
    if len(data) < 5 or data[0] != 0x2F:
        return None
    br = _BitReader(data[1:])
    try:
        w = br.read(14) + 1
        h = br.read(14) + 1
        br.read_bit()  # alpha hint
        if br.read(3) != 0:
            return None  # unknown version
        pix, transforms = _decode_image(br, w, h, True)
        for ttype, bits, timg, orig_w in reversed(transforms):
            if ttype == 0:
                _inv_predictor(pix, orig_w, len(pix) // orig_w, bits, timg)
            elif ttype == 1:
                _inv_color_transform(pix, orig_w, len(pix) // orig_w, bits, timg)
            elif ttype == 2:
                _inv_subtract_green(pix)
            else:
                pix = _inv_color_index(pix, orig_w, bits, timg)
        return w, h, pix
    except (EOFError, ValueError, IndexError):
        return None


# ---------------------------------------------------------------------------
# encode
# ---------------------------------------------------------------------------


def _write_huffman_code(bw: _BitWriter, freqs: "dict[int, int]", alphabet: int):
    """Emit one Huffman code and return symbol->(code,len). Uses the
    simple code for <=2 distinct symbols, else the normal code-length-
    coded form (zeros run-length-compressed with CL symbols 17/18)."""
    syms = sorted(s for s, f in freqs.items() if f > 0)
    if not syms:
        syms = [0]
    if len(syms) <= 2 and max(syms) < 256:
        bw.write(1, 1)  # simple
        bw.write(len(syms) - 1, 1)
        if syms[0] >= 2:
            bw.write(1, 1)
            bw.write(syms[0], 8)
        else:
            bw.write(0, 1)
            bw.write(syms[0], 1)
        if len(syms) == 2:
            bw.write(syms[1], 8)
        if len(syms) == 1:
            return {syms[0]: (0, 0)}
        return {syms[0]: (0, 1), syms[1]: (1, 1)}

    bw.write(0, 1)  # normal
    depth = _code_lengths({s: freqs.get(s, 0) for s in syms}, 15)
    lengths = [depth.get(s, 0) for s in range(alphabet)]

    # serialize lengths as CL symbols with zero-run compression
    cl_stream: "list[tuple[int, int, int]]" = []  # (cl_sym, extra, extra_bits)
    i = 0
    while i < len(lengths):
        if lengths[i] == 0:
            run = 1
            while i + run < len(lengths) and lengths[i + run] == 0:
                run += 1
            i += run
            while run >= 11:
                r = min(run, 138)
                cl_stream.append((18, r - 11, 7))
                run -= r
            while run >= 3:
                r = min(run, 10)
                cl_stream.append((17, r - 3, 3))
                run -= r
            for _ in range(run):
                cl_stream.append((0, 0, 0))
        else:
            cl_stream.append((lengths[i], 0, 0))
            i += 1
    # trailing zero runs can simply be dropped? keep them: decoder zeros
    # the remainder anyway only via max_symbol; we write all (no trick bit)
    cl_freq: "dict[int, int]" = {}
    for s, _, _ in cl_stream:
        cl_freq[s] = cl_freq.get(s, 0) + 1
    cl_depth = _code_lengths(cl_freq, 7)
    if len(cl_depth) == 1:
        # a lone CL symbol still needs a 1-bit canonical slot
        cl_depth[next(iter(cl_depth))] = 1
    cl_lengths = [cl_depth.get(s, 0) for s in range(19)]
    bw.write(15, 4)  # num_code_lengths = 19
    for s in _CL_ORDER:
        bw.write(cl_lengths[s], 3)
    bw.write(0, 1)  # no max_symbol trick
    cl_codes = _canonical_codes(cl_lengths)
    single_cl = len([l for l in cl_lengths if l]) == 1
    for s, extra, ebits in cl_stream:
        if not single_cl:
            c, ln = cl_codes[s]
            bw.write_code(c, ln)
        # degenerate single-symbol CL code: zero bits per symbol
        if ebits:
            bw.write(extra, ebits)
    return _canonical_codes(lengths)


def _encode_image(
    bw: _BitWriter,
    pix: "list[int]",
    cache_bits: int = 0,
    rle: bool = True,
    is_level0: bool = False,
):
    """Entropy-code one image (single Huffman group): optional color
    cache, run-length LZ77 with DIRECT distance codes only. Level-0
    (main) images additionally carry the no-meta-Huffman bit."""
    n = len(pix)
    cache_size = (1 << cache_bits) if cache_bits else 0
    cache = [0] * cache_size

    # token pass
    tokens = []  # ('lit', p) | ('cache', idx) | ('copy', length, dist)
    gf: "dict[int, int]" = {}
    rf: "dict[int, int]" = {}
    bf: "dict[int, int]" = {}
    af: "dict[int, int]" = {}
    df: "dict[int, int]" = {}
    i = 0
    while i < n:
        p = pix[i]
        if rle and i > 0 and p == pix[i - 1]:
            run = 1
            while i + run < n and pix[i + run] == pix[i - 1]:
                run += 1
            j = 0
            while j < run:
                ln = min(run - j, 4096)
                lc, _, _ = _prefix_encode(ln)
                dc, _, _ = _prefix_encode(121)  # direct distance 1
                gf[256 + lc] = gf.get(256 + lc, 0) + 1
                df[dc] = df.get(dc, 0) + 1
                tokens.append(("copy", ln, 1))
                if cache_size:
                    idx = (0x1E35A7BD * p & 0xFFFFFFFF) >> (32 - cache_bits)
                    cache[idx] = p
                j += ln
            i += run
            continue
        if cache_size:
            idx = (0x1E35A7BD * p & 0xFFFFFFFF) >> (32 - cache_bits)
            if cache[idx] == p and i > 0:
                sym = 256 + 24 + idx
                gf[sym] = gf.get(sym, 0) + 1
                tokens.append(("cache", idx))
                i += 1
                continue
            cache[idx] = p
        g = (p >> 8) & 0xFF
        gf[g] = gf.get(g, 0) + 1
        r = (p >> 16) & 0xFF
        rf[r] = rf.get(r, 0) + 1
        b = p & 0xFF
        bf[b] = bf.get(b, 0) + 1
        a = (p >> 24) & 0xFF
        af[a] = af.get(a, 0) + 1
        tokens.append(("lit", p))
        i += 1

    # header: color cache, then codes
    if cache_bits:
        bw.write(1, 1)
        bw.write(cache_bits, 4)
    else:
        bw.write(0, 1)
    if is_level0:
        bw.write(0, 1)  # no meta Huffman (single group)
    if not df:
        df[0] = 1
    green_alpha = 256 + 24 + cache_size
    g_codes = _write_huffman_code(bw, gf, green_alpha)
    r_codes = _write_huffman_code(bw, rf, 256)
    b_codes = _write_huffman_code(bw, bf, 256)
    a_codes = _write_huffman_code(bw, af, 256)
    d_codes = _write_huffman_code(bw, df, 40)

    for tok in tokens:
        if tok[0] == "lit":
            p = tok[1]
            c, ln = g_codes[(p >> 8) & 0xFF]
            bw.write_code(c, ln)
            c, ln = r_codes[(p >> 16) & 0xFF]
            bw.write_code(c, ln)
            c, ln = b_codes[p & 0xFF]
            bw.write_code(c, ln)
            c, ln = a_codes[(p >> 24) & 0xFF]
            bw.write_code(c, ln)
        elif tok[0] == "cache":
            c, ln = g_codes[256 + 24 + tok[1]]
            bw.write_code(c, ln)
        else:
            _, length, dist = tok
            lc, le, lv = _prefix_encode(length)
            c, ln = g_codes[256 + lc]
            bw.write_code(c, ln)
            if le:
                bw.write(lv, le)
            dc, de, dv = _prefix_encode(dist + 120)
            c, ln = d_codes[dc]
            bw.write_code(c, ln)
            if de:
                bw.write(dv, de)


def vp8l_encode(
    width: int,
    height: int,
    channels: int,
    pixels: bytes,
    cache_bits: int = 6,
    subtract_green: bool = False,
    use_palette: "bool | None" = None,
) -> bytes:
    """Encode row-major interleaved pixels (1 = grey, 3 = RGB, 4 = RGBA)
    as a VP8L chunk payload. ``use_palette=None`` auto-selects the
    color-indexing path (with pixel bundling) when <= 256 distinct
    colors; explicit False forces the literal path."""
    if channels not in (1, 3, 4):
        raise ValueError("channels must be 1, 3 or 4")
    n = width * height
    pix = [0] * n
    for i in range(n):
        o = i * channels
        if channels == 1:
            v = pixels[o]
            pix[i] = 0xFF000000 | (v << 16) | (v << 8) | v
        elif channels == 3:
            pix[i] = (
                0xFF000000 | (pixels[o] << 16) | (pixels[o + 1] << 8) | pixels[o + 2]
            )
        else:
            pix[i] = (
                (pixels[o + 3] << 24)
                | (pixels[o] << 16)
                | (pixels[o + 1] << 8)
                | pixels[o + 2]
            )

    bw = _BitWriter()
    bw.write(width - 1, 14)
    bw.write(height - 1, 14)
    bw.write(1 if channels == 4 else 0, 1)  # alpha hint
    bw.write(0, 3)  # version

    colors = sorted(set(pix))
    if use_palette is None:
        use_palette = len(colors) <= 256
    if use_palette and len(colors) > 256:
        raise ValueError("palette mode needs <= 256 distinct colors")

    if use_palette:
        # color-indexing transform with pixel bundling
        idx_of = {c: i for i, c in enumerate(colors)}
        ncol = len(colors)
        xbits = 3 if ncol <= 2 else 2 if ncol <= 4 else 1 if ncol <= 16 else 0
        bw.write(1, 1)  # transform present
        bw.write(3, 2)  # color indexing
        bw.write(ncol - 1, 8)
        # palette image: component-wise delta from previous entry
        deltas = []
        prev = 0
        for c in colors:
            d = 0
            for sh in (24, 16, 8, 0):
                d |= (((c >> sh) - (prev >> sh)) & 0xFF) << sh
            deltas.append(d)
            prev = c
        _encode_image(bw, deltas, cache_bits=0)
        # main image at packed width, indices bundled into green
        if xbits:
            bpp = 8 >> xbits
            per = 1 << xbits
            packed_w = _sub_size(width, xbits)
            packed = [0] * (packed_w * height)
            for y in range(height):
                for x in range(width):
                    g = idx_of[pix[y * width + x]]
                    packed[y * packed_w + (x >> xbits)] |= g << (
                        8 + bpp * (x % per)
                    )
            main = [0xFF000000 | (p & 0xFF00) for p in packed]
        else:
            main = [0xFF000000 | (idx_of[p] << 8) for p in pix]
        bw.write(0, 1)  # no more transforms
        _encode_image(bw, main, cache_bits=0, is_level0=True)
        return bytes([0x2F]) + bw.getvalue()

    if subtract_green:
        bw.write(1, 1)
        bw.write(2, 2)  # subtract-green (no payload)
        fwd = []
        for p in pix:
            g = (p >> 8) & 0xFF
            r = (((p >> 16) & 0xFF) - g) & 0xFF
            b = ((p & 0xFF) - g) & 0xFF
            fwd.append((p & 0xFF00FF00) | (r << 16) | b)
        pix = fwd
    bw.write(0, 1)  # end of transforms
    _encode_image(bw, pix, cache_bits=cache_bits, is_level0=True)
    return bytes([0x2F]) + bw.getvalue()


# ---------------------------------------------------------------------------
# RIFF container
# ---------------------------------------------------------------------------


def _chunks(payload: bytes):
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WEBP":
        return
    i = 12
    while i + 8 <= len(payload):
        fourcc = payload[i : i + 4]
        (size,) = struct.unpack("<I", payload[i + 4 : i + 8])
        data = payload[i + 8 : i + 8 + size]
        if len(data) < size:
            return  # truncated chunk: stop (what parsed stands)
        yield fourcc, data
        i += 8 + size + (size & 1)


def _vp8_lossy_dims(data: bytes) -> "tuple[int, int] | None":
    """Lossy VP8 key-frame header: 3-byte frame tag, 0x9d012a start code,
    14-bit width/height (public VP8 spec, RFC 6386 §9.1)."""
    if len(data) < 10 or data[3:6] != b"\x9d\x01\x2a":
        return None
    if data[0] & 1:  # not a key frame — no dimensions
        return None
    w = struct.unpack("<H", data[6:8])[0] & 0x3FFF
    h = struct.unpack("<H", data[8:10])[0] & 0x3FFF
    return w, h


def webp_meta(payload: bytes) -> "dict | None":
    """Container + stream metadata: REAL dimensions for VP8L (header
    bits) and lossy VP8 (frame header) and VP8X (canvas), REAL n_frames
    from ANMF chunk count. None when not a WebP."""
    if len(payload) < 16 or payload[:4] != b"RIFF" or payload[8:12] != b"WEBP":
        return None
    w = h = None
    n_frames = 0
    has_stream = False
    for fourcc, data in _chunks(payload):
        if fourcc == b"VP8X" and len(data) >= 10:
            cw = int.from_bytes(data[4:7], "little") + 1
            ch = int.from_bytes(data[7:10], "little") + 1
            if w is None:
                w, h = cw, ch
        elif fourcc == b"VP8L" and len(data) >= 5 and data[0] == 0x2F:
            has_stream = True
            if w is None:
                bits = int.from_bytes(data[1:5], "little")
                w = (bits & 0x3FFF) + 1
                h = ((bits >> 14) & 0x3FFF) + 1
        elif fourcc == b"VP8 ":
            has_stream = True
            if w is None:
                dims = _vp8_lossy_dims(data)
                if dims:
                    w, h = dims
        elif fourcc == b"ANMF":
            n_frames += 1
            has_stream = True
    if w is None or not has_stream:
        return None
    return {
        "width": w,
        "height": h,
        "bit_depth": 8,
        "n_frames": max(n_frames, 1),
        "format": "webp",
    }


def _argb_to_rgb(pix: "list[int]") -> bytes:
    out = bytearray(len(pix) * 3)
    for i, p in enumerate(pix):
        out[3 * i] = (p >> 16) & 0xFF
        out[3 * i + 1] = (p >> 8) & 0xFF
        out[3 * i + 2] = p & 0xFF
    return bytes(out)


def webp_decode(payload: bytes) -> "tuple[int, int, int, bytes] | None":
    """First lossless still frame -> (width, height, 3, rgb bytes), or
    None (lossy/animated-only payloads fall back to metadata)."""
    for fourcc, data in _chunks(payload):
        if fourcc == b"VP8L":
            got = vp8l_decode(data)
            if got is None:
                return None
            w, h, pix = got
            return w, h, 3, _argb_to_rgb(pix)
    return None


def webp_frames(payload: bytes) -> "list[tuple[int, int, int, int, bytes]] | None":
    """Decode every ANMF frame whose stream is VP8L ->
    [(x, y, w, h, rgb)], or the single still frame; None when nothing is
    losslessly decodable."""
    frames = []
    for fourcc, data in _chunks(payload):
        if fourcc == b"ANMF" and len(data) >= 16:
            fx = int.from_bytes(data[0:3], "little") * 2
            fy = int.from_bytes(data[3:6], "little") * 2
            sub = data[16:]
            # frame data holds its own chunks (no RIFF header)
            j = 0
            while j + 8 <= len(sub):
                cc = sub[j : j + 4]
                (sz,) = struct.unpack("<I", sub[j + 4 : j + 8])
                cd = sub[j + 8 : j + 8 + sz]
                if cc == b"VP8L":
                    got = vp8l_decode(cd)
                    if got is None:
                        return None
                    w, h, pix = got
                    frames.append((fx, fy, w, h, _argb_to_rgb(pix)))
                j += 8 + sz + (sz & 1)
    if frames:
        return frames
    still = webp_decode(payload)
    if still is None:
        return None
    w, h, _c, rgb = still
    return [(0, 0, w, h, rgb)]


def _riff(chunks: "list[tuple[bytes, bytes]]") -> bytes:
    body = b"WEBP"
    for cc, data in chunks:
        body += cc + struct.pack("<I", len(data)) + data
        if len(data) & 1:
            body += b"\x00"
    return b"RIFF" + struct.pack("<I", len(body)) + body


def webp_encode(
    width: int,
    height: int,
    channels: int,
    pixels: bytes,
    **kw,
) -> bytes:
    """Still lossless WebP (RIFF + VP8L)."""
    return _riff([(b"VP8L", vp8l_encode(width, height, channels, pixels, **kw))])


def webp_encode_anim(
    width: int, height: int, frames: "list[bytes]", channels: int = 3, **kw
) -> bytes:
    """Animated lossless WebP: VP8X + ANIM + one ANMF(VP8L) per frame."""
    chunks = [
        (
            b"VP8X",
            bytes([0x02, 0, 0, 0])
            + (width - 1).to_bytes(3, "little")
            + (height - 1).to_bytes(3, "little"),
        ),
        (b"ANIM", b"\x00\x00\x00\x00\x00\x00"),
    ]
    for fr in frames:
        stream = vp8l_encode(width, height, channels, fr, **kw)
        fd = (
            (0).to_bytes(3, "little")
            + (0).to_bytes(3, "little")
            + (width - 1).to_bytes(3, "little")
            + (height - 1).to_bytes(3, "little")
            + (40).to_bytes(3, "little")
            + bytes([0])
            + b"VP8L"
            + struct.pack("<I", len(stream))
            + stream
            + (b"\x00" if len(stream) & 1 else b"")
        )
        chunks.append((b"ANMF", fd))
    return _riff(chunks)


def webp_resize(payload: bytes, new_w: int, new_h: int) -> "bytes | None":
    """Nearest-neighbor resize of a lossless still, re-encoded."""
    got = webp_decode(payload)
    if got is None or new_w < 1 or new_h < 1:
        return None
    w, h, _c, rgb = got
    out = bytearray(new_w * new_h * 3)
    for y in range(new_h):
        sy = min(y * h // new_h, h - 1)
        for x in range(new_w):
            sx = min(x * w // new_w, w - 1)
            so = (sy * w + sx) * 3
            do = (y * new_w + x) * 3
            out[do : do + 3] = rgb[so : so + 3]
    return webp_encode(new_w, new_h, 3, bytes(out))
