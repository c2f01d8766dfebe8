"""Pure-stdlib PNG codec — the real-image leg of the multimodal
operators without PIL.

PNG is the one mainstream image format decodable with nothing but the
standard library (DEFLATE via zlib + per-row unfiltering per the public
PNG specification, RFC 2083 / ISO 15948). This closes the "codecs
stubbed" gap for PNG payloads: mm02's metadata extraction and mm04's
resize slot in real decode/encode when the payload IS a PNG, and fall
back to the deterministic stub otherwise (the synthetic corpus's
text-bytes payloads keep their oracle rows).

Supported: 8-bit greyscale (0), RGB (2), greyscale+alpha (4), RGBA (6),
non-interlaced — what encoders emit by default. Paletted (3), 16-bit and
Adam7 return None (fall back), never a wrong decode.
"""

from __future__ import annotations

import struct
import zlib

_SIG = b"\x89PNG\r\n\x1a\n"

# channels per pixel by color type
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def png_meta(payload: bytes) -> dict | None:
    """Parse signature + IHDR → metadata dict, or None if not a PNG."""
    if len(payload) < 33 or payload[:8] != _SIG:
        return None
    length, ctype = struct.unpack(">I4s", payload[8:16])
    if ctype != b"IHDR" or length != 13:
        return None
    w, h, depth, color, _comp, _filt, interlace = struct.unpack(
        ">IIBBBBB", payload[16:29]
    )
    return {
        "width": w,
        "height": h,
        "bit_depth": depth,
        "color_type": color,
        "interlaced": bool(interlace),
        "n_frames": 1,
        "format": "png",
    }


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def png_decode(payload: bytes) -> tuple[int, int, int, bytearray] | None:
    """Full pixel decode → (width, height, channels, pixels) with pixels
    as row-major interleaved bytes, or None when unsupported/not a PNG."""
    meta = png_meta(payload)
    if (
        meta is None
        or meta["bit_depth"] != 8
        or meta["color_type"] not in _CHANNELS
        or meta["interlaced"]
    ):
        return None
    w, h, ch = meta["width"], meta["height"], _CHANNELS[meta["color_type"]]
    # walk chunks, concatenate IDAT
    idat = bytearray()
    pos = 8
    try:
        while pos + 8 <= len(payload):
            ln, ct = struct.unpack(">I4s", payload[pos : pos + 8])
            data = payload[pos + 8 : pos + 8 + ln]
            if ct == b"IDAT":
                idat += data
            elif ct == b"IEND":
                break
            pos += 12 + ln  # length + type + data + crc
        raw = zlib.decompress(bytes(idat))
    except (zlib.error, struct.error):
        return None
    stride = w * ch
    if len(raw) != h * (stride + 1):
        return None
    out = bytearray(h * stride)
    prev = bytearray(stride)
    for y in range(h):
        ftype = raw[y * (stride + 1)]
        line = bytearray(raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)])
        if ftype == 1:  # Sub
            for i in range(ch, stride):
                line[i] = (line[i] + line[i - ch]) & 0xFF
        elif ftype == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                left = line[i - ch] if i >= ch else 0
                line[i] = (line[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                left = line[i - ch] if i >= ch else 0
                ul = prev[i - ch] if i >= ch else 0
                line[i] = (line[i] + _paeth(left, prev[i], ul)) & 0xFF
        elif ftype != 0:
            return None
        out[y * stride : (y + 1) * stride] = line
        prev = line
    return w, h, ch, out


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def png_encode(width: int, height: int, channels: int, pixels: bytes) -> bytes:
    """Encode interleaved 8-bit pixels (1/2/3/4 channels) as a PNG."""
    color = {1: 0, 2: 4, 3: 2, 4: 6}[channels]
    stride = width * channels
    assert len(pixels) == height * stride
    raw = bytearray()
    for y in range(height):
        raw.append(0)  # filter: None
        raw += pixels[y * stride : (y + 1) * stride]
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color, 0, 0, 0)
    return (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw), 9))
        + _chunk(b"IEND", b"")
    )


def png_resize(payload: bytes, new_w: int, new_h: int) -> bytes | None:
    """Nearest-neighbor resize of a PNG payload → new PNG bytes, or None
    when the input is not a supported PNG. Deterministic (floor mapping,
    the standard nearest-neighbor index formula)."""
    dec = png_decode(payload)
    if dec is None:
        return None
    w, h, ch, px = dec
    out = bytearray(new_h * new_w * ch)
    for y in range(new_h):
        sy = y * h // new_h
        src_row = sy * w * ch
        dst_row = y * new_w * ch
        for x in range(new_w):
            sx = x * w // new_w
            s = src_row + sx * ch
            d = dst_row + x * ch
            out[d : d + ch] = px[s : s + ch]
    return png_encode(new_w, new_h, ch, bytes(out))
