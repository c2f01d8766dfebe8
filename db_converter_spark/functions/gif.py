"""Pure-stdlib GIF codec — the third real-image leg of the multimodal
operators without PIL (png.py: RFC 2083; jpeg.py: ITU-T T.81; this:
the public GIF89a specification, W3C/CompuServe).

GIF is the one mainstream ANIMATED format decodable with pure stdlib
(variable-width LSB-first LZW over palette indices). That makes it the
real-data carrier for two contracts the stub could only fake:
``n_frames`` in mm02's metadata, and mm03's every-k-th FRAME sampling.

Implements: ``gif_meta`` (logical screen + real frame count),
``gif_frames`` (per-frame decode → (x, y, w, h, RGB bytes) — frames are
returned as their OWN rects against their palette; no disposal-method
compositing onto a shared canvas, which frame-sampling does not need),
``gif_decode`` (first frame as a full-canvas RGB image when it covers
the canvas), ``gif_encode`` (single- or multi-frame, global palette,
real LZW compression, optional interlace — how the tests make fixtures)
and ``gif_resize`` (nearest-neighbor on palette INDICES — no
re-quantization needed — re-encoded single-frame).

Unsupported shapes return None (fall back to the stub), never a wrong
decode. Lossless: palette round-trips are exact, so the tests assert
byte equality (unlike JPEG's tolerance bands).
"""

from __future__ import annotations

import struct

_SIGS = (b"GIF87a", b"GIF89a")


# ---------------------------------------------------------------------------
# block walk
# ---------------------------------------------------------------------------


def _skip_subblocks(data: bytes, i: int) -> int:
    """Advance past data sub-blocks; returns the index after the 0
    terminator, or -1 when the stream ends before the terminator (a
    truncated block)."""
    while i < len(data):
        n = data[i]
        i += 1
        if n == 0:
            return i
        i += n
    return -1


def _walk(data: bytes):
    """Yield ('img', 0, descriptor_offset) / ('ext', label, offset) blocks;
    stops at the trailer. A block is yielded only AFTER its descriptor,
    color table, and data sub-blocks all parse in-bounds (terminator
    included) — a tail-truncated frame is never yielded, so gif_meta's
    n_frames counts exactly the frames gif_frames can decode (they agreed
    to disagree before r11: meta counted the chopped frame, frames
    returned None)."""
    if data[:6] not in _SIGS:
        return
    w, h, flags, _bg, _ar = struct.unpack("<HHBBB", data[6:13])
    i = 13
    if flags & 0x80:  # global color table
        i += 3 * (2 << (flags & 7))
    while i < len(data):
        b = data[i]
        if b == 0x3B:  # trailer
            return
        if b == 0x21:  # extension
            if i + 2 >= len(data):
                return  # truncated: no label/sub-blocks
            label = data[i + 1]
            j = _skip_subblocks(data, i + 2)
            if j < 0:
                return
            yield ("ext", label, i + 2)
            i = j
        elif b == 0x2C:  # image descriptor
            if i + 10 > len(data):
                return  # truncated descriptor
            _x, _y, iw, ih, iflags = struct.unpack("<HHHHB", data[i + 1 : i + 10])
            j = i + 10
            if iflags & 0x80:  # local color table
                j += 3 * (2 << (iflags & 7))
            j += 1  # LZW min code size
            if j > len(data):
                return  # truncated color table / missing min-code-size
            j = _skip_subblocks(data, j)
            if j < 0:
                return  # truncated LZW data
            yield ("img", 0, i + 1)
            i = j
        else:
            return  # corrupt block type: stop counting what we can't parse


def gif_meta(payload: bytes) -> "dict | None":
    """Signature + logical screen + REAL frame count, or None."""
    if len(payload) < 13 or payload[:6] not in _SIGS:
        return None
    w, h = struct.unpack("<HH", payload[6:10])
    n = 0
    try:
        for kind, _label, _off in _walk(payload):
            if kind == "img":
                n += 1
    except (IndexError, struct.error):
        pass  # truncated tail: count what parsed
    if n == 0:
        return None
    return {
        "width": w,
        "height": h,
        "bit_depth": 8,
        "n_frames": n,
        "format": "gif",
    }


# ---------------------------------------------------------------------------
# LZW
# ---------------------------------------------------------------------------


def _lzw_decode(data: bytes, min_code_size: int, n_pixels: int) -> "bytearray | None":
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    table: "list[bytes]" = [bytes([i]) for i in range(clear)] + [b"", b""]
    code_size = min_code_size + 1
    buf = 0
    nbits = 0
    prev: "bytes | None" = None
    for byte in data:
        buf |= byte << nbits
        nbits += 8
        while nbits >= code_size:
            code = buf & ((1 << code_size) - 1)
            buf >>= code_size
            nbits -= code_size
            if code == clear:
                table = [bytes([i]) for i in range(clear)] + [b"", b""]
                code_size = min_code_size + 1
                prev = None
                continue
            if code == eoi:
                return out
            if prev is None:
                if code >= len(table):
                    return None
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                table.append(prev + entry[:1])
            elif code == len(table):
                entry = prev + prev[:1]
                table.append(entry)
            else:
                return None
            out.extend(entry)
            if len(out) >= n_pixels:
                return out
            prev = entry
            if len(table) == (1 << code_size) and code_size < 12:
                code_size += 1
    return out


def _lzw_encode(indices: bytes, min_code_size: int) -> bytes:
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    buf = 0
    nbits = 0
    code_size = min_code_size + 1

    def emit(code: int) -> None:
        nonlocal buf, nbits
        buf |= code << nbits
        nbits += code_size
        while nbits >= 8:
            out.append(buf & 0xFF)
            buf >>= 8
            nbits -= 8

    table: "dict[bytes, int]" = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    emit(clear)
    run = b""
    for b in indices:
        cand = run + bytes([b])
        if cand in table:
            run = cand
            continue
        emit(table[run])
        table[cand] = next_code
        next_code += 1
        if next_code - 1 == (1 << code_size) and code_size < 12:
            code_size += 1
        if next_code >= 4096:
            emit(clear)
            table = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
            code_size = min_code_size + 1
        run = bytes([b])
    if run:
        emit(table[run])
    emit(eoi)
    if nbits:
        out.append(buf & 0xFF)
    return bytes(out)


_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _deinterlace(idx: bytearray, w: int, h: int) -> bytearray:
    out = bytearray(len(idx))
    src = 0
    for start, step in _INTERLACE_PASSES:
        for y in range(start, h, step):
            out[y * w : (y + 1) * w] = idx[src : src + w]
            src += w
    return out


# ---------------------------------------------------------------------------
# decode
# ---------------------------------------------------------------------------


def gif_frames(payload: bytes) -> "list[tuple[int, int, int, int, bytes]] | None":
    """Decode EVERY frame → [(x, y, w, h, rgb_bytes)] (each frame its own
    rect, local palette honored, interlace unwoven), or None."""
    if len(payload) < 13 or payload[:6] not in _SIGS:
        return None
    flags = payload[10]
    gct = None
    i = 13
    if flags & 0x80:
        n = 2 << (flags & 7)
        gct = payload[i : i + 3 * n]
        i += 3 * n
    frames = []
    try:
        for kind, _label, off in _walk(payload):
            if kind != "img":
                continue
            x, y, iw, ih, iflags = struct.unpack("<HHHHB", payload[off : off + 9])
            j = off + 9
            pal = gct
            if iflags & 0x80:
                n = 2 << (iflags & 7)
                pal = payload[j : j + 3 * n]
                j += 3 * n
            if pal is None:
                return None
            mcs = payload[j]
            j += 1
            stream = bytearray()
            while True:
                n = payload[j]
                j += 1
                if n == 0:
                    break
                stream.extend(payload[j : j + n])
                j += n
            idx = _lzw_decode(bytes(stream), mcs, iw * ih)
            if idx is None or len(idx) < iw * ih:
                return None
            idx = idx[: iw * ih]
            if iflags & 0x40:
                idx = _deinterlace(idx, iw, ih)
            rgb = bytearray(iw * ih * 3)
            for k, v in enumerate(idx):
                rgb[3 * k : 3 * k + 3] = pal[3 * v : 3 * v + 3]
            frames.append((x, y, iw, ih, bytes(rgb)))
    except (IndexError, struct.error):
        return None
    return frames or None


def gif_decode(payload: bytes) -> "tuple[int, int, int, bytearray] | None":
    """First frame as (width, height, 3, RGB bytes) when it covers the
    logical screen (the png/jpeg decode contract), else None."""
    meta = gif_meta(payload)
    frames = gif_frames(payload)
    if meta is None or not frames:
        return None
    x, y, w, h, rgb = frames[0]
    if (x, y, w, h) != (0, 0, meta["width"], meta["height"]):
        return None  # partial first frame: no full canvas to return
    return w, h, 3, bytearray(rgb)


# ---------------------------------------------------------------------------
# encode / resize
# ---------------------------------------------------------------------------


def gif_encode(
    width: int,
    height: int,
    frames: "list[bytes]",
    palette: bytes,
    interlace: bool = False,
) -> bytes:
    """GIF89a with a global palette: ``frames`` are palette-INDEX byte
    strings (one per frame, each width*height long); ``palette`` is RGB
    triples, length a power of two (2..256 entries)."""
    n_colors = len(palette) // 3
    if n_colors < 2 or n_colors & (n_colors - 1) or n_colors > 256:
        raise ValueError("palette must hold a power-of-two 2..256 colors")
    depth = n_colors.bit_length() - 1
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", width, height, 0x80 | (depth - 1), 0, 0)
    out += palette
    if len(frames) > 1:  # NETSCAPE loop extension, the animation marker
        out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"
    mcs = max(2, depth)
    for idx in frames:
        if len(idx) != width * height:
            raise ValueError("frame length != width*height")
        if interlace:
            woven = bytearray()
            for start, step in _INTERLACE_PASSES:
                for y in range(start, height, step):
                    woven += idx[y * width : (y + 1) * width]
            idx = bytes(woven)
        out += b"\x2c" + struct.pack(
            "<HHHHB", 0, 0, width, height, 0x40 if interlace else 0
        )
        out.append(mcs)
        data = _lzw_encode(idx, mcs)
        for i in range(0, len(data), 255):
            chunk = data[i : i + 255]
            out.append(len(chunk))
            out += chunk
        out.append(0)
    out += b"\x3b"
    return bytes(out)


def gif_resize(payload: bytes, new_w: int, new_h: int) -> "bytes | None":
    """Nearest-neighbor resample of the FIRST frame on palette indices
    (no re-quantization), re-encoded single-frame; None if undecodable."""
    if len(payload) < 13 or payload[:6] not in _SIGS:
        return None
    meta = gif_meta(payload)
    frames = gif_frames(payload)
    if meta is None or not frames:
        return None
    x, y, w, h, rgb = frames[0]
    if (x, y) != (0, 0):
        return None
    # rebuild an index frame from RGB via a dense palette of its colors
    colors: "dict[bytes, int]" = {}
    idx = bytearray(w * h)
    for k in range(w * h):
        c = bytes(rgb[3 * k : 3 * k + 3])
        if c not in colors:
            if len(colors) >= 256:
                return None  # cannot happen for a valid GIF frame
            colors[c] = len(colors)
        idx[k] = colors[c]
    n = max(2, 1 << (len(colors) - 1).bit_length())
    pal = b"".join(sorted(colors, key=colors.get)) + b"\x00" * (3 * (n - len(colors)))
    ys = [(j * h) // new_h for j in range(new_h)]
    xs = [(i * w) // new_w for i in range(new_w)]
    resized = bytearray(new_w * new_h)
    for j, sy in enumerate(ys):
        base = sy * w
        row = j * new_w
        for i, sx in enumerate(xs):
            resized[row + i] = idx[base + sx]
    return gif_encode(new_w, new_h, [bytes(resized)], pal)
