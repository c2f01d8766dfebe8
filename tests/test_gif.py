"""Pure-stdlib GIF codec (functions/gif.py) — lossless round-trip
(palette exact, byte equality), multi-frame metadata, interlace, LZW
table-growth stress, and real GIF payloads through the actual
mm02/mm03/mm04 mapInPandas pipelines (the ANIMATED leg the PNG/JPEG
codecs cannot carry: n_frames and frame sampling become real)."""

from __future__ import annotations

import hashlib

from db_converter_spark.functions.gif import (
    gif_decode,
    gif_encode,
    gif_frames,
    gif_meta,
    gif_resize,
)

_PAL64 = b"".join(
    bytes([r * 85, g * 85, b * 85])
    for r in range(4) for g in range(4) for b in range(4)
)


def _frame(w: int, h: int, seed: int) -> bytes:
    return bytes((x * 7 + y * 3 + seed) % 64 for y in range(h) for x in range(w))


def _rgb(idx: bytes) -> bytes:
    return b"".join(_PAL64[3 * i : 3 * i + 3] for i in idx)


def test_lossless_roundtrip_and_meta():
    w, h = 37, 21
    f1, f2, f3 = _frame(w, h, 0), _frame(w, h, 5), _frame(w, h, 11)
    payload = gif_encode(w, h, [f1, f2, f3], _PAL64)
    meta = gif_meta(payload)
    assert meta == {
        "width": w, "height": h, "bit_depth": 8, "n_frames": 3, "format": "gif",
    }
    # first-frame full decode is EXACT (palette lossless)
    dw, dh, ch, px = gif_decode(payload)
    assert (dw, dh, ch) == (w, h, 3) and bytes(px) == _rgb(f1)
    # every frame decodes exactly
    frames = gif_frames(payload)
    assert [f[4] for f in frames] == [_rgb(f1), _rgb(f2), _rgb(f3)]
    assert all(f[:4] == (0, 0, w, h) for f in frames)


def test_interlaced_decode_matches_progressive():
    w, h = 23, 17
    f = _frame(w, h, 3)
    plain = gif_decode(gif_encode(w, h, [f], _PAL64))
    woven = gif_decode(gif_encode(w, h, [f], _PAL64, interlace=True))
    assert bytes(plain[3]) == bytes(woven[3]) == _rgb(f)


def test_lzw_table_growth_stress():
    """A 128x128 high-entropy frame forces LZW through multiple code-size
    bumps and a table reset past 4096 entries — still exact."""
    w = h = 128
    f = bytes((x * x + 13 * y + (x * y) // 7) % 64 for y in range(h) for x in range(w))
    assert bytes(gif_decode(gif_encode(w, h, [f], _PAL64))[3]) == _rgb(f)


def test_resize_contract_and_determinism():
    w, h = 64, 32
    payload = gif_encode(w, h, [_frame(w, h, 1)], _PAL64)
    out = gif_resize(payload, 32, 16)
    meta = gif_meta(out)
    assert (meta["width"], meta["height"], meta["n_frames"]) == (32, 16, 1)
    assert out == gif_resize(payload, 32, 16)
    # nearest-neighbor on indices: every output pixel exists in the source
    src_colors = set()
    sw, sh, _, spx = gif_decode(payload)
    for k in range(sw * sh):
        src_colors.add(bytes(spx[3 * k : 3 * k + 3]))
    rw, rh, _, rpx = gif_decode(out)
    for k in range(rw * rh):
        assert bytes(rpx[3 * k : 3 * k + 3]) in src_colors


def test_non_gif_returns_none():
    assert gif_meta(b"not a gif") is None
    assert gif_decode(b"GIF89abroken") is None
    assert gif_frames(b"hello") is None
    assert gif_resize(b"hello", 2, 2) is None
    from db_converter_spark.functions.png import png_encode

    png = png_encode(4, 4, 3, bytes(48))
    assert gif_meta(png) is None


def test_mm_operators_decode_real_gif(spark):
    """Real GIF payloads through the actual mapInPandas pipelines: mm02
    reports the TRUE frame count of an animation, mm03 samples REAL
    decoded frames (every 4th, md5 over their RGB bytes), mm04 resizes
    within 224 — with the stub fallback intact for non-image payloads."""
    from db_converter_spark.operators.multimodal import (
        _FRAME_STRIDE,
        _MM02_SCHEMA,
        _MM03_SCHEMA,
        _MM04_SCHEMA,
        _decode_image_batch,
        _resize_batch,
        _sample_frames_batch,
    )

    w, h = 300, 200
    anim = gif_encode(w, h, [_frame(w, h, s) for s in range(9)], _PAL64)
    payloads = [(1, anim), (3, b"plainly not an image")]
    df = spark.createDataFrame(payloads, "doc_id LONG, payload BINARY")

    metas = {
        r["doc_id"]: r
        for r in df.mapInPandas(_decode_image_batch, schema=_MM02_SCHEMA).collect()
    }
    assert (metas[1]["width"], metas[1]["height"]) == (w, h)
    assert (metas[1]["n_frames"], metas[1]["format"]) == (9, "gif")

    samples = {
        r["doc_id"]: r
        for r in df.mapInPandas(_sample_frames_batch, schema=_MM03_SCHEMA).collect()
    }
    s1 = samples[1]
    assert (s1["n_frames"], s1["n_sampled"]) == (9, 3)  # frames 0, 4, 8
    want = b"".join(_rgb(_frame(w, h, s)) for s in (0, 4, 8))
    assert s1["sample_md5"] == hashlib.md5(want).hexdigest()
    assert samples[3]["n_frames"] > 0  # stub path still alive

    sizes = {
        r["doc_id"]: r
        for r in df.mapInPandas(_resize_batch, schema=_MM04_SCHEMA).collect()
    }
    r1 = sizes[1]
    assert (r1["src_w"], r1["src_h"]) == (w, h)
    assert (r1["dst_w"], r1["dst_h"]) == (224, 149)  # fit-within-224
    assert _FRAME_STRIDE == 4


def test_truncated_tail_frame_meta_agrees_with_frames():
    """A tail-chopped multi-frame GIF (the r11 ADVICE case): gif_meta must
    count only frames whose descriptor + LZW data fully parse, and agree
    with what gif_frames actually decodes — before r11 meta said 2 while
    frames returned None, so mm02 and mm03 disagreed on the same payload."""
    w, h = 19, 13
    f1, f2 = _frame(w, h, 0), _frame(w, h, 7)
    payload = gif_encode(w, h, [f1, f2], _PAL64)
    # chop inside the SECOND frame's data: cut the last 10 bytes (trailer
    # + tail of the final sub-blocks)
    chopped = payload[:-10]
    meta = gif_meta(chopped)
    frames = gif_frames(chopped)
    assert meta is not None and meta["n_frames"] == 1
    assert frames is not None and len(frames) == 1
    assert bytes(frames[0][4]) == _rgb(f1)
    # chop inside the FIRST frame: nothing decodable -> both sides None
    head_only = payload[:40]  # header + GCT(192B)? definitely inside GCT
    assert gif_meta(head_only) is None
    assert gif_frames(head_only) is None
    # intact payload still reports both frames
    assert gif_meta(payload)["n_frames"] == 2
    assert len(gif_frames(payload)) == 2
