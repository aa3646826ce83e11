"""Real-codec tests: the stdlib PNG decoder/encoder, standalone and wired
through the multimodal operators' hooks on actual image bytes.

The 2×2 fixture is constructed by hand (struct + zlib straight from the
spec), NOT with the module's own encoder, so decode is tested against an
independent byte source; filters are covered by forward-filtering known
pixels in the test and checking the decoder inverts them.
"""

from __future__ import annotations

import struct
import zlib

import pytest

from nifi_hive_schema_generator_bundle_spark.operators.multimodal import (
    decode_features,
    resize_media,
)
from nifi_hive_schema_generator_bundle_spark.operators.png_codec import (
    feature_fn,
    png_decode,
    png_encode,
    png_info,
    resize,
)

SIG = b"\x89PNG\r\n\x1a\n"

# 2×2 RGB: red, green / blue, white (row-major)
PIXELS_2X2 = bytes(
    [255, 0, 0, 0, 255, 0,
     0, 0, 255, 255, 255, 255]
)


def _chunk(typ: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + typ
        + data
        + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
    )


def _handmade_png(pixels: bytes, w: int, h: int, ch: int = 3,
                  filters: list[int] | None = None) -> bytes:
    """Build a PNG by hand, forward-applying the given per-row filter ids
    (defaults to all 0) so the decoder's un-filtering is what's tested."""
    stride = w * ch
    filters = filters or [0] * h
    rows = [bytearray(pixels[y * stride:(y + 1) * stride]) for y in range(h)]
    prev = bytearray(stride)
    raw = b""
    for y, f in enumerate(filters):
        cur, enc = rows[y], bytearray(rows[y])
        if f == 1:
            for i in range(ch, stride):
                enc[i] = (cur[i] - cur[i - ch]) & 0xFF
        elif f == 2:
            for i in range(stride):
                enc[i] = (cur[i] - prev[i]) & 0xFF
        elif f == 3:
            for i in range(stride):
                a = cur[i - ch] if i >= ch else 0
                enc[i] = (cur[i] - ((a + prev[i]) >> 1)) & 0xFF
        elif f == 4:
            for i in range(stride):
                a = cur[i - ch] if i >= ch else 0
                b = prev[i]
                c = prev[i - ch] if i >= ch else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                enc[i] = (cur[i] - pred) & 0xFF
        raw += bytes([f]) + bytes(enc)
        prev = cur
    ctype = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (SIG + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(raw)) + _chunk(b"IEND", b""))


def test_decode_handmade_2x2():
    png = _handmade_png(PIXELS_2X2, 2, 2)
    assert png_info(png)[:2] == (2, 2)
    w, h, ch, px = png_decode(png)
    assert (w, h, ch) == (2, 2, 3)
    assert px == PIXELS_2X2


@pytest.mark.parametrize("filters", [[1, 2], [3, 4], [4, 1], [2, 3]])
def test_decode_inverts_every_filter(filters):
    png = _handmade_png(PIXELS_2X2, 2, 2, filters=filters)
    assert png_decode(png)[3] == PIXELS_2X2


def test_roundtrip_encoder_all_channel_counts():
    for ch in (1, 2, 3, 4):
        pixels = bytes(range(4 * 3 * ch))  # 4×3 image
        png = png_encode(pixels, 4, 3, ch)
        assert png_decode(png) == (4, 3, ch, pixels)


def test_unsupported_shapes_raise():
    with pytest.raises(ValueError):
        png_decode(b"JFIF not a png")
    # 16-bit depth
    ihdr = struct.pack(">IIBBBBB", 1, 1, 16, 2, 0, 0, 0)
    deep = SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IEND", b"")
    with pytest.raises(NotImplementedError):
        png_decode(deep)


def test_resize_nearest_neighbor():
    png = _handmade_png(PIXELS_2X2, 2, 2)
    out = resize(png, 4, 4)
    w, h, ch, px = png_decode(out)
    assert (w, h, ch) == (4, 4, 3)
    # top-left 2×2 block is all the original red pixel
    assert px[0:3] == px[3:6] == px[12:15] == px[15:18] == bytes([255, 0, 0])
    # bottom-right pixel is the original white
    assert px[-3:] == bytes([255, 255, 255])


def test_feature_fn_real_signature():
    f = feature_fn(dim=6)
    vec = f(_handmade_png(PIXELS_2X2, 2, 2))
    assert len(vec) == 6
    assert all(0.0 <= v <= 1.0 for v in vec)
    # 12 pixel bytes / 6 buckets = pairs: (255+0)/510, (0+0)/510, ...
    assert vec[0] == pytest.approx(255 / 510)
    assert vec[5] == pytest.approx(510 / 510)


# ---- the real codec through the multimodal operators' Spark plumbing ----

def test_decode_features_on_real_png(spark):
    rows = [
        (1, _handmade_png(PIXELS_2X2, 2, 2)),
        (2, _handmade_png(bytes([0] * 12), 2, 2)),   # all-black
        (3, None),
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {
        r.media_id: r.features
        for r in decode_features(df, dim=4, decode_fn=feature_fn(4)).collect()
    }
    assert got[3] is None
    assert len(got[1]) == 4
    assert got[2] == [0.0, 0.0, 0.0, 0.0]
    assert got[1] != got[2]


def test_resize_media_on_real_png(spark):
    df = spark.createDataFrame(
        [(1, _handmade_png(PIXELS_2X2, 2, 2))], "media_id long, payload binary"
    )
    out = resize_media(df, width=4, height=2, resize_fn=resize).collect()[0]
    w, h, ch, px = png_decode(bytes(out.payload))
    assert (w, h) == (4, 2)
    assert (out.width, out.height) == (4, 2)
    # nearest-neighbor doubling along x: red red green green
    assert px[0:3] == px[3:6] == bytes([255, 0, 0])
    assert px[6:9] == px[9:12] == bytes([0, 255, 0])


def test_truncated_ihdr_raises_valueerror():
    # valid signature, IHDR chunk declaring 13 bytes but carrying 4 —
    # a cut-off upload must surface as ValueError (the documented error
    # surface), not struct.error
    bad = SIG + _chunk(b"IHDR", b"\x00\x00\x00\x01")
    with pytest.raises(ValueError):
        png_info(bad)
