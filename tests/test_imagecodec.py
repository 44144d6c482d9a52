"""Conformance tests for the pure-Python image codecs
(operators/imagecodec.py — PPM/BMP per their public layouts, PNG per
RFC 2083). No Spark session needed; these are byte-level spec tests."""

import struct
import zlib

import pytest

from supabase_etl_spark.operators import imagecodec as IC


def _pattern(w: int, h: int, seed: int = 7) -> bytes:
    return bytes(
        (seed + 3 * x + 5 * y + 7 * c) % 256
        for y in range(h)
        for x in range(w)
        for c in range(3)
    )


@pytest.mark.parametrize("w,h", [(1, 1), (3, 2), (8, 8), (13, 5)])
def test_ppm_roundtrip(w, h):
    rgb = _pattern(w, h)
    dec = IC.decode_ppm(IC.encode_ppm(w, h, rgb))
    assert dec == (w, h, 3, rgb)


def test_ppm_comments_in_header():
    rgb = _pattern(2, 2)
    data = b"P6\n# a comment\n2 2\n# another\n255\n" + rgb
    assert IC.decode_ppm(data) == (2, 2, 3, rgb)


@pytest.mark.parametrize("w,h", [(1, 1), (3, 2), (8, 8), (13, 5)])
def test_bmp_roundtrip(w, h):
    # widths 1/3/13 exercise nonzero row padding (stride % 4)
    rgb = _pattern(w, h)
    dec = IC.decode_bmp(IC.encode_bmp(w, h, rgb))
    assert dec == (w, h, 3, rgb)


def test_bmp_top_down_negative_height():
    rgb = _pattern(3, 2)
    data = bytearray(IC.encode_bmp(3, 2, rgb))
    # flip to top-down: negate height and reorder the two rows
    struct.pack_into("<i", data, 22, -2)
    stride = (3 * 3 + 3) & ~3
    off = 54
    r0 = bytes(data[off : off + stride])
    r1 = bytes(data[off + stride : off + 2 * stride])
    data[off : off + stride] = r1
    data[off + stride : off + 2 * stride] = r0
    assert IC.decode_bmp(bytes(data)) == (3, 2, 3, rgb)


@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
@pytest.mark.parametrize("w,h", [(1, 1), (4, 3), (9, 7)])
def test_png_roundtrip_every_filter(filter_type, w, h):
    """Every RFC 2083 filter type (None/Sub/Up/Average/Paeth) must
    reconstruct bit-exactly."""
    rgb = _pattern(w, h)
    png = IC.encode_png(w, h, rgb, filter_type=filter_type)
    assert IC.decode_png(png) == (w, h, 3, rgb)


def test_png_signature_and_chunk_layout():
    png = IC.encode_png(2, 1, _pattern(2, 1))
    assert png[:8] == b"\x89PNG\r\n\x1a\n"
    # IHDR immediately after signature, 13-byte payload
    assert png[8:16] == struct.pack(">I", 13) + b"IHDR"
    w, h, depth, color = struct.unpack(">IIBB", png[16:26])
    assert (w, h, depth, color) == (2, 1, 8, 2)
    assert png.endswith(IC._png_chunk(b"IEND", b""))


def test_png_crc_validation():
    png = bytearray(IC.encode_png(2, 2, _pattern(2, 2)))
    png[20] ^= 0xFF  # corrupt IHDR payload without fixing CRC
    with pytest.raises(ValueError, match="CRC"):
        IC.decode_png(bytes(png))


def test_png_multiple_idat_chunks():
    """Decoders must concatenate IDAT payloads (RFC 2083 §4.1.3)."""
    w, h = 4, 4
    rgb = _pattern(w, h)
    raw = bytearray()
    for y in range(h):
        raw.append(0)
        raw += rgb[y * w * 3 : (y + 1) * w * 3]
    z = zlib.compress(bytes(raw))
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    split = len(z) // 2
    png = (
        IC.PNG_SIG
        + IC._png_chunk(b"IHDR", ihdr)
        + IC._png_chunk(b"IDAT", z[:split])
        + IC._png_chunk(b"IDAT", z[split:])
        + IC._png_chunk(b"IEND", b"")
    )
    assert IC.decode_png(png) == (w, h, 3, rgb)


def test_png_grayscale_and_rgba_decode():
    """Hand-built color-type 0 and 6 images decode and normalize."""
    # 2x1 grayscale: values 10, 200
    raw = bytes([0, 10, 200])
    ihdr = struct.pack(">IIBBBBB", 2, 1, 8, 0, 0, 0, 0)
    png = (
        IC.PNG_SIG
        + IC._png_chunk(b"IHDR", ihdr)
        + IC._png_chunk(b"IDAT", zlib.compress(raw))
        + IC._png_chunk(b"IEND", b"")
    )
    w, h, ch, px = IC.decode_png(png)
    assert (w, h, ch, px) == (2, 1, 1, bytes([10, 200]))
    assert IC.to_rgb(w, h, ch, px) == bytes([10, 10, 10, 200, 200, 200])
    # 1x1 RGBA
    raw = bytes([0, 1, 2, 3, 128])
    ihdr = struct.pack(">IIBBBBB", 1, 1, 8, 6, 0, 0, 0)
    png = (
        IC.PNG_SIG
        + IC._png_chunk(b"IHDR", ihdr)
        + IC._png_chunk(b"IDAT", zlib.compress(raw))
        + IC._png_chunk(b"IEND", b"")
    )
    w, h, ch, px = IC.decode_png(png)
    assert (w, h, ch, px) == (1, 1, 4, bytes([1, 2, 3, 128]))
    assert IC.to_rgb(w, h, ch, px) == bytes([1, 2, 3])


def test_decode_image_dispatch():
    rgb = _pattern(3, 3)
    for enc in (IC.encode_png, IC.encode_bmp, IC.encode_ppm):
        assert IC.decode_image(enc(3, 3, rgb)) == (3, 3, 3, rgb)
    with pytest.raises(ValueError, match="unrecognized"):
        IC.decode_image(b"GIF89a....")


def test_resize_nearest_mapping():
    """dst(x,y) = src(x*w//nw, y*h//nh) — exact integer mapping."""
    w, h = 4, 4
    rgb = _pattern(w, h)
    out = IC.resize_nearest(w, h, 3, rgb, 2, 2)
    expect = bytearray()
    for ny in range(2):
        sy = ny * h // 2
        for nx in range(2):
            sx = nx * w // 2
            expect += rgb[(sy * w + sx) * 3 : (sy * w + sx) * 3 + 3]
    assert out == bytes(expect)
    # upscale path
    up = IC.resize_nearest(2, 2, 3, _pattern(2, 2), 4, 4)
    assert len(up) == 4 * 4 * 3


def test_resize_identity():
    rgb = _pattern(5, 3)
    assert IC.resize_nearest(5, 3, 3, rgb, 5, 3) == rgb


def test_roundtrip_property_random_pixels():
    """Hypothesis: arbitrary RGB buffers roundtrip exactly through all
    three encoders (PNG exercises filtering + zlib; BMP row padding;
    PPM maxval text header)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from supabase_etl_spark.operators import imagecodec as IC

    @settings(max_examples=30, deadline=None)
    @given(
        w=st.integers(min_value=1, max_value=9),
        h=st.integers(min_value=1, max_value=9),
        data=st.data(),
    )
    def check(w, h, data):
        px = bytes(
            data.draw(
                st.lists(
                    st.integers(min_value=0, max_value=255),
                    min_size=w * h * 3,
                    max_size=w * h * 3,
                )
            )
        )
        for enc in (IC.encode_png, IC.encode_bmp, IC.encode_ppm):
            got = IC.decode_image(enc(w, h, px))
            assert got[:2] == (w, h)
            assert got[3] == px, enc.__name__

    check()
