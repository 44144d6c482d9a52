"""Pure-Python image codecs: PPM (P6), BMP (24-bit BI_RGB), PNG.

The runtime ships no imaging library, so — following the same move as
``io/avro_codec.py`` (jar absent ⇒ implement the public spec) — the
three simplest public raster formats are implemented from their
specifications:

* **PPM P6** — Netpbm binary portable pixmap (the de-facto spec at
  netpbm.sourceforge.net/doc/ppm.html): ASCII header
  ``P6 <w> <h> <maxval>`` with ``#`` comments, then ``3*w*h`` raw
  bytes.
* **BMP** — Windows BITMAPFILEHEADER + BITMAPINFOHEADER, 24-bit
  uncompressed (``BI_RGB``), bottom-up rows padded to 4 bytes, BGR
  byte order (the layout documented in the public Windows GDI
  reference).
* **PNG** — RFC 2083: 8-byte signature, chunked layout with CRC-32,
  IHDR/IDAT/IEND, zlib-deflated scanlines each prefixed with a filter
  byte (types 0..4: None/Sub/Up/Average/Paeth), non-interlaced.
  Decoder accepts bit depth 8 with color types 0 (gray), 2 (RGB),
  4 (gray+alpha) and 6 (RGBA); encoder emits color type 2 with a
  selectable per-row filter (used by tests to cover every filter's
  reconstruction path).

All functions are plain ``bytes -> tuple`` / ``tuple -> bytes`` so the
Spark side can call them from Arrow-batched ``mapInPandas`` workers —
the codec is CPU-local per row, embarrassingly parallel, and carries
no state, which is exactly what a 100 TB media-decode stage needs.

Decoded form everywhere: ``(width, height, channels, pixels)`` where
``pixels`` is ``bytes`` of length ``width*height*channels``, row-major,
RGB(A)/gray order.
"""

from __future__ import annotations

import struct
import zlib

PNG_SIG = b"\x89PNG\r\n\x1a\n"

# ---------------------------------------------------------------------------
# PPM (P6)
# ---------------------------------------------------------------------------


def encode_ppm(width: int, height: int, rgb: bytes) -> bytes:
    """Binary portable pixmap: ``P6 <w> <h> 255\\n`` + raw RGB rows."""
    if len(rgb) != width * height * 3:
        raise ValueError("rgb buffer does not match dimensions")
    return b"P6\n%d %d\n255\n" % (width, height) + rgb


def decode_ppm(data: bytes) -> tuple[int, int, int, bytes]:
    """Parse P6, honoring whitespace runs and ``#`` comments in the
    header (the spec allows comments anywhere before the maxval)."""
    if data[:2] != b"P6":
        raise ValueError("not a P6 PPM")
    pos = 2
    fields: list[int] = []
    while len(fields) < 3:
        # skip whitespace and comments
        while pos < len(data) and data[pos : pos + 1].isspace():
            pos += 1
        if pos < len(data) and data[pos : pos + 1] == b"#":
            while pos < len(data) and data[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(data) and not data[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(data[start:pos]))
    pos += 1  # single whitespace byte after maxval, then raster begins
    width, height, maxval = fields
    if maxval != 255:
        raise ValueError("only maxval=255 supported")
    need = width * height * 3
    raster = data[pos : pos + need]
    if len(raster) != need:
        raise ValueError("truncated PPM raster")
    return width, height, 3, raster


# ---------------------------------------------------------------------------
# BMP (24-bit BI_RGB)
# ---------------------------------------------------------------------------


def encode_bmp(width: int, height: int, rgb: bytes) -> bytes:
    """24-bit uncompressed BMP: bottom-up rows, BGR order, 4-byte row
    padding — the classic BITMAPINFOHEADER layout."""
    if len(rgb) != width * height * 3:
        raise ValueError("rgb buffer does not match dimensions")
    row_stride = (width * 3 + 3) & ~3
    image_size = row_stride * height
    off_bits = 14 + 40
    header = struct.pack("<2sIHHI", b"BM", off_bits + image_size, 0, 0, off_bits)
    info = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, image_size, 2835, 2835, 0, 0
    )
    pad = b"\x00" * (row_stride - width * 3)
    rows = []
    for y in range(height - 1, -1, -1):  # bottom-up
        row = bytearray()
        base = y * width * 3
        for x in range(width):
            r, g, b = rgb[base + 3 * x : base + 3 * x + 3]
            row += bytes((b, g, r))  # BGR on disk
        rows.append(bytes(row) + pad)
    return header + info + b"".join(rows)


def decode_bmp(data: bytes) -> tuple[int, int, int, bytes]:
    """Parse 24-bit BI_RGB BMP (top-down negative heights accepted)."""
    if data[:2] != b"BM":
        raise ValueError("not a BMP")
    (off_bits,) = struct.unpack_from("<I", data, 10)
    (hdr_size,) = struct.unpack_from("<I", data, 14)
    if hdr_size < 40:
        raise ValueError("BITMAPCOREHEADER not supported")
    width, height_raw = struct.unpack_from("<ii", data, 18)
    (bpp,) = struct.unpack_from("<H", data, 28)
    (compression,) = struct.unpack_from("<I", data, 30)
    if bpp != 24 or compression != 0:
        raise ValueError("only 24-bit BI_RGB supported")
    top_down = height_raw < 0
    height = -height_raw if top_down else height_raw
    row_stride = (width * 3 + 3) & ~3
    out = bytearray(width * height * 3)
    for row_i in range(height):
        y = row_i if top_down else height - 1 - row_i
        src = off_bits + row_i * row_stride
        base = y * width * 3
        for x in range(width):
            b, g, r = data[src + 3 * x : src + 3 * x + 3]
            out[base + 3 * x : base + 3 * x + 3] = bytes((r, g, b))
    return width, height, 3, bytes(out)


# ---------------------------------------------------------------------------
# PNG (RFC 2083)
# ---------------------------------------------------------------------------


def _png_chunk(ctype: bytes, payload: bytes) -> bytes:
    crc = zlib.crc32(ctype + payload) & 0xFFFFFFFF
    return struct.pack(">I", len(payload)) + ctype + payload + struct.pack(">I", crc)


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def encode_png(width: int, height: int, rgb: bytes, filter_type: int = 0) -> bytes:
    """Color-type-2 (truecolor) 8-bit PNG. ``filter_type`` selects the
    per-scanline filter (0..4) so tests can cover every reconstruction
    branch of the decoder; 0 (None) is the production default."""
    if len(rgb) != width * height * 3:
        raise ValueError("rgb buffer does not match dimensions")
    if not 0 <= filter_type <= 4:
        raise ValueError("filter_type must be 0..4")
    bpp = 3
    stride = width * bpp
    raw = bytearray()
    prev = bytes(stride)
    for y in range(height):
        row = rgb[y * stride : (y + 1) * stride]
        raw.append(filter_type)
        if filter_type == 0:
            raw += row
        elif filter_type == 1:  # Sub
            raw += bytes(
                (row[i] - (row[i - bpp] if i >= bpp else 0)) & 0xFF
                for i in range(stride)
            )
        elif filter_type == 2:  # Up
            raw += bytes((row[i] - prev[i]) & 0xFF for i in range(stride))
        elif filter_type == 3:  # Average
            raw += bytes(
                (row[i] - ((row[i - bpp] if i >= bpp else 0) + prev[i]) // 2) & 0xFF
                for i in range(stride)
            )
        else:  # Paeth
            raw += bytes(
                (
                    row[i]
                    - _paeth(
                        row[i - bpp] if i >= bpp else 0,
                        prev[i],
                        prev[i - bpp] if i >= bpp else 0,
                    )
                )
                & 0xFF
                for i in range(stride)
            )
        prev = row
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    return (
        PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _png_chunk(b"IEND", b"")
    )


_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def decode_png(data: bytes) -> tuple[int, int, int, bytes]:
    """RFC 2083 decode: chunk walk (CRC-verified), IDAT concatenation,
    zlib inflate, per-scanline unfilter for types 0..4. Bit depth 8,
    color types 0/2/4/6, non-interlaced."""
    if data[: len(PNG_SIG)] != PNG_SIG:
        raise ValueError("not a PNG")
    pos = len(PNG_SIG)
    width = height = channels = -1
    idat = bytearray()
    while pos < len(data):
        (length,) = struct.unpack_from(">I", data, pos)
        ctype = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack_from(">I", data, pos + 8 + length)
        if zlib.crc32(ctype + payload) & 0xFFFFFFFF != crc:
            raise ValueError(f"CRC mismatch in {ctype!r} chunk")
        pos += 12 + length
        if ctype == b"IHDR":
            width, height, depth, color, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", payload
            )
            if depth != 8:
                raise ValueError("only bit depth 8 supported")
            if color not in _PNG_CHANNELS:
                raise ValueError(f"color type {color} not supported")
            if interlace != 0:
                raise ValueError("interlaced PNG not supported")
            if comp != 0 or filt != 0:
                raise ValueError("nonstandard compression/filter method")
            channels = _PNG_CHANNELS[color]
        elif ctype == b"IDAT":
            idat += payload
        elif ctype == b"IEND":
            break
    if width < 0:
        raise ValueError("missing IHDR")
    raw = zlib.decompress(bytes(idat))
    bpp = channels
    stride = width * bpp
    if len(raw) != height * (stride + 1):
        raise ValueError("decompressed size mismatch")
    out = bytearray(height * stride)
    prev = bytes(stride)
    for y in range(height):
        ft = raw[y * (stride + 1)]
        line = bytearray(raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)])
        if ft == 0:
            pass
        elif ft == 1:  # Sub
            for i in range(bpp, stride):
                line[i] = (line[i] + line[i - bpp]) & 0xFF
        elif ft == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ft == 3:  # Average
            for i in range(stride):
                left = line[i - bpp] if i >= bpp else 0
                line[i] = (line[i] + (left + prev[i]) // 2) & 0xFF
        elif ft == 4:  # Paeth
            for i in range(stride):
                left = line[i - bpp] if i >= bpp else 0
                ul = prev[i - bpp] if i >= bpp else 0
                line[i] = (line[i] + _paeth(left, prev[i], ul)) & 0xFF
        else:
            raise ValueError(f"unknown filter type {ft}")
        out[y * stride : (y + 1) * stride] = line
        prev = bytes(line)
    return width, height, channels, bytes(out)


# ---------------------------------------------------------------------------
# dispatch + pixel ops
# ---------------------------------------------------------------------------


def decode_image(data: bytes) -> tuple[int, int, int, bytes]:
    """Magic-byte dispatch to the right decoder — the real replacement
    for the former NotImplementedError stub."""
    if data[: len(PNG_SIG)] == PNG_SIG:
        return decode_png(data)
    if data[:2] == b"BM":
        return decode_bmp(data)
    if data[:2] == b"P6":
        return decode_ppm(data)
    raise ValueError("unrecognized image format")


def to_rgb(width: int, height: int, channels: int, pixels: bytes) -> bytes:
    """Normalize any decoded channel layout to 3-channel RGB (gray
    replicated, alpha dropped)."""
    if channels == 3:
        return pixels
    out = bytearray(width * height * 3)
    for i in range(width * height):
        if channels == 1:
            v = pixels[i]
            out[3 * i : 3 * i + 3] = bytes((v, v, v))
        elif channels == 2:  # gray + alpha
            v = pixels[2 * i]
            out[3 * i : 3 * i + 3] = bytes((v, v, v))
        else:  # RGBA
            out[3 * i : 3 * i + 3] = pixels[4 * i : 4 * i + 3]
    return bytes(out)


def resize_nearest(
    width: int, height: int, channels: int, pixels: bytes, new_w: int, new_h: int
) -> bytes:
    """Nearest-neighbor resample: dst(x,y) = src(x*w//nw, y*h//nh).
    Integer-only index math so an SQL oracle can replay the mapping
    exactly."""
    out = bytearray(new_w * new_h * channels)
    for ny in range(new_h):
        sy = ny * height // new_h
        for nx in range(new_w):
            sx = nx * width // new_w
            src = (sy * width + sx) * channels
            dst = (ny * new_w + nx) * channels
            out[dst : dst + channels] = pixels[src : src + channels]
    return bytes(out)
