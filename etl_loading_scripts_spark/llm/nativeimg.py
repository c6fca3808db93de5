"""Native libpng/libtiff interop (ctypes) — extending the round-7
real-library validation (``llm/webplib.py``) to the PNG and TIFF
codecs: the container ships ``libpng16.so.16`` and ``libtiff.so.6``,
and ctypes against their public C APIs needs no Python package.

- **libpng** via the SIMPLIFIED API (``png_image_begin_read_from_memory``
  / ``png_image_finish_read`` / ``png_image_write_to_memory`` — the
  setjmp-free surface added in libpng 1.6 precisely for FFI callers).
  The write path matters most: libpng chooses PER-ROW ADAPTIVE FILTERS
  with its real heuristics, producing authentic wire bytes the
  from-scratch decoder's five filter inverses must all handle — a
  coverage self-encoded fixtures (filter 0 everywhere) never forced.
- **libtiff** via the classic API (``TIFFOpen`` + ``TIFFSetField`` +
  ``TIFFWriteScanline`` / ``TIFFReadRGBAImageOriented``), error
  handlers silenced to returns instead of stderr. Both the from-scratch
  TIFF-LZW and Deflate encoders' bitstreams are decoded by the real
  library, and authentic libtiff LZW output decodes here.

Both directions for both formats are oracle-gated
(``mm_native_png_tiff_interop``), and **JPEG gets real-libjpeg
validation THROUGH libtiff** (which links libjpeg and drives it via
TIFF compression 7): libjpeg's own C API is not ctypes-safe (setjmp +
exact struct sizes — undefined behavior waiting to crash an executor),
but with the ``JPEGTABLESMODE`` pseudo-tag at 0 every strip libtiff
writes is a complete standalone JFIF stream from the real libjpeg,
which the from-scratch decoder reads; the reverse wraps the
from-scratch encoder's JFIF bytes as a one-strip compression-7 TIFF
that libtiff decodes through libjpeg (``mm_jpeg_libjpeg_interop``).
Still NOT bound: **libgif** exposes no memory-level simple API either
direction without reading its internal structs (DGifSlurp's SavedImage
graph), and GIF's LZW layer gains little after TIFF-LZW is
interop-proven (decision note mirrors SCALING.md r7's VP8 entry: no
fake fidelity).

Scale: library handles load once per executor Python worker; all work
stays inside the same Arrow-batched mapInPandas kernels as every codec
query. The .so files ride the node image (standard native deps).
"""

from __future__ import annotations

import ctypes
import ctypes.util
import os
import tempfile
import uuid

_PNG = None
_PNG_TRIED = False
_TIFF = None
_TIFF_TRIED = False

#: simplified-API pixel formats (png.h): RGB = color bit only
_PNG_FORMAT_RGB = 2
#: png_image.warning_or_error bit 1 = error (bit 0 = warning only)
_PNG_ERROR_BIT = 2


class _PngImage(ctypes.Structure):
    """png_image, the simplified API's control struct (png.h, version
    PNG_IMAGE_VERSION = 1) — a small fixed public layout, unlike the
    private png_struct the classic API hides behind pointers."""

    _fields_ = [
        ("opaque", ctypes.c_void_p),
        ("version", ctypes.c_uint32),
        ("width", ctypes.c_uint32),
        ("height", ctypes.c_uint32),
        ("format", ctypes.c_uint32),
        ("flags", ctypes.c_uint32),
        ("colormap_entries", ctypes.c_uint32),
        ("warning_or_error", ctypes.c_uint32),
        ("message", ctypes.c_char * 64),
    ]


def _load_png():
    global _PNG, _PNG_TRIED
    if _PNG_TRIED:
        return _PNG
    _PNG_TRIED = True
    for name in ("libpng16.so.16", "libpng16.so", "libpng.so"):
        try:
            lib = ctypes.CDLL(name)
            break
        except OSError:
            continue
    else:
        return None
    lib.png_image_begin_read_from_memory.restype = ctypes.c_int
    lib.png_image_begin_read_from_memory.argtypes = [
        ctypes.POINTER(_PngImage), ctypes.c_char_p, ctypes.c_size_t,
    ]
    lib.png_image_finish_read.restype = ctypes.c_int
    lib.png_image_finish_read.argtypes = [
        ctypes.POINTER(_PngImage), ctypes.c_void_p, ctypes.c_char_p,
        ctypes.c_int32, ctypes.c_void_p,
    ]
    lib.png_image_write_to_memory.restype = ctypes.c_int
    lib.png_image_write_to_memory.argtypes = [
        ctypes.POINTER(_PngImage), ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_size_t), ctypes.c_int, ctypes.c_char_p,
        ctypes.c_int32, ctypes.c_void_p,
    ]
    _PNG = lib
    return _PNG


def _load_tiff():
    global _TIFF, _TIFF_TRIED
    if _TIFF_TRIED:
        return _TIFF
    _TIFF_TRIED = True
    for name in ("libtiff.so.6", "libtiff.so.5", "libtiff.so"):
        try:
            lib = ctypes.CDLL(name)
            break
        except OSError:
            continue
    else:
        return None
    lib.TIFFOpen.restype = ctypes.c_void_p
    lib.TIFFOpen.argtypes = [ctypes.c_char_p, ctypes.c_char_p]
    lib.TIFFClose.restype = None
    lib.TIFFClose.argtypes = [ctypes.c_void_p]
    # varargs (TIFFSetField/TIFFGetField): leave argtypes open; the
    # x86-64 SysV varargs ABI takes our explicit ctypes ints/pointers
    lib.TIFFSetField.restype = ctypes.c_int
    lib.TIFFGetField.restype = ctypes.c_int
    lib.TIFFWriteScanline.restype = ctypes.c_int
    lib.TIFFWriteScanline.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_uint32, ctypes.c_uint16,
    ]
    lib.TIFFReadRGBAImageOriented.restype = ctypes.c_int
    lib.TIFFReadRGBAImageOriented.argtypes = [
        ctypes.c_void_p, ctypes.c_uint32, ctypes.c_uint32,
        ctypes.POINTER(ctypes.c_uint32), ctypes.c_int, ctypes.c_int,
    ]
    # silence default handlers (stderr prints from executor workers)
    handler_t = ctypes.CFUNCTYPE(
        None, ctypes.c_char_p, ctypes.c_char_p, ctypes.c_void_p
    )
    lib.TIFFSetErrorHandler.restype = ctypes.c_void_p
    lib.TIFFSetErrorHandler(ctypes.cast(None, handler_t))
    lib.TIFFSetWarningHandler.restype = ctypes.c_void_p
    lib.TIFFSetWarningHandler(ctypes.cast(None, handler_t))
    _TIFF = lib
    return _TIFF


def nativeimg_available() -> bool:
    return _load_png() is not None and _load_tiff() is not None


def _require(lib, name: str):
    if lib is None:
        raise NotImplementedError(
            f"{name} shared library not found in this environment — the "
            "native PNG/TIFF interop paths need it on every node; the "
            "from-scratch codecs keep working without it"
        )
    return lib


#: quarantine cap on decoded size: a corrupt/hostile header declaring
#: absurd dimensions must raise (the quarantine path catches ValueError),
#: not OOM the executor worker with one giant allocation
_MAX_PIXELS = 100_000_000


def libpng_decode_rgb(payload: bytes) -> tuple[int, int, bytes]:
    """payload → (width, height, RGB bytes) through the REAL libpng
    (simplified API; palette/gray/rgba inputs convert to RGB library-
    side). ValueError on corrupt bytes."""
    lib = _require(_load_png(), "libpng")
    img = _PngImage()
    img.version = 1
    if not lib.png_image_begin_read_from_memory(
        ctypes.byref(img), payload, len(payload)
    ) or (img.warning_or_error & _PNG_ERROR_BIT):
        raise ValueError(f"libpng: {img.message.decode(errors='replace')}")
    w, h = img.width, img.height
    if w * h > _MAX_PIXELS:
        raise ValueError(f"libpng: implausible dimensions {w}x{h}")
    img.format = _PNG_FORMAT_RGB
    buf = ctypes.create_string_buffer(w * h * 3)
    if not lib.png_image_finish_read(
        ctypes.byref(img), None, buf, 0, None
    ) or (img.warning_or_error & _PNG_ERROR_BIT):
        raise ValueError(f"libpng: {img.message.decode(errors='replace')}")
    return w, h, buf.raw


def libpng_encode_rgb(width: int, height: int, rgb: bytes) -> bytes:
    """RGB → a REAL libpng-written PNG — per-row ADAPTIVE filter
    selection with the library's own heuristics (authentic wire bytes
    exercising all five filter inverses in the from-scratch decoder)."""
    lib = _require(_load_png(), "libpng")
    if len(rgb) != width * height * 3:
        raise ValueError("rgb length != width*height*3")
    img = _PngImage()
    img.version = 1
    img.width = width
    img.height = height
    img.format = _PNG_FORMAT_RGB
    size = ctypes.c_size_t(0)
    # two-call protocol: NULL buffer queries the required size
    lib.png_image_write_to_memory(
        ctypes.byref(img), None, ctypes.byref(size), 0, rgb, 0, None
    )
    if size.value == 0 or (img.warning_or_error & _PNG_ERROR_BIT):
        raise ValueError(f"libpng: {img.message.decode(errors='replace')}")
    buf = ctypes.create_string_buffer(size.value)
    if not lib.png_image_write_to_memory(
        ctypes.byref(img), buf, ctypes.byref(size), 0, rgb, 0, None
    ) or (img.warning_or_error & _PNG_ERROR_BIT):
        raise ValueError(f"libpng: {img.message.decode(errors='replace')}")
    return buf.raw[: size.value]


# TIFF tag constants (tiff.h, public)
_T_IMAGEWIDTH = 256
_T_IMAGELENGTH = 257
_T_BITSPERSAMPLE = 258
_T_COMPRESSION = 259
_T_PHOTOMETRIC = 262
_T_SAMPLESPERPIXEL = 277
_T_ROWSPERSTRIP = 278
_T_PLANARCONFIG = 284
_PHOTOMETRIC_RGB = 2
_PLANARCONFIG_CONTIG = 1
_ORIENTATION_TOPLEFT = 1


def libtiff_decode_rgba(payload: bytes) -> tuple[int, int, bytes]:
    """payload → (width, height, RGBA bytes) through the REAL libtiff
    (``TIFFReadRGBAImageOriented``, top-left orientation; the packed
    ABGR words ARE R,G,B,A byte order on little-endian). ValueError on
    corrupt bytes. Goes through a temp file: libtiff's memory source
    needs client callbacks, and the file path is the simpler honest
    seam (same IO the scan kernels do anyway)."""
    lib = _require(_load_tiff(), "libtiff")
    path = os.path.join(tempfile.gettempdir(), f".tif-{uuid.uuid4().hex}.tif")
    try:
        with open(path, "wb") as fh:
            fh.write(payload)
        # keep the handle wrapped in c_void_p: TIFFGetField/TIFFSetField
        # are VARARGS, and ctypes passes a bare Python int as a 32-bit
        # C int there — truncating the 64-bit pointer (segfault)
        tif = ctypes.c_void_p(lib.TIFFOpen(path.encode(), b"r"))
        if not tif.value:
            raise ValueError("libtiff: corrupt or non-TIFF payload")
        try:
            w = ctypes.c_uint32(0)
            h = ctypes.c_uint32(0)
            lib.TIFFGetField(tif, ctypes.c_uint32(_T_IMAGEWIDTH), ctypes.byref(w))
            lib.TIFFGetField(tif, ctypes.c_uint32(_T_IMAGELENGTH), ctypes.byref(h))
            n = w.value * h.value
            if n > _MAX_PIXELS:
                raise ValueError(
                    f"libtiff: implausible dimensions {w.value}x{h.value}"
                )
            raster = (ctypes.c_uint32 * n)()
            ok = lib.TIFFReadRGBAImageOriented(
                tif, w, h, raster, _ORIENTATION_TOPLEFT, 1
            )
            if not ok:
                raise ValueError("libtiff: decode failed (corrupt data?)")
            return w.value, h.value, ctypes.string_at(raster, n * 4)
        finally:
            lib.TIFFClose(tif)
    finally:
        if os.path.exists(path):
            os.unlink(path)


def libtiff_encode_rgb(
    width: int, height: int, rgb: bytes, compression: int = 5
) -> bytes:
    """RGB → a REAL libtiff-written strip TIFF (compression 1 none /
    5 LZW / 8 Deflate) — authentic bitstreams for the from-scratch
    decoder's LZW and Inflate paths."""
    lib = _require(_load_tiff(), "libtiff")
    if len(rgb) != width * height * 3:
        raise ValueError("rgb length != width*height*3")
    path = os.path.join(tempfile.gettempdir(), f".tif-{uuid.uuid4().hex}.tif")
    try:
        # c_void_p wrap: see the read path's varargs-truncation note
        tif = ctypes.c_void_p(lib.TIFFOpen(path.encode(), b"w"))
        if not tif.value:
            raise ValueError("libtiff: cannot open for write")
        try:
            sf = lib.TIFFSetField
            sf(tif, ctypes.c_uint32(_T_IMAGEWIDTH), ctypes.c_uint32(width))
            sf(tif, ctypes.c_uint32(_T_IMAGELENGTH), ctypes.c_uint32(height))
            sf(tif, ctypes.c_uint32(_T_BITSPERSAMPLE), ctypes.c_int(8))
            sf(tif, ctypes.c_uint32(_T_SAMPLESPERPIXEL), ctypes.c_int(3))
            sf(tif, ctypes.c_uint32(_T_PHOTOMETRIC), ctypes.c_int(_PHOTOMETRIC_RGB))
            sf(tif, ctypes.c_uint32(_T_PLANARCONFIG), ctypes.c_int(_PLANARCONFIG_CONTIG))
            sf(tif, ctypes.c_uint32(_T_COMPRESSION), ctypes.c_int(compression))
            sf(tif, ctypes.c_uint32(_T_ROWSPERSTRIP), ctypes.c_uint32(height))
            stride = width * 3
            for y in range(height):
                row = rgb[y * stride : (y + 1) * stride]
                if lib.TIFFWriteScanline(tif, row, y, 0) < 0:
                    raise ValueError("libtiff: scanline write failed")
        finally:
            lib.TIFFClose(tif)
        with open(path, "rb") as fh:
            return fh.read()
    finally:
        if os.path.exists(path):
            os.unlink(path)


# ---------------------------------------------------------------------------
# JPEG interop THROUGH libtiff's libjpeg codec (COMPRESSION_JPEG = 7)
# ---------------------------------------------------------------------------
#
# libjpeg's own C API is not ctypes-safe (setjmp + exact struct sizes —
# the de-scope above), but libtiff LINKS libjpeg and drives it through
# TIFF compression 7: with the JPEGTABLESMODE pseudo-tag set to 0, every
# strip is a COMPLETE standalone JFIF stream produced by the real
# libjpeg — which the from-scratch decoder can read directly. The
# reverse wraps the from-scratch encoder's JFIF bytes as a one-strip
# compression-7 TIFF that libtiff decodes through the real libjpeg.
# Both directions of JPEG validation, zero undefined behavior.

_T_STRIPOFFSETS = 273
_T_STRIPBYTECOUNTS = 279
_T_YCBCRSUBSAMPLING = 530
_COMPRESSION_JPEG = 7
_PHOTOMETRIC_YCBCR = 6
#: libtiff JPEG pseudo-tags (tif_jpeg.c, public)
_T_JPEGQUALITY = 65537
_T_JPEGCOLORMODE = 65538
_T_JPEGTABLESMODE = 65539


def libjpeg_encode_rgb(width: int, height: int, rgb: bytes, quality: int = 88) -> bytes:
    """RGB → a REAL libjpeg-encoded baseline JFIF stream (via libtiff
    compression 7 with tables inlined per strip), extracted from the
    one-strip TIFF's StripOffsets/StripByteCounts — authentic libjpeg
    wire bytes for the from-scratch decoder to prove itself on."""
    import struct

    lib = _require(_load_tiff(), "libtiff")
    if len(rgb) != width * height * 3:
        raise ValueError("rgb length != width*height*3")
    path = os.path.join(tempfile.gettempdir(), f".tifj-{uuid.uuid4().hex}.tif")
    try:
        tif = ctypes.c_void_p(lib.TIFFOpen(path.encode(), b"w"))
        if not tif.value:
            raise ValueError("libtiff: cannot open for write")
        try:
            sf = lib.TIFFSetField
            u32 = ctypes.c_uint32
            sf(tif, u32(_T_IMAGEWIDTH), u32(width))
            sf(tif, u32(_T_IMAGELENGTH), u32(height))
            sf(tif, u32(_T_BITSPERSAMPLE), ctypes.c_int(8))
            sf(tif, u32(_T_SAMPLESPERPIXEL), ctypes.c_int(3))
            sf(tif, u32(_T_PHOTOMETRIC), ctypes.c_int(_PHOTOMETRIC_YCBCR))
            sf(tif, u32(_T_PLANARCONFIG), ctypes.c_int(_PLANARCONFIG_CONTIG))
            sf(tif, u32(_T_COMPRESSION), ctypes.c_int(_COMPRESSION_JPEG))
            sf(tif, u32(_T_JPEGQUALITY), ctypes.c_int(quality))
            sf(tif, u32(_T_JPEGCOLORMODE), ctypes.c_int(1))  # RGB auto-convert
            sf(tif, u32(_T_JPEGTABLESMODE), ctypes.c_int(0))  # tables in strip
            sf(tif, u32(_T_ROWSPERSTRIP), u32(height))
            stride = width * 3
            for y in range(height):
                if lib.TIFFWriteScanline(tif, rgb[y * stride : (y + 1) * stride], y, 0) < 0:
                    raise ValueError("libtiff: JPEG scanline write failed")
        finally:
            lib.TIFFClose(tif)
        data = open(path, "rb").read()
    finally:
        if os.path.exists(path):
            os.unlink(path)
    if data[:4] != b"II*\x00":
        raise ValueError("libtiff: unexpected byte order")
    (ifd_off,) = struct.unpack_from("<I", data, 4)
    (n,) = struct.unpack_from("<H", data, ifd_off)
    tags = {}
    for i in range(n):
        t, _typ, _cnt, val = struct.unpack_from("<HHII", data, ifd_off + 2 + i * 12)
        tags[t] = val
    off, ln = tags[_T_STRIPOFFSETS], tags[_T_STRIPBYTECOUNTS]
    strip = data[off : off + ln]
    if strip[:2] != b"\xff\xd8":
        raise ValueError("libtiff: strip is not a standalone JFIF stream")
    return strip


def tiff_wrap_jpeg(
    width: int, height: int, jpeg: bytes,
    subsampling: tuple[int, int] = (2, 2),
) -> bytes:
    """Wrap a standalone JFIF stream as a minimal one-strip
    compression-7 TIFF (classic little-endian, YCbCr photometric) — the
    container libtiff needs to route the bytes through the REAL
    libjpeg. ``subsampling`` must MATCH the stream's sampling factors
    ((2,2) for the 4:2:0 encoder, (1,1) for 4:4:4/progressive) — a
    mismatched tag makes libjpeg reject the strip."""
    import struct

    def entry(tag, typ, cnt, val):
        return struct.pack("<HHII", tag, typ, cnt, val)

    n_entries = 11
    bps_off = 8 + 2 + n_entries * 12 + 4
    strip_off = bps_off + 6
    entries = b"".join(
        (
            entry(_T_IMAGEWIDTH, 3, 1, width),
            entry(_T_IMAGELENGTH, 3, 1, height),
            entry(_T_BITSPERSAMPLE, 3, 3, bps_off),
            entry(_T_COMPRESSION, 3, 1, _COMPRESSION_JPEG),
            entry(_T_PHOTOMETRIC, 3, 1, _PHOTOMETRIC_YCBCR),
            entry(_T_STRIPOFFSETS, 4, 1, strip_off),
            entry(_T_SAMPLESPERPIXEL, 3, 1, 3),
            entry(_T_ROWSPERSTRIP, 3, 1, height),
            entry(_T_STRIPBYTECOUNTS, 4, 1, len(jpeg)),
            entry(_T_PLANARCONFIG, 3, 1, _PLANARCONFIG_CONTIG),
            entry(_T_YCBCRSUBSAMPLING, 3, 2,
                  subsampling[0] | (subsampling[1] << 16)),
        )
    )
    return (
        b"II*\x00"
        + struct.pack("<I", 8)
        + struct.pack("<H", n_entries)
        + entries
        + struct.pack("<I", 0)
        + struct.pack("<HHH", 8, 8, 8)
        + jpeg
    )


# ---------------------------------------------------------------------------
# Oracle-gated four-leg interop
# ---------------------------------------------------------------------------

from typing import Iterator  # noqa: E402

import pandas as pd  # noqa: E402

from pyspark.sql import DataFrame, SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from etl_loading_scripts_spark.catalog import load_table  # noqa: E402
from etl_loading_scripts_spark.registry import register  # noqa: E402

_SCHEMA = (
    "doc_id long, leg string, width int, height int, "
    "sum_px bigint, checksum_weighted bigint"
)

#: 8-color deterministic RGB byte at linear position q: color index
#: k = (x + 3y + d) % 8, channel value (k*29 + c*17 + d) % 251 — ≤8
#: distinct colors so the SAME pixels ride plain, Adam7-interlaced,
#: AND palette PNGs (one oracle expression covers every encoder kind)
_PX = (
    "((((q // 3) % w + 3 * ((q // 3) // w) + d) % 8) * 29"
    " + (q % 3) * 17 + d) % 251"
)
_PX_DUCK = _PX.replace("w", "CAST(w AS BIGINT)").replace(
    "d", "CAST(doc_id AS BIGINT)"
)


def _planted_rgb(d: int, w: int, h: int):
    import numpy as np

    q = np.arange(w * h * 3, dtype=np.int64)
    k = ((q // 3) % w + 3 * ((q // 3) // w) + d) % 8
    return (k * 29 + (q % 3) * 17 + d).astype(np.int64) % 251


def _interop_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Four legs per doc, all decoding to the SAME RGB pixels:

    - png_ours_lib: the from-scratch PNG encoder for this doc's class
      (plain / Adam7 interlaced / palette) → libpng decodes;
    - png_lib_ours: libpng writes (ADAPTIVE per-row filters — authentic
      bytes) → the from-scratch decoder;
    - tiff_ours_lib: from-scratch TIFF at LZW+predictor2 (even docs) or
      Deflate (odd) → libtiff decodes;
    - tiff_lib_ours: libtiff writes LZW (even) / Deflate (odd) → the
      from-scratch decoder."""
    import numpy as np

    from etl_loading_scripts_spark.llm.codecs import (
        decode_png,
        encode_png,
        encode_png_interlaced,
        encode_png_palette,
    )
    from etl_loading_scripts_spark.llm.tiff import decode_tiff, encode_tiff

    for pdf in batches:
        out: dict[str, list] = {k: [] for k in (
            "doc_id", "leg", "width", "height", "sum_px", "checksum_weighted",
        )}
        for doc_id in pdf["doc_id"]:
            d = int(doc_id)
            w, h = 5 + d % 11, 4 + d % 7
            rgb = _planted_rgb(d, w, h).astype(np.uint8)
            rgb_b = rgb.tobytes()
            kind = d % 3
            if kind == 1:
                ours_png = encode_png_interlaced(w, h, rgb_b)
            elif kind == 2:
                # palette form of the same pixels: ≤8 distinct colors
                k = (
                    (np.arange(w * h, dtype=np.int64) % w
                     + 3 * (np.arange(w * h, dtype=np.int64) // w) + d) % 8
                ).astype(np.uint8)
                pal = bytes(
                    int((ki * 29 + c * 17 + d) % 251)
                    for ki in range(8)
                    for c in range(3)
                )
                ours_png = encode_png_palette(w, h, k.tobytes(), pal)
            else:
                ours_png = encode_png(w, h, rgb_b)
            comp = 5 if d % 2 == 0 else 8
            legs = {
                "png_ours_lib": libpng_decode_rgb(ours_png),
                "png_lib_ours": decode_png(libpng_encode_rgb(w, h, rgb_b)),
                "tiff_ours_lib": _rgba_to_rgb(
                    libtiff_decode_rgba(
                        encode_tiff(
                            w, h, rgb_b, channels=3,
                            compression=comp,
                            predictor=2 if comp == 5 else 1,
                        )
                    )
                ),
                "tiff_lib_ours": _tiff_rgb(
                    decode_tiff(libtiff_encode_rgb(w, h, rgb_b, comp))
                ),
            }
            q = np.arange(w * h * 3, dtype=np.int64)
            for leg, (dw, dh, drgb) in sorted(legs.items()):
                arr = np.frombuffer(drgb, dtype=np.uint8).astype(np.int64)
                out["doc_id"].append(d)
                out["leg"].append(leg)
                out["width"].append(dw)
                out["height"].append(dh)
                out["sum_px"].append(int(arr.sum()))
                out["checksum_weighted"].append(int(((q + 1) * arr).sum()))
        yield pd.DataFrame(out).astype(
            {
                "doc_id": "int64", "leg": "object", "width": "int32",
                "height": "int32", "sum_px": "int64",
                "checksum_weighted": "int64",
            }
        )


def _rgba_to_rgb(t):
    import numpy as np

    w, h, rgba = t
    a = np.frombuffer(rgba, dtype=np.uint8).reshape(-1, 4)
    if not (a[:, 3] == 255).all():
        raise ValueError("opaque RGB input must come back opaque")
    return w, h, a[:, :3].tobytes()


def _tiff_rgb(t):
    w, h, channels, px = t
    if channels != 3:
        raise ValueError(f"expected RGB from libtiff-written file, got {channels}")
    return w, h, px


@register(
    "mm_native_png_tiff_interop",
    oracle=f"""
    WITH px AS (
        SELECT doc_id,
               5 + doc_id % 11 AS w,
               4 + doc_id % 7 AS h
        FROM documents WHERE doc_id % 3 = 0
    ),
    stats AS (
        SELECT doc_id,
               CAST(w AS INT) AS width,
               CAST(h AS INT) AS height,
               CAST(list_sum(list_transform(range(0, w * h * 3),
                    q -> {_PX_DUCK})) AS BIGINT) AS sum_px,
               CAST(list_sum(list_transform(range(0, w * h * 3),
                    q -> (q + 1) * ({_PX_DUCK}))) AS BIGINT)
                   AS checksum_weighted
        FROM px
    )
    SELECT doc_id, l.leg, width, height, sum_px, checksum_weighted
    FROM stats
    CROSS JOIN (SELECT 'png_lib_ours' AS leg
                UNION ALL SELECT 'png_ours_lib'
                UNION ALL SELECT 'tiff_lib_ours'
                UNION ALL SELECT 'tiff_ours_lib') l
    """,
    doc="REAL-LIBRARY interop for the PNG and TIFF codecs, both "
    "directions (extends the r7 libwebp validation): per planted doc, "
    "(a) the from-scratch PNG encoder class (plain / Adam7 interlaced / "
    "palette, rotating by doc) decodes through the system libpng; (b) "
    "libpng-WRITTEN files — per-row adaptive filters chosen by the real "
    "library's heuristics — decode through the from-scratch inverse-"
    "filter paths; (c) from-scratch TIFF LZW+predictor2 / Deflate "
    "bitstreams decode through libtiff; (d) libtiff-written LZW/Deflate "
    "strips decode here. All four legs' pixel stats must equal the one "
    "arithmetic oracle — a spec deviation in either codebase, either "
    "format, either direction, hash-mismatches.",
)
def mm_native_png_tiff_interop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: same Arrow-batched mapInPandas contract as every codec
    kernel; the .so handles load once per worker. Every 3rd doc keeps
    the sweep cheap while rotating through all PNG encoder classes and
    both TIFF compressions."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id").filter(
        F.col("doc_id") % 3 == 0
    )
    return docs.mapInPandas(_interop_batches, schema=_SCHEMA)


_JPEG_SCHEMA = (
    "doc_id long, leg string, width int, height int, quality_ok boolean"
)


def _jpeg_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Two JPEG interop legs per doc over a smooth gradient (the class
    lossy codecs are built for), dimensions deliberately ragged (not
    MCU-aligned — the padding paths on both sides must agree):

    - jpeg_lib_ours: the REAL libjpeg encodes (via libtiff compression
      7, tables inlined) → the from-scratch baseline decoder reads the
      authentic JFIF bytes;
    - jpeg_ours_lib: the from-scratch 4:2:0 encoder's JFIF bytes →
      wrapped as a one-strip TIFF → decoded by the real libjpeg.

    Exact dimensions and a MAE < 16/255 bound are oracle-pinned (measured:
    libjpeg-encoded legs ~1-3, from-scratch-420 legs up to ~10.4 on the
    %200 wrap seams — lossy ringing, the same band as mm_decode_webp_lossy)."""
    import numpy as np

    from etl_loading_scripts_spark.llm.jpeg import (
        decode_jpeg,
        encode_jpeg_rgb_420,
    )

    for pdf in batches:
        out: dict[str, list] = {k: [] for k in (
            "doc_id", "leg", "width", "height", "quality_ok",
        )}
        for doc_id in pdf["doc_id"]:
            d = int(doc_id)
            w, h = 18 + d % 23, 14 + d % 19
            q = np.arange(w * h * 3, dtype=np.int64)
            rgb = (
                (40 + d % 60 + ((q // 3) % w) * 3 + ((q // 3) // w) * 2
                 + (q % 3) * 5) % 200
            ).astype(np.uint8)
            src = rgb.astype(np.int64)

            lib_jpeg = libjpeg_encode_rgb(w, h, rgb.tobytes(), quality=88)
            dw, dh, ch, px = decode_jpeg(lib_jpeg)
            if ch != 3:
                raise ValueError("expected color JPEG from libjpeg")
            mae1 = float(
                np.abs(np.frombuffer(px, dtype=np.uint8).astype(np.int64) - src).mean()
            )
            out["doc_id"].append(d)
            out["leg"].append("jpeg_lib_ours")
            out["width"].append(dw)
            out["height"].append(dh)
            out["quality_ok"].append(bool(mae1 < 16.0))

            wrapped = tiff_wrap_jpeg(w, h, encode_jpeg_rgb_420(w, h, rgb.tobytes()))
            dw, dh, rgba = libtiff_decode_rgba(wrapped)
            a = np.frombuffer(rgba, dtype=np.uint8).reshape(-1, 4)
            mae2 = float(np.abs(a[:, :3].astype(np.int64).ravel() - src).mean())
            out["doc_id"].append(d)
            out["leg"].append("jpeg_ours_lib")
            out["width"].append(dw)
            out["height"].append(dh)
            out["quality_ok"].append(bool(mae2 < 16.0))
        yield pd.DataFrame(out).astype(
            {
                "doc_id": "int64", "leg": "object", "width": "int32",
                "height": "int32", "quality_ok": "bool",
            }
        )


@register(
    "mm_jpeg_libjpeg_interop",
    oracle="""
    SELECT doc_id, l.leg,
           CAST(18 + doc_id % 23 AS INT) AS width,
           CAST(14 + doc_id % 19 AS INT) AS height,
           TRUE AS quality_ok
    FROM documents
    CROSS JOIN (SELECT 'jpeg_lib_ours' AS leg
                UNION ALL SELECT 'jpeg_ours_lib') l
    WHERE doc_id % 11 = 0
    """,
    doc="REAL-LIBJPEG interop for the from-scratch JPEG codec, both "
    "directions, WITHOUT binding libjpeg's setjmp-based C API: libtiff "
    "links libjpeg and drives it through TIFF compression 7 — with "
    "tables inlined per strip, libtiff-written strips are complete "
    "standalone JFIF streams from the real libjpeg, decoded here by "
    "the from-scratch baseline decoder; the reverse wraps the "
    "from-scratch 4:2:0 encoder's JFIF bytes as a one-strip "
    "compression-7 TIFF the real libjpeg decodes. Ragged (non-MCU-"
    "aligned) dimensions exercise both sides' padding; exact dims and "
    "MAE < 16/255 are oracle-pinned per (doc, leg).",
)
def mm_jpeg_libjpeg_interop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: same Arrow-batched mapInPandas contract as every codec
    kernel; the temp-file TIFF detour is per-image bytes in tmpfs, and
    the libjpeg entropy loops are C speed — the throughput story the
    adapter seam exists to buy."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id").filter(
        F.col("doc_id") % 11 == 0
    )
    return docs.mapInPandas(_jpeg_batches, schema=_JPEG_SCHEMA)
