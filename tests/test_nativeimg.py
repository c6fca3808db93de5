"""Native libpng/libtiff interop (llm/nativeimg.py): real-library
validation for the PNG and TIFF codecs plus the honest gates."""

from __future__ import annotations

import numpy as np
import pytest

from etl_loading_scripts_spark.llm.nativeimg import (
    _planted_rgb,
    libpng_decode_rgb,
    libpng_encode_rgb,
    libtiff_decode_rgba,
    libtiff_encode_rgb,
    nativeimg_available,
)

needs_libs = pytest.mark.skipif(
    not nativeimg_available(), reason="libpng/libtiff not present"
)


@needs_libs
def test_png_interop_all_encoder_classes():
    """Plain, Adam7-interlaced, and palette PNGs from the from-scratch
    encoders all decode through the real libpng; libpng-written files
    (adaptive per-row filters) decode through the from-scratch decoder."""
    from etl_loading_scripts_spark.llm.codecs import (
        decode_png,
        encode_png,
        encode_png_interlaced,
        encode_png_palette,
    )

    for d in (0, 1, 2, 3, 7, 11):
        w, h = 5 + d % 11, 4 + d % 7
        rgb = _planted_rgb(d, w, h).astype(np.uint8).tobytes()
        k = (
            (np.arange(w * h, dtype=np.int64) % w
             + 3 * (np.arange(w * h, dtype=np.int64) // w) + d) % 8
        ).astype(np.uint8)
        pal = bytes(
            int((ki * 29 + c * 17 + d) % 251) for ki in range(8) for c in range(3)
        )
        for payload in (
            encode_png(w, h, rgb),
            encode_png_interlaced(w, h, rgb),
            encode_png_palette(w, h, k.tobytes(), pal),
        ):
            dw, dh, out = libpng_decode_rgb(payload)
            assert (dw, dh, out) == (w, h, rgb)
        dw, dh, out = decode_png(libpng_encode_rgb(w, h, rgb))
        assert (dw, dh, out) == (w, h, rgb)


@needs_libs
def test_libpng_forces_adaptive_filters_through_our_inverses():
    """A gradient image makes libpng's heuristics pick non-zero row
    filters (sub/up/avg/paeth) — the coverage self-encoded filter-0
    fixtures never force. Assert the wire actually contains non-zero
    filter bytes, then decode it with the from-scratch inverses."""
    import zlib

    from etl_loading_scripts_spark.llm.codecs import decode_png

    w, h = 32, 24
    q = np.arange(w * h * 3, dtype=np.int64)
    rgb = (((q // 3) % w) * 5 + ((q // 3) // w) * 3 + (q % 3)).astype(
        np.uint8
    ).tobytes()
    payload = libpng_encode_rgb(w, h, rgb)
    # extract IDAT, inflate, look at the per-row filter bytes
    pos = 8
    idat = b""
    while pos < len(payload):
        ln = int.from_bytes(payload[pos : pos + 4], "big")
        tag = payload[pos + 4 : pos + 8]
        if tag == b"IDAT":
            idat += payload[pos + 8 : pos + 8 + ln]
        pos += 12 + ln
    raw = zlib.decompress(idat)
    stride = 1 + w * 3
    filters = {raw[y * stride] for y in range(h)}
    assert filters - {0}, f"expected adaptive filters, got {filters}"
    assert decode_png(payload)[2] == rgb


@needs_libs
def test_tiff_interop_lzw_and_deflate():
    from etl_loading_scripts_spark.llm.tiff import decode_tiff, encode_tiff

    for d, comp in ((0, 5), (1, 8)):
        w, h = 5 + d % 11, 4 + d % 7
        rgb = _planted_rgb(d, w, h).astype(np.uint8).tobytes()
        t = encode_tiff(
            w, h, rgb, channels=3, compression=comp,
            predictor=2 if comp == 5 else 1,
        )
        tw, th, rgba = libtiff_decode_rgba(t)
        a = np.frombuffer(rgba, dtype=np.uint8).reshape(-1, 4)
        assert (tw, th) == (w, h)
        assert a[:, :3].tobytes() == rgb
        assert (a[:, 3] == 255).all()
        dec = decode_tiff(libtiff_encode_rgb(w, h, rgb, comp))
        assert dec == (w, h, 3, rgb)


@needs_libs
def test_jpeg_interop_through_libtiff():
    """Real-libjpeg validation for the JPEG codec, both directions,
    through libtiff's compression-7 route — including PROGRESSIVE
    streams (libjpeg decodes the from-scratch progressive encoder's
    output) and ragged non-MCU-aligned dimensions."""
    from etl_loading_scripts_spark.llm.jpeg import (
        decode_jpeg,
        encode_jpeg_rgb_420,
        encode_jpeg_rgb_progressive,
    )
    from etl_loading_scripts_spark.llm.nativeimg import (
        libjpeg_encode_rgb,
        libtiff_decode_rgba,
        tiff_wrap_jpeg,
    )

    for d in (0, 5, 13):
        w, h = 18 + d % 23, 14 + d % 19
        q = np.arange(w * h * 3, dtype=np.int64)
        rgb = (
            (40 + ((q // 3) % w) * 3 + ((q // 3) // w) * 2 + (q % 3) * 5) % 200
        ).astype(np.uint8)
        src = rgb.astype(np.int64)
        # authentic libjpeg bytes -> from-scratch decoder
        jpeg = libjpeg_encode_rgb(w, h, rgb.tobytes(), quality=88)
        assert jpeg[:2] == b"\xff\xd8"
        dw, dh, ch, px = decode_jpeg(jpeg)
        assert (dw, dh, ch) == (w, h, 3)
        mae = np.abs(np.frombuffer(px, dtype=np.uint8).astype(np.int64) - src).mean()
        assert mae < 8, mae
        # from-scratch encoders -> real libjpeg: baseline 4:2:0 AND
        # PROGRESSIVE 4:4:4 (the wrap's subsampling tag must match the
        # stream's sampling factors)
        for enc, samp in (
            (encode_jpeg_rgb_420, (2, 2)),
            (encode_jpeg_rgb_progressive, (1, 1)),
        ):
            wrapped = tiff_wrap_jpeg(
                w, h, enc(w, h, rgb.tobytes()), subsampling=samp
            )
            dw, dh, rgba = libtiff_decode_rgba(wrapped)
            assert (dw, dh) == (w, h), enc.__name__
            a = np.frombuffer(rgba, dtype=np.uint8).reshape(-1, 4)
            mae = np.abs(a[:, :3].astype(np.int64).ravel() - src).mean()
            assert mae < 16, (enc.__name__, mae)


@needs_libs
def test_corrupt_payloads_quarantine():
    with pytest.raises(ValueError, match="libpng"):
        libpng_decode_rgb(b"\x89PNG\r\n\x1a\n" + b"\x00" * 30)
    with pytest.raises(ValueError, match="libtiff"):
        libtiff_decode_rgba(b"II*\x00" + b"\x00" * 30)


def test_no_library_gate_raises(monkeypatch):
    from etl_loading_scripts_spark.llm import nativeimg

    monkeypatch.setattr(nativeimg, "_PNG", None)
    monkeypatch.setattr(nativeimg, "_PNG_TRIED", True)
    monkeypatch.setattr(nativeimg, "_TIFF", None)
    monkeypatch.setattr(nativeimg, "_TIFF_TRIED", True)
    assert not nativeimg.nativeimg_available()
    with pytest.raises(NotImplementedError, match="libpng"):
        nativeimg.libpng_decode_rgb(b"x")
    with pytest.raises(NotImplementedError, match="libtiff"):
        nativeimg.libtiff_decode_rgba(b"x")
