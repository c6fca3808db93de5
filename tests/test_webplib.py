"""Native libwebp adapter (llm/webplib.py): real-library interop for
the from-scratch VP8L codec, lossy VP8 through the adapter seam, and
the honest no-library gate."""

from __future__ import annotations

import io

import numpy as np
import pytest

from etl_loading_scripts_spark.llm.webplib import (
    LibWebPAdapter,
    libwebp_available,
    libwebp_decode_rgba,
    libwebp_encode_lossless_rgba,
    libwebp_encode_rgb,
)

needs_lib = pytest.mark.skipif(
    not libwebp_available(), reason="libwebp.so not present"
)


@needs_lib
def test_interop_bidirectional_every_encoder_class():
    """Every from-scratch encoder variant's bitstream decodes through
    the REAL library, and authentic libwebp bitstreams decode through
    the from-scratch decoder — bit-exact both ways. Doc ids chosen to
    hit every encoder class (mod-16/8/4/2 dispatch)."""
    from etl_loading_scripts_spark.llm.multimodal import planted_webp_image
    from etl_loading_scripts_spark.llm.webp import decode_webp_lossless

    for d in (0, 1, 2, 3, 4, 6, 8, 10, 12, 14, 16, 22, 35, 410, 490):
        w, h, px, kind, ours = planted_webp_image(d, min_alpha=1)
        # ours → lib
        lw, lh, lib_rgba = libwebp_decode_rgba(ours)
        assert (lw, lh) == (w, h), (d, kind)
        assert lib_rgba == px.tobytes(), (d, kind)
        # lib → ours
        lib_payload = libwebp_encode_lossless_rgba(w, h, px.tobytes())
        dw, dh, rgba = decode_webp_lossless(lib_payload)
        assert (dw, dh) == (w, h), (d, kind)
        assert rgba == px.tobytes(), (d, kind)


@needs_lib
def test_from_scratch_decoder_matches_libwebp_even_on_exact0_streams():
    """The round-7 find, pinned: libwebp's DEFAULT lossless mode
    (exact=0) rewrites RGB under fully transparent pixels — on such a
    stream the from-scratch decoder must agree with LIBWEBP'S decode
    bit-exactly (the wire is ground truth), even though both differ
    from the pre-encode pixels."""
    from etl_loading_scripts_spark.llm.multimodal import planted_webp_image
    from etl_loading_scripts_spark.llm.webp import decode_webp_lossless

    w, h, px, _kind, _ = planted_webp_image(490)  # alpha hits 0 here
    assert (px[3::4] == 0).any(), "fixture must contain alpha-0 pixels"
    payload = libwebp_encode_lossless_rgba(w, h, px.tobytes())
    _, _, lib_rgba = libwebp_decode_rgba(payload)
    _, _, ours_rgba = decode_webp_lossless(payload)
    assert ours_rgba == lib_rgba  # decoder parity on the authentic wire
    assert lib_rgba != px.tobytes()  # ...which exact=0 made non-lossless


@needs_lib
def test_lossy_vp8_through_adapter_seam():
    from etl_loading_scripts_spark.llm.imagelib import decode_with_adapter

    w, h = 24, 18
    q = np.arange(w * h * 3, dtype=np.int64)
    rgb = (((q // 3) % w) * 3 + ((q // 3) // w) * 4 + (q % 3) * 9).astype(
        np.uint8
    )
    payload = libwebp_encode_rgb(w, h, rgb.tobytes(), quality=90.0)
    assert payload[12:16] == b"VP8 "  # the LOSSY chunk, not VP8L
    dw, dh, out = decode_with_adapter(payload, LibWebPAdapter)
    assert (dw, dh) == (w, h)
    arr = np.frombuffer(out, dtype=np.uint8).astype(np.int64)
    assert np.abs(arr - rgb.astype(np.int64)).mean() < 8.0
    # corrupt payloads quarantine, not crash
    with pytest.raises(ValueError, match="libwebp|corrupt"):
        libwebp_decode_rgba(payload[:20] + b"\x00" * 10)
    with pytest.raises(ValueError, match="WebP payloads only"):
        LibWebPAdapter.open(io.BytesIO(b"\x89PNG\r\n\x1a\nnot webp"))


def test_no_library_gate_raises(monkeypatch):
    """The honest environment gate: with no .so resolvable, the native
    paths raise NotImplementedError naming the dependency."""
    from etl_loading_scripts_spark.llm import webplib

    monkeypatch.setattr(webplib, "_LIB", None)
    monkeypatch.setattr(webplib, "_LIB_TRIED", True)
    assert not webplib.libwebp_available()
    with pytest.raises(NotImplementedError, match="libwebp"):
        webplib.libwebp_decode_rgba(b"RIFF\x00\x00\x00\x00WEBP")
