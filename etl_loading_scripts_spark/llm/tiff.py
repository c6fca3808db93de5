"""Dependency-free baseline TIFF codec — IFD walk, strips, both endians.

Round-4 continuation of the multimodal format surface. TIFF is the
scanned-document and scientific-imaging interchange format (and the
container behind many OCR corpora); its decode exercise is different
again from PNG/JPEG/GIF: a tag-directory (IFD) metadata walk with
little- AND big-endian layouts, inline-vs-offset value storage, and
strip-based raster assembly.

Scope (honest partial support): 8-bit grayscale
(PhotometricInterpretation 0/1, including the 0=WhiteIsZero inversion)
and RGB (2); Compression 1 (none), 5 (TIFF-LZW: MSB-first codes with
the spec's early code-width change, round 5) and 8/32946 (Adobe/legacy
Deflate via zlib); Predictor 2 (horizontal differencing); one or many
strips, II and MM byte orders, first IFD only (multi-page TIFFs decode
their first page). Everything else — JPEG-in-TIFF, planar
configuration 2, 16-bit samples, tiles — raises ``ValueError`` with
the reason; the classify-and-quarantine path keeps mixed corpora
flowing.

Reference behavior modeled: none in the reference repo (pure T-SQL
warehouse); training-data-pipeline extension surface.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

#: TIFF type sizes (type id → bytes per value) for the types we read.
_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4}

_CLEAR, _EOI = 256, 257


def lzw_encode_tiff(data: bytes) -> bytes:
    """TIFF-flavor LZW (TIFF 6.0 §13): MSB-first bit packing, Clear=256,
    EOI=257, and the EARLY code-width change — the width bumps when the
    NEXT code to be assigned reaches 2^w - 1 (one code earlier than GIF,
    the interop bug that famously bites naive implementations)."""
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc = (acc << width) | code
        nbits += width
        while nbits >= 8:
            nbits -= 8
            out.append((acc >> nbits) & 0xFF)

    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    nxt = 258
    width = 9
    emit(_CLEAR, width)
    w = b""
    for b in data:
        k = w + bytes([b])
        if k in table:
            w = k
            continue
        emit(table[w], width)
        table[k] = nxt
        nxt += 1
        if nxt == (1 << width) - 1 and width < 12:  # early change
            width += 1
        elif nxt == (1 << 12) - 1:
            emit(_CLEAR, width)
            table = {bytes([i]): i for i in range(256)}
            nxt = 258
            width = 9
        w = bytes([b])
    if w:
        emit(table[w], width)
    emit(_EOI, width)
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


def lzw_decode_tiff(data: bytes, max_out: int) -> bytes:
    """Inverse of :func:`lzw_encode_tiff`; ``max_out`` bounds the output
    (strip size from the IFD) so corrupt streams can't balloon. Raises
    ``ValueError`` on malformed codes — the quarantine signal."""
    out = bytearray()
    pos = 0
    acc = 0
    nbits = 0
    width = 9
    table: list[bytes] = []
    prev: bytes | None = None

    def reset() -> None:
        nonlocal table, width, prev
        table = [bytes([i]) for i in range(256)] + [b"", b""]
        width = 9
        prev = None

    reset()
    while True:
        while nbits < width:
            if pos >= len(data):
                raise ValueError("corrupt LZW: stream ended before EOI")
            acc = (acc << 8) | data[pos]
            pos += 1
            nbits += 8
        nbits -= width
        code = (acc >> nbits) & ((1 << width) - 1)
        if code == _EOI:
            break
        if code == _CLEAR:
            reset()
            continue
        if prev is None:
            if code > 255:
                raise ValueError("corrupt LZW: first code not a literal")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):  # KwKwK
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("corrupt LZW: code beyond table")
        out += entry
        if len(out) > max_out:
            raise ValueError("corrupt LZW: output exceeds strip size")
        prev = entry
        # early change, decoder side: the decoder's table is always ONE
        # entry behind the encoder's (the first code after Clear adds
        # nothing), so it must bump at 2^w - 2 to read the same stream
        # the encoder wrote with its 2^w - 1 rule (TIFF 6.0 §13 note)
        if len(table) == (1 << width) - 2 and width < 12:
            width += 1
    return bytes(out)


def _predict2_forward(raster: bytes, width: int, channels: int) -> bytes:
    """Horizontal differencing (Predictor=2): per row, per channel,
    each sample becomes its delta from the previous pixel (mod 256)."""
    a = np.frombuffer(raster, dtype=np.uint8).reshape(-1, width, channels)
    d = a.astype(np.int16)
    d[:, 1:, :] -= a[:, :-1, :].astype(np.int16)
    return (d & 0xFF).astype(np.uint8).tobytes()


def _predict2_inverse(raster: bytes, width: int, channels: int) -> bytes:
    """Inverse of :func:`_predict2_forward`: cumulative sum mod 256."""
    a = np.frombuffer(raster, dtype=np.uint8).reshape(-1, width, channels)
    return (
        np.cumsum(a.astype(np.int64), axis=1) & 0xFF
    ).astype(np.uint8).tobytes()


def encode_tiff(
    width: int, height: int, pixels: bytes, channels: int = 3,
    big_endian: bool = False, rows_per_strip: int | None = None,
    compression: int = 1, predictor: int = 1,
) -> bytes:
    """Encode 8-bit gray (channels=1) or RGB (channels=3) pixels as a
    strip-based TIFF, little- ('II') or big-endian ('MM');
    ``compression`` 1 (none), 5 (TIFF-LZW) or 8 (Deflate), optionally
    behind the Predictor-2 horizontal differencing that makes LZW earn
    its keep on photographic content."""
    if channels not in (1, 3):
        raise ValueError("channels must be 1 or 3")
    if len(pixels) != width * height * channels:
        raise ValueError("pixels length must be width*height*channels")
    if compression not in (1, 5, 8):
        raise ValueError("compression must be 1 (none), 5 (LZW) or 8 (deflate)")
    if predictor not in (1, 2):
        raise ValueError("predictor must be 1 (none) or 2 (horizontal)")
    e = ">" if big_endian else "<"
    rps = rows_per_strip or height
    strips = []
    for y in range(0, height, rps):
        s = pixels[y * width * channels : min(y + rps, height) * width * channels]
        if predictor == 2:
            s = _predict2_forward(s, width, channels)
        if compression == 5:
            s = lzw_encode_tiff(s)
        elif compression == 8:
            s = zlib.compress(s)
        strips.append(s)
    n_entries_total = 10 + (1 if predictor == 2 else 0)
    header_ifd_size = 8 + 2 + 12 * n_entries_total + 4
    # layout: header+IFD, then BitsPerSample array (for RGB), offsets
    # arrays (if >1 strip), then strip data
    extra = bytearray()
    extra_base = header_ifd_size

    def put_array(fmt: str, values: list[int]) -> int:
        off = extra_base + len(extra)
        extra.extend(struct.pack(f"{e}{len(values)}{fmt}", *values))
        return off

    entries: list[tuple[int, int, int, int]] = []  # tag, type, count, value

    bits_value = 8 if channels == 1 else put_array("H", [8, 8, 8])
    strip_sizes = [len(s) for s in strips]
    # strip offsets are filled after we know where data starts
    data_start_holder = extra_base  # placeholder; computed below

    # first pass to size the offset arrays
    n = len(strips)
    if n > 1:
        offsets_pos = extra_base + len(extra)
        extra.extend(bytes(4 * n))  # reserve StripOffsets array
        counts_pos = put_array("L", strip_sizes)
    data_start = extra_base + len(extra)
    offs = []
    acc = data_start
    for s in strips:
        offs.append(acc)
        acc += len(s)
    if n > 1:
        struct.pack_into(f"{e}{n}L", extra, offsets_pos - extra_base, *offs)
        strip_off_value = offsets_pos
        strip_cnt_value = counts_pos
    else:
        strip_off_value = offs[0]
        strip_cnt_value = strip_sizes[0]

    entries = [
        (256, 4, 1, width),           # ImageWidth
        (257, 4, 1, height),          # ImageLength
        (258, 3, channels, bits_value),  # BitsPerSample
        (259, 3, 1, compression),     # Compression
        (262, 3, 1, 1 if channels == 1 else 2),  # Photometric: BlackIsZero/RGB
        (273, 4, n, strip_off_value),  # StripOffsets
        (277, 3, 1, channels),        # SamplesPerPixel
        (278, 4, 1, rps),             # RowsPerStrip
        (279, 4, n, strip_cnt_value),  # StripByteCounts
        (284, 3, 1, 1),               # PlanarConfiguration: chunky
    ]
    if predictor == 2:
        entries.append((317, 3, 1, 2))  # Predictor: horizontal differencing
    out = bytearray()
    out += (b"MM" if big_endian else b"II") + struct.pack(f"{e}H", 42)
    out += struct.pack(f"{e}L", 8)  # first IFD right after header
    out += struct.pack(f"{e}H", len(entries))
    for tag, typ, count, value in sorted(entries):
        ent = struct.pack(f"{e}HHL", tag, typ, count)
        size = _TYPE_SIZE[typ] * count
        if size <= 4 and not (tag in (273, 279) and count > 1) and not (
            tag == 258 and channels == 3
        ):
            # inline value, left-justified in its 4 bytes per spec
            if typ == 3:
                ent += struct.pack(f"{e}H", value) + b"\x00\x00"
            else:
                ent += struct.pack(f"{e}L", value)
        else:
            ent += struct.pack(f"{e}L", value)  # offset
        out += ent
    out += struct.pack(f"{e}L", 0)  # no next IFD
    assert len(out) == header_ifd_size
    out += extra
    for s in strips:
        out += s
    return bytes(out)


def decode_tiff(payload: bytes) -> tuple[int, int, int, bytes]:
    """Decode an uncompressed 8-bit baseline TIFF →
    (width, height, channels, pixels).

    Walks the first IFD in either byte order, resolves inline vs
    offset-stored tag values, assembles the raster from strips, and
    applies the WhiteIsZero inversion when Photometric=0.
    """
    if payload[:4] == b"II*\x00":
        e = "<"
    elif payload[:4] == b"MM\x00*":
        e = ">"
    else:
        raise ValueError("not a TIFF payload (bad byte-order magic)")
    (ifd_off,) = struct.unpack_from(f"{e}L", payload, 4)
    (n_entries,) = struct.unpack_from(f"{e}H", payload, ifd_off)
    tags: dict[int, list[int]] = {}
    for i in range(n_entries):
        base = ifd_off + 2 + 12 * i
        tag, typ, count = struct.unpack_from(f"{e}HHL", payload, base)
        if typ not in _TYPE_SIZE:
            continue  # unknown value type: skip (spec-sanctioned)
        size = _TYPE_SIZE[typ] * count
        if size <= 4:
            vpos = base + 8
        else:
            (vpos,) = struct.unpack_from(f"{e}L", payload, base + 8)
        fmt = {1: "B", 2: "B", 3: "H", 4: "L"}[typ]
        tags[tag] = list(struct.unpack_from(f"{e}{count}{fmt}", payload, vpos))

    def one(tag: int, default=None) -> int:
        if tag in tags:
            return tags[tag][0]
        if default is None:
            raise ValueError(f"TIFF missing required tag {tag}")
        return default

    width, height = one(256), one(257)
    compression = one(259, 1)
    if compression not in (1, 5, 8, 32946):
        raise ValueError(
            f"unsupported TIFF compression {compression} "
            "(1=none, 5=LZW, 8/32946=deflate supported)"
        )
    predictor = one(317, 1)
    if predictor not in (1, 2):
        raise ValueError(f"unsupported TIFF predictor {predictor}")
    if one(284, 1) != 1:
        raise ValueError("only chunky planar configuration supported")
    channels = one(277, 1)
    photometric = one(262, 1)
    bits = tags.get(258, [8])
    if any(b != 8 for b in bits):
        raise ValueError("only 8-bit samples supported")
    if photometric in (0, 1):
        if channels != 1:
            raise ValueError("grayscale photometric with >1 sample")
    elif photometric == 2:
        if channels != 3:
            raise ValueError("RGB photometric needs 3 samples")
    else:
        raise ValueError(f"unsupported photometric interpretation {photometric}")
    offsets = tags.get(273)
    counts = tags.get(279)
    if not offsets or not counts or len(offsets) != len(counts):
        raise ValueError("TIFF missing strip layout tags")
    rps = one(278, height)
    parts = []
    for i, (o, c) in enumerate(zip(offsets, counts)):
        strip = payload[o : o + c]
        rows = min(rps, height - i * rps)
        expect = rows * width * channels
        if compression == 5:
            strip = lzw_decode_tiff(strip, expect)
        elif compression in (8, 32946):
            try:
                strip = zlib.decompress(strip)
            except zlib.error as exc:
                raise ValueError(f"corrupt TIFF deflate strip: {exc}") from exc
        if len(strip) != expect:
            raise ValueError("TIFF strip data does not match dimensions")
        if predictor == 2:
            strip = _predict2_inverse(strip, width, channels)
        parts.append(strip)
    raster = b"".join(parts)
    if len(raster) != width * height * channels:
        raise ValueError("TIFF strip data does not match dimensions")
    if photometric == 0:  # WhiteIsZero: invert to the BlackIsZero convention
        raster = (255 - np.frombuffer(raster, dtype=np.uint8)).tobytes()
    return width, height, channels, raster
