"""Dependency-free baseline TIFF codec — IFD walk, strips, both endians.

Round-4 continuation of the multimodal format surface. TIFF is the
scanned-document and scientific-imaging interchange format (and the
container behind many OCR corpora); its decode exercise is different
again from PNG/JPEG/GIF: a tag-directory (IFD) metadata walk with
little- AND big-endian layouts, inline-vs-offset value storage, and
strip-based raster assembly.

Scope (honest partial support): 8-bit uncompressed (Compression=1)
grayscale (PhotometricInterpretation 0/1, including the 0=WhiteIsZero
inversion) and RGB (2), one or many strips, II and MM byte orders,
first IFD only (multi-page TIFFs decode their first page). Everything
else — LZW/JPEG/deflate compression, planar configuration 2, 16-bit
samples, tiles — raises ``ValueError`` with the reason; the
classify-and-quarantine path keeps mixed corpora flowing.

Reference behavior modeled: none in the reference repo (pure T-SQL
warehouse); training-data-pipeline extension surface.
"""

from __future__ import annotations

import struct

import numpy as np

#: TIFF type sizes (type id → bytes per value) for the types we read.
_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4}


def encode_tiff(
    width: int, height: int, pixels: bytes, channels: int = 3,
    big_endian: bool = False, rows_per_strip: int | None = None,
) -> bytes:
    """Encode 8-bit gray (channels=1) or RGB (channels=3) pixels as an
    uncompressed strip-based TIFF, little- ('II') or big-endian ('MM')."""
    if channels not in (1, 3):
        raise ValueError("channels must be 1 or 3")
    if len(pixels) != width * height * channels:
        raise ValueError("pixels length must be width*height*channels")
    e = ">" if big_endian else "<"
    rps = rows_per_strip or height
    strips = [
        pixels[y * width * channels : min(y + rps, height) * width * channels]
        for y in range(0, height, rps)
    ]
    header_ifd_size = 8 + 2 + 12 * 10 + 4
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
        (259, 3, 1, 1),               # Compression: none
        (262, 3, 1, 1 if channels == 1 else 2),  # Photometric: BlackIsZero/RGB
        (273, 4, n, strip_off_value),  # StripOffsets
        (277, 3, 1, channels),        # SamplesPerPixel
        (278, 4, 1, rps),             # RowsPerStrip
        (279, 4, n, strip_cnt_value),  # StripByteCounts
        (284, 3, 1, 1),               # PlanarConfiguration: chunky
    ]
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
    if one(259, 1) != 1:
        raise ValueError("only uncompressed TIFF supported (Compression=1)")
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
    raster = b"".join(
        payload[o : o + c] for o, c in zip(offsets, counts)
    )
    if len(raster) != width * height * channels:
        raise ValueError("TIFF strip data does not match dimensions")
    if photometric == 0:  # WhiteIsZero: invert to the BlackIsZero convention
        raster = (255 - np.frombuffer(raster, dtype=np.uint8)).tobytes()
    return width, height, channels, raster
