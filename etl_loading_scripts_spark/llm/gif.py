"""Dependency-free GIF (87a/89a) codec — LZW, color tables, interlacing.

Round-4 continuation of the multimodal format surface: GIF is the third
most common image format in web scrapes after JPEG/PNG, and its decode
path is a genuinely different exercise from both — variable-width LSB-
first LZW with a growing dictionary, palette indirection, sub-block
framing, and the 4-pass GIF interlace. This module is real spec work:

- **Decoder**: header + logical screen descriptor, global/local color
  tables, extension-block skipping (GCE/comment/application), image
  descriptor, sub-block reassembly, full variable-width LZW decode
  (clear/EOI codes, 12-bit cap, the deferred-clear rule), 4-pass
  interlace reorder, palette resolution to packed RGB. First frame only
  (animation = repeated image blocks; frame N>0 needs composition
  policy, which belongs to the caller).
- **Encoder** (for honest round-trips): real LZW compression with
  dictionary growth and clear-code resets, GCT emission, optional
  interlaced row order — files any browser opens.

Scope limits (raise ``ValueError``): no frame composition for animated
GIFs beyond the first image block, no transparency application (the
index is returned as its palette color; compositing policy belongs to
the caller). Everything here is from the public GIF89a specification.

Reference behavior modeled: none in the reference repo (pure T-SQL
warehouse); training-data-pipeline extension surface.
"""

from __future__ import annotations

import struct

import numpy as np

#: 4-pass interlace: (start row, step) per pass.
_INTERLACE_PASSES = [(0, 8), (4, 8), (2, 4), (1, 2)]


def _u8(payload: bytes, pos: int) -> int:
    """``payload[pos]`` with a truncation check: corrupt/truncated files
    raise the documented ``ValueError`` from the container walks, never
    ``IndexError`` (ADVICE r4 — a truncated payload with a valid GIF
    magic must route to quarantine, not kill the partition)."""
    if pos >= len(payload):
        raise ValueError("corrupt GIF: truncated file")
    return payload[pos]


def _unpack(fmt: str, payload: bytes, pos: int) -> tuple:
    """``struct.unpack_from`` with the same truncation-as-ValueError
    contract as :func:`_u8` (struct.error would escape quarantine)."""
    if pos + struct.calcsize(fmt) > len(payload):
        raise ValueError("corrupt GIF: truncated file")
    return struct.unpack_from(fmt, payload, pos)


# ---------------------------------------------------------------------------
# LZW
# ---------------------------------------------------------------------------


class _LZWWriter:
    """Variable-width LSB-first code stream with sub-block framing."""

    def __init__(self) -> None:
        self.acc = 0
        self.nbits = 0
        self.bytes = bytearray()

    def write(self, code: int, width: int) -> None:
        self.acc |= code << self.nbits
        self.nbits += width
        while self.nbits >= 8:
            self.bytes.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def finish(self) -> bytes:
        if self.nbits:
            self.bytes.append(self.acc & 0xFF)
        out = bytearray()
        data = bytes(self.bytes)
        for i in range(0, len(data), 255):
            block = data[i : i + 255]
            out.append(len(block))
            out += block
        out.append(0)  # block terminator
        return bytes(out)


def _lzw_encode(indices: bytes, min_code_size: int) -> bytes:
    """Real LZW compression per the GIF spec (dictionary strings →
    codes, width grows at dictionary size, clear at 4096)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    w = _LZWWriter()

    def reset():
        return {bytes([i]): i for i in range(clear)}, eoi + 1, min_code_size + 1

    table, next_code, width = reset()
    w.write(clear, width)
    prefix = b""
    for byte in indices:
        cand = prefix + bytes([byte])
        if cand in table:
            prefix = cand
            continue
        w.write(table[prefix], width)
        table[cand] = next_code
        next_code += 1
        if next_code == (1 << width) + 1 and width < 12:
            width += 1
        if next_code >= 4096:
            w.write(clear, width)
            table, next_code, width = reset()
        prefix = bytes([byte])
    if prefix:
        w.write(table[prefix], width)
    w.write(eoi, width)
    return w.finish()


def _lzw_decode(data: bytes, min_code_size: int, n_expected: int) -> bytes:
    """Variable-width LSB-first LZW decode (clear/EOI, 12-bit cap)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    acc = 0
    nbits = 0
    pos = 0
    out = bytearray()

    def reset():
        return {i: bytes([i]) for i in range(clear)}, eoi + 1, min_code_size + 1

    table, next_code, width = reset()
    prev: bytes | None = None
    while True:
        while nbits < width:
            if pos >= len(data):
                raise ValueError("corrupt GIF: LZW stream truncated")
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table, next_code, width = reset()
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            entry = table[code]
        elif code in table:
            entry = table[code]
        elif code == next_code:
            entry = prev + prev[:1]  # the KwKwK case
        else:
            raise ValueError(f"corrupt GIF: LZW code {code} out of range")
        out += entry
        if prev is not None and next_code < 4096:
            table[next_code] = prev + entry[:1]
            next_code += 1
            if next_code == (1 << width) and width < 12:
                width += 1
        prev = entry
        if len(out) >= n_expected:
            break
    return bytes(out[:n_expected])


# ---------------------------------------------------------------------------
# Container
# ---------------------------------------------------------------------------


def encode_gif(
    width: int,
    height: int,
    indices: bytes,
    palette: bytes,
    interlace: bool = False,
) -> bytes:
    """Encode palette indices + an RGB palette as a GIF89a file.

    The palette is padded to the next power-of-two entry count (GIF color
    tables come in 2^n sizes); ``interlace`` writes rows in the 4-pass
    order real interlaced GIFs use."""
    if len(indices) != width * height:
        raise ValueError("indices length must be width*height")
    if len(palette) % 3 or not palette:
        raise ValueError("palette must be non-empty RGB triples")
    n_colors = len(palette) // 3
    bits = max(1, (max(0, n_colors - 1)).bit_length())
    padded = palette + bytes(3 * ((1 << bits) - n_colors))
    if max(indices) >= n_colors:
        raise ValueError("index out of palette range")
    px = np.frombuffer(indices, dtype=np.uint8).reshape(height, width)
    if interlace:
        rows = [r for start, step in _INTERLACE_PASSES for r in range(start, height, step)]
        stream = px[rows].tobytes()
    else:
        stream = px.tobytes()
    min_code = max(2, bits)
    flags = 0x80 | (bits - 1)  # GCT present, 2^bits entries
    out = (
        b"GIF89a"
        + struct.pack("<HHBBB", width, height, flags, 0, 0)
        + padded
        + b"\x2c"  # image descriptor
        + struct.pack("<HHHHB", 0, 0, width, height, 0x40 if interlace else 0)
        + bytes([min_code])
        + _lzw_encode(stream, min_code)
        + b"\x3b"  # trailer
    )
    return out


def decode_gif(payload: bytes) -> tuple[int, int, bytes]:
    """Decode the first frame of a GIF87a/89a → (width, height, rgb).

    Full container walk: logical screen descriptor, global color table,
    extension skipping, local color table, sub-block reassembly, LZW,
    4-pass interlace reorder, palette → packed RGB.
    """
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload (bad magic)")
    sw, sh, flags, _bg, _aspect = _unpack("<HHBBB", payload, 6)
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        if pos + 3 * n > len(payload):
            raise ValueError("corrupt GIF: truncated global color table")
        gct = np.frombuffer(payload, dtype=np.uint8, count=3 * n, offset=pos).reshape(
            n, 3
        )
        pos += 3 * n
    while pos < len(payload):
        block = _u8(payload, pos)
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension: label + sub-blocks
            pos += 1
            while _u8(payload, pos):
                pos += 1 + payload[pos]
            pos += 1
            continue
        if block != 0x2C:
            raise ValueError(f"corrupt GIF: unknown block 0x{block:02x}")
        left, top, w, h, iflags = _unpack("<HHHHB", payload, pos)
        pos += 9
        ct = gct
        if iflags & 0x80:  # local color table
            n = 2 << (iflags & 0x07)
            if pos + 3 * n > len(payload):
                raise ValueError("corrupt GIF: truncated local color table")
            ct = np.frombuffer(
                payload, dtype=np.uint8, count=3 * n, offset=pos
            ).reshape(n, 3)
            pos += 3 * n
        if ct is None:
            raise ValueError("GIF image without any color table")
        min_code = _u8(payload, pos)
        pos += 1
        data = bytearray()
        while _u8(payload, pos):
            ln = payload[pos]
            if pos + 1 + ln > len(payload):
                raise ValueError("corrupt GIF: truncated image sub-block")
            data += payload[pos + 1 : pos + 1 + ln]
            pos += 1 + ln
        pos += 1
        idx = np.frombuffer(
            _lzw_decode(bytes(data), min_code, w * h), dtype=np.uint8
        ).reshape(h, w)
        if iflags & 0x40:  # interlaced: invert the 4-pass row order
            rows = [
                r for start, step in _INTERLACE_PASSES for r in range(start, h, step)
            ]
            ordered = np.empty_like(idx)
            ordered[rows] = idx
            idx = ordered
        if int(idx.max(initial=0)) >= ct.shape[0]:
            raise ValueError("corrupt GIF: palette index out of range")
        return w, h, np.ascontiguousarray(ct[idx]).tobytes()
    raise ValueError("no image block found")


def encode_gif_animated(
    width: int,
    height: int,
    frames: list[bytes],
    palette: bytes,
    delay_cs: int = 10,
) -> bytes:
    """Encode multiple index frames as an animated GIF89a (NETSCAPE2.0
    loop extension + a graphic-control extension per frame)."""
    if not frames:
        raise ValueError("need at least one frame")
    n_colors = len(palette) // 3
    bits = max(1, (max(0, n_colors - 1)).bit_length())
    padded = palette + bytes(3 * ((1 << bits) - n_colors))
    min_code = max(2, bits)
    out = bytearray()
    out += b"GIF89a" + struct.pack("<HHBBB", width, height, 0x80 | (bits - 1), 0, 0)
    out += padded
    # NETSCAPE looping application extension (loop forever)
    out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"
    for idx in frames:
        if len(idx) != width * height:
            raise ValueError("frame length must be width*height")
        if max(idx) >= n_colors:
            raise ValueError("index out of palette range")
        out += b"\x21\xf9\x04\x00" + struct.pack("<H", delay_cs) + b"\x00\x00"
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, width, height, 0)
        out += bytes([min_code]) + _lzw_encode(idx, min_code)
    out += b"\x3b"
    return bytes(out)


def gif_frame_census(payload: bytes) -> tuple[int, int, int]:
    """Count the image blocks of a GIF without decoding pixel data →
    (n_frames, screen_width, screen_height). The metadata pass an
    animation-aware ingestion runs before deciding whether to decode,
    frame-sample, or quarantine a multi-frame file."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload (bad magic)")
    sw, sh, flags, _bg, _aspect = _unpack("<HHBBB", payload, 6)
    pos = 13
    if flags & 0x80:
        pos += 3 * (2 << (flags & 0x07))
    n_frames = 0
    saw_trailer = False
    while pos < len(payload):
        block = _u8(payload, pos)
        pos += 1
        if block == 0x3B:
            saw_trailer = True
            break
        if block == 0x21:
            pos += 1
            while _u8(payload, pos):
                pos += 1 + payload[pos]
            pos += 1
            continue
        if block != 0x2C:
            raise ValueError(f"corrupt GIF: unknown block 0x{block:02x}")
        _l, _t, _w, _h, iflags = _unpack("<HHHHB", payload, pos)
        pos += 9
        if iflags & 0x80:
            pos += 3 * (2 << (iflags & 0x07))
        pos += 1  # LZW min code size
        while _u8(payload, pos):
            pos += 1 + payload[pos]
        pos += 1
        n_frames += 1
    if not saw_trailer:
        # a byte-boundary truncation can land exactly between blocks;
        # the missing 0x3B trailer is the tell (ADVICE r4)
        raise ValueError("corrupt GIF: missing trailer")
    return n_frames, sw, sh
