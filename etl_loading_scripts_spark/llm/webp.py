"""Dependency-free WebP-lossless (VP8L) codec — literal-coded subset.

The last quarantined image class (``mm_format_quarantine``'s unknown
bucket): WebP is the modern web image format, and its LOSSLESS variant
(VP8L) is a self-contained spec a from-scratch codec can honestly
implement — RIFF container, LSB-first bitstream, 14-bit dimensions,
and DEFLATE-style canonical prefix codes with VP8L's own code-length
code order. This module implements the literal-coded subset:

- **Container/header**: RIFF/WEBP/VP8L chunk, 0x2F signature,
  width/height-minus-one 14-bit fields, alpha hint, version 0.
- **Prefix codes**: both wire forms — SIMPLE (1-2 symbols, the spec's
  compact escape) and NORMAL (3-bit code-length-code lengths in the
  spec's order [17,18,0,1,...,15,16 reshuffled], repeat symbols 16/17/18,
  canonical reconstruction — the same discipline as DEFLATE/JPEG DHT).
- **Pixel coding**: per-pixel GREEN→RED→BLUE→ALPHA symbol order from
  the 5-code group (green's alphabet is 256+24 to carry backref length
  symbols).

Plus two transforms: SUBTRACT-GREEN (the decorrelation real encoders
almost always enable — red/blue stored minus green mod 256) and
COLOR-INDEXING (the icon/logo palette class: delta-coded entries ride
their own entropy-coded sub-image, and palettes of ≤16 colors BUNDLE
several indices per coded pixel, narrowing the coded image — spec
§4.4, all three bundling tiers implemented). And LZ77
BACKREFERENCES with plain distance codes (prefix-valued lengths,
overlapping distance-1 copies — the RLE layer; ``encode_webp_rle``
emits them for pixel runs). And the COLOR CACHE (hash-addressed
recent-pixel dictionary, ``encode_webp_cached``). And the PREDICTOR
transform (all 14 spec modes incl. Select and the ClampAddSubtract
pair, per-block mode map riding its own entropy-coded sub-image,
``encode_webp_predicted`` choosing modes by residual mass). And the
CROSS-COLOR transform (signed ColorTransformDelta multipliers, element
map sub-image) — ALL FOUR spec transforms now decode. And META PREFIX
IMAGES (multiple prefix-code groups selected per block by a
sub-resolution entropy image — the spatial entropy segmentation,
``encode_webp_meta``). And the 120-entry NEIGHBOR-MAP distance codes
(spec §4.2.2's 2D distance mapping — codes 1..120 address nearby
pixel offsets, ``encode_webp_neighbor`` emits them for
previous-row copies). And the COMBINED stream
(``encode_webp_combined``: subtract-green + color cache + distance-1
neighbor backrefs interacting in one bitstream — the multi-tool shape
real libwebp output has).

Round 7 RESOLVED the interop caveat this header used to carry: the
container's system ``libwebp.so`` (driven via ctypes, ``llm/webplib.py``)
cross-validates this codec BOTH directions — authentic libwebp-encoded
VP8L streams decode here bit-exactly (including streams where libwebp's
default exact=0 mode rewrote RGB under transparent pixels — this
decoder agrees with the wire, as it must), and every encoder variant
above produces bitstreams the real library decodes losslessly
(oracle-gated: ``mm_webp_libwebp_interop``). Lossy VP8 decode is served
by the native adapter (``mm_decode_webp_lossy``); a from-scratch
RFC 6386 decoder is explicitly de-scoped (SCALING.md r7: its default
probability tables are thousands of constants unsourceable offline),
so this module raising on 'VP8 ' remains correct — callers wanting
lossy go through ``webplib.LibWebPAdapter``.

Reference behavior modeled: none (SURVEY §2.10); training-data-pipeline
extension surface. Spec: "WebP Lossless Bitstream Specification"
(public, webmproject.org).
"""

from __future__ import annotations

import struct

import numpy as np

#: VP8L code-length-code symbol order (spec §5.2.2).
CLC_ORDER = [17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15]

#: The 120-entry NEIGHBOR-MAP distance table (spec §4.2.2 "Distance
#: Mapping"): distance codes 1..120 address nearby 2D pixel offsets
#: instead of linear distances — entry i (code i+1) packs (dy << 4) |
#: (8 - dx), so dy = e >> 4 and dx = 8 - (e & 0xF); the linear
#: distance is dy*xsize + dx clamped to >= 1. Codes > 120 carry
#: distance - 120 directly. Byte-packed exactly as the spec lists it.
_DIST_MAP_PACKED = bytes([
    0x18, 0x07, 0x17, 0x19, 0x28, 0x06, 0x27, 0x29, 0x16, 0x1A,
    0x26, 0x2A, 0x38, 0x05, 0x37, 0x39, 0x15, 0x1B, 0x36, 0x3A,
    0x25, 0x2B, 0x48, 0x04, 0x47, 0x49, 0x14, 0x1C, 0x35, 0x3B,
    0x46, 0x4A, 0x24, 0x2C, 0x58, 0x45, 0x4B, 0x34, 0x3C, 0x03,
    0x57, 0x59, 0x13, 0x1D, 0x56, 0x5A, 0x23, 0x2D, 0x44, 0x4C,
    0x55, 0x5B, 0x33, 0x3D, 0x68, 0x02, 0x67, 0x69, 0x12, 0x1E,
    0x66, 0x6A, 0x22, 0x2E, 0x54, 0x5C, 0x43, 0x4D, 0x65, 0x6B,
    0x32, 0x3E, 0x78, 0x01, 0x77, 0x79, 0x53, 0x5D, 0x11, 0x1F,
    0x64, 0x6C, 0x42, 0x4E, 0x76, 0x7A, 0x21, 0x2F, 0x75, 0x7B,
    0x31, 0x3F, 0x63, 0x6D, 0x52, 0x5E, 0x00, 0x74, 0x7C, 0x41,
    0x4F, 0x10, 0x20, 0x62, 0x6E, 0x30, 0x73, 0x7D, 0x51, 0x5F,
    0x40, 0x72, 0x7E, 0x61, 0x6F, 0x50, 0x71, 0x7F, 0x60, 0x70,
])

#: Unpacked (dx, dy) pairs: DIST_MAP[code - 1] for codes 1..120.
DIST_MAP = [((8 - (e & 0xF)), e >> 4) for e in _DIST_MAP_PACKED]


def _dist_code_to_distance(dist_code: int, xsize: int) -> int:
    """Wire distance code → linear pixel distance (spec §4.2.2): codes
    1..120 go through the neighbor map (dy*xsize + dx, clamped to 1);
    codes above 120 are plain distances offset by 120."""
    if dist_code > 120:
        return dist_code - 120
    dx, dy = DIST_MAP[dist_code - 1]
    return max(1, dy * xsize + dx)


def _distance_to_dist_code(distance: int, xsize: int) -> int:
    """Linear distance → smallest wire code (encode side): neighbor-map
    codes win when the offset is within the 2D window, else plain
    distance + 120. First table hit wins, matching the decode map."""
    for i, (dx, dy) in enumerate(DIST_MAP):
        if max(1, dy * xsize + dx) == distance:
            return i + 1
    return distance + 120

_GREEN_ALPHA = 256 + 24  # literal greens + backref length symbols


class _BitReaderLSB:
    """LSB-first bit reader (VP8L convention, same as DEFLATE)."""

    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.pos = pos
        self.bit = 0

    def read(self, n: int) -> int:
        v = 0
        for i in range(n):
            if self.pos >= len(self.data):
                raise ValueError("corrupt VP8L: truncated bitstream")
            v |= ((self.data[self.pos] >> self.bit) & 1) << i
            self.bit += 1
            if self.bit == 8:
                self.bit = 0
                self.pos += 1
        return v


class _BitWriterLSB:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, v: int, n: int) -> None:
        for i in range(n):
            self.acc |= ((v >> i) & 1) << self.nbits
            self.nbits += 1
            if self.nbits == 8:
                self.out.append(self.acc)
                self.acc = 0
                self.nbits = 0

    def flush(self) -> bytes:
        if self.nbits:
            self.out.append(self.acc)
            self.acc = 0
            self.nbits = 0
        return bytes(self.out)


def _canonical_codes(lengths: dict[int, int]) -> dict[int, tuple[int, int]]:
    """symbol → (code, len) via the canonical assignment (shorter codes
    first, ties by symbol — the DEFLATE rule VP8L shares)."""
    maxlen = max(lengths.values())
    bl_count = [0] * (maxlen + 1)
    for ln in lengths.values():
        bl_count[ln] += 1
    code = 0
    next_code = [0] * (maxlen + 2)
    for ln in range(1, maxlen + 1):
        code = (code + bl_count[ln - 1]) << 1
        next_code[ln] = code
    out = {}
    for sym in sorted(lengths):
        ln = lengths[sym]
        out[sym] = (next_code[ln], ln)
        next_code[ln] += 1
    return out


def _assign_lengths(freqs: dict[int, int], max_len: int = 15) -> dict[int, int]:
    """FREQUENCY-OPTIMAL length-limited code lengths via package-merge
    (Larmore-Hirschberg): the canonical algorithm real encoders use —
    merge items and packages level by level for ``max_len`` rounds; a
    symbol's length is how many of the cheapest ``2n-2`` packages it
    appears in. Kraft-complete and optimal under the length cap (VP8L's
    15), unlike the balanced-tree assignment rounds 5-and-earlier used
    (valid but cost-blind: a 90%-frequency symbol got the same length
    as a singleton). Decoders are unchanged — canonical reconstruction
    already handles arbitrary length multisets."""
    syms = sorted(freqs)
    n = len(syms)
    if n < 2:
        raise ValueError("normal code needs >= 2 symbols")
    if n > (1 << max_len):
        raise ValueError("alphabet exceeds length-limited capacity")
    # items: (weight, {sym: count}) — count = how many packages the
    # symbol is inside; start each level from the singletons again
    singles = sorted(
        ((max(freqs[s], 1), (s,)) for s in syms), key=lambda t: (t[0], t[1])
    )
    level: list[tuple[int, tuple]] = list(singles)
    for _ in range(max_len - 1):
        packaged = [
            (
                level[i][0] + level[i + 1][0],
                level[i][1] + level[i + 1][1],
            )
            for i in range(0, len(level) - 1, 2)
        ]
        level = sorted(singles + packaged, key=lambda t: (t[0], t[1]))
    lengths = {s: 0 for s in syms}
    for _w, members in level[: 2 * n - 2]:
        for s in members:
            lengths[s] += 1
    return lengths


class _Prefix:
    """Decoding table for one prefix code (simple or normal)."""

    def __init__(self, codes: dict[int, tuple[int, int]] | None, single: int | None):
        self.single = single  # 0-bit code: always this symbol
        self.lookup = (
            {(c, ln): s for s, (c, ln) in codes.items()} if codes else {}
        )
        self.maxlen = max((ln for (_c, ln) in self.lookup), default=0)

    def decode(self, br: _BitReaderLSB) -> int:
        if self.single is not None:
            return self.single
        code = 0
        for ln in range(1, self.maxlen + 1):
            code = (code << 1) | br.read(1)
            if (code, ln) in self.lookup:
                return self.lookup[(code, ln)]
        raise ValueError("corrupt VP8L: invalid prefix code")


def _read_prefix_code(br: _BitReaderLSB, alphabet: int) -> _Prefix:
    if br.read(1):  # simple
        num_symbols = br.read(1) + 1
        first_8 = br.read(1)
        s0 = br.read(8 if first_8 else 1)
        if num_symbols == 1:
            return _Prefix(None, s0)
        s1 = br.read(8)
        return _Prefix({s0: (0, 1), s1: (1, 1)}, None)
    # normal: code-length code
    num_clc = 4 + br.read(4)
    clc_lengths = {}
    for i in range(num_clc):
        ln = br.read(3)
        if ln:
            clc_lengths[CLC_ORDER[i]] = ln
    if not clc_lengths:
        raise ValueError("corrupt VP8L: empty code-length code")
    clc = _Prefix(_canonical_codes(clc_lengths), None) if len(
        clc_lengths
    ) > 1 else _Prefix(None, next(iter(clc_lengths)))
    if br.read(1):  # use_max_symbol: a BUDGET of decoded code-length-code
        # SYMBOLS (one loop iteration each — a repeat op counts as one
        # unit), NOT a bound on the symbol index; the spec's
        # ReadHuffmanCodeLengths decrements it per decoded symbol and
        # leaves every remaining length zero when it runs out.
        length_nbits = 2 + 2 * br.read(3)
        budget = 2 + br.read(length_nbits)
    else:
        budget = -1  # unlimited: the loop stops at the alphabet bound
    lengths: dict[int, int] = {}
    sym = 0
    prev = 8
    while sym < alphabet:
        if budget == 0:
            break
        if budget > 0:
            budget -= 1
        s = clc.decode(br)
        if s < 16:
            if s:
                lengths[sym] = s
                prev = s
            sym += 1
        elif s == 16:
            rep = 3 + br.read(2)
            for _ in range(rep):
                if sym < alphabet:
                    lengths[sym] = prev
                sym += 1
        elif s == 17:
            sym += 3 + br.read(3)
        else:  # 18
            sym += 11 + br.read(7)
    if not lengths:
        raise ValueError("corrupt VP8L: empty prefix code")
    if len(lengths) == 1:
        return _Prefix(None, next(iter(lengths)))
    return _Prefix(_canonical_codes(lengths), None)


def decode_webp_lossless(payload: bytes) -> tuple[int, int, bytes]:
    """Decode a VP8L WebP → (width, height, RGBA bytes): all four spec
    transforms (predictor, cross-color, subtract-green, palette incl.
    pixel bundling), LZ77 backreferences with BOTH plain and
    neighbor-map distance codes, the color cache, and meta prefix
    groups. Raises ``ValueError`` on non-WebP magic, corrupt streams,
    or lossy VP8 (the one remaining quarantine line)."""
    if len(payload) < 20 or payload[:4] != b"RIFF" or payload[8:12] != b"WEBP":
        raise ValueError("not a WebP payload")
    if payload[12:16] == b"VP8X":
        # extended container (metadata/alpha flags): walk the chunk
        # list for the VP8L image chunk — EXIF/XMP/ICCP ride alongside
        # and are skipped by size; lossy VP8 inside stays quarantined
        pos = 12
        data = None
        while pos + 8 <= len(payload):
            tag = payload[pos : pos + 4]
            (ln,) = struct.unpack_from("<I", payload, pos + 4)
            body = payload[pos + 8 : pos + 8 + ln]
            if len(body) < ln:
                raise ValueError("corrupt WebP: truncated chunk")
            if tag == b"VP8L":
                data = body
                break
            if tag == b"VP8 ":
                raise ValueError("lossy WebP (VP8) not supported")
            pos += 8 + ln + (ln & 1)  # chunks are 2-byte aligned
        if data is None:
            raise ValueError("extended WebP without a VP8L image chunk")
    elif payload[12:16] == b"VP8L":
        (chunk_len,) = struct.unpack_from("<I", payload, 16)
        data = payload[20 : 20 + chunk_len]
    else:
        raise ValueError("lossy WebP not supported (VP8L only)")
    if not data or data[0] != 0x2F:
        raise ValueError("corrupt VP8L: bad signature")
    br = _BitReaderLSB(data, 1)
    width = br.read(14) + 1
    height = br.read(14) + 1
    br.read(1)  # alpha hint
    if br.read(3) != 0:
        raise ValueError("unsupported VP8L version")
    transforms: list[tuple[int, object]] = []
    while br.read(1):  # transform list
        ttype = br.read(2)
        if ttype == 0:  # predictor: per-block mode sub-image
            size_bits = br.read(3) + 2
            bw_ = (width + (1 << size_bits) - 1) >> size_bits
            bh_ = (height + (1 << size_bits) - 1) >> size_bits
            modes = _read_entropy_image(br, bw_, bh_)[:, 1].copy()
            if int(modes.max(initial=0)) > 13:
                raise ValueError("corrupt VP8L: predictor mode > 13")
            transforms.append((0, (size_bits, bw_, modes)))
        elif ttype == 1:  # cross-color: per-block transform elements
            size_bits = br.read(3) + 2
            bw_ = (width + (1 << size_bits) - 1) >> size_bits
            bh_ = (height + (1 << size_bits) - 1) >> size_bits
            elems = _read_entropy_image(br, bw_, bh_)
            transforms.append((1, (size_bits, bw_, elems)))
        elif ttype == 2:  # subtract-green: no payload, invertible add
            transforms.append((2, None))
        elif ttype == 3:  # color indexing (palette)
            size = br.read(8) + 1
            # the palette rides as its own entropy-coded image of
            # (size × 1), entries DELTA-coded against the previous one
            deltas = _read_entropy_image(br, size, 1)
            palette = np.cumsum(deltas.astype(np.int64), axis=0) & 0xFF
            transforms.append((3, palette.astype(np.uint8)))
        else:  # pragma: no cover — types 0..3 all handled above
            raise ValueError("corrupt VP8L: unknown transform type")
    # pixel bundling: small palettes pack several indices per green byte
    # and the coded image narrows accordingly (spec §4.4)
    coded_w = width
    xbits = 0
    for ttype, payload in transforms:
        if ttype == 3:
            size = payload.shape[0]
            xbits = 3 if size <= 2 else 2 if size <= 4 else 1 if size <= 16 else 0
            coded_w = (width + (1 << xbits) - 1) >> xbits
    out = _read_entropy_image(br, coded_w, height, main=True)
    for ttype, payload in reversed(transforms):
        if ttype == 0:  # predictor inverse: residual + prediction mod 256
            size_bits, bw_, modes = payload
            out = _predictor_inverse(out, width, height, size_bits, bw_, modes)
        elif ttype == 1:  # cross-color inverse: add the deltas back
            size_bits, bw_, elems = payload
            out = _cross_color(out, width, height, size_bits, bw_, elems, +1)
        elif ttype == 2:
            g = out[:, 1].astype(np.int64)
            out[:, 0] = ((out[:, 0].astype(np.int64) + g) & 0xFF).astype(np.uint8)
            out[:, 2] = ((out[:, 2].astype(np.int64) + g) & 0xFF).astype(np.uint8)
        else:  # palette: unbundle indices, then map through entries
            size = payload.shape[0]
            idx = np.zeros(width * height, dtype=np.int64)
            bpp = 8 >> xbits if xbits else 8
            per = 1 << xbits
            greens = out[:, 1].reshape(height, coded_w)
            for y in range(height):
                for cx in range(coded_w):
                    g = int(greens[y, cx])
                    for s in range(per):
                        x = cx * per + s
                        if x < width:
                            idx[y * width + x] = (g >> (s * bpp)) & ((1 << bpp) - 1)
            if int(idx.max(initial=0)) >= size:
                raise ValueError("corrupt VP8L: palette index out of range")
            out = payload[idx]
    return width, height, out.tobytes()


def _avg2(a, b):
    return tuple((int(x) + int(y)) // 2 for x, y in zip(a, b))


def _predict(mode: int, L, T, TL, TR):
    """The 14 VP8L predictor modes (spec §4.2.1) over RGBA tuples,
    with the spec/libwebp conventions exactly: Select ties choose T,
    ClampAddSubtractHalf's half-step truncates toward zero (C integer
    division), and TR at the right edge wraps to the row-above's
    one-past-end pixel (handled in ``_predictor_neighbors``)."""
    if mode == 0:
        return (0, 0, 0, 255)
    if mode == 1:
        return L
    if mode == 2:
        return T
    if mode == 3:
        return TR
    if mode == 4:
        return TL
    if mode == 5:
        return _avg2(_avg2(L, TR), T)
    if mode == 6:
        return _avg2(L, TL)
    if mode == 7:
        return _avg2(L, T)
    if mode == 8:
        return _avg2(TL, T)
    if mode == 9:
        return _avg2(T, TR)
    if mode == 10:
        return _avg2(_avg2(L, TL), _avg2(T, TR))
    if mode == 11:  # Select: gradient chooses the closer neighbor,
        # ties choose T — spec pseudo-code `(pL < pT) ? L : T`, and
        # libwebp's Select(top, left, tl) returns TOP on
        # pa_minus_pb <= 0 where the Sub3 sum is Σ(|left-tl|-|top-tl|)
        # = pT - pL. (ADVICE r5 claimed ties choose L; re-derivation of
        # both sources says T — documented in BASELINE.md r6.)
        p = tuple(int(l) + int(t) - int(tl) for l, t, tl in zip(L, T, TL))
        pl = sum(abs(pc - int(lc)) for pc, lc in zip(p, L))
        pt = sum(abs(pc - int(tc)) for pc, tc in zip(p, T))
        return L if pl < pt else T
    if mode == 12:  # ClampAddSubtractFull
        return tuple(
            min(255, max(0, int(l) + int(t) - int(tl)))
            for l, t, tl in zip(L, T, TL)
        )
    # 13: ClampAddSubtractHalf — the half-step is C integer division
    # (truncates TOWARD ZERO for negatives, unlike Python's floor //)
    a = _avg2(L, T)
    out = []
    for ac, tlc in zip(a, TL):
        d = int(ac) - int(tlc)
        half = d // 2 if d >= 0 else -((-d) // 2)
        out.append(min(255, max(0, int(ac) + half)))
    return tuple(out)


def _predictor_neighbors(px, width, x, y):
    """(L, T, TL, TR) for raster position (x, y) with the edge rules:
    (0,0) has no neighbors (mode is overridden to black there), row 0
    predicts from L only, column 0 from T only, and TR at the right
    edge WRAPS to the row-above's one-past-end pixel — which in raster
    order is the CURRENT row's first (already decoded) pixel, the
    spec/libwebp convention."""
    i = y * width + x
    L = tuple(px[i - 1]) if x > 0 else None
    T = tuple(px[i - width]) if y > 0 else None
    TL = tuple(px[i - width - 1]) if x > 0 and y > 0 else None
    # i - width + 1 at x == width-1 is y*width — the current row's
    # first pixel, i.e. the spec's wrap to top[1] one past the row end
    TR = tuple(px[i - width + 1]) if y > 0 else None
    return L, T, TL, TR


def _effective_mode(mode, x, y):
    if x == 0 and y == 0:
        return 0
    if y == 0:
        return 1  # first row: left only
    if x == 0:
        return 2  # first column: top only
    return mode


def _predictor_inverse(res, width, height, size_bits, bw_, modes):
    out = np.zeros_like(res)
    for y in range(height):
        for x in range(width):
            i = y * width + x
            mode = _effective_mode(
                int(modes[(y >> size_bits) * bw_ + (x >> size_bits)]), x, y
            )
            L, T, TL, TR = _predictor_neighbors(out, width, x, y)
            pred = _predict(mode, L, T, TL, TR)
            out[i] = [
                (int(res[i, c]) + int(pred[c])) & 0xFF for c in range(4)
            ]
    return out


def _ct_delta(t: int, c: int) -> int:
    """ColorTransformDelta (spec §4.2.3): both operands as SIGNED bytes,
    product arithmetic-shifted right 5."""
    ts = t - 256 if t > 127 else t
    cs = c - 256 if c > 127 else c
    return (ts * cs) >> 5


def _cross_color(px, width, height, size_bits, bw_, elems, sign):
    """Apply (+1) or remove (-1) the cross-color transform: per block,
    the transform element pixel carries green_to_red in BLUE,
    green_to_blue in GREEN, red_to_blue in RED (spec layout)."""
    out = px.copy()
    for y in range(height):
        for x in range(width):
            i = y * width + x
            e = elems[(y >> size_bits) * bw_ + (x >> size_bits)]
            g2r, g2b, r2b = int(e[2]), int(e[1]), int(e[0])
            g = int(out[i, 1])
            if sign > 0:  # inverse (decode): red first, then blue uses
                r = (int(out[i, 0]) + _ct_delta(g2r, g)) & 0xFF
                b = (
                    int(out[i, 2]) + _ct_delta(g2b, g) + _ct_delta(r2b, r)
                ) & 0xFF
            else:  # forward (encode): subtract, blue uses the ORIGINAL red
                r0 = int(out[i, 0])
                r = (r0 - _ct_delta(g2r, g)) & 0xFF
                b = (
                    int(out[i, 2]) - _ct_delta(g2b, g) - _ct_delta(r2b, r0)
                ) & 0xFF
            out[i, 0] = r
            out[i, 2] = b
    return out


def _prefix_value_decode(br: _BitReaderLSB, code: int) -> int:
    """The VP8L length/distance prefix-value scheme: codes 0-3 are the
    values 1-4; higher codes carry (code-2)>>1 extra bits (spec §4.2.2)."""
    if code < 4:
        return code + 1
    extra = (code - 2) >> 1
    offset = (2 + (code & 1)) << extra
    return offset + br.read(extra) + 1


def _prefix_value_encode(value: int) -> tuple[int, int, int]:
    """value → (code, extra_bits_value, n_extra_bits)."""
    if value <= 4:
        return value - 1, 0, 0
    v = value - 1
    extra = v.bit_length() - 2
    code = 2 * extra + ((v >> extra) & 1) + 2
    return code, v & ((1 << extra) - 1), extra


def _read_entropy_image(
    br: _BitReaderLSB, width: int, height: int, main: bool = False
) -> "np.ndarray":
    """One entropy-coded VP8L image → (width*height, 4) RGBA array
    (channel layout R,G,B,A), including LZ77 BACKREFERENCES (green
    symbols 256-279: prefix-valued length, then a distance code —
    plain (>120) or through the 120-entry 2D neighbor map —
    pixel-unit copies that may overlap) and the COLOR CACHE (hash-addressed
    recent-pixel dictionary, spec multiplier 0x1e35a7bd; cache symbols
    ride above the literal+length range of the green alphabet), and — for
    the main image — META PREFIX IMAGES: a sub-resolution entropy image
    whose (red<<8 | green) value selects which of several prefix-code
    GROUPS codes each block (the spatial entropy segmentation real
    encoders use on large photos)."""
    cache_bits = br.read(4) if br.read(1) else 0
    meta = None
    if main and br.read(1):
        meta_bits = br.read(3) + 2
        mw = (width + (1 << meta_bits) - 1) >> meta_bits
        mh = (height + (1 << meta_bits) - 1) >> meta_bits
        mimg = _read_entropy_image(br, mw, mh)
        groups_idx = (
            mimg[:, 0].astype(np.int64) << 8
        ) | mimg[:, 1].astype(np.int64)
        meta = (meta_bits, mw, groups_idx)
        n_groups = int(groups_idx.max(initial=0)) + 1
    else:
        n_groups = 1
    cache = [0] * (1 << cache_bits) if cache_bits else None
    green_alpha = _GREEN_ALPHA + (1 << cache_bits if cache_bits else 0)
    groups = []
    for _ in range(n_groups):
        groups.append({
            "g": _read_prefix_code(br, green_alpha),
            "r": _read_prefix_code(br, 256),
            "b": _read_prefix_code(br, 256),
            "a": _read_prefix_code(br, 256),
            "d": _read_prefix_code(br, 40),
        })
    n = width * height
    out = np.zeros((n, 4), dtype=np.uint8)

    def argb(row):
        return (
            (int(row[3]) << 24) | (int(row[0]) << 16)
            | (int(row[1]) << 8) | int(row[2])
        )

    def cache_insert(row):
        if cache is not None:
            cache[(0x1E35A7BD * argb(row) & 0xFFFFFFFF) >> (32 - cache_bits)] = argb(row)

    def group_at(i):
        if meta is None:
            return groups[0]
        meta_bits, mw, gidx = meta
        y, x = divmod(i, width)
        return groups[int(gidx[(y >> meta_bits) * mw + (x >> meta_bits)])]

    i = 0
    while i < n:
        grp = group_at(i)
        g = grp["g"].decode(br)
        if g < 256:
            out[i, 1] = g
            out[i, 0] = grp["r"].decode(br)
            out[i, 2] = grp["b"].decode(br)
            out[i, 3] = grp["a"].decode(br)
            cache_insert(out[i])
            i += 1
            continue
        if g >= _GREEN_ALPHA:  # color cache hit
            if cache is None:
                raise ValueError("corrupt VP8L: cache symbol without cache")
            v = cache[g - _GREEN_ALPHA]
            out[i] = ((v >> 16) & 0xFF, (v >> 8) & 0xFF, v & 0xFF, v >> 24)
            i += 1
            continue
        # backreference: length from the green symbol, then distance —
        # codes 1..120 through the spec's 120-entry 2D neighbor map,
        # codes above 120 as plain linear distances
        length = _prefix_value_decode(br, g - 256)
        dist_code = _prefix_value_decode(br, grp["d"].decode(br))
        distance = _dist_code_to_distance(dist_code, width)
        if distance > i or i + length > n:
            raise ValueError("corrupt VP8L: backreference out of range")
        for k in range(length):  # may overlap (RLE) — copy sequentially
            out[i + k] = out[i + k - distance]
            cache_insert(out[i + k])
        i += length
    return out


def _write_prefix_code(bw: _BitWriterLSB, freqs: dict[int, int], alphabet: int):
    """Emit one prefix code (simple for ≤2 symbols, else normal with a
    full-alphabet length array, no repeats) and return the symbol→
    (code, len) map for the payload phase."""
    syms = sorted(freqs)
    if syms[-1] > 255 and len(syms) < 3:
        # the SIMPLE wire form carries 8-bit symbol fields only; backref
        # length symbols (256+) must ride a NORMAL code — pad to the
        # 3-symbol minimum our normal writer needs
        freqs = dict(freqs)
        for pad in (0, 1):
            if len(freqs) >= 3:
                break
            freqs.setdefault(pad, 0)
        syms = sorted(freqs)
    if len(syms) == 1:
        bw.write(1, 1)  # simple
        bw.write(0, 1)  # one symbol
        bw.write(1, 1)  # 8-bit symbol field
        bw.write(syms[0], 8)
        return {syms[0]: (0, 0)}
    if len(syms) == 2:
        bw.write(1, 1)
        bw.write(1, 1)  # two symbols
        bw.write(1, 1)
        bw.write(syms[0], 8)
        bw.write(syms[1], 8)
        return {syms[0]: (0, 1), syms[1]: (1, 1)}
    bw.write(0, 1)  # normal
    lengths = _assign_lengths(freqs)
    used = sorted(set(lengths.values()) | {0})
    clc_freq = {ln: 1 for ln in used}
    clc_lengths = (
        _assign_lengths(clc_freq) if len(clc_freq) > 1 else {used[0]: 1}
    )
    bw.write(15, 4)  # num_code_lengths = 4 + 15 = 19: all, in order
    for s in CLC_ORDER:
        bw.write(clc_lengths.get(s, 0), 3)
    clc_codes = _canonical_codes(clc_lengths)
    bw.write(0, 1)  # use_max_symbol = 0 → full alphabet length array
    for sym in range(alphabet):
        c, ln = clc_codes[lengths.get(sym, 0)]
        bw.write(_rev(c, ln), ln)
    return {s: (c, ln) for s, (c, ln) in _canonical_codes(lengths).items()}


def _rev(code: int, ln: int) -> int:
    """Canonical codes are defined MSB-first; the LSB-first writer needs
    them bit-reversed so the reader's MSB-accumulating walk sees them in
    definition order."""
    out = 0
    for _ in range(ln):
        out = (out << 1) | (code & 1)
        code >>= 1
    return out


def _write_entropy_pixels(bw: _BitWriterLSB, px: "np.ndarray") -> None:
    """Emit one entropy-coded image body (prefix group + literals) for
    an (n, 4) RGBA array — shared by the main image and the palette
    sub-image. Caller writes the cache/meta bits first."""
    chans = {"g": px[:, 1], "r": px[:, 0], "b": px[:, 2], "a": px[:, 3]}
    freqs = {
        k: {int(v): int(c) for v, c in zip(*np.unique(arr, return_counts=True))}
        for k, arr in chans.items()
    }
    codes = {}
    codes["g"] = _write_prefix_code(bw, freqs["g"], _GREEN_ALPHA)
    codes["r"] = _write_prefix_code(bw, freqs["r"], 256)
    codes["b"] = _write_prefix_code(bw, freqs["b"], 256)
    codes["a"] = _write_prefix_code(bw, freqs["a"], 256)
    _write_prefix_code(bw, {0: 1}, 40)  # distance code: unused single
    for i in range(px.shape[0]):
        for k, col in (("g", 1), ("r", 0), ("b", 2), ("a", 3)):
            c, ln = codes[k][int(px[i, col])]
            if ln:
                bw.write(_rev(c, ln), ln)


def encode_webp_palette(width: int, height: int, rgba: bytes) -> bytes:
    """Encode RGBA pixels as a PALETTE-transformed VP8L WebP (the
    icon/logo class): unique colors become a delta-coded entropy-coded
    sub-image, pixels become indices in the green channel, and palettes
    of ≤16 colors bundle several indices per coded pixel (the spec's
    pixel-bundling width reduction)."""
    if len(rgba) != width * height * 4:
        raise ValueError("rgba length must be width*height*4")
    px = np.frombuffer(rgba, dtype=np.uint8).reshape(-1, 4)
    colors, idx = np.unique(px, axis=0, return_inverse=True)
    size = colors.shape[0]
    if size > 256:
        raise ValueError("palette encoding needs <= 256 distinct colors")
    bw = _BitWriterLSB()
    bw.write(width - 1, 14)
    bw.write(height - 1, 14)
    bw.write(1 if (px[:, 3] != 255).any() else 0, 1)
    bw.write(0, 3)  # version
    bw.write(1, 1)  # one transform
    bw.write(3, 2)  # COLOR_INDEXING
    bw.write(size - 1, 8)
    # transform payload: the palette as a delta-coded entropy sub-image
    # (cache bit + body; sub-images carry no meta bit)
    deltas = (
        np.diff(
            np.vstack(
                [np.zeros((1, 4), dtype=np.int64), colors.astype(np.int64)]
            ),
            axis=0,
        )
        & 0xFF
    ).astype(np.uint8)
    bw.write(0, 1)  # palette image: no color cache
    _write_entropy_pixels(bw, deltas)
    bw.write(0, 1)  # end of transform list
    # main image: bundled indices in the green channel
    xbits = 3 if size <= 2 else 2 if size <= 4 else 1 if size <= 16 else 0
    per = 1 << xbits
    bpp = 8 >> xbits if xbits else 8
    coded_w = (width + per - 1) >> xbits if xbits else width
    grid = idx.reshape(height, width)
    packed = np.zeros((height, coded_w), dtype=np.int64)
    for y in range(height):
        for cx in range(coded_w):
            v = 0
            for s in range(per):
                x = cx * per + s
                if x < width:
                    v |= int(grid[y, x]) << (s * bpp)
            packed[y, cx] = v
    main = np.zeros((height * coded_w, 4), dtype=np.uint8)
    main[:, 1] = packed.reshape(-1)
    bw.write(0, 1)  # main: no color cache
    bw.write(0, 1)  # main: no meta prefix
    _write_entropy_pixels(bw, main)
    body = b"\x2f" + bw.flush()
    chunk = b"VP8L" + struct.pack("<I", len(body)) + body
    if len(body) % 2:
        chunk += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk


def encode_webp_lossless(
    width: int, height: int, rgba: bytes, subtract_green: bool = False
) -> bytes:
    """Encode RGBA pixels as a literal-coded VP8L WebP (no cache, no
    backrefs — bit-exact by construction). ``subtract_green`` applies
    the spec's cheapest transform (red/blue stored minus green mod 256
    — the decorrelation real encoders almost always pick), exercising
    the decoder's transform list."""
    if len(rgba) != width * height * 4:
        raise ValueError("rgba length must be width*height*4")
    if width > 16384 or height > 16384:
        raise ValueError("VP8L dimensions are 14-bit")
    px = np.frombuffer(rgba, dtype=np.uint8).reshape(-1, 4).copy()
    bw = _BitWriterLSB()
    bw.write(width - 1, 14)
    bw.write(height - 1, 14)
    bw.write(1 if (px[:, 3] != 255).any() else 0, 1)
    bw.write(0, 3)  # version
    if subtract_green:
        g = px[:, 1].astype(np.int64)
        px[:, 0] = ((px[:, 0].astype(np.int64) - g) & 0xFF).astype(np.uint8)
        px[:, 2] = ((px[:, 2].astype(np.int64) - g) & 0xFF).astype(np.uint8)
        bw.write(1, 1)  # one transform follows
        bw.write(2, 2)  # TRANSFORM_SUBTRACT_GREEN
    bw.write(0, 1)  # end of transform list
    bw.write(0, 1)  # no color cache
    bw.write(0, 1)  # no meta prefix
    _write_entropy_pixels(bw, px)
    body = b"\x2f" + bw.flush()
    chunk = b"VP8L" + struct.pack("<I", len(body)) + body
    if len(body) % 2:
        chunk += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk


def encode_webp_rle(width: int, height: int, rgba: bytes) -> bytes:
    """Encode RGBA pixels as VP8L with RUN-LENGTH backreferences:
    runs of ≥ 4 identical pixels become LZ77 copies at distance 1
    (length via the prefix-value scheme on green symbols 256+,
    plain distance code 121 = distance 1) — the compression layer the
    literal encoder leaves on the table, and the decode path real
    encoders exercise constantly."""
    if len(rgba) != width * height * 4:
        raise ValueError("rgba length must be width*height*4")
    px = np.frombuffer(rgba, dtype=np.uint8).reshape(-1, 4)
    n = px.shape[0]
    # tokenize: ("lit", i) | ("ref", length)
    tokens: list[tuple[str, int]] = []
    i = 0
    while i < n:
        run = 1
        while i + run < n and run < 4096 and (px[i + run] == px[i]).all():
            run += 1
        tokens.append(("lit", i))
        if run >= 4:
            tokens.append(("ref", run - 1))
            i += run
        else:
            i += 1
    # symbol frequencies (green carries literals AND length codes)
    freqs = {k: {} for k in ("g", "r", "b", "a", "d")}

    def bump(ch, sym):
        freqs[ch][sym] = freqs[ch].get(sym, 0) + 1

    dist_sym = _prefix_value_encode(1 + 120)[0]
    for kind, v in tokens:
        if kind == "lit":
            bump("g", int(px[v, 1]))
            bump("r", int(px[v, 0]))
            bump("b", int(px[v, 2]))
            bump("a", int(px[v, 3]))
        else:
            bump("g", 256 + _prefix_value_encode(v)[0])
            bump("d", dist_sym)
    if not freqs["d"]:
        return encode_webp_lossless(width, height, rgba)
    for ch in ("r", "b", "a"):
        if not freqs[ch]:  # all-run image edge: ensure non-empty codes
            freqs[ch] = {0: 1}
    bw = _BitWriterLSB()
    bw.write(width - 1, 14)
    bw.write(height - 1, 14)
    bw.write(1 if (px[:, 3] != 255).any() else 0, 1)
    bw.write(0, 3)  # version
    bw.write(0, 1)  # no transforms
    bw.write(0, 1)  # no color cache
    bw.write(0, 1)  # no meta prefix
    codes = {}
    codes["g"] = _write_prefix_code(bw, freqs["g"], _GREEN_ALPHA)
    codes["r"] = _write_prefix_code(bw, freqs["r"], 256)
    codes["b"] = _write_prefix_code(bw, freqs["b"], 256)
    codes["a"] = _write_prefix_code(bw, freqs["a"], 256)
    codes["d"] = _write_prefix_code(bw, freqs["d"], 40)

    def emit(ch, sym):
        c, ln = codes[ch][sym]
        if ln:
            bw.write(_rev(c, ln), ln)

    for kind, v in tokens:
        if kind == "lit":
            emit("g", int(px[v, 1]))
            emit("r", int(px[v, 0]))
            emit("b", int(px[v, 2]))
            emit("a", int(px[v, 3]))
        else:
            code, extra_v, extra_n = _prefix_value_encode(v)
            emit("g", 256 + code)
            if extra_n:
                bw.write(extra_v, extra_n)
            dcode, dextra_v, dextra_n = _prefix_value_encode(121)
            emit("d", dcode)
            if dextra_n:
                bw.write(dextra_v, dextra_n)
    body = b"\x2f" + bw.flush()
    chunk = b"VP8L" + struct.pack("<I", len(body)) + body
    if len(body) % 2:
        chunk += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk


def encode_webp_neighbor(width: int, height: int, rgba: bytes) -> bytes:
    """Encode RGBA pixels as VP8L with NEIGHBOR-MAP distance codes:
    runs of pixels equal to the pixel directly ABOVE (distance =
    width) become LZ77 copies addressed through the spec's 120-entry
    2D distance table — (dx=0, dy=1) is code 1, the cheapest wire
    distance real encoders use constantly for vertically-coherent
    images. Exercises the decode path plain-distance streams never
    touch."""
    if len(rgba) != width * height * 4:
        raise ValueError("rgba length must be width*height*4")
    px = np.frombuffer(rgba, dtype=np.uint8).reshape(-1, 4)
    n = px.shape[0]
    # tokenize: ("lit", i) | ("ref", length) — copies at distance=width
    tokens: list[tuple[str, int]] = []
    i = 0
    while i < n:
        if i >= width and (px[i] == px[i - width]).all():
            run = 1
            while (
                i + run < n and run < 4096
                and (px[i + run] == px[i + run - width]).all()
            ):
                run += 1
            if run >= 4:
                tokens.append(("ref", run))
                i += run
                continue
        tokens.append(("lit", i))
        i += 1
    if not any(k == "ref" for k, _ in tokens):
        return encode_webp_lossless(width, height, rgba)
    dist_code = _distance_to_dist_code(width, width)  # (0,1) → code 1
    dist_sym = _prefix_value_encode(dist_code)[0]
    freqs = {k: {} for k in ("g", "r", "b", "a", "d")}

    def bump(ch, sym):
        freqs[ch][sym] = freqs[ch].get(sym, 0) + 1

    for kind, v in tokens:
        if kind == "lit":
            bump("g", int(px[v, 1]))
            bump("r", int(px[v, 0]))
            bump("b", int(px[v, 2]))
            bump("a", int(px[v, 3]))
        else:
            bump("g", 256 + _prefix_value_encode(v)[0])
            bump("d", dist_sym)
    for ch in ("r", "b", "a"):
        if not freqs[ch]:  # all-copy image edge: ensure non-empty codes
            freqs[ch] = {0: 1}
    bw = _BitWriterLSB()
    bw.write(width - 1, 14)
    bw.write(height - 1, 14)
    bw.write(1 if (px[:, 3] != 255).any() else 0, 1)
    bw.write(0, 3)  # version
    bw.write(0, 1)  # no transforms
    bw.write(0, 1)  # no color cache
    bw.write(0, 1)  # no meta prefix
    codes = {}
    codes["g"] = _write_prefix_code(bw, freqs["g"], _GREEN_ALPHA)
    codes["r"] = _write_prefix_code(bw, freqs["r"], 256)
    codes["b"] = _write_prefix_code(bw, freqs["b"], 256)
    codes["a"] = _write_prefix_code(bw, freqs["a"], 256)
    codes["d"] = _write_prefix_code(bw, freqs["d"], 40)

    def emit(ch, sym):
        c, ln = codes[ch][sym]
        if ln:
            bw.write(_rev(c, ln), ln)

    for kind, v in tokens:
        if kind == "lit":
            emit("g", int(px[v, 1]))
            emit("r", int(px[v, 0]))
            emit("b", int(px[v, 2]))
            emit("a", int(px[v, 3]))
        else:
            code, extra_v, extra_n = _prefix_value_encode(v)
            emit("g", 256 + code)
            if extra_n:
                bw.write(extra_v, extra_n)
            dcode, dextra_v, dextra_n = _prefix_value_encode(dist_code)
            emit("d", dcode)
            if dextra_n:
                bw.write(dextra_v, dextra_n)
    body = b"\x2f" + bw.flush()
    chunk = b"VP8L" + struct.pack("<I", len(body)) + body
    if len(body) % 2:
        chunk += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk


def encode_webp_cached(
    width: int, height: int, rgba: bytes, cache_bits: int = 6
) -> bytes:
    """Encode RGBA pixels as VP8L with a COLOR CACHE: each pixel whose
    ARGB value sits at its hash slot ((0x1e35a7bd·argb) >> (32-bits))
    becomes a single cache symbol instead of four literals — the
    recent-color dictionary that makes palette-ish photos cheap for
    real encoders. Literals update the cache exactly as the decoder
    replays them."""
    if not 1 <= cache_bits <= 11:
        raise ValueError("cache_bits must be in 1..11")
    if len(rgba) != width * height * 4:
        raise ValueError("rgba length must be width*height*4")
    px = np.frombuffer(rgba, dtype=np.uint8).reshape(-1, 4)
    n = px.shape[0]
    size = 1 << cache_bits
    cache = [0] * size
    tokens: list[tuple[str, int]] = []  # ("lit", i) | ("cache", idx)
    for i in range(n):
        argb = (
            (int(px[i, 3]) << 24) | (int(px[i, 0]) << 16)
            | (int(px[i, 1]) << 8) | int(px[i, 2])
        )
        idx = (0x1E35A7BD * argb & 0xFFFFFFFF) >> (32 - cache_bits)
        if cache[idx] == argb and i > 0:
            tokens.append(("cache", idx))
        else:
            tokens.append(("lit", i))
            cache[idx] = argb
    freqs = {k: {} for k in ("g", "r", "b", "a")}
    for kind, v in tokens:
        if kind == "lit":
            for ch, col in (("g", 1), ("r", 0), ("b", 2), ("a", 3)):
                sym = int(px[v, col]) if ch != "g" else int(px[v, 1])
                freqs[ch][sym] = freqs[ch].get(sym, 0) + 1
        else:
            sym = _GREEN_ALPHA + v
            freqs["g"][sym] = freqs["g"].get(sym, 0) + 1
    for ch in ("r", "b", "a"):
        if not freqs[ch]:
            freqs[ch] = {0: 1}
    bw = _BitWriterLSB()
    bw.write(width - 1, 14)
    bw.write(height - 1, 14)
    bw.write(1 if (px[:, 3] != 255).any() else 0, 1)
    bw.write(0, 3)  # version
    bw.write(0, 1)  # no transforms
    bw.write(1, 1)  # color cache present
    bw.write(cache_bits, 4)
    bw.write(0, 1)  # no meta prefix
    codes = {}
    codes["g"] = _write_prefix_code(bw, freqs["g"], _GREEN_ALPHA + size)
    codes["r"] = _write_prefix_code(bw, freqs["r"], 256)
    codes["b"] = _write_prefix_code(bw, freqs["b"], 256)
    codes["a"] = _write_prefix_code(bw, freqs["a"], 256)
    _write_prefix_code(bw, {0: 1}, 40)  # distance code: unused single

    def emit(ch, sym):
        c, ln = codes[ch][sym]
        if ln:
            bw.write(_rev(c, ln), ln)

    for kind, v in tokens:
        if kind == "lit":
            emit("g", int(px[v, 1]))
            emit("r", int(px[v, 0]))
            emit("b", int(px[v, 2]))
            emit("a", int(px[v, 3]))
        else:
            emit("g", _GREEN_ALPHA + v)
    body = b"\x2f" + bw.flush()
    chunk = b"VP8L" + struct.pack("<I", len(body)) + body
    if len(body) % 2:
        chunk += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk


def encode_webp_extended(
    width: int, height: int, rgba: bytes, metadata: bytes = b""
) -> bytes:
    """Wrap a lossless VP8L image in the EXTENDED (VP8X) container —
    the wire shape real files use whenever EXIF/XMP/ICC metadata or
    animation flags are present. Layout: VP8X chunk (feature flags +
    24-bit canvas-minus-one dims), optional EXIF chunk carrying
    ``metadata``, then the VP8L image chunk the decoder walks to."""
    inner = encode_webp_lossless(width, height, rgba)
    vp8l_chunk = inner[12:]  # 'VP8L' + size + body (+ pad)
    flags = 0x08 if metadata else 0  # EXIF flag bit (spec: bit 3)
    vp8x = b"VP8X" + struct.pack("<I", 10) + bytes([flags, 0, 0, 0]) + (
        struct.pack("<I", width - 1)[:3] + struct.pack("<I", height - 1)[:3]
    )
    exif = b""
    if metadata:
        exif = b"EXIF" + struct.pack("<I", len(metadata)) + metadata
        if len(metadata) % 2:
            exif += b"\x00"
    content = vp8x + exif + vp8l_chunk
    return b"RIFF" + struct.pack("<I", 4 + len(content)) + b"WEBP" + content


def encode_webp_combined(
    width: int, height: int, rgba: bytes, cache_bits: int = 6
) -> bytes:
    """Encode RGBA pixels with THREE coding tools in ONE stream —
    SUBTRACT-GREEN transform + COLOR CACHE + LZ77 backreferences
    (distance 1 via NEIGHBOR code 2) — the tool interaction real
    libwebp output exhibits constantly but the single-tool wire
    classes never exercise together: cache symbols ride above the
    literal+length green range, backref-copied pixels must be
    replayed into the cache exactly as the decoder does, and the
    transform inverts after entropy decode."""
    if not 1 <= cache_bits <= 11:
        raise ValueError("cache_bits must be in 1..11")
    if len(rgba) != width * height * 4:
        raise ValueError("rgba length must be width*height*4")
    px = np.frombuffer(rgba, dtype=np.uint8).reshape(-1, 4).copy()
    has_alpha = bool((px[:, 3] != 255).any())
    # subtract-green on the stored samples (decoder adds back last)
    g = px[:, 1].astype(np.int64)
    px[:, 0] = ((px[:, 0].astype(np.int64) - g) & 0xFF).astype(np.uint8)
    px[:, 2] = ((px[:, 2].astype(np.int64) - g) & 0xFF).astype(np.uint8)
    n = px.shape[0]
    size = 1 << cache_bits
    cache = [0] * size

    def argb_of(i):
        return (
            (int(px[i, 3]) << 24) | (int(px[i, 0]) << 16)
            | (int(px[i, 1]) << 8) | int(px[i, 2])
        )

    def slot(v):
        return (0x1E35A7BD * v & 0xFFFFFFFF) >> (32 - cache_bits)

    # tokenize replaying the decoder's exact cache discipline
    tokens: list[tuple[str, int]] = []  # ("lit", i)|("cache", slot)|("ref", len)
    i = 0
    while i < n:
        run = 1
        while i + run < n and run < 4096 and (px[i + run] == px[i]).all():
            run += 1
        # pixel i itself: cache hit or literal
        v = argb_of(i)
        s = slot(v)
        if i > 0 and cache[s] == v:
            tokens.append(("cache", s))
        else:
            tokens.append(("lit", i))
            cache[s] = v
        if run >= 5:  # first pixel emitted above, copy the rest
            tokens.append(("ref", run - 1))
            # decoder inserts every COPIED pixel into the cache
            for k in range(1, run):
                vv = argb_of(i + k)
                cache[slot(vv)] = vv
            i += run
        else:
            i += 1
    dist_code = _distance_to_dist_code(1, width)  # (1,0) → neighbor code 2
    dist_sym = _prefix_value_encode(dist_code)[0]
    freqs = {k: {} for k in ("g", "r", "b", "a", "d")}

    def bump(ch, sym):
        freqs[ch][sym] = freqs[ch].get(sym, 0) + 1

    for kind, v in tokens:
        if kind == "lit":
            bump("g", int(px[v, 1]))
            bump("r", int(px[v, 0]))
            bump("b", int(px[v, 2]))
            bump("a", int(px[v, 3]))
        elif kind == "cache":
            bump("g", _GREEN_ALPHA + v)
        else:
            bump("g", 256 + _prefix_value_encode(v)[0])
            bump("d", dist_sym)
    for ch in ("r", "b", "a"):
        if not freqs[ch]:
            freqs[ch] = {0: 1}
    if not freqs["d"]:
        freqs["d"] = {0: 1}
    bw = _BitWriterLSB()
    bw.write(width - 1, 14)
    bw.write(height - 1, 14)
    bw.write(1 if has_alpha else 0, 1)
    bw.write(0, 3)  # version
    bw.write(1, 1)  # one transform follows
    bw.write(2, 2)  # TRANSFORM_SUBTRACT_GREEN
    bw.write(0, 1)  # end of transform list
    bw.write(1, 1)  # color cache present
    bw.write(cache_bits, 4)
    bw.write(0, 1)  # no meta prefix
    codes = {}
    codes["g"] = _write_prefix_code(bw, freqs["g"], _GREEN_ALPHA + size)
    codes["r"] = _write_prefix_code(bw, freqs["r"], 256)
    codes["b"] = _write_prefix_code(bw, freqs["b"], 256)
    codes["a"] = _write_prefix_code(bw, freqs["a"], 256)
    codes["d"] = _write_prefix_code(bw, freqs["d"], 40)

    def emit(ch, sym):
        c, ln = codes[ch][sym]
        if ln:
            bw.write(_rev(c, ln), ln)

    for kind, v in tokens:
        if kind == "lit":
            emit("g", int(px[v, 1]))
            emit("r", int(px[v, 0]))
            emit("b", int(px[v, 2]))
            emit("a", int(px[v, 3]))
        elif kind == "cache":
            emit("g", _GREEN_ALPHA + v)
        else:
            code, extra_v, extra_n = _prefix_value_encode(v)
            emit("g", 256 + code)
            if extra_n:
                bw.write(extra_v, extra_n)
            dcode, dextra_v, dextra_n = _prefix_value_encode(dist_code)
            emit("d", dcode)
            if dextra_n:
                bw.write(dextra_v, dextra_n)
    body = b"\x2f" + bw.flush()
    chunk = b"VP8L" + struct.pack("<I", len(body)) + body
    if len(body) % 2:
        chunk += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk


def encode_webp_predicted(
    width: int, height: int, rgba: bytes, size_bits: int = 4
) -> bytes:
    """Encode RGBA pixels as a PREDICTOR-transformed VP8L: per block
    (2^size_bits square) the mode with the smallest absolute residual
    mass is chosen from all 14 spec predictors, the mode map rides its
    own entropy-coded sub-image, and the main image carries residuals
    mod 256 — the transform real photographic WebPs lead with."""
    if not 2 <= size_bits <= 9:
        raise ValueError("size_bits must be in 2..9")
    if len(rgba) != width * height * 4:
        raise ValueError("rgba length must be width*height*4")
    px = np.frombuffer(rgba, dtype=np.uint8).reshape(-1, 4)
    bw_ = (width + (1 << size_bits) - 1) >> size_bits
    bh_ = (height + (1 << size_bits) - 1) >> size_bits
    modes = np.zeros(bw_ * bh_, dtype=np.uint8)
    res = np.zeros_like(px)
    for by in range(bh_):
        for bx in range(bw_):
            x0, y0 = bx << size_bits, by << size_bits
            x1 = min(x0 + (1 << size_bits), width)
            y1 = min(y0 + (1 << size_bits), height)
            best_mode, best_cost = 0, None
            for mode in range(14):
                cost = 0
                for y in range(y0, y1):
                    for x in range(x0, x1):
                        i = y * width + x
                        m = _effective_mode(mode, x, y)
                        L, T, TL, TR = _predictor_neighbors(px, width, x, y)
                        pred = _predict(m, L, T, TL, TR)
                        for c in range(4):
                            d = (int(px[i, c]) - int(pred[c])) & 0xFF
                            cost += min(d, 256 - d)
                if best_cost is None or cost < best_cost:
                    best_mode, best_cost = mode, cost
            modes[by * bw_ + bx] = best_mode
            for y in range(y0, y1):
                for x in range(x0, x1):
                    i = y * width + x
                    m = _effective_mode(best_mode, x, y)
                    L, T, TL, TR = _predictor_neighbors(px, width, x, y)
                    pred = _predict(m, L, T, TL, TR)
                    res[i] = [
                        (int(px[i, c]) - int(pred[c])) & 0xFF for c in range(4)
                    ]
    bw = _BitWriterLSB()
    bw.write(width - 1, 14)
    bw.write(height - 1, 14)
    bw.write(1 if (px[:, 3] != 255).any() else 0, 1)
    bw.write(0, 3)  # version
    bw.write(1, 1)  # one transform
    bw.write(0, 2)  # PREDICTOR_TRANSFORM
    bw.write(size_bits - 2, 3)
    mode_img = np.zeros((bw_ * bh_, 4), dtype=np.uint8)
    mode_img[:, 1] = modes
    mode_img[:, 3] = 255
    bw.write(0, 1)  # mode image: no color cache
    _write_entropy_pixels(bw, mode_img)
    bw.write(0, 1)  # end of transform list
    bw.write(0, 1)  # main: no color cache
    bw.write(0, 1)  # main: no meta prefix
    _write_entropy_pixels(bw, res)
    body = b"\x2f" + bw.flush()
    chunk = b"VP8L" + struct.pack("<I", len(body)) + body
    if len(body) % 2:
        chunk += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk


def encode_webp_cross_color(
    width: int, height: int, rgba: bytes,
    g2r: int = 40, g2b: int = 24, r2b: int = 16, size_bits: int = 4,
) -> bytes:
    """Encode RGBA pixels with the CROSS-COLOR transform: fixed signed
    multipliers (green_to_red / green_to_blue / red_to_blue) decorrelate
    the channels before literal coding; the per-block element map rides
    its own entropy-coded sub-image (constant here — real encoders fit
    per block; the wire shape is identical)."""
    if not 2 <= size_bits <= 9:
        raise ValueError("size_bits must be in 2..9")
    if len(rgba) != width * height * 4:
        raise ValueError("rgba length must be width*height*4")
    px = np.frombuffer(rgba, dtype=np.uint8).reshape(-1, 4)
    bw_ = (width + (1 << size_bits) - 1) >> size_bits
    bh_ = (height + (1 << size_bits) - 1) >> size_bits
    elems = np.zeros((bw_ * bh_, 4), dtype=np.uint8)
    elems[:, 2] = g2r & 0xFF
    elems[:, 1] = g2b & 0xFF
    elems[:, 0] = r2b & 0xFF
    elems[:, 3] = 255
    res = _cross_color(px, width, height, size_bits, bw_, elems, -1)
    bw = _BitWriterLSB()
    bw.write(width - 1, 14)
    bw.write(height - 1, 14)
    bw.write(1 if (px[:, 3] != 255).any() else 0, 1)
    bw.write(0, 3)  # version
    bw.write(1, 1)  # one transform
    bw.write(1, 2)  # CROSS_COLOR_TRANSFORM
    bw.write(size_bits - 2, 3)
    bw.write(0, 1)  # element image: no color cache
    _write_entropy_pixels(bw, elems)
    bw.write(0, 1)  # end of transform list
    bw.write(0, 1)  # main: no color cache
    bw.write(0, 1)  # main: no meta prefix
    _write_entropy_pixels(bw, res)
    body = b"\x2f" + bw.flush()
    chunk = b"VP8L" + struct.pack("<I", len(body)) + body
    if len(body) % 2:
        chunk += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk


def encode_webp_meta(
    width: int, height: int, rgba: bytes, meta_bits: int = 3
) -> bytes:
    """Encode RGBA pixels with a META PREFIX IMAGE: the image splits
    into left/right halves at block granularity, each half coded by its
    OWN prefix-code group fitted to its pixel statistics — the spatial
    entropy segmentation large photos use (sky blocks vs texture
    blocks). The meta sub-image carries the group index in
    (red<<8|green)."""
    if not 2 <= meta_bits <= 9:
        raise ValueError("meta_bits must be in 2..9")
    if len(rgba) != width * height * 4:
        raise ValueError("rgba length must be width*height*4")
    px = np.frombuffer(rgba, dtype=np.uint8).reshape(-1, 4)
    mw = (width + (1 << meta_bits) - 1) >> meta_bits
    mh = (height + (1 << meta_bits) - 1) >> meta_bits
    # group 0 = left-half blocks, group 1 = right-half blocks
    gidx = np.zeros(mw * mh, dtype=np.int64)
    for my in range(mh):
        for mx in range(mw):
            gidx[my * mw + mx] = 1 if mx >= mw // 2 else 0
    n_groups = int(gidx.max()) + 1

    def pixel_group(i):
        y, x = divmod(i, width)
        return int(gidx[(y >> meta_bits) * mw + (x >> meta_bits)])

    freqs = [
        {"g": {}, "r": {}, "b": {}, "a": {}} for _ in range(n_groups)
    ]
    for i in range(px.shape[0]):
        f = freqs[pixel_group(i)]
        for ch, col in (("g", 1), ("r", 0), ("b", 2), ("a", 3)):
            sym = int(px[i, col])
            f[ch][sym] = f[ch].get(sym, 0) + 1
    bw = _BitWriterLSB()
    bw.write(width - 1, 14)
    bw.write(height - 1, 14)
    bw.write(1 if (px[:, 3] != 255).any() else 0, 1)
    bw.write(0, 3)  # version
    bw.write(0, 1)  # no transforms
    bw.write(0, 1)  # no color cache
    bw.write(1, 1)  # meta prefix image present
    bw.write(meta_bits - 2, 3)
    mimg = np.zeros((mw * mh, 4), dtype=np.uint8)
    mimg[:, 0] = (gidx >> 8).astype(np.uint8)
    mimg[:, 1] = (gidx & 0xFF).astype(np.uint8)
    mimg[:, 3] = 255
    bw.write(0, 1)  # meta image: no color cache
    _write_entropy_pixels(bw, mimg)
    codes = []
    for f in freqs:
        for ch in ("g", "r", "b", "a"):
            if not f[ch]:  # a group with no pixels (e.g. 1-block-wide
                f[ch] = {0: 1}  # images): emit a valid dummy code
        grp = {}
        grp["g"] = _write_prefix_code(bw, f["g"], _GREEN_ALPHA)
        grp["r"] = _write_prefix_code(bw, f["r"], 256)
        grp["b"] = _write_prefix_code(bw, f["b"], 256)
        grp["a"] = _write_prefix_code(bw, f["a"], 256)
        _write_prefix_code(bw, {0: 1}, 40)
        codes.append(grp)
    for i in range(px.shape[0]):
        grp = codes[pixel_group(i)]
        for ch, col in (("g", 1), ("r", 0), ("b", 2), ("a", 3)):
            c, ln = grp[ch][int(px[i, col])]
            if ln:
                bw.write(_rev(c, ln), ln)
    body = b"\x2f" + bw.flush()
    chunk = b"VP8L" + struct.pack("<I", len(body)) + body
    if len(body) % 2:
        chunk += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk
