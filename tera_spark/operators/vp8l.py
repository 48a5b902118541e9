"""WebP-lossless (VP8L) codec, pure stdlib + numpy — the fourth REAL
image tier next to PNG, baseline JPEG (operators/jpeg.py) and GIF
(operators/gif.py).

Decoder: full bitstream per the public "WebP Lossless Bitstream
Specification" (Google, 2012-2023) — RIFF/WEBP container walk (VP8L
direct or inside VP8X), LSB-first bit reading, simple and
code-length-coded Huffman trees, meta-Huffman (Huffman image), color
cache, LZ77 backward references with the 2D distance mapping, and all
four inverse transforms applied in reverse order: PREDICTOR (14 modes,
per-block), COLOR (cross-channel deltas), SUBTRACT_GREEN, and
COLOR_INDEXING (palette, incl. sub-byte pixel bundling for palettes
<= 16). VP8 (lossy) payloads are out of scope — they need a full DCT
codec and arithmetic decoder; decode_image keeps raising for them.

Encoder (fixture tier, like the GIF encoder): ARGB in, valid VP8L out.
Emits flat 8-bit literal Huffman trees via the code-length path (one
'8' + repeat-16s, a two-symbol code-length code), optionally behind a
SUBTRACT_GREEN transform, a color cache, or run-length LZ77 copies of
the left neighbor — so round-trips drive the decoder's simple-code,
code-length, cache, LZ77 and transform paths with oracle-checkable
fixtures and zero binary assets. Lossless: decode(encode(px)) == px
for ANY content.

Everything here is public knowledge (RIFF container spec; the VP8L
bitstream spec and its reference constants — code-length code order,
distance mapping table, prefix-coded length/distance scheme — are all
in the published specification).
"""

from __future__ import annotations

import struct

import numpy as np

# code-length-code order (spec section 6.2.2 / kCodeLengthCodeOrder)
_CLC_ORDER = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)

# the 120-entry 2D neighborhood for short distance codes (spec 6.2.3):
# (dx, dy) pairs ordered by the spec's distance map
_DIST_MAP = (
    (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
    (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
    (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
    (1, 4), (-1, 4), (4, 1), (-4, 1), (3, 3), (-3, 3), (2, 4), (-2, 4),
    (4, 2), (-4, 2), (0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0),
    (1, 5), (-1, 5), (5, 1), (-5, 1), (2, 5), (-2, 5), (5, 2), (-5, 2),
    (4, 4), (-4, 4), (3, 5), (-3, 5), (5, 3), (-5, 3), (0, 6), (6, 0),
    (1, 6), (-1, 6), (6, 1), (-6, 1), (2, 6), (-2, 6), (6, 2), (-6, 2),
    (4, 5), (-4, 5), (5, 4), (-5, 4), (3, 6), (-3, 6), (6, 3), (-6, 3),
    (0, 7), (7, 0), (1, 7), (-1, 7), (5, 5), (-5, 5), (7, 1), (-7, 1),
    (4, 6), (-4, 6), (6, 4), (-6, 4), (2, 7), (-2, 7), (7, 2), (-7, 2),
    (3, 7), (-3, 7), (7, 3), (-7, 3), (5, 6), (-5, 6), (6, 5), (-6, 5),
    (8, 0), (4, 7), (-4, 7), (7, 4), (-7, 4), (8, 1), (8, 2), (6, 6),
    (-6, 6), (8, 3), (5, 7), (-5, 7), (7, 5), (-7, 5), (8, 4), (6, 7),
    (-6, 7), (7, 6), (-7, 6), (8, 5), (7, 7), (-7, 7), (8, 6), (8, 7),
)


class _BitReader:
    """LSB-first bit reader (VP8L convention)."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0  # bit position

    def read(self, n: int) -> int:
        v = 0
        for i in range(n):
            byte = self.pos >> 3
            if byte >= len(self.data):
                raise ValueError("VP8L: bitstream truncated")
            v |= ((self.data[byte] >> (self.pos & 7)) & 1) << i
            self.pos += 1
        return v


class _Huffman:
    """Canonical Huffman decoder from code lengths (MSB-first codes,
    as the spec assigns them), read bit-by-bit off the LSB-first
    stream. Table is a dict code->(symbol) keyed by (length, code)."""

    __slots__ = ("table", "single")

    def __init__(self, lengths: list[int]):
        self.single: int | None = None
        nz = [(l, s) for s, l in enumerate(lengths) if l > 0]
        if len(nz) == 1:
            self.single = nz[0][1]
            self.table = {}
            return
        # canonical assignment: shorter codes first, then symbol order
        self.table = {}
        code = 0
        for bit_len in range(1, max((l for l, _ in nz), default=0) + 1):
            for length, sym in nz:
                if length == bit_len:
                    self.table[(bit_len, code)] = sym
                    code += 1
            code <<= 1

    def read(self, br: _BitReader) -> int:
        if self.single is not None:
            return self.single
        code = 0
        length = 0
        while True:
            code = (code << 1) | br.read(1)
            length += 1
            sym = self.table.get((length, code))
            if sym is not None:
                return sym
            if length > 15:
                raise ValueError("VP8L: invalid Huffman code")


def _read_code_lengths(br: _BitReader, alphabet_size: int) -> list[int]:
    """One Huffman code: 'simple' (1-2 symbols) or code-length-coded
    (spec 6.2.2). Returns the per-symbol code lengths."""
    if br.read(1):  # simple code
        n_syms = br.read(1) + 1
        first_8 = br.read(1)
        lengths = [0] * alphabet_size
        s0 = br.read(8 if first_8 else 1)
        if s0 >= alphabet_size:
            raise ValueError("VP8L: simple-code symbol out of alphabet")
        lengths[s0] = 1
        if n_syms == 2:
            s1 = br.read(8)
            if s1 >= alphabet_size:
                raise ValueError("VP8L: simple-code symbol out of alphabet")
            lengths[s1] = 1
        return lengths
    # code-length code
    n_codes = br.read(4) + 4
    clc_lengths = [0] * 19
    for i in range(n_codes):
        clc_lengths[_CLC_ORDER[i]] = br.read(3)
    clc = _Huffman(clc_lengths)
    if br.read(1):  # limited symbol count
        length_nbits = 2 + 2 * br.read(3)
        max_symbol = 2 + br.read(length_nbits)
    else:
        max_symbol = alphabet_size
    lengths = [0] * alphabet_size
    prev = 8
    i = 0
    while i < alphabet_size:
        if max_symbol == 0:
            break
        max_symbol -= 1
        s = clc.read(br)
        if s < 16:
            lengths[i] = s
            i += 1
            if s:
                prev = s
        elif s == 16:
            for _ in range(3 + br.read(2)):
                if i < alphabet_size:
                    lengths[i] = prev
                    i += 1
        elif s == 17:
            i += 3 + br.read(3)
        else:  # 18
            i += 11 + br.read(7)
    return lengths


def _prefix_decode(br: _BitReader, code: int) -> int:
    """Length/distance prefix coding (spec 6.2.3): codes 0-3 literal
    1-4; above that, extra bits."""
    if code < 4:
        return code + 1
    extra = (code - 2) >> 1
    offset = (2 + (code & 1)) << extra
    return offset + br.read(extra) + 1


_GROUP_ALPHABETS = (280, 256, 256, 256, 40)  # green+len, R, B, A, dist


def _read_huffman_group(br: _BitReader, cache_bits: int) -> list[_Huffman]:
    sizes = list(_GROUP_ALPHABETS)
    sizes[0] += (1 << cache_bits) if cache_bits else 0
    return [_Huffman(_read_code_lengths(br, n)) for n in sizes]


def _div_round_up(a: int, b: int) -> int:
    return (a + b - 1) // b


def _decode_entropy_image(
    br: _BitReader, width: int, height: int, *, is_main: bool
) -> np.ndarray:
    """Decode one VP8L entropy-coded ARGB image (spec section 5/6) to
    an (h, w, 4) uint8 array in [A, R, G, B] channel order. Transform
    and meta-huffman sub-images recurse here with is_main=False."""
    huff_img = None
    huff_bits = 0
    n_groups = 1
    if is_main and br.read(1):  # meta-huffman present
        huff_bits = br.read(3) + 2
        hw = _div_round_up(width, 1 << huff_bits)
        hh = _div_round_up(height, 1 << huff_bits)
        huff_img = _decode_entropy_image(br, hw, hh, is_main=False)
        # group index = (red << 8) | green
        idx = (huff_img[:, :, 1].astype(np.int32) << 8) | huff_img[:, :, 2]
        n_groups = int(idx.max()) + 1
    cache_bits = br.read(4) if br.read(1) else 0
    if cache_bits > 11:
        raise ValueError("VP8L: color cache too large")
    cache = [0] * (1 << cache_bits) if cache_bits else None
    groups = [_read_huffman_group(br, cache_bits) for _ in range(n_groups)]

    n = width * height
    px = np.zeros(n, dtype=np.uint32)  # packed ARGB
    if huff_img is not None:
        gidx = (huff_img[:, :, 1].astype(np.int32) << 8) | huff_img[:, :, 2]
    pos = 0
    cache_len = 280 + ((1 << cache_bits) if cache_bits else 0)
    while pos < n:
        if huff_img is not None:
            x, y = pos % width, pos // width
            g = groups[int(gidx[y >> huff_bits, x >> huff_bits])]
        else:
            g = groups[0]
        s = g[0].read(br)
        if s < 256:  # literal: green, then R, B, A
            green = s
            red = g[1].read(br)
            blue = g[2].read(br)
            alpha = g[3].read(br)
            v = (alpha << 24) | (red << 16) | (green << 8) | blue
            px[pos] = v
            if cache is not None:
                cache[((v * 0x1E35A7BD) & 0xFFFFFFFF) >> (32 - cache_bits)] = v
            pos += 1
        elif s < 280:  # LZ77 backward reference
            length = _prefix_decode(br, s - 256)
            dist_code = _prefix_decode(br, g[4].read(br))
            if dist_code <= 120:
                dx, dy = _DIST_MAP[dist_code - 1]
                dist = dx + dy * width
                if dist < 1:
                    dist = 1
            else:
                dist = dist_code - 120
            if dist > pos or pos + length > n:
                raise ValueError("VP8L: invalid backward reference")
            for k in range(length):
                v = int(px[pos - dist])
                px[pos] = v
                if cache is not None:
                    cache[((v * 0x1E35A7BD) & 0xFFFFFFFF) >> (32 - cache_bits)] = v
                pos += 1
        else:  # color-cache hit
            if cache is None:
                raise ValueError("VP8L: cache symbol without cache")
            px[pos] = cache[s - 280]
            pos += 1
    out = np.zeros((height, width, 4), dtype=np.uint8)
    grid = px.reshape(height, width)
    out[:, :, 0] = (grid >> 24) & 0xFF  # A
    out[:, :, 1] = (grid >> 16) & 0xFF  # R
    out[:, :, 2] = (grid >> 8) & 0xFF  # G
    out[:, :, 3] = grid & 0xFF  # B
    return out


# --- inverse transforms -------------------------------------------------


def _inv_subtract_green(img: np.ndarray) -> np.ndarray:
    g = img[:, :, 2].astype(np.uint16)
    img[:, :, 1] = ((img[:, :, 1] + g) & 0xFF).astype(np.uint8)
    img[:, :, 3] = ((img[:, :, 3] + g) & 0xFF).astype(np.uint8)
    return img


def _cdelta(t: int, c: int) -> int:
    """ColorTransformDelta: signed(t) * signed(c) >> 5 (spec 4.3)."""
    ts = t - 256 if t >= 128 else t
    cs = c - 256 if c >= 128 else c
    return (ts * cs) >> 5


def _inv_color_transform(img: np.ndarray, bits: int, tdata: np.ndarray) -> np.ndarray:
    h, w = img.shape[:2]
    for y in range(h):
        trow = tdata[y >> bits]
        for x in range(w):
            tv = trow[x >> bits]
            g2r = int(tv[3])  # blue channel of transform px = green_to_red
            g2b = int(tv[2])  # green channel = green_to_blue
            r2b = int(tv[1])  # red channel = red_to_blue
            g = int(img[y, x, 2])
            r = (int(img[y, x, 1]) + _cdelta(g2r, g)) & 0xFF
            b = (int(img[y, x, 3]) + _cdelta(g2b, g) + _cdelta(r2b, r)) & 0xFF
            img[y, x, 1] = r
            img[y, x, 3] = b
    return img


def _avg2(a: int, b: int) -> int:
    return (a + b) >> 1


def _clamp_add_sub_full(a: int, b: int, c: int) -> int:
    return min(255, max(0, a + b - c))


def _clamp_add_sub_half(a: int, b: int, c: int) -> int:
    """clamp(ave + (ave - c)/2) with C-style truncate-toward-zero
    division on the possibly-negative correction (spec 4.2)."""
    ave = _avg2(a, b)
    d = ave - c
    half = d // 2 if d >= 0 else -((-d) // 2)
    return min(255, max(0, ave + half))


def _predict(mode: int, left, top, topleft, topright) -> tuple[int, int, int, int]:
    if mode == 0:
        return (255, 0, 0, 0)
    if mode == 1:
        return left
    if mode == 2:
        return top
    if mode == 3:
        return topright
    if mode == 4:
        return topleft
    if mode == 5:
        t = tuple(_avg2(_avg2(left[i], topright[i]), top[i]) for i in range(4))
        return t
    if mode == 6:
        return tuple(_avg2(left[i], topleft[i]) for i in range(4))
    if mode == 7:
        return tuple(_avg2(left[i], top[i]) for i in range(4))
    if mode == 8:
        return tuple(_avg2(topleft[i], top[i]) for i in range(4))
    if mode == 9:
        return tuple(_avg2(top[i], topright[i]) for i in range(4))
    if mode == 10:
        return tuple(
            _avg2(_avg2(left[i], topleft[i]), _avg2(top[i], topright[i])) for i in range(4)
        )
    if mode == 11:  # Select(top, left, topleft): whichever is closer to TL
        p = sum(abs(top[i] - topleft[i]) for i in range(4))
        q = sum(abs(left[i] - topleft[i]) for i in range(4))
        return top if p <= q else left
    if mode == 12:
        return tuple(_clamp_add_sub_full(left[i], top[i], topleft[i]) for i in range(4))
    if mode == 13:
        return tuple(
            _clamp_add_sub_half(left[i], top[i], topleft[i]) for i in range(4)
        )
    raise ValueError(f"VP8L: bad predictor mode {mode}")


def _inv_predictor(img: np.ndarray, bits: int, pdata: np.ndarray) -> np.ndarray:
    h, w = img.shape[:2]
    for y in range(h):
        prow = pdata[y >> bits]
        for x in range(w):
            if x == 0 and y == 0:
                pred = (255, 0, 0, 0)
            elif y == 0:
                pred = tuple(int(v) for v in img[0, x - 1])  # L
            elif x == 0:
                pred = tuple(int(v) for v in img[y - 1, 0])  # T
            else:
                mode = int(prow[x >> bits][2])  # green channel
                left = tuple(int(v) for v in img[y, x - 1])
                top = tuple(int(v) for v in img[y - 1, x])
                topleft = tuple(int(v) for v in img[y - 1, x - 1])
                # linear-array semantics (spec 4.2): TR of the last
                # column is the CURRENT row's first pixel (index
                # pos - width + 1 wraps), already reconstructed
                topright = (
                    tuple(int(v) for v in img[y - 1, x + 1])
                    if x + 1 < w
                    else tuple(int(v) for v in img[y, 0])
                )
                pred = _predict(mode, left, top, topleft, topright)
            for i in range(4):
                img[y, x, i] = (int(img[y, x, i]) + pred[i]) & 0xFF
    return img


def _inv_color_indexing(img: np.ndarray, palette: np.ndarray, width: int) -> np.ndarray:
    """Palette lookup, undoing sub-byte pixel bundling (spec 4.4)."""
    n_colors = len(palette)
    if n_colors <= 2:
        pack_bits = 3  # 8 px/byte
    elif n_colors <= 4:
        pack_bits = 2
    elif n_colors <= 16:
        pack_bits = 1
    else:
        pack_bits = 0
    h = img.shape[0]
    out = np.zeros((h, width, 4), dtype=np.uint8)
    per_byte = 1 << pack_bits
    idx_bits = 8 >> pack_bits
    mask = (1 << idx_bits) - 1
    for y in range(h):
        for x in range(width):
            packed = int(img[y, x >> pack_bits, 2])  # green channel holds index
            idx = (packed >> ((x % per_byte) * idx_bits)) & mask
            out[y, x] = palette[idx] if idx < n_colors else 0
    return out


def decode_vp8l(payload: bytes) -> dict:
    """Decode a VP8L bitstream (the bytes AFTER the 'VP8L' chunk
    header) to {"width","height","channels","pixels"} — RGBA bytes,
    matching the PNG/JPEG/GIF decoder contract."""
    br = _BitReader(payload)
    if br.read(8) != 0x2F:
        raise ValueError("VP8L: bad signature")
    width = br.read(14) + 1
    height = br.read(14) + 1
    if width * height > (1 << 26):
        raise ValueError(f"VP8L dimensions {width}x{height} exceed the decode cap")
    br.read(1)  # alpha-is-used hint
    if br.read(3) != 0:
        raise ValueError("VP8L: unsupported version")

    # transforms (each at most once; order of reading = reverse of apply)
    transforms: list[tuple] = []
    xsize = width
    while br.read(1):
        ttype = br.read(2)
        if ttype in (0, 1):  # PREDICTOR / COLOR
            bits = br.read(3) + 2
            tw = _div_round_up(xsize, 1 << bits)
            th = _div_round_up(height, 1 << bits)
            tdata = _decode_entropy_image(br, tw, th, is_main=False)
            transforms.append((ttype, bits, tdata))
        elif ttype == 2:  # SUBTRACT_GREEN
            transforms.append((2,))
        else:  # COLOR_INDEXING
            n_colors = br.read(8) + 1
            pal_img = _decode_entropy_image(br, n_colors, 1, is_main=False)
            # palette entries are delta-coded left-to-right
            pal = pal_img[0].astype(np.int32)
            for i in range(1, n_colors):
                pal[i] = (pal[i] + pal[i - 1]) & 0xFF
            palette = pal.astype(np.uint8)
            if n_colors <= 2:
                xsize = _div_round_up(xsize, 8)
            elif n_colors <= 4:
                xsize = _div_round_up(xsize, 4)
            elif n_colors <= 16:
                xsize = _div_round_up(xsize, 2)
            transforms.append((3, palette))

    img = _decode_entropy_image(br, xsize, height, is_main=True)
    for t in reversed(transforms):
        if t[0] == 0:
            img = _inv_predictor(img, t[1], t[2])
        elif t[0] == 1:
            img = _inv_color_transform(img, t[1], t[2])
        elif t[0] == 2:
            img = _inv_subtract_green(img)
        else:
            img = _inv_color_indexing(img, t[1], width)

    rgba = np.zeros((height, width, 4), dtype=np.uint8)
    rgba[:, :, 0] = img[:, :, 1]  # R
    rgba[:, :, 1] = img[:, :, 2]  # G
    rgba[:, :, 2] = img[:, :, 3]  # B
    rgba[:, :, 3] = img[:, :, 0]  # A
    return {
        "width": width,
        "height": height,
        "channels": 4,
        "pixels": rgba.tobytes(),
    }


def decode_webp(payload: bytes) -> dict:
    """RIFF/WEBP container walk: decode the VP8L chunk (direct or
    inside a VP8X extended file). Lossy 'VP8 ' raises — that's a DCT
    codec, a different tier."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WEBP":
        raise ValueError("not a RIFF/WEBP payload")
    pos = 12
    while pos + 8 <= len(payload):
        tag = payload[pos : pos + 4]
        (size,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        body = payload[pos + 8 : pos + 8 + size]
        if tag == b"VP8L":
            return decode_vp8l(body)
        if tag == b"VP8 ":
            raise NotImplementedError(
                "lossy VP8 (DCT) WebP not supported; VP8L (lossless) is"
            )
        pos += 8 + size + (size & 1)  # chunks are 2-byte aligned
    raise ValueError("RIFF/WEBP: no VP8L chunk found")


# --- fixture-tier encoder ------------------------------------------------


class _BitWriter:
    def __init__(self):
        self.bytes = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, v: int, n: int) -> None:
        self.acc |= (v & ((1 << n) - 1)) << self.nbits
        self.nbits += n
        while self.nbits >= 8:
            self.bytes.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def write_code(self, code: int, length: int) -> None:
        """Huffman codes go on the wire MSB-first (unlike everything
        else, which is LSB-first)."""
        for i in range(length - 1, -1, -1):
            self.write((code >> i) & 1, 1)

    def done(self) -> bytes:
        if self.nbits:
            self.bytes.append(self.acc & 0xFF)
            self.acc = 0
            self.nbits = 0
        return bytes(self.bytes)


def _canonical(lengths: dict[int, int]) -> dict[int, tuple[int, int]]:
    """Canonical Huffman assignment: symbol -> (code, length)."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    for bit_len in range(1, max(lengths.values()) + 1):
        for sym in sorted(s for s, l in lengths.items() if l == bit_len):
            out[sym] = (code, bit_len)
            code += 1
        code <<= 1
    return out


def _write_clc_coded(
    bw: _BitWriter, clc_lengths: dict[int, int], syms: list[tuple[int, int, int]]
) -> None:
    """Emit one code-length-coded Huffman code (spec 6.2.2):
    ``clc_lengths`` maps code-length-alphabet symbols to THEIR code
    lengths (must be a complete code), ``syms`` is the sequence of
    (clc_symbol, extra_value, extra_bits) to emit. Uses the max-symbol
    limit so the decoder reads exactly len(syms) symbols and leaves
    every remaining length at 0."""
    bw.write(0, 1)  # not a simple code
    order_idx = {sym: i for i, sym in enumerate(_CLC_ORDER)}
    n_codes = max(max(order_idx[sym] for sym in clc_lengths) + 1, 4)
    bw.write(n_codes - 4, 4)
    for i in range(n_codes):
        bw.write(clc_lengths.get(_CLC_ORDER[i], 0), 3)
    clc = _canonical(clc_lengths)
    cnt = len(syms)
    bw.write(1, 1)  # use the max-symbol limit
    k = 0
    while (cnt - 2) >= (1 << (2 + 2 * k)):
        k += 1
    bw.write(k, 3)
    bw.write(cnt - 2, 2 + 2 * k)
    for sym, extra_val, extra_bits in syms:
        bw.write_code(*clc[sym])
        if extra_bits:
            bw.write(extra_val, extra_bits)


def _flat8_syms() -> list[tuple[int, int, int]]:
    """lengths[0..255] = 8 via one literal '8' + repeat-16s."""
    syms = [(8, 0, 0)]
    remaining = 255
    while remaining > 0:
        take = min(6, remaining)
        if take < 3:
            syms.extend([(8, 0, 0)] * take)
            remaining = 0
        else:
            syms.append((16, take - 3, 2))
            remaining -= take
    return syms


def _write_flat8_code(bw: _BitWriter) -> None:
    """Flat 256-symbol 8-bit code (complete: 256·2^-8 = 1); any
    symbols past 255 in the alphabet stay length 0 via the limit."""
    _write_clc_coded(bw, {8: 1, 16: 1}, _flat8_syms())


def _write_green_runs_code(bw: _BitWriter) -> None:
    """Green tree for the runs encoder: lengths[0..255] = 9 and
    lengths[256] = 1 (complete: 256/512 + 1/2 = 1). Canonically,
    symbol 256 -> code 0 (1 bit) and literal s -> 256+s (9 bits)."""
    syms = [(9, 0, 0)]
    remaining = 255
    while remaining > 0:
        take = min(6, remaining)
        if take < 3:
            syms.extend([(9, 0, 0)] * take)
            remaining = 0
        else:
            syms.append((16, take - 3, 2))
            remaining -= take
    syms.append((1, 0, 0))  # lengths[256] = 1
    # CLC over {16, 1, 9}: 16 -> len 1, 1/9 -> len 2 (complete)
    _write_clc_coded(bw, {16: 1, 1: 2, 9: 2}, syms)


def _write_simple_code(bw: _BitWriter, symbols: list[int]) -> None:
    """Simple Huffman code with 1 or 2 symbols (spec 6.2.1)."""
    bw.write(1, 1)
    bw.write(len(symbols) - 1, 1)
    bw.write(1, 1)  # first symbol in 8 bits
    bw.write(symbols[0], 8)
    if len(symbols) == 2:
        bw.write(symbols[1], 8)


def _vp8l_header(bw: _BitWriter, width: int, height: int) -> None:
    bw.write(0x2F, 8)
    bw.write(width - 1, 14)
    bw.write(height - 1, 14)
    bw.write(1, 1)  # alpha-is-used hint
    bw.write(0, 3)  # version


def _split_argb(rgba: bytes, width: int, height: int):
    import numpy as _np

    px = _np.frombuffer(rgba, dtype=_np.uint8).reshape(height * width, 4).astype(_np.int32)
    return px[:, 3], px[:, 0], px[:, 1], px[:, 2]  # a, r, g, b


def encode_vp8l(
    width: int, height: int, rgba: bytes, *, subtract_green: bool = False
) -> bytes:
    """Fixture-tier VP8L encoder: every pixel a literal under flat
    8-bit trees, optionally behind the SUBTRACT_GREEN transform.
    Lossless for ANY content. Returns a complete RIFF/WEBP file."""
    if len(rgba) != width * height * 4:
        raise ValueError(f"need {width * height * 4} RGBA bytes, got {len(rgba)}")
    a, r, g, b = _split_argb(rgba, width, height)
    if subtract_green:
        r = (r - g) & 0xFF
        b = (b - g) & 0xFF

    bw = _BitWriter()
    _vp8l_header(bw, width, height)
    if subtract_green:
        bw.write(1, 1)  # a transform follows
        bw.write(2, 2)  # SUBTRACT_GREEN (no payload)
    bw.write(0, 1)  # no (more) transforms
    bw.write(0, 1)  # no meta-huffman
    bw.write(0, 1)  # no color cache
    _write_flat8_code(bw)  # green (280-symbol alphabet, 256+ at len 0)
    _write_flat8_code(bw)  # red
    _write_flat8_code(bw)  # blue
    _write_flat8_code(bw)  # alpha
    _write_simple_code(bw, [0])  # distance: single symbol, never used

    for i in range(height * width):
        bw.write_code(int(g[i]), 8)  # flat-8: code == value
        bw.write_code(int(r[i]), 8)
        bw.write_code(int(b[i]), 8)
        bw.write_code(int(a[i]), 8)
    return _wrap_riff(bw.done())


def encode_vp8l_runs(width: int, height: int, rgba: bytes) -> bytes:
    """Fixture encoder that EXERCISES the LZ77 decode path: a pixel
    equal to its LEFT neighbor becomes a (length=1, distance=1)
    backward reference — green symbol 256 (1 bit) + zero-bit distance
    (single-symbol tree on distance code 1 -> map entry (1,0)).
    Everything else is a literal at 9+8+8+8 bits."""
    if len(rgba) != width * height * 4:
        raise ValueError("bad pixel buffer")
    import numpy as _np

    px32 = _np.frombuffer(rgba, dtype=_np.uint8).reshape(height * width, 4)
    a, r, g, b = _split_argb(rgba, width, height)

    bw = _BitWriter()
    _vp8l_header(bw, width, height)
    bw.write(0, 1)  # no transforms
    bw.write(0, 1)  # no meta-huffman
    bw.write(0, 1)  # no color cache
    _write_green_runs_code(bw)  # literals at 9 bits, symbol 256 at 1 bit
    _write_flat8_code(bw)  # red
    _write_flat8_code(bw)  # blue
    _write_flat8_code(bw)  # alpha
    # distance tree: single symbol 1 -> prefix value 2 -> short
    # distance code 2 -> map entry (1,0) -> the left pixel, 0 bits
    _write_simple_code(bw, [1])

    n = width * height
    for i in range(n):
        if i % width > 0 and (px32[i] == px32[i - 1]).all():
            bw.write_code(0, 1)  # symbol 256: copy — len prefix 0
            # (length prefix code 0 -> length 1, no extra bits; the
            # single-symbol distance tree costs 0 bits)
        else:
            bw.write_code(256 + int(g[i]), 9)
            bw.write_code(int(r[i]), 8)
            bw.write_code(int(b[i]), 8)
            bw.write_code(int(a[i]), 8)
    return _wrap_riff(bw.done())


def _wrap_riff(vp8l_body: bytes) -> bytes:
    chunk = b"VP8L" + struct.pack("<I", len(vp8l_body)) + vp8l_body
    if len(vp8l_body) & 1:
        chunk += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk


def encode_vp8l_palette(width: int, height: int, rgba: bytes) -> bytes:
    """Fixture encoder that EXERCISES the COLOR_INDEXING decode path:
    builds a palette (<= 256 distinct colors required), emits it as the
    delta-coded transform sub-image, and writes green-channel indices —
    sub-byte BUNDLED when the palette allows (8/4/2 indices per byte
    for <=2/4/16 colors), the spec's width-packing."""
    if len(rgba) != width * height * 4:
        raise ValueError("bad pixel buffer")
    px = np.frombuffer(rgba, dtype=np.uint8).reshape(height * width, 4)
    colors: list[tuple[int, int, int, int]] = []
    index_of: dict[tuple[int, int, int, int], int] = {}
    idx = np.zeros(height * width, dtype=np.int32)
    for i in range(height * width):
        c = tuple(int(v) for v in px[i])
        j = index_of.get(c)
        if j is None:
            j = len(colors)
            if j >= 256:
                raise ValueError("palette encoder needs <= 256 distinct colors")
            index_of[c] = j
            colors.append(c)
        idx[i] = j
    n_colors = len(colors)
    if n_colors <= 2:
        pack_bits = 3
    elif n_colors <= 4:
        pack_bits = 2
    elif n_colors <= 16:
        pack_bits = 1
    else:
        pack_bits = 0
    per_byte = 1 << pack_bits
    idx_bits = 8 >> pack_bits
    xsize = _div_round_up(width, per_byte)

    bw = _BitWriter()
    _vp8l_header(bw, width, height)
    bw.write(1, 1)  # a transform follows
    bw.write(3, 2)  # COLOR_INDEXING
    bw.write(n_colors - 1, 8)
    # palette sub-image: 1 x n_colors entropy image, entries
    # delta-coded left-to-right, literal flat-8 trees, emission order
    # green, red, blue, alpha (spec literal order)
    bw.write(0, 1)  # no color cache
    _write_flat8_code(bw)
    _write_flat8_code(bw)
    _write_flat8_code(bw)
    _write_flat8_code(bw)
    _write_simple_code(bw, [0])
    prev = (0, 0, 0, 0)  # working ARGB order: (a, r, g, b)
    for (r, g, b, a) in colors:
        argb = (a, r, g, b)
        delta = tuple((argb[k] - prev[k]) & 0xFF for k in range(4))
        bw.write_code(delta[2], 8)  # green
        bw.write_code(delta[1], 8)  # red
        bw.write_code(delta[3], 8)  # blue
        bw.write_code(delta[0], 8)  # alpha
        prev = argb
    bw.write(0, 1)  # closes the transform list (decoder's while-bit)
    bw.write(0, 1)  # no meta-huffman
    bw.write(0, 1)  # no color cache
    _write_flat8_code(bw)
    _write_flat8_code(bw)
    _write_flat8_code(bw)
    _write_flat8_code(bw)
    _write_simple_code(bw, [0])
    grid = idx.reshape(height, width)
    for y in range(height):
        for xp in range(xsize):
            packed = 0
            for j in range(per_byte):
                x = xp * per_byte + j
                if x < width:
                    packed |= int(grid[y, x]) << (j * idx_bits)
            bw.write_code(packed, 8)  # green = packed indices
            bw.write_code(0, 8)  # red
            bw.write_code(0, 8)  # blue
            bw.write_code(255, 8)  # alpha
    return _wrap_riff(bw.done())
