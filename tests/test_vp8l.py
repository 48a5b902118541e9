"""WebP-lossless (VP8L) codec: fixture-encoder round-trips (literal /
SUBTRACT_GREEN / LZ77 runs / COLOR_INDEXING palette with sub-byte
bundling) plus hand-crafted bitstreams for the decoder paths the
fixture encoders don't emit — PREDICTOR and COLOR transforms, the
color cache, and meta-Huffman. The forward transforms used to craft
those streams are reimplemented HERE from the spec, independently of
the decoder's inverse code."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from tera_spark.operators.vp8l import (
    _BitWriter,
    _vp8l_header,
    _wrap_riff,
    _write_clc_coded,
    _write_flat8_code,
    _write_simple_code,
    decode_webp,
    encode_vp8l,
    encode_vp8l_palette,
    encode_vp8l_runs,
)

RNG = np.random.RandomState(20260815)


def _rand_rgba(w: int, h: int) -> bytes:
    return RNG.randint(0, 256, (h * w * 4,), dtype=np.uint8).tobytes()


# --- fixture-encoder round-trips ----------------------------------------


@pytest.mark.parametrize("w,h", [(1, 1), (7, 3), (16, 16), (33, 9)])
def test_literal_round_trip(w, h):
    px = _rand_rgba(w, h)
    d = decode_webp(encode_vp8l(w, h, px))
    assert (d["width"], d["height"], d["channels"]) == (w, h, 4)
    assert d["pixels"] == px


@pytest.mark.parametrize("w,h", [(5, 5), (31, 7)])
def test_subtract_green_round_trip(w, h):
    px = _rand_rgba(w, h)
    assert decode_webp(encode_vp8l(w, h, px, subtract_green=True))["pixels"] == px


def test_lz77_runs_round_trip_and_compresses():
    w, h = 24, 10
    base = np.repeat(RNG.randint(0, 5, (h, w, 1), dtype=np.uint8) * 50, 4, axis=2)
    base[:, :, 3] = 255
    # long horizontal runs: the runs encoder must beat the literal one
    base[:, 4:20] = base[:, 4:5]
    px = base.tobytes()
    runs = encode_vp8l_runs(w, h, px)
    assert decode_webp(runs)["pixels"] == px
    assert len(runs) < len(encode_vp8l(w, h, px))


@pytest.mark.parametrize("ncol", [2, 3, 11, 17, 250])
def test_palette_round_trip_all_bundling_widths(ncol):
    w, h = 19, max(6, (ncol + 18) // 19)  # enough pixels to use every color
    pal = RNG.randint(0, 256, (ncol, 4), dtype=np.uint8)
    ids = RNG.randint(0, ncol, (h * w,))
    ids[:ncol] = np.arange(ncol)  # use every color
    px = pal[ids].reshape(-1).tobytes()
    d = decode_webp(encode_vp8l_palette(w, h, px))
    assert (d["width"], d["height"]) == (w, h)
    assert d["pixels"] == px


def test_container_walk_and_lossy_rejection():
    px = _rand_rgba(3, 3)
    f = encode_vp8l(3, 3, px)
    # VP8X-extended container: VP8X chunk first, VP8L after
    vp8l_chunk = f[12:]
    vp8x = b"VP8X" + struct.pack("<I", 10) + b"\x00" * 10
    ext = b"RIFF" + struct.pack("<I", 4 + len(vp8x) + len(vp8l_chunk)) + b"WEBP" + vp8x + vp8l_chunk
    assert decode_webp(ext)["pixels"] == px
    # lossy VP8 is a different codec tier: loud, typed refusal
    lossy = b"RIFF" + struct.pack("<I", 12) + b"WEBP" + b"VP8 " + struct.pack("<I", 0)
    with pytest.raises(NotImplementedError, match="lossy"):
        decode_webp(lossy)
    with pytest.raises(ValueError):
        decode_webp(b"RIFF1234WAVE")


# --- hand-crafted streams: transform / cache / meta paths ----------------
# ARGB tuple order below is (a, r, g, b), matching the decoder's
# working order; literal emission order on the wire is G, R, B, A.


def _emit_literal_pixels(bw: _BitWriter, argb_pixels) -> None:
    for (a, r, g, b) in argb_pixels:
        bw.write_code(g, 8)
        bw.write_code(r, 8)
        bw.write_code(b, 8)
        bw.write_code(a, 8)


def _emit_flat_group(bw: _BitWriter) -> None:
    _write_flat8_code(bw)  # green
    _write_flat8_code(bw)  # red
    _write_flat8_code(bw)  # blue
    _write_flat8_code(bw)  # alpha
    _write_simple_code(bw, [0])  # distance (unused)


def _finish(bw: _BitWriter) -> bytes:
    return _wrap_riff(bw.done())


def _rand_argb(w: int, h: int) -> list[list[tuple]]:
    return [
        [tuple(int(v) for v in RNG.randint(0, 256, 4)) for _ in range(w)]
        for _ in range(h)
    ]


# independent spec-forward predictors (test-side reimplementation)
def _avg2(x, y):
    return tuple((a + b) >> 1 for a, b in zip(x, y))


def _spec_predict(mode, L, T, TL, TR):
    if mode == 0:
        return (255, 0, 0, 0)
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
    if mode == 11:
        p = sum(abs(T[i] - TL[i]) for i in range(4))
        q = sum(abs(L[i] - TL[i]) for i in range(4))
        return T if p <= q else L
    if mode == 12:
        return tuple(min(255, max(0, L[i] + T[i] - TL[i])) for i in range(4))
    if mode == 13:
        out = []
        for i in range(4):
            ave = (L[i] + T[i]) >> 1
            d = ave - TL[i]
            half = d // 2 if d >= 0 else -((-d) // 2)
            out.append(min(255, max(0, ave + half)))
        return tuple(out)
    raise AssertionError(mode)


@pytest.mark.parametrize("mode", list(range(14)))
def test_predictor_transform_all_modes(mode):
    """One predictor block covering the whole image (bits=3 on an
    8x6): residuals computed by the spec-forward reimplementation
    must invert to the exact target through the decoder."""
    w, h = 8, 6
    target = _rand_argb(w, h)

    def px(y, x):
        return target[y][x]

    residuals = []
    for y in range(h):
        for x in range(w):
            if x == 0 and y == 0:
                pred = (255, 0, 0, 0)
            elif y == 0:
                pred = px(0, x - 1)
            elif x == 0:
                pred = px(y - 1, 0)
            else:
                L, T, TL = px(y, x - 1), px(y - 1, x), px(y - 1, x - 1)
                TR = px(y - 1, x + 1) if x + 1 < w else px(y, 0)
                pred = _spec_predict(mode, L, T, TL, TR)
            residuals.append(
                tuple((target[y][x][i] - pred[i]) & 0xFF for i in range(4))
            )

    bw = _BitWriter()
    _vp8l_header(bw, w, h)
    bw.write(1, 1)  # transform present
    bw.write(0, 2)  # PREDICTOR
    bw.write(3 - 2, 3)  # bits=3 -> 8x8 tiles -> 1x1 tile image
    # tile sub-image: 1 pixel, green channel = mode
    bw.write(0, 1)  # no color cache
    _emit_flat_group(bw)
    _emit_literal_pixels(bw, [(0, 0, mode, 0)])
    bw.write(0, 1)  # end of transforms
    bw.write(0, 1)  # no meta-huffman
    bw.write(0, 1)  # no cache
    _emit_flat_group(bw)
    _emit_literal_pixels(bw, residuals)

    d = decode_webp(_finish(bw))
    got = np.frombuffer(d["pixels"], dtype=np.uint8).reshape(h, w, 4)
    for y in range(h):
        for x in range(w):
            a, r, g, b = target[y][x]
            assert tuple(got[y, x]) == (r, g, b, a), (mode, y, x)


def test_color_transform_inverts():
    """COLOR transform with one tile: forward per spec (subtract
    deltas, blue uses the ORIGINAL red), decoder must add them back."""
    w, h = 6, 4
    target = _rand_argb(w, h)
    g2r, g2b, r2b = 0x35, 0xCB, 0x11  # mixed signs as int8

    def cdelta(t, c):
        ts = t - 256 if t >= 128 else t
        cs = c - 256 if c >= 128 else c
        return (ts * cs) >> 5

    coded = []
    for y in range(h):
        for x in range(w):
            a, r, g, b = target[y][x]
            nr = (r - cdelta(g2r, g)) & 0xFF
            nb = (b - cdelta(g2b, g) - cdelta(r2b, r)) & 0xFF
            coded.append((a, nr, g, nb))

    bw = _BitWriter()
    _vp8l_header(bw, w, h)
    bw.write(1, 1)
    bw.write(1, 2)  # COLOR transform
    bw.write(3 - 2, 3)  # bits=3: one 8x8 tile
    bw.write(0, 1)  # sub-image: no cache
    _emit_flat_group(bw)
    # transform pixel: blue=g2r, green=g2b, red=r2b
    _emit_literal_pixels(bw, [(0, r2b, g2b, g2r)])
    bw.write(0, 1)
    bw.write(0, 1)
    bw.write(0, 1)
    _emit_flat_group(bw)
    _emit_literal_pixels(bw, coded)

    d = decode_webp(_finish(bw))
    got = np.frombuffer(d["pixels"], dtype=np.uint8).reshape(h, w, 4)
    for y in range(h):
        for x in range(w):
            a, r, g, b = target[y][x]
            assert tuple(got[y, x]) == (r, g, b, a), (y, x)


def test_color_cache_hits():
    """Color cache path: first pixel a literal (inserted into the
    cache), the rest cache hits addressed by the spec hash."""
    w, h = 5, 3
    cache_bits = 4
    a, r, g, b = 77, 200, 0, 13  # green 0 keeps the tree tiny
    argb = (a << 24) | (r << 16) | (g << 8) | b
    slot = ((argb * 0x1E35A7BD) & 0xFFFFFFFF) >> (32 - cache_bits)
    cache_sym = 280 + slot

    bw = _BitWriter()
    _vp8l_header(bw, w, h)
    bw.write(0, 1)  # no transforms
    bw.write(0, 1)  # no meta
    bw.write(1, 1)  # color cache present
    bw.write(cache_bits, 4)
    # green tree: lengths[0]=1 and lengths[280+slot]=1 (skips between)
    gap = cache_sym - 1  # zeros between symbol 0 and the cache symbol
    syms = [(1, 0, 0)]
    rem = gap
    while rem > 0:
        take = min(138, rem)
        if take >= 11:
            syms.append((18, take - 11, 7))
        else:
            syms.append((17, take - 3, 3))  # take in [3,10] by construction
        rem -= take
    syms.append((1, 0, 0))
    _write_clc_coded(bw, {1: 1, 18: 2, 17: 2}, syms)
    _write_flat8_code(bw)  # red
    _write_flat8_code(bw)  # blue
    _write_flat8_code(bw)  # alpha
    _write_simple_code(bw, [0])  # distance
    # literal: green code 0 (1 bit), then R, B, A flat-8
    bw.write_code(0, 1)
    bw.write_code(r, 8)
    bw.write_code(b, 8)
    bw.write_code(a, 8)
    for _ in range(w * h - 1):
        bw.write_code(1, 1)  # cache symbol: canonical code 1

    d = decode_webp(_finish(bw))
    got = np.frombuffer(d["pixels"], dtype=np.uint8).reshape(-1, 4)
    assert (got == np.array([r, g, b, a], dtype=np.uint8)).all()


def test_meta_huffman_single_group():
    """Meta-Huffman path: a 1-tile Huffman image selecting group 0 for
    every pixel; literal decode must equal the target."""
    w, h = 9, 5
    target = _rand_argb(w, h)
    bw = _BitWriter()
    _vp8l_header(bw, w, h)
    bw.write(0, 1)  # no transforms
    bw.write(1, 1)  # meta-huffman present
    bw.write(2 - 2, 3)  # huff_bits=2 -> 4x4 tiles -> 3x2 tile image
    # huffman image: all pixels (r<<8|g) = 0
    bw.write(0, 1)  # sub-image: no cache
    _emit_flat_group(bw)
    _emit_literal_pixels(bw, [(0, 0, 0, 0)] * (3 * 2))
    bw.write(0, 1)  # main: no cache
    _emit_flat_group(bw)  # group 0
    _emit_literal_pixels(bw, [p for row in target for p in row])

    d = decode_webp(_finish(bw))
    got = np.frombuffer(d["pixels"], dtype=np.uint8).reshape(h, w, 4)
    for y in range(h):
        for x in range(w):
            a, r, g, b = target[y][x]
            assert tuple(got[y, x]) == (r, g, b, a)


def test_decode_image_dispatches_webp():
    from tera_spark.operators.multimodal import decode_image

    px = _rand_rgba(4, 4)
    d = decode_image(encode_vp8l(4, 4, px))
    assert d["channels"] == 4 and d["pixels"] == px


def _write_green_9bit_with(bw: _BitWriter, special: int) -> None:
    """Green tree: lengths[0..255]=9 and lengths[special]=1 (complete:
    256/512 + 1/2). Canonical: special -> 0 (1 bit), literal s ->
    256+s (9 bits). Generalizes the runs encoder's tree to any single
    control symbol (length prefixes above 0 need it)."""
    syms = [(9, 0, 0)]
    remaining = 255
    while remaining > 0:
        take = min(6, remaining)
        syms.append((16, take - 3, 2))
        remaining -= take
    gap = special - 256
    while gap > 0:
        take = min(gap, 138) if gap >= 11 else gap
        if take >= 11:
            syms.append((18, take - 11, 7))
        else:
            syms.append((17, take - 3, 3))  # gap in [3,10]
        gap -= take
    syms.append((1, 0, 0))
    _write_clc_coded(bw, {16: 2, 1: 2, 9: 2, 17: 2}, syms)


def test_lz77_long_backref_row_copy():
    """A single backward reference of LENGTH 10 at distance=width (the
    (0,1) map entry) copies a whole row: exercises the multi-bit
    length prefix (code 6 + 2 extra bits) and the copy loop."""
    w, h = 10, 2
    row = [tuple(int(v) for v in RNG.randint(0, 256, 4)) for _ in range(w)]

    bw = _BitWriter()
    _vp8l_header(bw, w, h)
    bw.write(0, 1)  # no transforms
    bw.write(0, 1)  # no meta
    bw.write(0, 1)  # no cache
    # length prefix for 10 is code 6 (offset 9, 2 extra bits, value 1):
    # green symbol 256 + 6 = 262 at 1 bit, literals at 9
    _write_green_9bit_with(bw, 262)
    _write_flat8_code(bw)  # red
    _write_flat8_code(bw)  # blue
    _write_flat8_code(bw)  # alpha
    _write_simple_code(bw, [0])  # dist prefix 0 -> code 1 -> (0,1) = width

    _emit_literal_pixels_9bit(bw, row)
    bw.write_code(0, 1)  # symbol 262
    bw.write(1, 2)       # extra bits: length = 9 + 1 = 10
    d = decode_webp(_finish(bw))
    got = np.frombuffer(d["pixels"], dtype=np.uint8).reshape(h, w, 4)
    for x in range(w):
        a, r, g, b = row[x]
        assert tuple(got[0, x]) == (r, g, b, a)
        assert tuple(got[1, x]) == (r, g, b, a)  # copied row


def _emit_literal_pixels_9bit(bw: _BitWriter, argb_pixels) -> None:
    for (a, r, g, b) in argb_pixels:
        bw.write_code(256 + g, 9)
        bw.write_code(r, 8)
        bw.write_code(b, 8)
        bw.write_code(a, 8)


def test_meta_huffman_two_groups():
    """Two REAL Huffman groups selected per 4x4 tile: group 0 decodes
    flat-8 literals, group 1 a two-symbol simple green code — a
    mis-selected group would garble one half of the image."""
    w, h = 8, 4  # two 4x4 tiles side by side
    left = [tuple(int(v) for v in RNG.randint(0, 256, 4)) for _ in range(16)]
    G0, G1 = 7, 201  # group 1's only green symbols

    bw = _BitWriter()
    _vp8l_header(bw, w, h)
    bw.write(0, 1)  # no transforms
    bw.write(1, 1)  # meta-huffman present
    bw.write(0, 3)  # huff_bits = 2 -> 4x4 tiles -> 2x1 tile image
    bw.write(0, 1)  # tile sub-image: no cache
    _emit_flat_group(bw)
    # tile 0 -> group 0, tile 1 -> group 1 (index = red<<8 | green)
    _emit_literal_pixels(bw, [(0, 0, 0, 0), (0, 0, 1, 0)])
    bw.write(0, 1)  # main: no cache
    _emit_flat_group(bw)  # group 0: flat-8 everywhere
    # group 1: simple 2-symbol green, flat RBA, unused distance
    _write_simple_code(bw, [G0, G1])
    _write_flat8_code(bw)
    _write_flat8_code(bw)
    _write_flat8_code(bw)
    _write_simple_code(bw, [0])

    expect = {}
    k = 0
    for y in range(h):
        for x in range(w):
            if x < 4:  # group 0 tile: full literals
                a, r, g, b = left[k]
                k += 1
                _emit_literal_pixels(bw, [(a, r, g, b)])
                expect[(y, x)] = (r, g, b, a)
            else:  # group 1 tile: green from the simple pair
                g = G0 if (x + y) % 2 == 0 else G1
                bw.write(0 if g == G0 else 1, 1)  # simple code: 1 bit
                bw.write_code(11, 8)  # red (flat-8)
                bw.write_code(22, 8)  # blue
                bw.write_code(255, 8)  # alpha
                expect[(y, x)] = (11, g, 22, 255)

    d = decode_webp(_finish(bw))
    got = np.frombuffer(d["pixels"], dtype=np.uint8).reshape(h, w, 4)
    for (y, x), rgba in expect.items():
        assert tuple(got[y, x]) == rgba, (y, x)


def test_backref_copies_insert_into_color_cache():
    """Spec subtlety: pixels produced by a BACKWARD REFERENCE must be
    inserted into the color cache exactly like literals. Two colors A
    and B collide in the 4-bit cache slot; the stream goes
    literal A, literal B (slot now B), backref copying A (slot must
    flip back to A), cache-hit — which must decode A. A decoder that
    skips cache insertion on copies yields B here."""
    from tera_spark.operators.vp8l import _canonical

    cache_bits = 4
    A = (0xFF, 10, 20, 30)   # (a, r, g, b) — slot 8
    B = (0xFF, 0, 40, 50)    # same slot 8
    argb = lambda c: (c[0] << 24) | (c[1] << 16) | (c[2] << 8) | c[3]
    s = ((argb(A) * 0x1E35A7BD) & 0xFFFFFFFF) >> (32 - cache_bits)
    assert s == ((argb(B) * 0x1E35A7BD) & 0xFFFFFFFF) >> (32 - cache_bits)

    w, h = 4, 1
    bw = _BitWriter()
    _vp8l_header(bw, w, h)
    bw.write(0, 1)  # no transforms
    bw.write(0, 1)  # no meta
    bw.write(1, 1)  # color cache
    bw.write(cache_bits, 4)
    # green tree: literals 0..255 at 9 bits (Kraft 1/2) + symbol 256
    # (length prefix 0 -> copy len 1) and the cache symbol 280+s at
    # 2 bits each (1/4 + 1/4) -> complete
    lengths = {i: 9 for i in range(256)}
    lengths[256] = 2
    lengths[280 + s] = 2
    syms = [(9, 0, 0)]
    rem = 255
    while rem > 0:
        take = min(6, rem)
        syms.append((16, take - 3, 2))
        rem -= take
    syms.append((2, 0, 0))        # lengths[256] = 2
    gap = 280 + s - 257           # zeros between 257 and the cache sym
    while gap > 0:
        take = min(gap, 138) if gap >= 11 else gap
        if take >= 11:
            syms.append((18, take - 11, 7))
        else:
            syms.append((17, take - 3, 3))
        gap -= take
    syms.append((2, 0, 0))        # lengths[280+s] = 2
    _write_clc_coded(bw, {9: 2, 16: 2, 2: 2, 17: 3, 18: 3}, syms)
    _write_flat8_code(bw)  # red
    _write_flat8_code(bw)  # blue
    _write_flat8_code(bw)  # alpha
    # distance needed: plain distance 2 (px2 copies px0). Short codes
    # 1..120 are the 2D map; plain distances are dist_code 120+d, so
    # dist_code = 122 -> prefix code 13 with 5 extra bits (value 25).
    _write_simple_code(bw, [13])
    codes = _canonical(lengths)

    def green(sym):
        bw.write_code(*codes[sym])

    # pixels: A literal, B literal, copy distance 2 (px0=A), cache hit
    def lit(c):
        a, r, g, b = c
        green(g)
        bw.write_code(r, 8)
        bw.write_code(b, 8)
        bw.write_code(a, 8)

    lit(A)
    lit(B)
    green(256)  # copy length 1 (prefix 0, no extra bits)
    bw.write(25, 5)  # distance extra bits: dist_code 96+25+1 = 122 -> distance 2
    green(280 + s)  # cache hit: must be A (copy re-inserted it)
    d = decode_webp(_finish(bw))
    got = np.frombuffer(d["pixels"], dtype=np.uint8).reshape(w, 4)
    exp = lambda c: (c[1], c[2], c[3], c[0])
    assert tuple(got[0]) == exp(A)
    assert tuple(got[1]) == exp(B)
    assert tuple(got[2]) == exp(A), "backref must copy A from distance 2"
    assert tuple(got[3]) == exp(A), (
        "cache hit after the copy must see A — copies insert into the cache"
    )


def test_decoder_survives_corruption_fuzz():
    """Crawl robustness: corrupt/truncated VP8L payloads must fail
    with a TYPED error (ValueError / NotImplementedError), never an
    IndexError/KeyError/hang — a 100 TB crawl WILL contain garbage
    with valid magics. 300 single-byte corruptions + 60 truncations of
    a valid file, plus pure-noise bodies."""
    px = _rand_rgba(9, 7)
    good = bytearray(encode_vp8l(9, 7, px))
    rng = np.random.RandomState(99)
    allowed = (ValueError, NotImplementedError)
    for _ in range(300):
        buf = bytearray(good)
        i = int(rng.randint(12, len(buf)))  # keep the RIFF magic intact
        buf[i] ^= 1 << int(rng.randint(0, 8))
        try:
            d = decode_webp(bytes(buf))
            assert isinstance(d["pixels"], bytes)  # harmless flip: fine
        except allowed:
            pass
    for _ in range(60):
        cut = int(rng.randint(13, len(good)))
        try:
            decode_webp(bytes(good[:cut]))
        except allowed:
            pass
    for _ in range(30):
        body = bytes(rng.randint(0, 256, int(rng.randint(1, 400)), dtype=np.uint8))
        payload = b"RIFF" + struct.pack("<I", 4 + 8 + len(body)) + b"WEBP" + b"VP8L" + struct.pack("<I", len(body)) + body
        try:
            decode_webp(payload)
        except allowed:
            pass


def test_stacked_transforms_reverse_order():
    """Real libwebp files stack transforms (typically PREDICTOR +
    SUBTRACT_GREEN). The spec inverts them in REVERSE bitstream order:
    with [P, SG] in the stream, decode applies SG-inverse first, then
    P-inverse — so the forward crafting here is residual = P_fwd(target)
    followed by coded = SG_fwd(residual). A decoder inverting in read
    order garbles every pixel."""
    w, h = 6, 5
    mode = 2  # T predictor: simple forward
    target = _rand_argb(w, h)

    def px(y, x):
        return target[y][x]

    residuals = []
    for y in range(h):
        for x in range(w):
            if x == 0 and y == 0:
                pred = (255, 0, 0, 0)
            elif y == 0:
                pred = px(0, x - 1)
            elif x == 0:
                pred = px(y - 1, 0)
            else:
                pred = px(y - 1, x)  # mode 2 = T
            residuals.append(
                tuple((target[y][x][i] - pred[i]) & 0xFF for i in range(4))
            )
    # subtract-green forward on the RESIDUALS (a, r, g, b working order)
    coded = [
        (a, (r - g) & 0xFF, g, (b - g) & 0xFF) for (a, r, g, b) in residuals
    ]

    bw = _BitWriter()
    _vp8l_header(bw, w, h)
    bw.write(1, 1)  # transform 1: PREDICTOR
    bw.write(0, 2)
    bw.write(3 - 2, 3)  # bits=3 -> one tile
    bw.write(0, 1)  # sub-image: no cache
    _emit_flat_group(bw)
    _emit_literal_pixels(bw, [(0, 0, mode, 0)])
    bw.write(1, 1)  # transform 2: SUBTRACT_GREEN
    bw.write(2, 2)
    bw.write(0, 1)  # end of transforms
    bw.write(0, 1)  # no meta
    bw.write(0, 1)  # no cache
    _emit_flat_group(bw)
    _emit_literal_pixels(bw, coded)

    d = decode_webp(_finish(bw))
    got = np.frombuffer(d["pixels"], dtype=np.uint8).reshape(h, w, 4)
    for y in range(h):
        for x in range(w):
            a, r, g, b = target[y][x]
            assert tuple(got[y, x]) == (r, g, b, a), (y, x)
