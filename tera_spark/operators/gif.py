"""GIF codec, pure stdlib — the third REAL image tier next to PNG and
baseline JPEG (operators/jpeg.py).

Decoder: GIF87a/GIF89a header, logical screen descriptor, global and
local color tables, extension blocks (Graphic Control et al. skipped
structurally), variable-width LSB-first LZW decompression with CLEAR /
EOI handling and 12-bit dictionary cap, 4-pass interlace reordering,
palette expansion to RGB. Multi-frame files decode their FIRST frame
for the feature path and report ``n_frames`` (frame_sample_plan's
metadata source). GIF is lossless, so decode(encode(px)) == px for ANY
content — the strongest fixture/oracle property of the three codecs.

Encoder (fixture tier): single-frame 8-bit grayscale-palette GIF using
literal-only LZW (a CLEAR code every 254 literals keeps the code width
at 9 bits — the classic "uncompressed GIF" construction; every decoder
accepts it because it is ordinary valid LZW).

Everything here is public knowledge (GIF89a specification / CompuServe
GIF87a; the LZW variant is the spec's Appendix F).
"""

from __future__ import annotations

import struct

GIF_MAGIC = (b"GIF87a", b"GIF89a")


# --- LZW (GIF variant: variable width, LSB-first bit packing) ----------


def _lzw_decode(data: bytes, min_code_size: int, n_pixels: int) -> bytearray:
    clear = 1 << min_code_size
    eoi = clear + 1
    code_size = min_code_size + 1
    base = [bytes([i]) for i in range(clear)] + [b"", b""]
    table = list(base)
    out = bytearray()
    prev: bytes | None = None
    acc = 0
    nbits = 0
    pos = 0
    while len(out) < n_pixels:
        while nbits < code_size:
            if pos >= len(data):
                return out  # truncated stream: return what we have
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << code_size) - 1)
        acc >>= code_size
        nbits -= code_size
        if code == clear:
            table = list(base)
            code_size = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if code < len(table) and code not in (clear, eoi):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]  # the KwKwK case
        else:
            raise ValueError(f"corrupt LZW stream (code {code})")
        out += entry
        if prev is not None and len(table) < 4096:
            table.append(prev + entry[:1])
            if len(table) == (1 << code_size) and code_size < 12:
                code_size += 1
        prev = entry
    return out


def _lzw_encode_literals(indices: bytes, min_code_size: int = 8) -> bytes:
    """Literal-only LZW: every pixel emitted as its own code, CLEAR
    inserted often enough that the code width never grows past
    min_code_size+1. Valid (just compression-free) LZW output."""
    clear = 1 << min_code_size
    eoi = clear + 1
    code_size = min_code_size + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += code_size
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    emit(clear)
    count = 0
    for px in indices:
        emit(px)
        count += 1
        if count == 254:  # dictionary would hit 2^code_size next add
            emit(clear)
            count = 0
    emit(eoi)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


# --- decoder ------------------------------------------------------------

_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def decode_gif(payload: bytes) -> dict:
    """Decode the first frame of a GIF payload. Returns
    {width, height, channels: 3, pixels (RGB interleaved), n_frames}.
    Frames after the first are structurally walked (counted), not
    rendered — the feature/fingerprint path reads frame one; full
    animation compositing (disposal methods) is out of scope."""
    if payload[:6] not in GIF_MAGIC:
        raise ValueError("not a GIF payload")
    sw, sh, packed, _bg, _ar = struct.unpack("<HHBBB", payload[6:13])
    if sw * sh > (1 << 26):
        raise ValueError(f"GIF dimensions {sw}x{sh} exceed the decode cap")
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = payload[pos : pos + 3 * n]
        pos += 3 * n
    first = None  # (left, top, w, h, rgb_rows)
    n_frames = 0
    while pos < len(payload):
        b = payload[pos]
        pos += 1
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension: label + sub-blocks
            pos += 1
            while payload[pos]:
                pos += 1 + payload[pos]
            pos += 1
            continue
        if b != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{b:02X}")
        left, top, w, h, ipacked = struct.unpack("<HHHHB", payload[pos : pos + 9])
        pos += 9
        lct = None
        if ipacked & 0x80:
            n = 2 << (ipacked & 0x07)
            lct = payload[pos : pos + 3 * n]
            pos += 3 * n
        min_code = payload[pos]
        pos += 1
        chunks = []
        while payload[pos]:
            ln = payload[pos]
            chunks.append(payload[pos + 1 : pos + 1 + ln])
            pos += 1 + ln
        pos += 1
        n_frames += 1
        if first is not None:
            continue  # later frames: counted, not rendered
        palette = lct if lct is not None else gct
        if palette is None:
            raise ValueError("GIF frame without a color table")
        idx = _lzw_decode(b"".join(chunks), min_code, w * h)
        if len(idx) < w * h:
            idx = idx + bytes(w * h - len(idx))
        if ipacked & 0x40:  # interlaced: reorder the 4 passes
            rows = [idx[r * w : (r + 1) * w] for r in range(h)]
            ordered: list[bytes | None] = [None] * h
            src = 0
            for start, step in _INTERLACE_PASSES:
                for r in range(start, h, step):
                    ordered[r] = rows[src]
                    src += 1
            idx = b"".join(ordered)  # type: ignore[arg-type]
        first = (left, top, w, h, idx, palette)
    if first is None:
        raise ValueError("GIF contains no image")
    _, _, w, h, idx, palette = first
    n_colors = len(palette) // 3
    px = bytearray(3 * len(idx))
    for i, ix in enumerate(idx):
        if ix >= n_colors:
            # short slice assignment would silently SHRINK the buffer
            raise ValueError(
                f"GIF pixel index {ix} outside the {n_colors}-entry color table"
            )
        o = 3 * ix
        px[3 * i : 3 * i + 3] = palette[o : o + 3]
    return {
        "width": w,
        "height": h,
        "channels": 3,
        "pixels": bytes(px),
        "n_frames": n_frames,
    }


# --- encoder (fixture tier) ---------------------------------------------


def encode_gif_gray(width: int, height: int, pixels: bytes) -> bytes:
    """Single-frame GIF89a with the 256-entry grayscale palette
    (i, i, i) and literal-only LZW — lossless, so ANY pixel content
    round-trips exactly (decode_gif returns each gray value replicated
    into R=G=B)."""
    if len(pixels) != width * height:
        raise ValueError(f"need {width * height} pixels, got {len(pixels)}")
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", width, height, 0xF7, 0, 0)  # GCT, 256 entries
    for i in range(256):
        out += bytes((i, i, i))
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, width, height, 0)
    out.append(8)  # LZW min code size
    lzw = _lzw_encode_literals(bytes(pixels), 8)
    for i in range(0, len(lzw), 255):
        chunk = lzw[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3b"
    return bytes(out)
