"""Baseline-sequential JPEG codec, pure stdlib + numpy.

Closes the dominant-web-format gap in the multimodal codec tiers
(operators/multimodal.py): a JFIF payload now decodes for REAL —
segment parse (DQT/SOF0/DHT/DRI/SOS), canonical Huffman decode with
byte-unstuffing and restart markers, dequantize + de-zigzag, exact
float64 separable IDCT, chroma upsampling (4:4:4 / 4:2:2 / 4:2:0),
BT.601 YCbCr→RGB. Decoding covers baseline DCT (SOF0) with 8-bit
precision, 1 or 3 components — what the overwhelming majority of
web-crawl JPEGs are; progressive (SOF2) and arithmetic coding raise.

The encoder exists for the oracle fixtures (and resize re-encode):
grayscale or 4:2:0 color baseline JPEG using the ITU T.81 Annex K
typical Huffman tables and a flat quantization table. Its key
property: a BLOCK-CONSTANT image (every 8×8 block one value, chroma
flat 128) round-trips EXACTLY — a constant block has only a DC
coefficient (8·(v−128), quantized losslessly by the flat table; the
IDCT of a lone DC is constant to float64), so a SQL oracle can
predict every decoded pixel in closed form without parsing JPEG,
exactly like the PNG/WAV fixture contracts in multimodal.py.

All tables and formulas are from the public ITU T.81 spec (Annex K
tables; A.3.3 DCT). No external codec library involved.
"""

from __future__ import annotations

import struct

try:  # numpy is baked into the target container; guard for safety
    import numpy as _np
except ImportError:  # pragma: no cover
    _np = None

JPEG_MAGIC = b"\xff\xd8\xff"

# zigzag scan order: ZIGZAG[i] = block index (row*8+col) of the i-th
# coefficient in scan order (T.81 figure A.6)
ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

# --- Annex K typical Huffman tables (BITS counts + value order) -------
DC_LUM_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUM_VALS = list(range(12))
DC_CHR_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHR_VALS = list(range(12))
AC_LUM_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125]
AC_LUM_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]
AC_CHR_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119]
AC_CHR_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
    0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
    0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
    0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
    0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]

FLAT_Q = [8] * 64  # flat quantization: block-constant images are lossless


def _dct_matrix():
    """Exact separable DCT-II basis: C[u, x] = c(u)/2 · cos((2x+1)uπ/16)."""
    import math

    C = _np.zeros((8, 8))
    for u in range(8):
        cu = (1 / math.sqrt(2)) if u == 0 else 1.0
        for x in range(8):
            C[u, x] = 0.5 * cu * math.cos((2 * x + 1) * u * math.pi / 16)
    return C


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) by canonical Huffman construction
    (T.81 C.2): codes of length L are consecutive, doubling on to L+1."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.acc >> self.nbits) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:
                self.buf.append(0x00)  # byte stuffing

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1-bits per spec
        return bytes(self.buf)


class _BitReader:
    """Entropy-segment bit reader: unstuffs 0xFF00, surfaces RSTn."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        b = self.data[self.pos]
        if b == 0xFF:
            nxt = self.data[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7:
                raise _RestartMarker(nxt)
            else:
                raise ValueError(f"marker 0xFF{nxt:02X} inside entropy data")
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def read_bit(self) -> int:
        if not self.nbits:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def align_and_skip_rst(self) -> None:
        """At a restart interval boundary: drop bits to the byte edge
        and consume the RSTn marker."""
        self.nbits = 0
        while self.data[self.pos] == 0xFF and self.data[self.pos + 1] == 0xFF:
            self.pos += 1  # fill bytes
        if self.data[self.pos] == 0xFF and 0xD0 <= self.data[self.pos + 1] <= 0xD7:
            self.pos += 2


class _RestartMarker(Exception):
    def __init__(self, marker: int) -> None:
        self.marker = marker


class _HuffDecoder:
    """Canonical table as (min_code, max_code, first_index) per length
    — the T.81 F.2.2.3 DECODE procedure."""

    def __init__(self, bits: list[int], vals: list[int]) -> None:
        self.vals = vals
        self.min_code = [0] * 17
        self.max_code = [-1] * 17
        self.val_ptr = [0] * 17
        code = 0
        k = 0
        for length in range(1, 17):
            if bits[length - 1]:
                self.val_ptr[length] = k
                self.min_code[length] = code
                code += bits[length - 1]
                k += bits[length - 1]
                self.max_code[length] = code - 1
            else:
                self.max_code[length] = -1
            code <<= 1

    def decode(self, r: _BitReader) -> int:
        code = r.read_bit()
        length = 1
        while code > self.max_code[length]:
            code = (code << 1) | r.read_bit()
            length += 1
            if length > 16:
                raise ValueError("corrupt Huffman stream")
        return self.vals[self.val_ptr[length] + code - self.min_code[length]]


def _extend(v: int, t: int) -> int:
    """T.81 F.2.2.1 EXTEND: map a t-bit magnitude to its signed value."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def _category(v: int) -> int:
    return v.bit_length() if v > 0 else (-v).bit_length()


# --- decoder -----------------------------------------------------------


def decode_jpeg(payload: bytes) -> dict:
    """Decode a baseline-sequential JFIF payload. Returns the same
    shape as decode_png: {width, height, channels, pixels} with pixels
    row-major interleaved bytes (1 byte/px grayscale, 3 bytes/px RGB)."""
    if _np is None:  # pragma: no cover
        raise NotImplementedError("JPEG decode needs numpy")
    if payload[:3] != JPEG_MAGIC:
        raise ValueError("not a JPEG payload")
    qt: dict[int, list[int]] = {}
    huff_dc: dict[int, _HuffDecoder] = {}
    huff_ac: dict[int, _HuffDecoder] = {}
    comps: list[dict] = []
    width = height = 0
    restart_interval = 0
    pos = 2
    data = payload
    while True:
        if data[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            raise ValueError("EOI before SOS")
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue  # parameterless
        seglen = struct.unpack(">H", data[pos : pos + 2])[0]
        body = data[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0xF
                if pq == 0:
                    qt[tq] = list(body[i + 1 : i + 65])
                    i += 65
                elif pq == 1:  # 16-bit table (extended-precision DQT)
                    if i + 129 > len(body):
                        raise ValueError("torn 16-bit quant table")
                    qt[tq] = list(struct.unpack(">64H", body[i + 1 : i + 129]))
                    i += 129
                else:
                    raise ValueError(f"bad DQT precision {pq}")
        elif marker == 0xC0:  # SOF0 baseline
            if body[0] != 8:
                raise NotImplementedError("non-8-bit precision")
            height, width = struct.unpack(">HH", body[1:5])
            if height * width > (1 << 26):
                raise ValueError(f"JPEG dimensions {width}x{height} exceed the decode cap")
            n = body[5]
            comps = []
            for c in range(n):
                cid, hv, tq = body[6 + 3 * c : 9 + 3 * c]
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq}
                )
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError("only baseline sequential (SOF0) supported")
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 0xF
                bits = list(body[i + 1 : i + 17])
                nv = sum(bits)
                vals = list(body[i + 17 : i + 17 + nv])
                (huff_dc if tc == 0 else huff_ac)[th] = _HuffDecoder(bits, vals)
                i += 17 + nv
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", body[:2])[0]
        elif marker == 0xDA:  # SOS
            ns = body[0]
            scan = []
            for c in range(ns):
                cs, tables = body[1 + 2 * c : 3 + 2 * c]
                comp = next(x for x in comps if x["id"] == cs)
                scan.append(
                    {**comp, "dc": tables >> 4, "ac": tables & 0xF}
                )
            pos += seglen
            return _decode_scan(
                data, pos, scan, qt, huff_dc, huff_ac,
                width, height, restart_interval,
            )
        # APPn / COM / others: skip
        pos += seglen


def _decode_scan(data, pos, scan, qt, huff_dc, huff_ac, width, height, dri):
    hmax = max(c["h"] for c in scan)
    vmax = max(c["v"] for c in scan)
    mcux = -(-width // (8 * hmax))
    mcuy = -(-height // (8 * vmax))
    r = _BitReader(data, pos)
    IDCT = _dct_matrix()
    # per component: coefficient store (blocks_y, blocks_x, 8, 8)
    for c in scan:
        bw, bh = mcux * c["h"], mcuy * c["v"]
        c["coef"] = _np.zeros((bh, bw, 8, 8))
        c["pred"] = 0
        c["q"] = _np.array(
            [[qt[c["tq"]][next(i for i, z in enumerate(ZIGZAG) if z == row * 8 + col)]
              for col in range(8)] for row in range(8)],
            dtype=_np.float64,
        )
    # dequant matrix above is q in NATURAL order (inverse zigzag)
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if dri and mcu_count and mcu_count % dri == 0:
                r.align_and_skip_rst()
                for c in scan:
                    c["pred"] = 0
            mcu_count += 1
            for c in scan:
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        blk = _decode_block(r, huff_dc[c["dc"]], huff_ac[c["ac"]])
                        c["pred"] += blk[0]
                        blk[0] = c["pred"]
                        nat = _np.zeros(64)
                        nat[ZIGZAG] = blk  # scan order -> natural order
                        c["coef"][my * c["v"] + by, mx * c["h"] + bx] = (
                            nat.reshape(8, 8) * c["q"]
                        )
    planes = []
    for c in scan:
        # batched IDCT: (n, 8, 8) -> C^T F C
        F = c["coef"].reshape(-1, 8, 8)
        sp = _np.einsum("ux,nuv,vy->nxy", IDCT, F, IDCT)
        bh, bw = c["coef"].shape[:2]
        img = sp.reshape(bh, bw, 8, 8).transpose(0, 2, 1, 3).reshape(bh * 8, bw * 8)
        img = _np.clip(_np.round(img) + 128, 0, 255)
        # upsample to full resolution (sample replication), then crop
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            img = img.repeat(ry, axis=0).repeat(rx, axis=1)
        planes.append(img[:height, :width])
    if len(planes) == 1:
        px = planes[0].astype(_np.uint8)
        return {"width": width, "height": height, "channels": 1, "pixels": px.tobytes()}
    if len(planes) != 3:
        raise NotImplementedError(f"{len(planes)}-component JPEG")
    y, cb, cr = (p.astype(_np.float64) for p in planes)
    r_ = _np.clip(_np.round(y + 1.402 * (cr - 128)), 0, 255)
    g_ = _np.clip(_np.round(y - 0.344136 * (cb - 128) - 0.714136 * (cr - 128)), 0, 255)
    b_ = _np.clip(_np.round(y + 1.772 * (cb - 128)), 0, 255)
    px = _np.stack([r_, g_, b_], axis=-1).astype(_np.uint8)
    return {"width": width, "height": height, "channels": 3, "pixels": px.tobytes()}


def _decode_block(r: _BitReader, dc: _HuffDecoder, ac: _HuffDecoder):
    blk = _np.zeros(64)
    t = dc.decode(r)
    blk[0] = _extend(r.read_bits(t), t) if t else 0
    k = 1
    while k < 64:
        rs = ac.decode(r)
        rr, ss = rs >> 4, rs & 0xF
        if ss == 0:
            if rr == 15:  # ZRL: sixteen zeros
                k += 16
                continue
            break  # EOB
        k += rr
        if k > 63:
            raise ValueError("AC run past block end")
        blk[k] = _extend(r.read_bits(ss), ss)
        k += 1
    return blk


# --- encoder (fixture tier: grayscale or 4:2:0 color, flat quant) ------


def encode_jpeg_gray(
    width: int, height: int, pixels: bytes, *, wide_dqt: bool = False
) -> bytes:
    """Baseline grayscale JPEG. Block-constant inputs round-trip
    exactly (see module docstring); arbitrary inputs round-trip within
    normal quantization error. ``wide_dqt=True`` stores the SAME flat
    table in 16-bit (Pq=1) DQT form — the extended-precision variant
    some real encoders emit even in baseline-marked files."""
    if len(pixels) != width * height:
        raise ValueError(f"need {width * height} pixels, got {len(pixels)}")
    img = _np.frombuffer(bytes(pixels), dtype=_np.uint8).reshape(height, width)
    return _encode(width, height, [(img, 1, 1, 0, 0, 0)], n_comp=1, wide_dqt=wide_dqt)


def encode_jpeg_ycbcr420(width: int, height: int, y: bytes, cb_flat: int = 128, cr_flat: int = 128) -> bytes:
    """Baseline 4:2:0 COLOR JPEG with flat chroma planes — exercises
    the decoder's multi-component + subsampling + color-convert path
    while keeping fixtures closed-form (flat chroma quantizes
    losslessly; Y blocks follow the grayscale exactness rule)."""
    if len(y) != width * height:
        raise ValueError(f"need {width * height} luma pixels, got {len(y)}")
    yimg = _np.frombuffer(bytes(y), dtype=_np.uint8).reshape(height, width)
    cw, ch = -(-width // 2), -(-height // 2)
    cbimg = _np.full((ch, cw), cb_flat, dtype=_np.uint8)
    crimg = _np.full((ch, cw), cr_flat, dtype=_np.uint8)
    return _encode(
        width, height,
        [(yimg, 2, 2, 0, 0, 0), (cbimg, 1, 1, 1, 1, 1), (crimg, 1, 1, 1, 1, 1)],
        n_comp=3,
    )


def _encode(width, height, comps, *, n_comp, wide_dqt: bool = False):
    """comps: list of (plane, h, v, tq, dc_table, ac_table)."""
    if _np is None:  # pragma: no cover
        raise NotImplementedError("JPEG encode needs numpy")
    DCT = _dct_matrix()
    dc_codes = [_canonical_codes(DC_LUM_BITS, DC_LUM_VALS),
                _canonical_codes(DC_CHR_BITS, DC_CHR_VALS)]
    ac_codes = [_canonical_codes(AC_LUM_BITS, AC_LUM_VALS),
                _canonical_codes(AC_CHR_BITS, AC_CHR_VALS)]
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-width // (8 * hmax))
    mcuy = -(-height // (8 * vmax))

    out = bytearray(b"\xff\xd8")  # SOI
    # DQT (table 0; table 1 for chroma when present); wide_dqt stores
    # the same values as a 16-bit (Pq=1) table
    for tq in sorted({c[3] for c in comps}):
        if wide_dqt:
            out += b"\xff\xdb" + struct.pack(">HB", 131, 0x10 | tq)
            out += struct.pack(">64H", *FLAT_Q)
        else:
            out += b"\xff\xdb" + struct.pack(">HB", 67, tq) + bytes(FLAT_Q)
    # SOF0
    sof = struct.pack(">BHHB", 8, height, width, n_comp)
    for i, (_, h, v, tq, _, _) in enumerate(comps):
        sof += bytes([i + 1, (h << 4) | v, tq])
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    # DHT (the Annex K tables actually used)
    tabs = [(0, 0, DC_LUM_BITS, DC_LUM_VALS), (1, 0, AC_LUM_BITS, AC_LUM_VALS)]
    if n_comp == 3:
        tabs += [(0, 1, DC_CHR_BITS, DC_CHR_VALS), (1, 1, AC_CHR_BITS, AC_CHR_VALS)]
    for tc, th, bits, vals in tabs:
        body = bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals)
        out += b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body
    # SOS
    sos = bytes([n_comp])
    for i, (_, _, _, _, dct_t, act_t) in enumerate(comps):
        sos += bytes([i + 1, (dct_t << 4) | act_t])
    sos += b"\x00\x3f\x00"
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos

    # entropy-coded data: pad planes to their block grid (edge-replicate)
    padded = []
    for plane, h, v, tq, dct_t, act_t in comps:
        ph, pw = mcuy * v * 8, mcux * h * 8
        p = _np.empty((ph, pw), dtype=_np.float64)
        p[: plane.shape[0], : plane.shape[1]] = plane
        p[plane.shape[0] :, : plane.shape[1]] = plane[-1:, :]
        p[:, plane.shape[1] :] = p[:, plane.shape[1] - 1 : plane.shape[1]]
        padded.append((p - 128.0, h, v, dct_t, act_t))

    w = _BitWriter()
    pred = [0] * len(comps)
    for my in range(mcuy):
        for mx in range(mcux):
            for ci, (p, h, v, dct_t, act_t) in enumerate(padded):
                for by in range(v):
                    for bx in range(h):
                        ys = (my * v + by) * 8
                        xs = (mx * h + bx) * 8
                        blk = p[ys : ys + 8, xs : xs + 8]
                        F = DCT @ blk @ DCT.T
                        zz = _np.round(F.reshape(64)[ZIGZAG] / _np.array(FLAT_Q)).astype(int)
                        _encode_block(
                            w, zz, pred, ci, dc_codes[dct_t], ac_codes[act_t]
                        )
    out += w.flush()
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def _encode_block(w, zz, pred, ci, dc_tab, ac_tab):
    diff = int(zz[0]) - pred[ci]
    pred[ci] = int(zz[0])
    t = _category(diff)
    code, ln = dc_tab[t]
    w.write(code, ln)
    if t:
        w.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
    run = 0
    last_nz = max((i for i in range(1, 64) if zz[i]), default=0)
    for k in range(1, last_nz + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_tab[0xF0]  # ZRL
            w.write(code, ln)
            run -= 16
        s = _category(v)
        code, ln = ac_tab[(run << 4) | s]
        w.write(code, ln)
        w.write(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if last_nz < 63:
        code, ln = ac_tab[0x00]  # EOB
        w.write(code, ln)
