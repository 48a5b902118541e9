"""FLAC (Free Lossless Audio Codec): real decode + fixture encoder.

Closes the audio tier the way round 6 closed images (vp8l.py): the
lossless format a 100 TB crawl actually stores masters in is decoded
for REAL — full bitstream per the public xiph.org spec — while lossy
MP3 *sample* decode stays a documented non-goal (SURVEY.md §2.7: the
container walk in mp3.py serves triage; perceptual-codec synthesis
adds no training-data signal the PCM tier doesn't already provide).

Implemented surface:

* STREAMINFO metadata block (+ skip of any other block type).
* Frames: fixed blocking strategy, UTF-8-coded frame numbers, all
  block-size/sample-rate header codes in common use, CRC-8 header
  and CRC-16 frame checks.
* Subframes: CONSTANT, VERBATIM, FIXED orders 0-4, LPC orders 1-32,
  wasted bits.
* Rice residuals: 4- and 5-bit parameter methods, multi-partition,
  escape-to-raw partitions.
* Stereo decorrelation: independent, left/side, right/side, mid/side
  (side channel decoded at bps+1 per spec).
* STREAMINFO MD5 verification of the decoded PCM (the decoder proves
  every sample, not just the walk).

The fixture encoder emits spec-exact streams (CONSTANT / VERBATIM /
FIXED 0-2 / one literal-coefficient LPC mode; independent or
mid/side stereo; multi-frame), so conformance tests round-trip real
bitstreams rather than golden bytes.

Corruption contract (codec-tier standard): ValueError for corrupt
streams (bad magic, CRC mismatch, truncation, reserved codes),
NotImplementedError for valid-but-unsupported variants (variable
blocking strategy).

Reference parity: tera stores opaque bytes (README.md:31); the audio
tier is north-star LLM-pipeline surface. Layout follows the public
FLAC format spec (xiph.org / RFC 9639).
"""

from __future__ import annotations

import hashlib
import struct

_MAGIC = b"fLaC"

# fixed-predictor coefficients by order (residual = sample - prediction)
_FIXED_COEF = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}

_SAMPLE_RATE_CODES = {
    88200: 1, 176400: 2, 192000: 3, 8000: 4, 16000: 5, 22050: 6,
    24000: 7, 32000: 8, 44100: 9, 48000: 10, 96000: 11,
}
_SAMPLE_RATE_BY_CODE = {v: k for k, v in _SAMPLE_RATE_CODES.items()}


def _crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 else (crc << 1) & 0xFFFF
    return crc


class _BitWriter:
    def __init__(self):
        self._buf = bytearray()
        self._acc = 0
        self._n = 0

    def write(self, value: int, bits: int) -> None:
        self._acc = (self._acc << bits) | (value & ((1 << bits) - 1))
        self._n += bits
        while self._n >= 8:
            self._n -= 8
            self._buf.append((self._acc >> self._n) & 0xFF)
        self._acc &= (1 << self._n) - 1

    def write_unary(self, q: int) -> None:
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)  # q zeros then a one

    def align(self) -> None:
        if self._n:
            self.write(0, 8 - self._n)

    def bytes(self) -> bytes:
        assert self._n == 0
        return bytes(self._buf)


class _BitReader:
    def __init__(self, data: bytes, pos: int = 0):
        self._d = data
        self._byte = pos
        self._bit = 0

    def read(self, bits: int) -> int:
        out = 0
        for _ in range(bits):
            if self._byte >= len(self._d):
                raise ValueError("corrupt flac: bitstream truncated")
            out = (out << 1) | ((self._d[self._byte] >> (7 - self._bit)) & 1)
            self._bit += 1
            if self._bit == 8:
                self._bit = 0
                self._byte += 1
        return out

    def read_signed(self, bits: int) -> int:
        v = self.read(bits)
        return v - (1 << bits) if v >> (bits - 1) else v

    def read_unary(self) -> int:
        q = 0
        while True:
            if self.read(1):
                return q
            q += 1
            if q > 1 << 20:
                raise ValueError("corrupt flac: runaway unary code")

    def align(self) -> None:
        if self._bit:
            self._bit = 0
            self._byte += 1

    @property
    def byte_pos(self) -> int:
        return self._byte


def _zigzag(n: int) -> int:
    return (n << 1) if n >= 0 else ((-n) << 1) - 1


def _unzigzag(u: int) -> int:
    return (u >> 1) if (u & 1) == 0 else -((u + 1) >> 1)


def _utf8_coded(n: int) -> bytes:
    """FLAC's UTF-8-style coded number (frame index)."""
    if n < 0x80:
        return bytes([n])
    out = []
    for n_bytes in range(2, 8):
        if n < 1 << (n_bytes * 5 + 1 if n_bytes < 7 else 36):
            lead = (0xFF << (8 - n_bytes)) & 0xFF
            shift = 6 * (n_bytes - 1)
            first = lead | (n >> shift) if n_bytes < 7 else lead
            out.append(first & 0xFF)
            for i in range(n_bytes - 1):
                shift -= 6
                out.append(0x80 | ((n >> shift) & 0x3F))
            return bytes(out)
    raise ValueError("frame number out of coded range")


def _read_utf8_coded(r: _BitReader) -> int:
    b0 = r.read(8)
    if b0 < 0x80:
        return b0
    n_bytes = 0
    mask = 0x80
    while b0 & mask:
        n_bytes += 1
        mask >>= 1
    if n_bytes < 2 or n_bytes > 7:
        raise ValueError("corrupt flac: bad coded frame number")
    val = b0 & (0xFF >> (n_bytes + 1))
    for _ in range(n_bytes - 1):
        b = r.read(8)
        if (b & 0xC0) != 0x80:
            raise ValueError("corrupt flac: bad coded-number continuation")
        val = (val << 6) | (b & 0x3F)
    return val


# --------------------------------------------------------------------------
# encoder (fixture tier)
# --------------------------------------------------------------------------


def _encode_residual(w: _BitWriter, resid: list[int], *, partitions: int = 1) -> None:
    """Rice-code a residual run: method 0 (4-bit params), ``partitions``
    equal partitions (the caller guarantees divisibility)."""
    import math

    porder = int(math.log2(partitions))
    if 1 << porder != partitions:
        raise ValueError("partitions must be a power of two")
    w.write(0, 2)  # method: rice, 4-bit parameters
    w.write(porder, 4)
    per = len(resid) // partitions if partitions > 1 else len(resid)
    start = 0
    for p in range(partitions):
        chunk = resid[start : start + (per if p or partitions == 1 else per)]
        start += len(chunk)
        # pick the best 4-bit rice parameter for the chunk
        best_k, best_cost = 0, None
        for k in range(15):
            cost = sum((_zigzag(v) >> k) + 1 + k for v in chunk)
            if best_cost is None or cost < best_cost:
                best_k, best_cost = k, cost
        w.write(best_k, 4)
        for v in chunk:
            u = _zigzag(v)
            w.write_unary(u >> best_k)
            if best_k:
                w.write(u & ((1 << best_k) - 1), best_k)


def _encode_subframe(
    w: _BitWriter,
    samples: list[int],
    bps: int,
    mode: str,
    lpc_coefs: list[int] | None = None,
    lpc_shift: int = 0,
) -> None:
    if mode == "constant":
        if any(s != samples[0] for s in samples):
            raise ValueError("constant subframe needs constant samples")
        w.write(0, 1)
        w.write(0, 6)
        w.write(0, 1)
        w.write(samples[0] & ((1 << bps) - 1), bps)
        return
    if mode == "verbatim":
        w.write(0, 1)
        w.write(1, 6)
        w.write(0, 1)
        for s in samples:
            w.write(s & ((1 << bps) - 1), bps)
        return
    if mode.startswith("fixed"):
        order = int(mode[5:])
        if order not in _FIXED_COEF or order > len(samples):
            raise ValueError(f"bad fixed order {order}")
        w.write(0, 1)
        w.write(8 | order, 6)
        w.write(0, 1)
        for s in samples[:order]:
            w.write(s & ((1 << bps) - 1), bps)
        coef = _FIXED_COEF[order]
        resid = [
            samples[i] - sum(c * samples[i - 1 - j] for j, c in enumerate(coef))
            for i in range(order, len(samples))
        ]
        _encode_residual(w, resid)
        return
    if mode == "lpc":
        coefs = lpc_coefs or [1]
        order = len(coefs)
        if order > len(samples) or not 1 <= order <= 32:
            raise ValueError("bad lpc order")
        precision = max(2, max(abs(c) for c in coefs).bit_length() + 1)
        w.write(0, 1)
        w.write(32 | (order - 1), 6)
        w.write(0, 1)
        for s in samples[:order]:
            w.write(s & ((1 << bps) - 1), bps)
        w.write(precision - 1, 4)
        w.write(lpc_shift, 5)
        for c in coefs:
            w.write(c & ((1 << precision) - 1), precision)
        resid = [
            samples[i]
            - (sum(c * samples[i - 1 - j] for j, c in enumerate(coefs)) >> lpc_shift)
            for i in range(order, len(samples))
        ]
        _encode_residual(w, resid)
        return
    raise ValueError(f"unknown subframe mode {mode!r}")


def encode_flac(
    channels: list[list[int]],
    sample_rate: int,
    *,
    bps: int = 16,
    block_size: int = 4096,
    mode: str = "fixed2",
    stereo: str = "independent",
    lpc_coefs: list[int] | None = None,
    lpc_shift: int = 0,
) -> bytes:
    """Assemble a spec-exact FLAC stream for fixtures.

    ``channels`` is one list of ints per channel (equal lengths).
    ``mode`` picks the subframe type (constant/verbatim/fixedN/lpc);
    ``stereo`` is 'independent' or 'mid_side' (2 channels only). The
    STREAMINFO MD5 of the interleaved PCM is computed for real, so
    decoders can verify every sample."""
    n_ch = len(channels)
    if not 1 <= n_ch <= 8:
        raise ValueError("1..8 channels")
    n = len(channels[0])
    if any(len(c) != n for c in channels):
        raise ValueError("channel length mismatch")
    if stereo == "mid_side" and n_ch != 2:
        raise ValueError("mid_side needs exactly 2 channels")
    lim = 1 << (bps - 1)
    for c in channels:
        if any(not -lim <= s < lim for s in c):
            raise ValueError("sample out of range for bps")

    md5 = hashlib.md5()
    # RFC 9639 §9.1.1: MD5 runs over PCM packed to ceil(bps/8) bytes
    # (byte-aligned), little-endian signed — bps//8 truncates for the
    # 12/20-bit depths the sample-size code map supports and overflows
    # int.to_bytes on in-range samples
    width = (bps + 7) // 8
    for i in range(n):
        for c in channels:
            md5.update(
                int(c[i]).to_bytes(width, "little", signed=True)
            )

    frames = bytearray()
    n_frames = (n + block_size - 1) // block_size
    for f in range(n_frames):
        lo = f * block_size
        bs = min(block_size, n - lo)
        hdr = _BitWriter()
        hdr.write(0b11111111111110, 14)
        hdr.write(0, 1)  # reserved
        hdr.write(0, 1)  # fixed blocking strategy
        hdr.write(0b0111, 4)  # block size: 16-bit value at header end
        hdr.write(_SAMPLE_RATE_CODES.get(sample_rate, 0), 4)  # 0 = STREAMINFO
        if n_ch == 2 and stereo == "mid_side":
            hdr.write(10, 4)
        else:
            hdr.write(n_ch - 1, 4)
        hdr.write(0, 3)  # sample size: from STREAMINFO
        hdr.write(0, 1)  # reserved
        hdr.align()
        head = bytearray(hdr.bytes())
        head += _utf8_coded(f)
        head += struct.pack(">H", bs - 1)
        head.append(_crc8(bytes(head)))

        # a tail frame shorter than the predictor order degrades to
        # verbatim for that frame (predictor order must be <= block
        # size) — lossless either way
        fmode = mode
        if fmode.startswith("fixed") and int(fmode[5:]) > bs:
            fmode = "verbatim"
        elif fmode == "lpc" and len(lpc_coefs or [1]) > bs:
            fmode = "verbatim"
        body = _BitWriter()
        if n_ch == 2 and stereo == "mid_side":
            left = channels[0][lo : lo + bs]
            right = channels[1][lo : lo + bs]
            mid = [(a + b) >> 1 for a, b in zip(left, right)]
            side = [a - b for a, b in zip(left, right)]
            _encode_subframe(body, mid, bps, fmode, lpc_coefs, lpc_shift)
            _encode_subframe(body, side, bps + 1, fmode, lpc_coefs, lpc_shift)
        else:
            for c in channels:
                _encode_subframe(body, c[lo : lo + bs], bps, fmode, lpc_coefs, lpc_shift)
        body.align()
        frame = bytes(head) + body.bytes()
        frame += struct.pack(">H", _crc16(frame))
        frames += frame

    si = _BitWriter()
    si.write(block_size if n_frames > 1 else min(block_size, n), 16)  # min block
    si.write(block_size if n_frames > 1 else min(block_size, n), 16)  # max block
    si.write(0, 24)  # min frame size unknown
    si.write(0, 24)  # max frame size unknown
    si.write(sample_rate, 20)
    si.write(n_ch - 1, 3)
    si.write(bps - 1, 5)
    si.write(n, 36)
    si.align()
    streaminfo = si.bytes() + md5.digest()
    header = _MAGIC + bytes([0x80]) + len(streaminfo).to_bytes(3, "big") + streaminfo
    return header + bytes(frames)


# --------------------------------------------------------------------------
# decoder
# --------------------------------------------------------------------------


def _decode_residual(r: _BitReader, bs: int, order: int) -> list[int]:
    method = r.read(2)
    if method > 1:
        raise ValueError("corrupt flac: reserved residual method")
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    porder = r.read(4)
    nparts = 1 << porder
    if bs % nparts:
        raise ValueError("corrupt flac: partition order does not divide block")
    out: list[int] = []
    for p in range(nparts):
        want = (bs >> porder) - (order if p == 0 else 0)
        if want < 0:
            raise ValueError("corrupt flac: negative partition length")
        k = r.read(pbits)
        if k == escape:
            raw = r.read(5)
            for _ in range(want):
                out.append(r.read_signed(raw) if raw else 0)
        else:
            for _ in range(want):
                u = (r.read_unary() << k) | (r.read(k) if k else 0)
                out.append(_unzigzag(u))
    return out


def _decode_subframe(r: _BitReader, bs: int, bps: int) -> list[int]:
    if r.read(1):
        raise ValueError("corrupt flac: subframe padding bit set")
    ftype = r.read(6)
    wasted = 0
    if r.read(1):
        wasted = r.read_unary() + 1
        bps -= wasted
        if bps <= 0:
            raise ValueError("corrupt flac: wasted bits exceed sample size")
    if ftype == 0:  # CONSTANT
        v = r.read_signed(bps)
        out = [v] * bs
    elif ftype == 1:  # VERBATIM
        out = [r.read_signed(bps) for _ in range(bs)]
    elif 8 <= ftype <= 12:  # FIXED
        order = ftype - 8
        out = [r.read_signed(bps) for _ in range(order)]
        resid = _decode_residual(r, bs, order)
        coef = _FIXED_COEF[order]
        for v in resid:
            pred = sum(c * out[-1 - j] for j, c in enumerate(coef))
            out.append(v + pred)
    elif ftype >= 32:  # LPC
        order = (ftype & 0x1F) + 1
        out = [r.read_signed(bps) for _ in range(order)]
        precision = r.read(4) + 1
        if precision == 16:
            raise ValueError("corrupt flac: invalid lpc precision")
        shift = r.read_signed(5)
        if shift < 0:
            raise ValueError("corrupt flac: negative lpc shift")
        coefs = [r.read_signed(precision) for _ in range(order)]
        resid = _decode_residual(r, bs, order)
        for v in resid:
            pred = sum(c * out[-1 - j] for j, c in enumerate(coefs)) >> shift
            out.append(v + pred)
    else:
        raise ValueError(f"corrupt flac: reserved subframe type {ftype}")
    if wasted:
        out = [v << wasted for v in out]
    return out


def decode_flac(payload: bytes) -> tuple[dict, list[list[int]]]:
    """Full decode: (streaminfo dict, per-channel PCM). Verifies frame
    CRC-8/CRC-16 and the STREAMINFO PCM MD5. See parse_flac for the
    metadata-only walk."""
    if payload[:4] != _MAGIC:
        raise ValueError("not a flac payload")
    pos = 4
    info = None
    while True:
        if pos + 4 > len(payload):
            raise ValueError("corrupt flac: truncated metadata block header")
        last = payload[pos] & 0x80
        btype = payload[pos] & 0x7F
        blen = int.from_bytes(payload[pos + 1 : pos + 4], "big")
        pos += 4
        if pos + blen > len(payload):
            raise ValueError("corrupt flac: truncated metadata block")
        if btype == 0:
            if blen != 34:
                raise ValueError("corrupt flac: STREAMINFO must be 34 bytes")
            r = _BitReader(payload, pos)
            info = {
                "min_block": r.read(16),
                "max_block": r.read(16),
                "min_frame": r.read(24),
                "max_frame": r.read(24),
                "sample_rate": r.read(20),
                "channels": r.read(3) + 1,
                "bps": r.read(5) + 1,
                "total_samples": r.read(36),
                "md5": payload[pos + 18 : pos + 34].hex(),
            }
        elif btype == 127:
            raise ValueError("corrupt flac: invalid metadata block type")
        pos += blen
        if last:
            break
    if info is None:
        raise ValueError("corrupt flac: missing STREAMINFO")
    if info["sample_rate"] == 0:
        raise ValueError("corrupt flac: zero sample rate")

    chans: list[list[int]] = [[] for _ in range(info["channels"])]
    n_frames = 0
    while pos < len(payload):
        r = _BitReader(payload, pos)
        if r.read(14) != 0b11111111111110:
            raise ValueError(f"corrupt flac: lost frame sync at byte {pos}")
        if r.read(1):
            raise ValueError("corrupt flac: reserved header bit set")
        if r.read(1):
            raise NotImplementedError("variable blocking strategy not supported")
        bs_code = r.read(4)
        sr_code = r.read(4)
        ch_code = r.read(4)
        ss_code = r.read(3)
        if r.read(1):
            raise ValueError("corrupt flac: reserved header bit set")
        _read_utf8_coded(r)
        if bs_code == 0:
            raise ValueError("corrupt flac: reserved block size code")
        elif bs_code == 1:
            bs = 192
        elif bs_code <= 5:
            bs = 576 << (bs_code - 2)
        elif bs_code == 6:
            bs = r.read(8) + 1
        elif bs_code == 7:
            bs = r.read(16) + 1
        else:
            bs = 256 << (bs_code - 8)
        if sr_code == 0:
            sr = info["sample_rate"]
        elif sr_code in _SAMPLE_RATE_BY_CODE:
            sr = _SAMPLE_RATE_BY_CODE[sr_code]
        elif sr_code == 12:
            sr = r.read(8) * 1000
        elif sr_code == 13:
            sr = r.read(16)
        elif sr_code == 14:
            sr = r.read(16) * 10
        else:
            raise ValueError("corrupt flac: invalid sample rate code")
        if sr != info["sample_rate"]:
            raise ValueError("corrupt flac: frame/STREAMINFO sample rate mismatch")
        bps = {0: info["bps"], 1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}.get(ss_code)
        if bps is None:
            raise ValueError("corrupt flac: reserved sample size code")
        r.align()
        crc8_got = r.read(8)
        if _crc8(payload[pos : r.byte_pos - 1]) != crc8_got:
            raise ValueError(f"corrupt flac: frame header CRC-8 mismatch at byte {pos}")

        if ch_code <= 7:
            n_sub = ch_code + 1
            if n_sub != info["channels"]:
                raise ValueError("corrupt flac: frame/STREAMINFO channel mismatch")
            subs = [_decode_subframe(r, bs, bps) for _ in range(n_sub)]
        elif ch_code in (8, 9, 10):
            if info["channels"] != 2:
                raise ValueError("corrupt flac: stereo decorrelation on non-stereo stream")
            a_bits = bps + (1 if ch_code == 9 else 0)
            b_bits = bps + (1 if ch_code in (8, 10) else 0)
            ca = _decode_subframe(r, bs, a_bits)
            cb = _decode_subframe(r, bs, b_bits)
            if ch_code == 8:  # left/side
                subs = [ca, [a - s for a, s in zip(ca, cb)]]
            elif ch_code == 9:  # side/right
                subs = [[s + b for s, b in zip(ca, cb)], cb]
            else:  # mid/side
                left, right = [], []
                for m, s in zip(ca, cb):
                    m = (m << 1) | (s & 1)
                    left.append((m + s) >> 1)
                    right.append((m - s) >> 1)
                subs = [left, right]
        else:
            raise ValueError("corrupt flac: reserved channel assignment")
        r.align()
        crc16_got = (r.read(8) << 8) | r.read(8)
        if _crc16(payload[pos : r.byte_pos - 2]) != crc16_got:
            raise ValueError(f"corrupt flac: frame CRC-16 mismatch at byte {pos}")
        for c, s in zip(chans, subs):
            c.extend(s)
        n_frames += 1
        pos = r.byte_pos

    if info["total_samples"] and len(chans[0]) != info["total_samples"]:
        raise ValueError("corrupt flac: decoded sample count mismatch")
    if info["md5"] != "0" * 32:
        md5 = hashlib.md5()
        width = (info["bps"] + 7) // 8  # RFC 9639 byte-aligned packing
        for i in range(len(chans[0])):
            for c in chans:
                md5.update(int(c[i]).to_bytes(width, "little", signed=True))
        if md5.hexdigest() != info["md5"]:
            raise ValueError("corrupt flac: decoded PCM fails STREAMINFO MD5")
    info["n_frames"] = n_frames
    return info, chans


def parse_flac(payload: bytes) -> dict:
    """Metadata + full sample-verified decode, summarized for the
    triage tier: {sample_rate, channels, bps, n_samples, n_frames,
    duration_ms, sample_sum, energy} — the decoded-PCM stats the
    fixture oracles replay."""
    info, chans = decode_flac(payload)
    n = len(chans[0]) if chans else 0
    return {
        "sample_rate": info["sample_rate"],
        "channels": info["channels"],
        "bps": info["bps"],
        "n_samples": n,
        "n_frames": info["n_frames"],
        "duration_ms": n * 1000 // info["sample_rate"],
        "sample_sum": sum(sum(c) for c in chans),
        "energy": sum(s * s for c in chans for s in c),
    }
