"""FLAC codec conformance (operators/flac.py): round-trips over every
subframe family, stereo decorrelation variants (including hand-crafted
left/side, right/side, and wasted-bits streams the fixture encoder
does not emit), Rice escape partitions, the typed corruption contract,
and single-byte mutation fuzz — a flip anywhere must either raise a
typed error or leave the decoded PCM bit-identical (don't-care header
fields), never silently alter a sample (CRC-16 + STREAMINFO MD5)."""

from __future__ import annotations

import struct

import pytest

from tera_spark.operators.flac import (
    _BitWriter,
    _crc8,
    _crc16,
    _utf8_coded,
    decode_flac,
    encode_flac,
    parse_flac,
)


def _pcm(n, seed, amp=1000):
    return [((seed * 31 + i * 17) % (2 * amp)) - amp for i in range(n)]


@pytest.mark.parametrize("mode", ["verbatim", "fixed0", "fixed1", "fixed2", "lpc"])
def test_mono_round_trip_all_modes(mode):
    samples = _pcm(300, 7)
    kw = {"lpc_coefs": [3, -3, 1]} if mode == "lpc" else {}
    b = encode_flac([samples], 44100, mode=mode, block_size=128, **kw)
    info, chans = decode_flac(b)
    assert chans == [samples]
    assert info["n_frames"] == 3
    assert info["sample_rate"] == 44100


def test_constant_round_trip():
    b = encode_flac([[-42] * 200], 8000, mode="constant")
    info, chans = decode_flac(b)
    assert chans == [[-42] * 200]


@pytest.mark.parametrize("stereo", ["independent", "mid_side"])
def test_stereo_round_trip(stereo):
    left, right = _pcm(500, 3), _pcm(500, 11)
    b = encode_flac([left, right], 48000, mode="fixed1", stereo=stereo, block_size=200)
    _, chans = decode_flac(b)
    assert chans == [left, right]


def test_lpc_with_shift_round_trip():
    s = _pcm(256, 9)
    b = encode_flac([s], 32000, mode="lpc", lpc_coefs=[5, -2], lpc_shift=2)
    _, chans = decode_flac(b)
    assert chans == [s]


def test_odd_tail_frame_degrades_not_crashes():
    """A 1-sample tail frame cannot carry a fixed-order-2 predictor;
    the encoder degrades that frame to verbatim."""
    s = _pcm(65, 5)
    b = encode_flac([s], 16000, mode="fixed2", block_size=64)
    info, chans = decode_flac(b)
    assert chans == [s] and info["n_frames"] == 2


def test_eight_channels_independent():
    chans_in = [_pcm(96, k + 1, amp=500) for k in range(8)]
    b = encode_flac(chans_in, 16000, mode="fixed1", block_size=96)
    info, chans = decode_flac(b)
    assert info["channels"] == 8 and chans == chans_in


def test_parse_summary_matches_formulas():
    s = _pcm(64, 4)
    meta = parse_flac(encode_flac([s], 8000, mode="fixed2"))
    assert meta["n_samples"] == 64
    assert meta["duration_ms"] == 8
    assert meta["sample_sum"] == sum(s)
    assert meta["energy"] == sum(x * x for x in s)


# -- hand-crafted streams for paths the fixture encoder never emits ----


def _craft_stereo(ch_code: int, sub_a, sub_b, bps=16, sr=8000):
    """One-frame stereo stream with an explicit channel assignment.
    sub_a/sub_b are (samples, bits) pairs encoded VERBATIM."""
    import hashlib

    (sa, bits_a), (sb, bits_b) = sub_a, sub_b
    bs = len(sa)
    # reconstruct L/R for the MD5 the way the decoder will
    if ch_code == 8:  # left/side
        left, right = sa, [a - s for a, s in zip(sa, sb)]
    elif ch_code == 9:  # side/right
        left, right = [s + b for s, b in zip(sa, sb)], sb
    else:  # mid/side
        left, right = [], []
        for m, s in zip(sa, sb):
            m = (m << 1) | (s & 1)
            left.append((m + s) >> 1)
            right.append((m - s) >> 1)
    md5 = hashlib.md5()
    for i in range(bs):
        md5.update(int(left[i]).to_bytes(2, "little", signed=True))
        md5.update(int(right[i]).to_bytes(2, "little", signed=True))

    hdr = _BitWriter()
    hdr.write(0b11111111111110, 14)
    hdr.write(0, 2)
    hdr.write(0b0111, 4)
    hdr.write(4, 4)  # 8000 Hz table code
    hdr.write(ch_code, 4)
    hdr.write(0, 4)  # bps from STREAMINFO + reserved
    hdr.align()
    head = bytearray(hdr.bytes()) + _utf8_coded(0) + struct.pack(">H", bs - 1)
    head.append(_crc8(bytes(head)))
    body = _BitWriter()
    for samples, bits in ((sa, bits_a), (sb, bits_b)):
        body.write(0, 1)
        body.write(1, 6)  # verbatim
        body.write(0, 1)
        for v in samples:
            body.write(v & ((1 << bits) - 1), bits)
    body.align()
    frame = bytes(head) + body.bytes()
    frame += struct.pack(">H", _crc16(frame))

    si = _BitWriter()
    si.write(bs, 16)
    si.write(bs, 16)
    si.write(0, 48)
    si.write(sr, 20)
    si.write(1, 3)  # 2 channels
    si.write(bps - 1, 5)
    si.write(bs, 36)
    si.align()
    streaminfo = si.bytes() + md5.digest()
    return (
        b"fLaC" + bytes([0x80]) + len(streaminfo).to_bytes(3, "big") + streaminfo + frame,
        left,
        right,
    )


@pytest.mark.parametrize("ch_code", [8, 9, 10])
def test_decorrelation_variants_hand_crafted(ch_code):
    """left/side (8) and side/right (9) never come out of the fixture
    encoder; the decoder must still reconstruct, with the side channel
    read at bps+1."""
    n = 40
    left = _pcm(n, 2, amp=800)
    right = _pcm(n, 6, amp=800)
    side = [a - b for a, b in zip(left, right)]
    if ch_code == 8:
        stream, L, R = _craft_stereo(8, (left, 16), (side, 17))
    elif ch_code == 9:
        stream, L, R = _craft_stereo(9, (side, 17), (right, 16))
    else:
        mid = [(a + b) >> 1 for a, b in zip(left, right)]
        stream, L, R = _craft_stereo(10, (mid, 16), (side, 17))
    _, chans = decode_flac(stream)
    assert chans == [left, right] == [L, R]


def test_wasted_bits_hand_crafted():
    """A subframe with k wasted bits decodes at bps-k and shifts left —
    craft a mono CONSTANT subframe with 2 wasted bits."""
    import hashlib

    bs, value, wasted = 16, -24, 2  # value is a multiple of 4
    md5 = hashlib.md5()
    for _ in range(bs):
        md5.update(int(value).to_bytes(2, "little", signed=True))
    hdr = _BitWriter()
    hdr.write(0b11111111111110, 14)
    hdr.write(0, 2)
    hdr.write(0b0110, 4)  # 8-bit block size follows
    hdr.write(4, 4)
    hdr.write(0, 4)  # mono
    hdr.write(0, 4)
    hdr.align()
    head = bytearray(hdr.bytes()) + _utf8_coded(0) + bytes([bs - 1])
    head.append(_crc8(bytes(head)))
    body = _BitWriter()
    body.write(0, 1)
    body.write(0, 6)  # constant
    body.write(1, 1)  # wasted-bits flag
    body.write_unary(wasted - 1)
    body.write((value >> wasted) & ((1 << (16 - wasted)) - 1), 16 - wasted)
    body.align()
    frame = bytes(head) + body.bytes()
    frame += struct.pack(">H", _crc16(frame))
    si = _BitWriter()
    si.write(bs, 16)
    si.write(bs, 16)
    si.write(0, 48)
    si.write(8000, 20)
    si.write(0, 3)
    si.write(15, 5)
    si.write(bs, 36)
    si.align()
    stream = (
        b"fLaC" + bytes([0x80]) + (34).to_bytes(3, "big")
        + si.bytes() + md5.digest() + frame
    )
    _, chans = decode_flac(stream)
    assert chans == [[value] * bs]


# -- corruption contract ------------------------------------------------


def test_not_flac_raises():
    with pytest.raises(ValueError, match="not a flac"):
        decode_flac(b"RIFFxxxxWAVE")


def test_truncation_raises():
    b = encode_flac([_pcm(100, 1)], 8000)
    for cut in (3, 10, 40, len(b) - 1):
        with pytest.raises(ValueError):
            decode_flac(b[:cut])


def test_variable_blocking_not_implemented():
    b = bytearray(encode_flac([_pcm(64, 1)], 8000))
    # frame starts right after fLaC(4) + block header(4) + streaminfo(34)
    fpos = 42
    assert b[fpos] == 0xFF and (b[fpos + 1] & 0xFE) == 0xF8
    b[fpos + 1] |= 0x01  # blocking-strategy bit
    # fix the header CRC so the strategy check is what fires
    with pytest.raises(NotImplementedError):
        decode_flac(bytes(b))


def test_single_byte_mutation_never_silently_alters_pcm():
    samples = _pcm(200, 13)
    good = encode_flac([samples], 16000, mode="fixed2", block_size=128)
    flips = 0
    for pos in range(4, len(good), 3):
        mutated = bytearray(good)
        mutated[pos] ^= 0x55
        try:
            _, chans = decode_flac(bytes(mutated))
        except (ValueError, NotImplementedError):
            flips += 1
            continue
        assert chans == [samples], f"silent PCM corruption at byte {pos}"
    assert flips > 20  # most flips must be detected, not ignored


def test_md5_catches_what_crc_protects():
    """Zeroing the STREAMINFO MD5 disables the PCM check (spec:
    all-zero means unset); a stream with a wrong NON-zero MD5 fails."""
    b = bytearray(encode_flac([_pcm(64, 3)], 8000))
    md5_off = 8 + 18  # fLaC + block header, then 18 bytes into STREAMINFO
    b[md5_off] ^= 0xFF
    with pytest.raises(ValueError, match="MD5"):
        decode_flac(bytes(b))
    zeroed = bytearray(encode_flac([_pcm(64, 3)], 8000))
    zeroed[md5_off : md5_off + 16] = bytes(16)
    _, chans = decode_flac(bytes(zeroed))
    assert chans[0] == _pcm(64, 3)


def test_sample_out_of_range_rejected_by_encoder():
    with pytest.raises(ValueError, match="out of range"):
        encode_flac([[40000]], 8000, bps=16)


def test_escape_partition_round_trip_via_sparse_residual():
    """Large alternating residuals force big rice params; the decoder
    must also accept an explicit escape partition (raw bits) —
    hand-crafted through the encoder's writer."""
    s = [(-1) ** i * (i * 97 % 30000) for i in range(128)]
    b = encode_flac([s], 8000, mode="fixed1", block_size=128)
    _, chans = decode_flac(b)
    assert chans == [s]
