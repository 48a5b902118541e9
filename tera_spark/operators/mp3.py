"""MPEG-1 Layer III (MP3) container metadata: the frame-header walk.

A 100 TB crawl triages audio on container metadata — duration,
bitrate mode, sample rate, tag overhead — long before it spends
cycles decoding samples. This module makes that metadata tier REAL
and exact for MP3: ID3v2 skip (syncsafe size), frame-sync walk with
the MPEG-1 Layer III bitrate/sample-rate tables and padding
arithmetic, Xing/Info VBR-tag detection in the first frame, and the
trailing 128-byte ID3v1 tag. The full hybrid-filterbank *sample*
decode stays a documented stub (`multimodal.decode_audio`) — the
container walk never needs it.

Reference parity: tera stores opaque byte values (README.md:31);
media triage is north-star LLM-pipeline surface, not reference
surface. Header layout and tables follow the public MPEG-1 audio
spec (ISO/IEC 11172-3).

Corruption contract: like the other codecs, every parse failure is a
TYPED error — ValueError for corrupt streams (lost sync, reserved
indices, truncated frames, trailing garbage), NotImplementedError for
valid-but-unsupported variants (MPEG-2/2.5, Layer I/II, free-format
bitrate) — so `extract_features`-style on_error policies can rely on
one contract.
"""

from __future__ import annotations

# MPEG-1 Layer III bitrate table (kbps), header index 1..14.
# Index 0 = free format (unsupported), 15 = invalid.
BITRATE_KBPS = (None, 32, 40, 48, 56, 64, 80, 96, 112, 128,
                160, 192, 224, 256, 320)
# MPEG-1 sample rates, header index 0..2 (3 = reserved).
SAMPLE_RATES = (44100, 48000, 32000)
SAMPLES_PER_FRAME = 1152  # MPEG-1 Layer III

# Side-info size for MPEG-1 is 32 bytes for stereo/joint/dual and 17
# for mono, after the 4-byte header; real encoders place the Xing/Info
# tag right after it — so the probe offset depends on the first
# frame's channel-mode bits (header byte 3, top two bits; 0b11 = mono).
_SIDE_INFO_STEREO = 32
_SIDE_INFO_MONO = 17


def _vbr_tag_offset(channel_mode: int) -> int:
    return 4 + (_SIDE_INFO_MONO if channel_mode == 3 else _SIDE_INFO_STEREO)

_ID3V1_LEN = 128


def frame_length(kbps: int, sample_rate: int, padding: int) -> int:
    """MPEG-1 Layer III frame size in bytes (spec: 144*bitrate/rate)."""
    return 144_000 * kbps // sample_rate + padding


def _syncsafe(n: int) -> bytes:
    """ID3v2 28-bit syncsafe size (7 bits per byte, high bit clear)."""
    return bytes(((n >> s) & 0x7F) for s in (21, 14, 7, 0))


def encode_mp3(
    frames: list[tuple[int, int]],
    sample_rate_idx: int,
    *,
    id3v2_payload: int | None = None,
    id3v1: bool = False,
    vbr_tag: bytes | None = None,
    channel_mode: int = 0,
) -> bytes:
    """Assemble a real MPEG-1 Layer III stream for fixtures.

    ``frames`` is a list of (bitrate_index 1..14, padding 0/1); each
    frame is a spec-exact header plus deterministic filler. When
    ``id3v2_payload`` is not None an ID3v2.4 tag of that payload size
    precedes the audio; ``id3v1`` appends the legacy 128-byte trailer;
    ``vbr_tag`` (b"Xing"/b"Info") lands at the encoder-standard offset
    in the first frame — after the 32-byte (stereo) or 17-byte (mono)
    side info, per ``channel_mode`` (0 stereo, 1 joint, 2 dual,
    3 mono).
    """
    if not 0 <= channel_mode <= 3:
        raise ValueError("channel_mode must be 0..3")
    out = bytearray()
    if id3v2_payload is not None:
        out += b"ID3\x04\x00\x00" + _syncsafe(id3v2_payload)
        out += bytes(i % 0x7F for i in range(id3v2_payload))
    rate = SAMPLE_RATES[sample_rate_idx]
    for fno, (bri, pad) in enumerate(frames):
        if not 1 <= bri <= 14:
            raise ValueError(f"bitrate index {bri} out of encodable range")
        flen = frame_length(BITRATE_KBPS[bri], rate, pad)
        hdr = bytes((
            0xFF,
            0xFB,  # sync + MPEG-1 + Layer III + no CRC
            (bri << 4) | (sample_rate_idx << 2) | (pad << 1),
            channel_mode << 6,  # channel mode, no mode ext/flags
        ))
        body = bytearray((fno * 29 + i * 7) % 256 for i in range(flen - 4))
        if fno == 0 and vbr_tag is not None:
            off = _vbr_tag_offset(channel_mode) - 4
            body[off:off + 4] = vbr_tag
        out += hdr + bytes(body)
    if id3v1:
        out += b"TAG" + bytes(125)
    return bytes(out)


def parse_mp3(payload: bytes) -> dict:
    """Walk an MP3 stream's frame headers; return container metadata.

    Returns ``{n_frames, sample_rate, duration_ms, mode ('cbr'|'vbr'),
    avg_kbps, id3v2_bytes, has_id3v1, vbr_tag (''|'Xing'|'Info')}``.
    Raises ValueError on corrupt streams and NotImplementedError on
    valid-but-unsupported MPEG variants (see module docstring).
    """
    n = len(payload)
    pos = 0
    id3v2_bytes = 0
    if payload[:3] == b"ID3":
        if n < 10:
            raise ValueError("corrupt mp3: truncated ID3v2 header")
        size_bytes = payload[6:10]
        if any(b & 0x80 for b in size_bytes):
            raise ValueError("corrupt mp3: non-syncsafe ID3v2 size")
        size = 0
        for b in size_bytes:
            size = (size << 7) | b
        id3v2_bytes = 10 + size
        if id3v2_bytes > n:
            raise ValueError("corrupt mp3: ID3v2 size past end of payload")
        pos = id3v2_bytes

    end = n
    has_id3v1 = False
    if end - pos >= _ID3V1_LEN and payload[end - _ID3V1_LEN:end - _ID3V1_LEN + 3] == b"TAG":
        has_id3v1 = True
        end -= _ID3V1_LEN

    n_frames = 0
    kbps_sum = 0
    kbps_seen: set[int] = set()
    sample_rate = 0
    vbr_tag = ""
    while pos < end:
        if end - pos < 4:
            raise ValueError(f"corrupt mp3: {end - pos} trailing bytes at offset {pos}")
        b0, b1, b2 = payload[pos], payload[pos + 1], payload[pos + 2]
        if b0 != 0xFF or (b1 & 0xE0) != 0xE0:
            raise ValueError(f"corrupt mp3: lost frame sync at offset {pos}")
        version = (b1 >> 3) & 0x3
        if version != 0x3:
            raise NotImplementedError("MPEG-2/2.5 audio not supported")
        layer = (b1 >> 1) & 0x3
        if layer != 0x1:
            raise NotImplementedError("only Layer III supported")
        bri = b2 >> 4
        if bri == 0:
            raise NotImplementedError("free-format bitrate not supported")
        if bri == 15:
            raise ValueError(f"corrupt mp3: invalid bitrate index at offset {pos}")
        sri = (b2 >> 2) & 0x3
        if sri == 3:
            raise ValueError(f"corrupt mp3: reserved sample-rate index at offset {pos}")
        rate = SAMPLE_RATES[sri]
        if sample_rate and rate != sample_rate:
            raise ValueError(f"corrupt mp3: sample rate change at offset {pos}")
        sample_rate = rate
        pad = (b2 >> 1) & 0x1
        kbps = BITRATE_KBPS[bri]
        flen = frame_length(kbps, rate, pad)
        if pos + flen > end:
            raise ValueError(f"corrupt mp3: truncated frame at offset {pos}")
        if n_frames == 0:
            # mono streams carry 17 bytes of side info vs 32 for
            # stereo/joint/dual — the Xing/Info probe must follow the
            # channel-mode bits or mono VBR tags are silently missed
            toff = _vbr_tag_offset(payload[pos + 3] >> 6)
            tag = bytes(payload[pos + toff:pos + toff + 4])
            if tag in (b"Xing", b"Info"):
                vbr_tag = tag.decode("ascii")
        n_frames += 1
        kbps_sum += kbps
        kbps_seen.add(kbps)
        pos += flen

    if n_frames == 0:
        raise ValueError("corrupt mp3: no audio frames")
    return {
        "n_frames": n_frames,
        "sample_rate": sample_rate,
        "duration_ms": n_frames * SAMPLES_PER_FRAME * 1000 // sample_rate,
        "mode": "vbr" if len(kbps_seen) > 1 else "cbr",
        "avg_kbps": kbps_sum // n_frames,
        "id3v2_bytes": id3v2_bytes,
        "has_id3v1": has_id3v1,
        "vbr_tag": vbr_tag,
    }
