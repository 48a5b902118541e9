"""MP3 (Layer III) container metadata: the frame-header walk.

A 100 TB crawl triages audio on container metadata — duration,
bitrate mode, sample rate, tag overhead — long before it spends
cycles decoding samples. This module makes that metadata tier REAL
and exact for MP3: ID3v2 skip (syncsafe size), frame-sync walk with
the Layer III bitrate/sample-rate tables for all three MPEG versions
(1 / 2 / 2.5 — version-specific frame-size coefficient, samples per
frame, and side-info widths) and padding arithmetic, Xing/Info
VBR-tag detection in the first frame (at the version- and
channel-mode-correct offset), and the trailing 128-byte ID3v1 tag.
The hybrid-filterbank *sample* decode is a documented permanent
non-goal (SURVEY.md §2.7) — the container walk never needs it, and
sample-level analysis runs on the lossless tier (WAV/µ-law/FLAC).

Reference parity: tera stores opaque byte values (README.md:31);
media triage is north-star LLM-pipeline surface, not reference
surface. Header layout and tables follow the public MPEG audio
specs (ISO/IEC 11172-3, 13818-3).

Free-format streams (bitrate index 0) are supported: the constant
frame size is discovered once by scanning for the next valid sync
with identical version/layer/rate bits, held for every frame, and
the bitrate derived by inverting the spec arithmetic; mixing
free-format and headered frames is corrupt per the constant-size
contract.

Corruption contract: like the other codecs, every parse failure is a
TYPED error — ValueError for corrupt streams (lost sync, reserved
version/indices, mid-stream version change, truncated frames,
trailing garbage, mixed free/headered frames), NotImplementedError
for valid-but-unsupported variants (Layer I/II) — so
`extract_features`-style on_error policies can rely on one contract.
"""

from __future__ import annotations

# Layer III bitrate tables (kbps), header index 1..14, by MPEG
# version. Index 0 = free format (unsupported), 15 = invalid.
BITRATE_KBPS = (None, 32, 40, 48, 56, 64, 80, 96, 112, 128,
                160, 192, 224, 256, 320)  # MPEG-1
BITRATE_KBPS_V2 = (None, 8, 16, 24, 32, 40, 48, 56, 64, 80,
                   96, 112, 128, 144, 160)  # MPEG-2 and 2.5
# Sample rates by header index 0..2 (3 = reserved), per version.
SAMPLE_RATES = (44100, 48000, 32000)         # MPEG-1
SAMPLE_RATES_V2 = (22050, 24000, 16000)      # MPEG-2
SAMPLE_RATES_V25 = (11025, 12000, 8000)      # MPEG-2.5
SAMPLES_PER_FRAME = 1152      # MPEG-1 Layer III
SAMPLES_PER_FRAME_V2 = 576    # MPEG-2/2.5 Layer III

# header version bits (byte 1, bits 4-3) -> (label, bitrates, rates,
# samples/frame, frame-size coefficient, side-info stereo/mono)
_VERSIONS = {
    0b11: ("1", BITRATE_KBPS, SAMPLE_RATES, 1152, 144_000, 32, 17),
    0b10: ("2", BITRATE_KBPS_V2, SAMPLE_RATES_V2, 576, 72_000, 17, 9),
    0b00: ("2.5", BITRATE_KBPS_V2, SAMPLE_RATES_V25, 576, 72_000, 17, 9),
}

# Side info follows the 4-byte header; real encoders place the
# Xing/Info tag right after it — so the probe offset depends on the
# version AND the frame's channel-mode bits (byte 3 top two bits;
# 0b11 = mono): MPEG-1 32/17 bytes, MPEG-2/2.5 17/9.


def _vbr_tag_offset(version_bits: int, channel_mode: int) -> int:
    _, _, _, _, _, si_stereo, si_mono = _VERSIONS[version_bits]
    return 4 + (si_mono if channel_mode == 3 else si_stereo)

_ID3V1_LEN = 128


def frame_length(
    kbps: int, sample_rate: int, padding: int, *, coeff: int = 144_000
) -> int:
    """Layer III frame size in bytes (spec: coeff*bitrate/rate; coeff
    is 144*1000 for MPEG-1, 72*1000 for MPEG-2/2.5)."""
    return coeff * kbps // sample_rate + padding


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
    version: str = "1",
    free_format_flen: int | None = None,
) -> bytes:
    """Assemble a real Layer III stream for fixtures.

    ``frames`` is a list of (bitrate_index 1..14, padding 0/1); each
    frame is a spec-exact header plus deterministic filler. When
    ``id3v2_payload`` is not None an ID3v2.4 tag of that payload size
    precedes the audio; ``id3v1`` appends the legacy 128-byte trailer;
    ``vbr_tag`` (b"Xing"/b"Info") lands at the encoder-standard offset
    in the first frame — right after the side info, whose size depends
    on ``version`` ("1", "2", "2.5") and ``channel_mode`` (0 stereo,
    1 joint, 2 dual, 3 mono): 32/17 bytes for MPEG-1, 17/9 for
    MPEG-2/2.5. ``free_format_flen`` emits a FREE-FORMAT stream
    instead: every frame has bitrate index 0 and that exact byte
    length (the spec's constant-size contract); the frames list then
    only sets the count, and filler avoids 0xFF so the decoder's
    sync scan has no false positives to reject.
    """
    if not 0 <= channel_mode <= 3:
        raise ValueError("channel_mode must be 0..3")
    vbits = {"1": 0b11, "2": 0b10, "2.5": 0b00}.get(version)
    if vbits is None:
        raise ValueError(f"version must be 1|2|2.5, got {version!r}")
    _, bitrates, rates, _, coeff, _, _ = _VERSIONS[vbits]
    out = bytearray()
    if id3v2_payload is not None:
        out += b"ID3\x04\x00\x00" + _syncsafe(id3v2_payload)
        out += bytes(i % 0x7F for i in range(id3v2_payload))
    rate = rates[sample_rate_idx]
    for fno, (bri, pad) in enumerate(frames):
        if free_format_flen is not None:
            if free_format_flen < 24:
                raise ValueError("free-format frame too small")
            bri, pad, flen = 0, 0, free_format_flen
        else:
            if not 1 <= bri <= 14:
                raise ValueError(f"bitrate index {bri} out of encodable range")
            flen = frame_length(bitrates[bri], rate, pad, coeff=coeff)
        hdr = bytes((
            0xFF,
            0xE0 | (vbits << 3) | 0x02 | 0x01,  # sync + version + Layer III + no CRC
            (bri << 4) | (sample_rate_idx << 2) | (pad << 1),
            channel_mode << 6,  # channel mode, no mode ext/flags
        ))
        fmod = 255 if free_format_flen is not None else 256  # %255 never yields 0xFF
        body = bytearray((fno * 29 + i * 7) % fmod for i in range(flen - 4))
        if fno == 0 and vbr_tag is not None:
            off = _vbr_tag_offset(vbits, channel_mode) - 4
            body[off:off + 4] = vbr_tag
        out += hdr + bytes(body)
    if id3v1:
        out += b"TAG" + bytes(125)
    return bytes(out)


def parse_mp3(payload: bytes) -> dict:
    """Walk an MP3 stream's frame headers; return container metadata.

    Returns ``{version ('1'|'2'|'2.5'), n_frames, sample_rate,
    duration_ms, mode ('cbr'|'vbr'), avg_kbps, id3v2_bytes, has_id3v1,
    vbr_tag (''|'Xing'|'Info')}``. Raises ValueError on corrupt
    streams and NotImplementedError on valid-but-unsupported variants
    (see module docstring).
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
    stream_vbits = None
    free_flen: int | None = None
    while pos < end:
        if end - pos < 4:
            raise ValueError(f"corrupt mp3: {end - pos} trailing bytes at offset {pos}")
        b0, b1, b2 = payload[pos], payload[pos + 1], payload[pos + 2]
        if b0 != 0xFF or (b1 & 0xE0) != 0xE0:
            raise ValueError(f"corrupt mp3: lost frame sync at offset {pos}")
        vbits = (b1 >> 3) & 0x3
        if vbits == 0b01:
            raise ValueError(f"corrupt mp3: reserved MPEG version at offset {pos}")
        if stream_vbits is None:
            stream_vbits = vbits
        elif vbits != stream_vbits:
            raise ValueError(f"corrupt mp3: MPEG version change at offset {pos}")
        _label, bitrates, rates, spf, coeff, _, _ = _VERSIONS[vbits]
        layer = (b1 >> 1) & 0x3
        if layer != 0x1:
            raise NotImplementedError("only Layer III supported")
        bri = b2 >> 4
        if bri == 15:
            raise ValueError(f"corrupt mp3: invalid bitrate index at offset {pos}")
        sri = (b2 >> 2) & 0x3
        if sri == 3:
            raise ValueError(f"corrupt mp3: reserved sample-rate index at offset {pos}")
        rate = rates[sri]
        if sample_rate and rate != sample_rate:
            raise ValueError(f"corrupt mp3: sample rate change at offset {pos}")
        sample_rate = rate
        pad = (b2 >> 1) & 0x1
        if bri == 0:
            # FREE FORMAT: bitrate index 0 means the (constant) frame
            # size is not in the header — discover it once by scanning
            # for the next header with identical version/layer/rate/
            # free-format bits, then hold every frame to it (the
            # spec's constant-size contract)
            if n_frames == 0:
                # a sync-looking byte pair can occur by COINCIDENCE in
                # the first frame's payload, so a candidate boundary is
                # only trusted when the boundary IT implies also parses
                # as a same-stream sync (or lands exactly at stream
                # end). Free-format candidates (bitrate index 0) imply
                # the next boundary at q + (q - pos); headered
                # candidates (a mixed — corrupt — stream) imply it at
                # q + their own header's frame length. A verified free
                # candidate always wins: a coincidence that slips past
                # one check cannot also beat the true boundary.
                def _sync_at(at: int) -> bool:
                    return (
                        at + 4 <= end
                        and payload[at] == 0xFF
                        and payload[at + 1] == b1
                        and (payload[at + 2] >> 4) != 15
                        and ((payload[at + 2] >> 2) & 0x3) == sri
                    )

                free_flen = None
                mixed_at: int | None = None
                q = pos + 24  # smallest plausible frame
                while q + 4 <= end:
                    if _sync_at(q):
                        c_bri = payload[q + 2] >> 4
                        if c_bri == 0:
                            nxt = q + (q - pos)
                            if nxt == end or _sync_at(nxt):
                                free_flen = q - pos
                                break
                        elif mixed_at is None:
                            c_pad = (payload[q + 2] >> 1) & 0x1
                            nxt = q + frame_length(
                                bitrates[c_bri], rate, c_pad, coeff=coeff
                            )
                            if nxt == end or _sync_at(nxt):
                                mixed_at = q
                    q += 1
                if free_flen is None and mixed_at is not None:
                    # verified HEADERED frame after a free-format one:
                    # hold the walk to that boundary so the
                    # mixed-stream check below reports it
                    free_flen = mixed_at - pos
                if free_flen is None:
                    free_flen = end - pos  # single-frame stream
            elif free_flen is None:
                raise ValueError(
                    f"corrupt mp3: free-format frame in a headered stream at offset {pos}"
                )
            kbps = free_flen * rate // coeff  # derived, spec arithmetic inverted
            flen = free_flen
        else:
            if n_frames and free_flen is not None:
                raise ValueError(
                    f"corrupt mp3: headered frame in a free-format stream at offset {pos}"
                )
            kbps = bitrates[bri]
            flen = frame_length(kbps, rate, pad, coeff=coeff)
        if pos + flen > end:
            raise ValueError(f"corrupt mp3: truncated frame at offset {pos}")
        if n_frames == 0:
            # the Xing/Info probe must follow the side-info size —
            # version- and channel-mode-dependent (mono MPEG-1 = 17
            # bytes, MPEG-2/2.5 = 17/9) — or VBR tags are silently
            # missed on everything but stereo MPEG-1
            toff = _vbr_tag_offset(vbits, payload[pos + 3] >> 6)
            tag = bytes(payload[pos + toff:pos + toff + 4])
            if tag in (b"Xing", b"Info"):
                vbr_tag = tag.decode("ascii")
        n_frames += 1
        kbps_sum += kbps
        kbps_seen.add(kbps)
        pos += flen

    if n_frames == 0:
        raise ValueError("corrupt mp3: no audio frames")
    spf = _VERSIONS[stream_vbits][3]
    return {
        "version": _VERSIONS[stream_vbits][0],
        "n_frames": n_frames,
        "sample_rate": sample_rate,
        "duration_ms": n_frames * spf * 1000 // sample_rate,
        "mode": "vbr" if len(kbps_seen) > 1 else "cbr",
        "avg_kbps": kbps_sum // n_frames,
        "id3v2_bytes": id3v2_bytes,
        "has_id3v1": has_id3v1,
        "vbr_tag": vbr_tag,
    }
