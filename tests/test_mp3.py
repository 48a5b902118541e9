"""MP3 container-metadata walk (operators/mp3.py): spec arithmetic,
tag handling, typed corruption contract, and the JVM magic-byte
sniffer + quarantine plumbing on Spark."""

from __future__ import annotations

import pytest

from tera_spark.operators.mp3 import (
    BITRATE_KBPS,
    SAMPLE_RATES,
    encode_mp3,
    frame_length,
    parse_mp3,
)


def test_cbr_roundtrip_exact_fields():
    frames = [(9, 0)] * 12  # 128 kbps, no padding
    p = encode_mp3(frames, 0)  # 44100
    m = parse_mp3(p)
    assert m["n_frames"] == 12
    assert m["sample_rate"] == 44100
    assert m["mode"] == "cbr"
    assert m["avg_kbps"] == 128
    assert m["duration_ms"] == 12 * 1152 * 1000 // 44100
    assert m["id3v2_bytes"] == 0 and not m["has_id3v1"] and m["vbr_tag"] == ""
    assert len(p) == 12 * frame_length(128, 44100, 0)


def test_vbr_padding_and_tags():
    frames = [(1, 1), (14, 0), (5, 1)]  # 32/320/64 kbps
    p = encode_mp3(frames, 1, id3v2_payload=33, id3v1=True, vbr_tag=b"Xing")
    m = parse_mp3(p)
    assert m["n_frames"] == 3
    assert m["sample_rate"] == 48000
    assert m["mode"] == "vbr"
    assert m["avg_kbps"] == (32 + 320 + 64) // 3
    assert m["id3v2_bytes"] == 43  # 10-byte header + payload
    assert m["has_id3v1"]
    assert m["vbr_tag"] == "Xing"
    want = 43 + 128 + sum(frame_length(BITRATE_KBPS[b], 48000, pad) for b, pad in frames)
    assert len(p) == want


def test_info_tag_detected_cbr():
    p = encode_mp3([(3, 0)] * 4, 2, vbr_tag=b"Info")
    m = parse_mp3(p)
    assert m["vbr_tag"] == "Info" and m["mode"] == "cbr"
    assert m["sample_rate"] == 32000


def test_frame_length_spec_table():
    # hand-checked values of floor(144*bitrate/rate)+pad
    assert frame_length(128, 44100, 0) == 417
    assert frame_length(128, 44100, 1) == 418
    assert frame_length(32, 48000, 0) == 96
    assert frame_length(320, 32000, 1) == 1441


def test_id3v2_syncsafe_size_skipped():
    # payload 200 crosses the 7-bit boundary (needs two syncsafe bytes)
    p = encode_mp3([(2, 0)] * 2, 0, id3v2_payload=200)
    m = parse_mp3(p)
    assert m["id3v2_bytes"] == 210 and m["n_frames"] == 2


@pytest.mark.parametrize(
    "mutate,err",
    [
        (lambda p: p[:10], ValueError),  # frames truncated away entirely
        (lambda p: b"\x00" + p[1:], ValueError),  # lost sync
        # flipping frame 1 to MPEG-2 changes its frame-size arithmetic:
        # the walk (which now SUPPORTS MPEG-2) desyncs at frame 2 or
        # trips the mid-stream version-change check — corrupt either way
        (lambda p: p[:1] + bytes([p[1] & ~0x08]) + p[2:], ValueError),
        (lambda p: p[:1] + bytes([(p[1] & ~0x06) | 0x06]) + p[2:], NotImplementedError),  # Layer I
        (lambda p: p[:2] + bytes([0x0F << 4 | (p[2] & 0x0F)]) + p[3:], ValueError),  # bad bitrate
        # flipping frame 1 to free-format makes the sync scan land on
        # frame 2's HEADERED sync — a mixed stream, corrupt by the
        # constant-size free-format contract
        (lambda p: p[:2] + bytes([p[2] & 0x0F]) + p[3:], ValueError),
        (lambda p: p[:2] + bytes([(p[2] & ~0x0C) | 0x0C]) + p[3:], ValueError),  # reserved rate
        (lambda p: p[:-5], ValueError),  # truncated final frame
        (lambda p: p + b"\x01\x02", ValueError),  # trailing garbage
    ],
)
def test_corruption_contract_is_typed(mutate, err):
    p = encode_mp3([(9, 0)] * 3, 0)
    with pytest.raises(err):
        parse_mp3(mutate(p))


def test_id3v2_nonsyncsafe_and_oversized_rejected():
    p = encode_mp3([(9, 0)] * 2, 0, id3v2_payload=5)
    bad = p[:6] + b"\x80" + p[7:]
    with pytest.raises(ValueError):
        parse_mp3(bad)
    huge = p[:6] + b"\x7f\x7f\x7f\x7f" + p[10:]
    with pytest.raises(ValueError):
        parse_mp3(huge)


def test_sample_rate_change_midstream_rejected():
    a = encode_mp3([(9, 0)], 0)
    b = encode_mp3([(9, 0)], 1)
    with pytest.raises(ValueError):
        parse_mp3(a + b)


def test_empty_stream_rejected():
    with pytest.raises(ValueError):
        parse_mp3(b"")


def test_extract_and_sniff_on_spark(spark):
    from pyspark.sql import functions as F

    from tera_spark.operators.multimodal import (
        extract_mp3_metadata,
        sniff_formats,
        synth_mp3_media,
    )

    docs = spark.range(0, 40).select(
        F.col("id").alias("doc_id"), (F.col("id") * 37 % 211).alias("n_chars")
    )
    media = synth_mp3_media(docs)
    sniffed = {r["format"] for r in sniff_formats(media).select("format").collect()}
    assert sniffed == {"mp3"}

    rows = {r["asset_id"]: r for r in extract_mp3_metadata(media).collect()}
    assert len(rows) == 40
    for did, r in rows.items():
        n = did * 37 % 211
        assert r["n_frames"] == 30 + n % 40
        assert r["sample_rate"] == SAMPLE_RATES[did % 3]
        assert r["mode"] == ("vbr" if did % 2 == 0 else "cbr")
        assert r["vbr_tag"] == ("Xing" if did % 2 == 0 else "Info")
        assert r["has_id3v1"] == int(did % 5 == 0)


def test_quarantine_policy_on_garbage(spark):
    from pyspark.sql import functions as F

    from tera_spark.operators.multimodal import extract_mp3_metadata, synth_mp3_media

    docs = spark.range(0, 6).select(
        F.col("id").alias("doc_id"), F.lit(7).alias("n_chars")
    )
    media = synth_mp3_media(docs).withColumn(
        "payload",
        F.when(F.col("asset_id") % 2 == 0, F.expr("unhex('00DEADBEEF')")).otherwise(
            F.col("payload")
        ),
    )
    out = extract_mp3_metadata(media, on_error="quarantine").collect()
    bad = [r for r in out if r["n_frames"] == -1]
    good = [r for r in out if r["n_frames"] > 0]
    assert len(bad) == 3 and len(good) == 3
    with pytest.raises(Exception):
        extract_mp3_metadata(media, on_error="fail").collect()
    with pytest.raises(ValueError):
        extract_mp3_metadata(media, on_error="bogus")


def test_sniffer_classifies_every_magic(spark):
    from pyspark.sql import functions as F

    from tera_spark.operators.multimodal import sniff_format_col

    cases = [
        (b"\x89PNG\r\n\x1a\n" + b"\x00" * 8, "png"),
        (b"\xff\xd8\xff\xe0JFIF", "jpeg"),
        (b"GIF87a\x01\x00", "gif"),
        (b"GIF89a\x01\x00", "gif"),
        (b"RIFF\x10\x00\x00\x00WEBPVP8L", "webp"),
        (b"RIFF\x10\x00\x00\x00WAVEfmt ", "wav"),
        (b"YUV4MPEG2 W8 H6\n", "y4m"),
        (b"ID3\x04\x00\x00\x00\x00\x00\x00", "mp3"),
        (b"\xff\xfb\x90\x00" + b"\x00" * 8, "mp3"),  # raw frame sync
        (b"\xff\xe2\x10\x00", "mp3"),  # lowest sync variant 0xE0 bits
        (b"\xff\x7b\x00\x00", "unknown"),  # sync bits not set
        (b"RIFF\x10\x00\x00\x00AVI LIST", "unknown"),  # RIFF but not ours
        (b"", "unknown"),
        (b"plain text", "unknown"),
    ]
    df = spark.createDataFrame(
        [(i, bytearray(p)) for i, (p, _) in enumerate(cases)], "i int, payload binary"
    ).withColumn("format", sniff_format_col())
    got = {r["i"]: r["format"] for r in df.collect()}
    for i, (_, want) in enumerate(cases):
        assert got[i] == want, (i, got[i], want)


# ------------------------- property: round trip + typed-error fuzz

try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    _frames = st.lists(
        st.tuples(st.integers(1, 14), st.integers(0, 1)), min_size=1, max_size=40
    )

    @given(
        frames=_frames,
        sr=st.integers(0, 2),
        id3=st.one_of(st.none(), st.integers(0, 300)),
        v1=st.booleans(),
        tag=st.sampled_from([None, b"Xing", b"Info"]),
    )
    @settings(max_examples=60, deadline=None)
    def test_property_roundtrip(frames, sr, id3, v1, tag):
        p = encode_mp3(frames, sr, id3v2_payload=id3, id3v1=v1, vbr_tag=tag)
        m = parse_mp3(p)
        kbps = [BITRATE_KBPS[b] for b, _ in frames]
        assert m["n_frames"] == len(frames)
        assert m["sample_rate"] == SAMPLE_RATES[sr]
        assert m["mode"] == ("vbr" if len(set(kbps)) > 1 else "cbr")
        assert m["avg_kbps"] == sum(kbps) // len(kbps)
        assert m["id3v2_bytes"] == (0 if id3 is None else 10 + id3)
        assert m["has_id3v1"] == v1
        assert m["vbr_tag"] == (tag.decode() if tag else "")

    @given(
        frames=_frames,
        pos=st.integers(0, 10_000),
        val=st.integers(0, 255),
        data=st.data(),
    )
    @settings(max_examples=80, deadline=None)
    def test_property_mutation_never_escapes_typed_errors(frames, pos, val, data):
        """Any single-byte corruption either still parses (bytes can be
        coincidentally valid) or raises the TYPED errors — never an
        IndexError/struct slip out of the walk."""
        p = bytearray(encode_mp3(frames, 1, id3v2_payload=20))
        p[pos % len(p)] = val
        try:
            m = parse_mp3(bytes(p))
            assert m["n_frames"] >= 1
        except (ValueError, NotImplementedError):
            pass
except ImportError:  # hypothesis not in the container: plain tests above cover the spec
    pass


@pytest.mark.parametrize("version,rate0,spf", [("2", 22050, 576), ("2.5", 11025, 576)])
def test_mpeg2_and_25_walk(version, rate0, spf):
    """MPEG-2/2.5 Layer III: version-specific bitrate table, frame-size
    coefficient (72000), samples per frame (576), and side-info-aware
    VBR-tag offsets."""
    p = encode_mp3([(9, 0)] * 4, 0, version=version, vbr_tag=b"Xing")
    m = parse_mp3(p)
    assert m["version"] == version
    assert m["sample_rate"] == rate0
    assert m["n_frames"] == 4
    assert m["duration_ms"] == 4 * spf * 1000 // rate0
    assert m["avg_kbps"] == 80  # V2 table index 9
    assert m["vbr_tag"] == "Xing"


def test_mpeg2_mono_vbr_tag_offset():
    """MPEG-2 mono side info is 9 bytes — the smallest probe offset."""
    p = encode_mp3([(9, 0)] * 2, 1, version="2", vbr_tag=b"Info", channel_mode=3)
    m = parse_mp3(p)
    assert m["vbr_tag"] == "Info" and m["sample_rate"] == 24000


def test_reserved_version_bits_are_corrupt():
    p = bytearray(encode_mp3([(9, 0)] * 2, 0))
    p[1] = (p[1] & ~0x18) | 0x08  # version bits 0b01 = reserved
    with pytest.raises(ValueError, match="reserved MPEG version"):
        parse_mp3(bytes(p))


def test_mixed_version_stream_is_corrupt():
    a = encode_mp3([(9, 0)], 0, version="2")
    b = encode_mp3([(9, 0)], 0, version="2.5")
    with pytest.raises(ValueError):
        parse_mp3(a + b)


def test_free_format_multi_frame_walk():
    """Free format (bitrate index 0): constant frame size discovered
    by the sync scan, bitrate derived by inverting the spec formula."""
    p = encode_mp3([(0, 0)] * 5, 0, free_format_flen=500)
    m = parse_mp3(p)
    assert m["n_frames"] == 5
    assert m["sample_rate"] == 44100
    assert m["mode"] == "cbr"
    assert m["avg_kbps"] == 500 * 44100 // 144_000  # derived = 153
    assert len(p) == 5 * 500


def test_free_format_single_frame_and_tags():
    p = encode_mp3([(0, 0)], 1, free_format_flen=300, id3v1=True,
                   vbr_tag=b"Info")
    m = parse_mp3(p)
    assert m["n_frames"] == 1
    assert m["has_id3v1"] and m["vbr_tag"] == "Info"
    assert m["sample_rate"] == 48000


def test_free_format_mpeg2_walk():
    p = encode_mp3([(0, 0)] * 3, 2, free_format_flen=120, version="2")
    m = parse_mp3(p)
    assert m["version"] == "2" and m["n_frames"] == 3
    assert m["avg_kbps"] == 120 * 16000 // 72_000


def test_free_format_truncated_is_corrupt():
    p = encode_mp3([(0, 0)] * 3, 0, free_format_flen=400)
    with pytest.raises(ValueError):
        parse_mp3(p[:-7])


def test_headered_frame_inside_free_stream_is_corrupt():
    free = encode_mp3([(0, 0)] * 2, 0, free_format_flen=400)
    headered = encode_mp3([(9, 0)], 0)
    with pytest.raises(ValueError, match="headered frame"):
        parse_mp3(free + headered)
