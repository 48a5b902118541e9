"""Regression tests for the round-6 ADVICE findings: mono-aware MP3
VBR-tag probe, TIFF out-of-line ASCII GPS refs, and the media-triage
fold running the MP3 deep walk exactly once per epoch."""

from __future__ import annotations

import pytest

from tera_spark.operators.mp3 import encode_mp3, parse_mp3


def test_mono_vbr_tag_detected():
    """MPEG-1 mono side info is 17 bytes, not 32 — the Xing/Info probe
    must follow the channel-mode bits or mono VBR streams silently
    report vbr_tag=''."""
    mono = encode_mp3([(9, 0)] * 3, 0, vbr_tag=b"Xing", channel_mode=3)
    assert parse_mp3(mono)["vbr_tag"] == "Xing"
    # and the stereo offset still works
    stereo = encode_mp3([(9, 0)] * 3, 0, vbr_tag=b"Info", channel_mode=0)
    assert parse_mp3(stereo)["vbr_tag"] == "Info"


def test_mono_without_tag_reports_empty():
    mono = encode_mp3([(9, 0)] * 3, 0, channel_mode=3)
    assert parse_mp3(mono)["vbr_tag"] == ""


def test_stereo_tag_not_misread_at_mono_offset():
    """A stereo stream whose filler bytes happen to spell nothing at
    offset 21 must not probe there: the tag sits at 36 only."""
    stereo = encode_mp3([(9, 0)] * 2, 1, vbr_tag=b"Xing")
    meta = parse_mp3(stereo)
    assert meta["vbr_tag"] == "Xing"
    assert meta["n_frames"] == 2


@pytest.mark.parametrize("bo", ["II", "MM"])
def test_exif_out_of_line_ascii_ref(bo):
    """GPSLatitudeRef with count > 4 stores an OFFSET in the 4-byte
    field (TIFF 6.0); the parser must dereference it, not read the
    offset bytes as the string."""
    from tera_spark.operators.exif import (
        encode_exif_app1,
        insert_exif,
        parse_exif,
    )

    base = b"\xff\xd8\xff\xdb\x00\x04\x00\x00\xff\xda\x00\x02end"
    app1 = encode_exif_app1(
        orientation=1, byte_order=bo, gps=("NORTH", 48, 51, 2412)
    )
    meta = parse_exif(insert_exif(base, app1))
    assert meta["has_gps"]
    assert meta["gps_ref"] == "NORTH"
    assert (meta["lat_deg"], meta["lat_min"], meta["lat_sec_centi"]) == (48, 51, 2412)


def test_exif_out_of_line_ref_bad_offset_raises():
    """An out-of-line ASCII offset past the TIFF block is corrupt, not
    garbage-returned."""
    import struct

    from tera_spark.operators.exif import (
        encode_exif_app1,
        insert_exif,
        parse_exif,
    )

    base = b"\xff\xd8\xff\xda\x00\x02end"
    app1 = bytearray(
        encode_exif_app1(orientation=1, byte_order="II", gps=("NORTH", 1, 2, 300))
    )
    # find the out-of-line ref offset field and point it past the end
    tiff = bytes(app1[10:])
    soff = tiff.find(b"NORTH\x00")
    assert soff > 0
    pos = app1.find(struct.pack("<I", soff))
    assert pos > 0
    app1[pos : pos + 4] = struct.pack("<I", len(tiff) + 100)
    with pytest.raises(ValueError, match="corrupt EXIF"):
        parse_exif(insert_exif(base, bytes(app1)))


def test_inline_short_ref_still_inline():
    from tera_spark.operators.exif import (
        encode_exif_app1,
        insert_exif,
        parse_exif,
    )

    base = b"\xff\xd8\xff\xda\x00\x02end"
    app1 = encode_exif_app1(orientation=6, byte_order="MM", gps=("N", 10, 20, 3000))
    meta = parse_exif(insert_exif(base, app1))
    assert meta["gps_ref"] == "N"
    assert meta["orientation"] == 6


def test_media_triage_walks_mp3_once_per_epoch(spark, tmp_path, monkeypatch):
    """The quarantine write IS the persist: the census join must read
    the written partition back, not re-run extract_mp3_metadata (the
    epoch's most expensive Python stage) a second time."""
    from tera_spark.operators import multimodal as MM
    from tera_spark.streaming.media_triage import MediaTriage

    calls = []
    real = MM.extract_mp3_metadata

    def counting(df, **kw):
        calls.append(1)
        return real(df, **kw)

    monkeypatch.setattr(MM, "extract_mp3_metadata", counting)

    good = encode_mp3([(9, 0)] * 2, 0)
    rows = [(1, bytearray(good)), (2, bytearray(b"\xff\xfb corrupt")),
            (3, bytearray(b"GIF89a tail"))]
    batch = spark.createDataFrame(rows, "asset_id long, payload binary")
    tri = MediaTriage(spark, str(tmp_path / "triage"))
    tri.fold(batch, epoch_id=0)
    assert calls == [1]
    census = {r["format"]: r for r in tri.census().collect()}
    assert census["mp3"]["n_quarantined"] == 1
    assert census["mp3"]["n_assets"] == 2


def test_lsh_bucket_stats_surfaces_hot_bucket(spark):
    """A boilerplate corpus (many identical docs) must show up as a
    single hot bucket per band with quadratic candidate-pair volume —
    the condition the dashboard exists to catch BEFORE pair
    generation."""
    from pyspark.sql import functions as F

    from tera_spark.operators.dedup import lsh_bucket_stats

    n_hot = 40
    docs = spark.range(n_hot + 10).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < n_hot, F.lit("same boilerplate text repeated all over"))
        .otherwise(F.concat(F.lit("unique text number "), F.col("id").cast("string"),
                            F.lit(" with words beyond any shared shingle window")))
        .alias("text"),
    )
    rows = {r.band: r for r in lsh_bucket_stats(docs, cap=16).collect()}
    assert set(rows) == {0, 1, 2, 3}
    for r in rows.values():
        assert r.max_bucket >= n_hot
        assert r.n_over_cap >= 1
        assert r.candidate_pairs >= n_hot * (n_hot - 1) // 2


def test_media_triage_quarantines_corrupt_flac(spark, tmp_path):
    """FLAC joined the triage deep walk: a stream whose frame CRC (or
    PCM MD5) is corrupt lands in quarantine; the intact one counts
    clean. MP3 routing is unaffected."""
    from tera_spark.operators.flac import encode_flac
    from tera_spark.streaming.media_triage import MediaTriage

    good = encode_flac([[((i * 17) % 200) - 100 for i in range(96)]], 8000)
    corrupt = bytearray(good)
    corrupt[-10] ^= 0xFF  # inside the last frame: CRC-16 must trip
    rows = [
        (1, bytearray(good)),
        (2, corrupt),
        (3, bytearray(encode_mp3([(9, 0)] * 2, 0))),
    ]
    batch = spark.createDataFrame(rows, "asset_id long, payload binary")
    tri = MediaTriage(spark, str(tmp_path / "triage_flac"))
    tri.fold(batch, epoch_id=0)
    census = {r["format"]: r for r in tri.census().collect()}
    assert census["flac"]["n_assets"] == 2
    assert census["flac"]["n_quarantined"] == 1
    assert census["mp3"]["n_quarantined"] == 0
    q = {r.asset_id for r in tri.quarantine().collect()}
    assert q == {2}


# ------------------------- round-7 codec-stub closures (PNG Adam7)


@pytest.mark.parametrize("w,h", [(1, 1), (3, 3), (7, 5), (8, 8), (17, 13), (64, 48)])
def test_png_adam7_roundtrip_matches_progressive(w, h):
    """An Adam7-interlaced encode of the same plane must decode to the
    bit-identical pixel buffer as the progressive encode — including
    dimensions where several passes are empty (1x1, 3x3)."""
    from tera_spark.operators.multimodal import decode_png, encode_png_gray

    pixels = bytes((x * 31 + 7) % 256 for x in range(w * h))
    plain = decode_png(encode_png_gray(w, h, pixels))
    inter = decode_png(encode_png_gray(w, h, pixels, interlace=True))
    assert plain["pixels"] == pixels
    assert inter == plain


def test_png_bad_interlace_method_is_corrupt():
    import struct

    from tera_spark.operators.multimodal import decode_png, encode_png_gray

    p = bytearray(encode_png_gray(4, 4, bytes(16)))
    # IHDR body starts at 16; interlace byte is its 13th byte
    p[16 + 12] = 2
    # fix the IHDR CRC so the interlace check is what fires
    import zlib as _z

    body = bytes(p[12:16]) + bytes(p[16:29])
    p[29:33] = struct.pack(">I", _z.crc32(body) & 0xFFFFFFFF)
    with pytest.raises(ValueError, match="interlace"):
        decode_png(bytes(p))


def test_png_interlaced_truncated_stream_is_corrupt():
    from tera_spark.operators.multimodal import decode_png, encode_png_gray
    import struct
    import zlib as _z

    good = encode_png_gray(16, 16, bytes(range(256)), interlace=True)
    # re-deflate a truncated scanline stream under a valid chunk CRC
    raw_pix = bytes(range(256))
    # craft: reuse encoder but chop the inflated stream by hand
    ihdr = struct.pack(">IIBBBBB", 16, 16, 8, 0, 0, 0, 1)

    def chunk(tag, body):
        return (struct.pack(">I", len(body)) + tag + body
                + struct.pack(">I", _z.crc32(tag + body) & 0xFFFFFFFF))

    # steal the real interlaced stream, drop its last 40 inflated bytes
    # (layout: 8 magic + 25 IHDR chunk + 8 IDAT len/tag .. body .. 4 crc + 12 IEND)
    full = _z.decompress(good[8 + 25 + 8 : -12 - 4])
    short = _z.compress(full[:-40], 6)
    bad = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
           + chunk(b"IDAT", short) + chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="corrupt PNG"):
        decode_png(bad)


def test_jpeg_16bit_dqt_round_trip():
    """Extended-precision (Pq=1) quant tables decode identically to the
    8-bit form when the values are equal — the variant some encoders
    emit in baseline-marked files."""
    from tera_spark.operators.jpeg import decode_jpeg, encode_jpeg_gray

    pixels = bytes(((x % 8 >= 4) * 96 + 64) for x in range(16 * 16))
    narrow = decode_jpeg(encode_jpeg_gray(16, 16, pixels))
    wide = decode_jpeg(encode_jpeg_gray(16, 16, pixels, wide_dqt=True))
    assert wide == narrow


def test_jpeg_bad_dqt_precision_is_corrupt():
    from tera_spark.operators.jpeg import decode_jpeg, encode_jpeg_gray

    p = bytearray(encode_jpeg_gray(8, 8, bytes([100] * 64)))
    dqt = p.find(b"\xff\xdb")
    p[dqt + 4] = 0x20 | (p[dqt + 4] & 0x0F)  # Pq=2: not a thing
    with pytest.raises(ValueError):
        decode_jpeg(bytes(p))


def test_jpeg_torn_wide_dqt_is_corrupt():
    from tera_spark.operators.jpeg import decode_jpeg, encode_jpeg_gray

    p = bytearray(encode_jpeg_gray(8, 8, bytes([100] * 64), wide_dqt=True))
    dqt = p.find(b"\xff\xdb")
    p[dqt + 2 : dqt + 4] = (67).to_bytes(2, "big")  # lie: 8-bit-sized segment
    with pytest.raises(ValueError):
        decode_jpeg(bytes(p))
