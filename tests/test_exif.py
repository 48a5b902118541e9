"""EXIF audit/strip (operators/exif.py): TIFF both byte orders, GPS
on/off, bit-exact strip, typed corruption contract, multi-APP1."""

from __future__ import annotations

import struct

import pytest

from tera_spark.operators.exif import (
    encode_exif_app1,
    insert_exif,
    parse_exif,
    strip_exif,
)
from tera_spark.operators.jpeg import decode_jpeg, encode_jpeg_gray

JP = encode_jpeg_gray(8, 8, bytes([55]) * 64)


def test_roundtrip_both_orders_and_gps_modes():
    for bo in ("II", "MM"):
        for gps in (None, ("N", 12, 34, 567), ("S", 89, 59, 5999)):
            tagged = insert_exif(JP, encode_exif_app1(orientation=3, byte_order=bo, gps=gps))
            m = parse_exif(tagged)
            assert (m["has_exif"], m["byte_order"], m["orientation"]) == (True, bo, 3)
            if gps is None:
                assert not m["has_gps"] and m["lat_deg"] == -1
            else:
                assert (m["gps_ref"], m["lat_deg"], m["lat_min"], m["lat_sec_centi"]) == gps


def test_strip_restores_original_bytes_and_is_idempotent():
    tagged = insert_exif(JP, encode_exif_app1(orientation=1, gps=("N", 1, 2, 3)))
    stripped = strip_exif(tagged)
    assert stripped == JP
    assert strip_exif(stripped) == JP  # idempotent / no-op without EXIF
    assert decode_jpeg(stripped)["pixels"] == decode_jpeg(tagged)["pixels"]


def test_multiple_app1_segments_all_removed():
    a1 = encode_exif_app1(orientation=2)
    a2 = encode_exif_app1(orientation=7, gps=("S", 10, 20, 30))
    tagged = insert_exif(insert_exif(JP, a1), a2)
    assert strip_exif(tagged) == JP
    # audit reads the FIRST exif block (a2 was inserted closest to SOI)
    assert parse_exif(tagged)["orientation"] == 7


def test_non_exif_app1_is_preserved():
    xmp = b"\xff\xe1" + struct.pack(">H", 2 + 10) + b"http://xmp"
    tagged = insert_exif(JP, xmp)
    assert strip_exif(tagged) == tagged  # only EXIF APP1 is dropped
    assert not parse_exif(tagged)["has_exif"]


def test_plain_jpeg_audits_empty():
    m = parse_exif(JP)
    assert not m["has_exif"] and m["byte_order"] == "" and m["orientation"] == -1


@pytest.mark.parametrize(
    "mutate",
    [
        lambda p: b"XX" + p[2:],  # not a JPEG
        lambda p: p[:3] + bytes([0x00]) + p[4:],  # lost segment sync
        lambda p: p[:20],  # truncated mid segment
    ],
)
def test_corrupt_jpeg_walk_is_typed(mutate):
    tagged = insert_exif(JP, encode_exif_app1(orientation=1))
    with pytest.raises(ValueError):
        parse_exif(mutate(tagged))
    with pytest.raises(ValueError):
        strip_exif(mutate(tagged))


def test_corrupt_tiff_is_typed():
    app1 = encode_exif_app1(orientation=1, gps=("N", 1, 2, 3))
    bad_order = app1[:10] + b"XX" + app1[12:]
    with pytest.raises(ValueError):
        parse_exif(insert_exif(JP, bad_order))
    # zero-denominator rational: the GPS latitude data area is the
    # last 24 bytes of the APP1 — zero the degree denominator there
    zero_den = app1[:-24] + struct.pack("<IIIIII", 1, 0, 2, 1, 3, 100)
    with pytest.raises(ValueError):
        parse_exif(insert_exif(JP, zero_den))


def test_encoder_rejects_bad_byte_order():
    with pytest.raises(ValueError):
        encode_exif_app1(orientation=1, byte_order="XX")


# ------------------------- property: mutation never escapes typed errors

try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @given(
        pos=st.integers(0, 10_000),
        val=st.integers(0, 255),
        orient=st.integers(1, 8),
        gps=st.booleans(),
        bo=st.sampled_from(["II", "MM"]),
    )
    @settings(max_examples=80, deadline=None)
    def test_property_exif_mutation_stays_typed(pos, val, orient, gps, bo):
        """Any single-byte corruption of a tagged JPEG either still
        audits/strips (bytes can be coincidentally valid) or raises the
        typed errors — never an IndexError/struct slip."""
        p = bytearray(
            insert_exif(
                JP,
                encode_exif_app1(
                    orientation=orient,
                    byte_order=bo,
                    gps=("N", 10, 20, 30) if gps else None,
                ),
            )
        )
        p[pos % len(p)] = val
        for fn in (parse_exif, strip_exif):
            try:
                fn(bytes(p))
            except (ValueError, NotImplementedError):
                pass
except ImportError:
    pass
