"""EXIF metadata: parse and strip — image-side PII handling.

A training-data pipeline must AUDIT crawl images for embedded
location data and STRIP metadata before the bytes enter a corpus —
the image analog of text PII redaction (operators/textops.py). This
module implements the public formats end-to-end with the stdlib:

* JPEG segment walk (SOI, FFxx length-prefixed segments, entropy data
  after SOS copied verbatim).
* EXIF APP1 parse: TIFF header in either byte order (II/MM), IFD0
  entry walk (Orientation SHORT inline, GPS-IFD LONG pointer), GPS
  sub-IFD (GPSLatitudeRef ASCII inline, GPSLatitude as three
  RATIONALs in the data area).
* ``strip_exif``: re-emit the stream without any EXIF APP1 segment —
  entropy-coded pixel data is untouched, so decode is bit-identical
  (pinned by the oracle's pixel_sum replay).

Corruption contract matches the codec tier: ValueError for corrupt
streams, NotImplementedError for valid-but-unsupported variants.
Layouts follow the public JPEG (ITU T.81) and TIFF 6.0 / EXIF specs.
"""

from __future__ import annotations

import struct

_SOI = b"\xff\xd8"
_EXIF_HEADER = b"Exif\x00\x00"

_TAG_ORIENTATION = 0x0112
_TAG_GPS_IFD = 0x8825
_TAG_GPS_LAT_REF = 0x0001
_TAG_GPS_LAT = 0x0002


def _segments(payload: bytes):
    """Yield (marker, start, end) for each length-prefixed segment;
    stops before SOS (entropy data follows it)."""
    if payload[:2] != _SOI:
        raise ValueError("not a JPEG payload")
    pos = 2
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError(f"corrupt JPEG: lost segment sync at {pos}")
        marker = payload[pos + 1]
        if marker in (0x00, 0xFF):
            # FF00 is entropy byte stuffing, FFFF is fill — neither is
            # a segment marker at the segment level
            raise ValueError(f"corrupt JPEG: invalid marker at {pos}")
        if marker == 0xDA:  # SOS
            return
        (ln,) = struct.unpack(">H", payload[pos + 2 : pos + 4])
        if pos + 2 + ln > len(payload):
            raise ValueError(f"corrupt JPEG: truncated segment at {pos}")
        yield marker, pos, pos + 2 + ln
        pos += 2 + ln
    raise ValueError("corrupt JPEG: no SOS segment")


def encode_exif_app1(
    *,
    orientation: int,
    byte_order: str = "II",
    gps: tuple[str, int, int, int] | None = None,
) -> bytes:
    """Assemble a real EXIF APP1 segment (fixture tier). ``gps`` is
    (ref, degrees, minutes, seconds_centi) — seconds are stored as the
    RATIONAL (seconds_centi, 100)."""
    if byte_order not in ("II", "MM"):
        raise ValueError("byte_order must be II or MM")
    e = "<" if byte_order == "II" else ">"

    def entry(tag: int, typ: int, count: int, value: bytes) -> bytes:
        return struct.pack(e + "HHI", tag, typ, count) + value.ljust(4, b"\x00")

    n_ifd0 = 2 if gps is not None else 1
    ifd0_end = 8 + 2 + n_ifd0 * 12 + 4
    entries = [
        entry(_TAG_ORIENTATION, 3, 1, struct.pack(e + "H", orientation)),
    ]
    body_after_gps_ifd = b""
    if gps is not None:
        ref, deg, minute, sec_centi = gps
        gps_ifd_off = ifd0_end
        lat_off = gps_ifd_off + 2 + 2 * 12 + 4
        entries.append(entry(_TAG_GPS_IFD, 4, 1, struct.pack(e + "I", gps_ifd_off)))
        ref_bytes = ref.encode("ascii") + b"\x00"
        lat_data = struct.pack(
            e + "IIIIII", deg, 1, minute, 1, sec_centi, 100
        )
        if len(ref_bytes) <= 4:
            ref_entry = entry(_TAG_GPS_LAT_REF, 2, len(ref_bytes), ref_bytes)
            tail = lat_data
        else:
            # TIFF 6.0 out-of-line value: the 4-byte field holds the
            # offset of the string, stored after the RATIONAL block
            ref_entry = entry(
                _TAG_GPS_LAT_REF, 2, len(ref_bytes),
                struct.pack(e + "I", lat_off + len(lat_data)),
            )
            tail = lat_data + ref_bytes
        gps_entries = [
            ref_entry,
            entry(_TAG_GPS_LAT, 5, 3, struct.pack(e + "I", lat_off)),
        ]
        body_after_gps_ifd = (
            struct.pack(e + "H", 2)
            + b"".join(gps_entries)
            + struct.pack(e + "I", 0)
            + tail
        )
    tiff = (
        (b"II" if byte_order == "II" else b"MM")
        + struct.pack(e + "H", 42)
        + struct.pack(e + "I", 8)
        + struct.pack(e + "H", n_ifd0)
        + b"".join(entries)
        + struct.pack(e + "I", 0)
        + body_after_gps_ifd
    )
    app1 = _EXIF_HEADER + tiff
    return b"\xff\xe1" + struct.pack(">H", len(app1) + 2) + app1


def insert_exif(jpeg: bytes, app1: bytes) -> bytes:
    """Place an APP1 segment directly after SOI."""
    if jpeg[:2] != _SOI:
        raise ValueError("not a JPEG payload")
    return _SOI + app1 + jpeg[2:]


def parse_exif(payload: bytes) -> dict:
    """Audit a JPEG's EXIF block. Returns {has_exif, byte_order,
    orientation, has_gps, gps_ref, lat_deg, lat_min, lat_sec_centi};
    absent fields are ''/-1/0 so the schema stays fixed. Corrupt tag
    blocks (offsets past the TIFF, torn entries) raise ValueError —
    low-level struct/index slips never escape (found by mutation
    fuzz: a corrupted IFD offset used to leak struct.error)."""
    try:
        return _parse_exif_inner(payload)
    except (struct.error, IndexError, UnicodeDecodeError) as e:
        raise ValueError(f"corrupt EXIF: {type(e).__name__}: {e}") from e


def _parse_exif_inner(payload: bytes) -> dict:
    out = {
        "has_exif": False, "byte_order": "", "orientation": -1,
        "has_gps": False, "gps_ref": "", "lat_deg": -1, "lat_min": -1,
        "lat_sec_centi": -1,
    }
    for marker, start, end in _segments(payload):
        if marker != 0xE1 or payload[start + 4 : start + 10] != _EXIF_HEADER:
            continue
        tiff = payload[start + 10 : end]
        bo = tiff[:2]
        if bo == b"II":
            e = "<"
        elif bo == b"MM":
            e = ">"
        else:
            raise ValueError("corrupt EXIF: bad TIFF byte order")
        (magic,) = struct.unpack_from(e + "H", tiff, 2)
        if magic != 42:
            raise ValueError("corrupt EXIF: bad TIFF magic")
        out["has_exif"] = True
        out["byte_order"] = bo.decode("ascii")
        (ifd0,) = struct.unpack_from(e + "I", tiff, 4)

        def entries(off: int):
            (n,) = struct.unpack_from(e + "H", tiff, off)
            for i in range(n):
                tag, typ, count = struct.unpack_from(e + "HHI", tiff, off + 2 + i * 12)
                yield tag, typ, count, off + 2 + i * 12 + 8

        gps_off = None
        for tag, typ, count, vpos in entries(ifd0):
            if tag == _TAG_ORIENTATION and typ == 3:
                (out["orientation"],) = struct.unpack_from(e + "H", tiff, vpos)
            elif tag == _TAG_GPS_IFD and typ == 4:
                (gps_off,) = struct.unpack_from(e + "I", tiff, vpos)
        if gps_off is not None:
            out["has_gps"] = True
            for tag, typ, count, vpos in entries(gps_off):
                if tag == _TAG_GPS_LAT_REF and typ == 2:
                    if count <= 4:
                        raw = tiff[vpos : vpos + count]
                    else:
                        # TIFF 6.0: a value wider than the 4-byte field
                        # is stored out-of-line; the field holds its
                        # offset — reading the offset bytes as ASCII
                        # yields garbage refs
                        (soff,) = struct.unpack_from(e + "I", tiff, vpos)
                        if soff + count > len(tiff):
                            raise ValueError(
                                "corrupt EXIF: ASCII value offset past TIFF end"
                            )
                        raw = tiff[soff : soff + count]
                    out["gps_ref"] = raw.split(b"\x00")[0].decode("ascii")
                elif tag == _TAG_GPS_LAT and typ == 5 and count == 3:
                    (doff,) = struct.unpack_from(e + "I", tiff, vpos)
                    d_n, d_d, m_n, m_d, s_n, s_d = struct.unpack_from(
                        e + "IIIIII", tiff, doff
                    )
                    if 0 in (d_d, m_d, s_d):
                        raise ValueError("corrupt EXIF: zero-denominator rational")
                    out["lat_deg"] = d_n // d_d
                    out["lat_min"] = m_n // m_d
                    out["lat_sec_centi"] = s_n * 100 // s_d
        return out
    return out


def strip_exif(payload: bytes) -> bytes:
    """Remove every EXIF APP1 segment; everything else — including the
    entropy-coded image data — is copied byte-for-byte."""
    drops = [
        (start, end)
        for marker, start, end in _segments(payload)
        if marker == 0xE1 and payload[start + 4 : start + 10] == _EXIF_HEADER
    ]
    if not drops:
        return payload
    out = bytearray()
    pos = 0
    for start, end in drops:
        out += payload[pos:start]
        pos = end
    out += payload[pos:]
    return bytes(out)
