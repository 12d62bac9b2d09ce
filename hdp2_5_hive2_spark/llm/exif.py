"""EXIF metadata audit + strip for JPEG payloads — image-side PII.

Crawled images carry EXIF blocks (an embedded little/big-endian TIFF
IFD inside the JPEG APP1 segment, per the public EXIF/JEITA spec) whose
GPS sub-IFD is a privacy liability and whose orientation tag changes
display semantics. A curation pipeline needs to (a) AUDIT — does this
image carry EXIF? GPS coordinates? what orientation/camera? — and
(b) SCRUB — remove the metadata WITHOUT transcoding pixels, which is a
pure segment-level operation on the JPEG container (drop APP1/APP13
segments, keep entropy-coded data byte-identical).

Implementation reuses the TIFF IFD machinery (`llm/tiff.py` parses the
same structure — EXIF literally embeds a TIFF header) and the JPEG
marker grammar (u16 big-endian segment lengths between SOI and SOS).

Scale: both operations are map-side byte passes behind the usual Arrow
seam; `exif_strip` never touches entropy-coded data, so scrubbing a
petabyte of JPEGs is IO-bound, not codec-bound."""

from __future__ import annotations

import struct
from dataclasses import dataclass

__all__ = ["ExifAudit", "exif_audit", "exif_strip", "build_exif_app1"]

_ORIENTATION = 0x0112
_MAKE = 0x010F
_MODEL = 0x0110
_GPS_IFD = 0x8825
_EXIF_IFD = 0x8769


@dataclass
class ExifAudit:
    has_exif: bool
    has_gps: bool
    orientation: int | None
    make: str | None
    model: str | None
    n_tags: int


def _jpeg_segments(data: bytes):
    """Yield (marker, seg_start, seg_end) for every marker segment up to
    SOS; entropy-coded data follows SOS and is not segment-framed."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    n = len(data)
    while pos + 4 <= n:
        if data[pos] != 0xFF:
            raise ValueError("JPEG corrupt: lost marker sync")
        marker = data[pos + 1]
        if marker == 0xD9:  # EOI
            return
        if marker == 0xDA:  # SOS — entropy data begins
            yield marker, pos, n
            return
        (ln,) = struct.unpack_from(">H", data, pos + 2)
        if ln < 2 or pos + 2 + ln > n:
            raise ValueError("JPEG corrupt: segment overruns file")
        yield marker, pos, pos + 2 + ln
        pos += 2 + ln


def exif_audit(data: bytes) -> ExifAudit:
    """Parse the APP1 Exif block (when present) via the shared TIFF IFD
    reader: orientation, camera strings, GPS sub-IFD presence."""
    from hdp2_5_hive2_spark.llm.tiff import _read_ifd

    for marker, s, e in _jpeg_segments(data):
        if marker != 0xE1:
            continue
        body = data[s + 4 : e]
        if body[:6] != b"Exif\x00\x00":
            continue
        tiff = body[6:]
        if tiff[:4] == b"II*\x00":
            endian = "<"
        elif tiff[:4] == b"MM\x00*":
            endian = ">"
        else:
            raise ValueError("EXIF corrupt: bad TIFF header in APP1")
        try:
            (ifd_off,) = struct.unpack_from(endian + "I", tiff, 4)
            tags = _read_ifd(tiff, ifd_off, endian)
        except (struct.error, ValueError) as exc:
            raise ValueError(f"EXIF corrupt: {exc}") from None

        def _ascii(tag):
            vals = tags.get(tag)
            if not vals:
                return None
            return bytes(v & 0xFF for v in vals).split(b"\x00")[0].decode(
                "ascii", "replace"
            ) or None

        return ExifAudit(
            True,
            _GPS_IFD in tags,
            tags.get(_ORIENTATION, [None])[0],
            _ascii(_MAKE),
            _ascii(_MODEL),
            len(tags),
        )
    return ExifAudit(False, False, None, None, None, 0)


def exif_strip(data: bytes, drop_markers: tuple[int, ...] = (0xE1, 0xED)) -> bytes:
    """Remove APP1 (EXIF/XMP) and APP13 (IPTC) segments; every other
    byte — including the entropy-coded pixel data — passes through
    untouched, so the image decodes identically."""
    out = bytearray(data[:2])
    for marker, s, e in _jpeg_segments(data):
        if marker in drop_markers:
            continue
        out += data[s:e]
    return bytes(out)


def build_exif_app1(
    orientation: int = 1,
    make: str | None = None,
    with_gps: bool = False,
) -> bytes:
    """A spec-shaped little-endian EXIF APP1 segment for fixtures
    (entries sorted by tag per the TIFF requirement)."""

    def entry(tag, typ, count, value):
        return struct.pack("<HHII", tag, typ, count, value)

    make_b = (make.encode("ascii") + b"\x00") if make else b""
    make_external = len(make_b) > 4
    n = 2 + (1 if make else 0) + (1 if with_gps else 0)
    data_off = 8 + 2 + n * 12 + 4  # TIFF hdr + count + entries + next-IFD

    ents = []
    if make:
        if make_external:
            ents.append(entry(_MAKE, 2, len(make_b), data_off))
        else:
            ents.append(entry(_MAKE, 2, len(make_b),
                              int.from_bytes(make_b.ljust(4, b"\x00"), "little")))
    ents.append(entry(_ORIENTATION, 3, 1, orientation))
    ents.append(entry(0x0131, 2, 4, int.from_bytes(b"eng\x00", "little")))
    ext = make_b if make_external else b""
    if with_gps:
        ents.append(entry(_GPS_IFD, 4, 1, data_off + len(ext)))
    ents.sort(key=lambda b: struct.unpack("<H", b[:2])[0])
    ifd = struct.pack("<H", len(ents)) + b"".join(ents) + struct.pack("<I", 0)
    tiff = b"II*\x00" + struct.pack("<I", 8) + ifd + ext
    if with_gps:
        # minimal GPS sub-IFD: zero entries + next-IFD 0
        tiff += struct.pack("<H", 0) + struct.pack("<I", 0)
    body = b"Exif\x00\x00" + tiff
    return b"\xff\xe1" + struct.pack(">H", len(body) + 2) + body
