"""Baseline TIFF codec from the TIFF 6.0 specification.

Scanned-document corpora (OCR training data, archival digitization) are
TIFF-heavy, so the image family gets the same treatment as PNG/JPEG:
decode from the published spec, independent cross-parity against an
implementation we don't control (javax.imageio ships a TIFF plugin since
Java 9 — tests/test_tiff.py round-trips against it both directions).

Scope (TIFF 6.0 baseline): II/MM byte orders, IFD walk with the
BYTE/SHORT/LONG value types, 8-bit grayscale and RGB in chunky planar
config, strip organization (any RowsPerStrip), Compression 1 (none),
32773 (PackBits — the spec's run-length scheme) and 5 (LZW, decode-only:
MSB-first code packing with the early-change convention, the variant
TIFF mandates — distinct from GIF's LSB packing). WhiteIsZero
photometric inverts per spec. Tiled TIFFs and 16-bit samples raise
cleanly. The encoder emits none/PackBits for fixtures and migration.

Hostile-input contract as everywhere: ValueError only, fuzz-pinned.
Runs behind the PixelCodec seam map-side like every other codec.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["tiff_decode", "tiff_encode"]

_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8}


def _read_ifd(data: bytes, off: int, e: str) -> dict[int, list[int]]:
    if off + 2 > len(data):
        raise ValueError("TIFF corrupt: IFD offset past EOF")
    (n,) = struct.unpack_from(e + "H", data, off)
    tags: dict[int, list[int]] = {}
    pos = off + 2
    for _ in range(n):
        if pos + 12 > len(data):
            raise ValueError("TIFF corrupt: truncated IFD entry")
        tag, typ, count = struct.unpack_from(e + "HHI", data, pos)
        size = _TYPE_SIZE.get(typ)
        if size is None:
            pos += 12
            continue  # unknown value type: skip per spec
        total = size * count
        if total <= 4:
            voff = pos + 8
        else:
            (voff,) = struct.unpack_from(e + "I", data, pos + 8)
        if voff + total > len(data):
            raise ValueError("TIFF corrupt: tag value past EOF")
        fmt = {1: "B", 2: "B", 3: "H", 4: "I"}.get(typ)
        if fmt:
            tags[tag] = list(
                struct.unpack_from(e + fmt * count, data, voff)
            )
        else:  # RATIONAL: keep numerators (unused by the baseline tags)
            tags[tag] = [
                struct.unpack_from(e + "II", data, voff + 8 * i)[0]
                for i in range(count)
            ]
        pos += 12
    return tags


def _packbits_decode(src: bytes, expect: int) -> bytes:
    out = bytearray()
    i = 0
    while i < len(src) and len(out) < expect:
        n = src[i]
        i += 1
        if n < 128:
            out += src[i : i + n + 1]
            i += n + 1
        elif n > 128:
            if i >= len(src):
                raise ValueError("TIFF corrupt: truncated PackBits run")
            out += src[i : i + 1] * (257 - n)
            i += 1
        # n == 128: no-op per spec
    if len(out) < expect:
        raise ValueError("TIFF corrupt: PackBits underrun")
    return bytes(out[:expect])


def _packbits_encode(row: bytes) -> bytes:
    out = bytearray()
    i = 0
    n = len(row)
    while i < n:
        run = 1
        while i + run < n and row[i + run] == row[i] and run < 128:
            run += 1
        if run >= 2:
            out.append(257 - run)
            out.append(row[i])
            i += run
            continue
        lit_start = i
        while (
            i < n
            and (i + 2 >= n or not (row[i] == row[i + 1] == row[i + 2]))
            and i - lit_start < 128
        ):
            i += 1
        out.append(i - lit_start - 1)
        out += row[lit_start:i]
    return bytes(out)


def _lzw_decode(src: bytes, expect: int) -> bytes:
    """TIFF LZW (spec section 13): MSB-first code packing, Clear=256,
    EOI=257, first dynamic code 258, EARLY code-width change (at table
    size 2^n - 1, one code earlier than GIF)."""
    out = bytearray()
    table: list[bytes] = [bytes([i]) for i in range(256)] + [b"", b""]
    width = 9
    acc = nbits = 0
    prev: bytes | None = None
    for byte in src:
        acc = (acc << 8) | byte
        nbits += 8
        while nbits >= width:
            code = (acc >> (nbits - width)) & ((1 << width) - 1)
            nbits -= width
            if code == 256:  # Clear
                table = table[:258]
                width = 9
                prev = None
                continue
            if code == 257:  # EOI
                if len(out) < expect:
                    raise ValueError("TIFF corrupt: LZW ended early")
                return bytes(out[:expect])
            if prev is None:
                if code >= len(table):
                    raise ValueError("TIFF corrupt: bad first LZW code")
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                table.append(prev + entry[:1])
            elif code == len(table):
                entry = prev + prev[:1]
                table.append(entry)
            else:
                raise ValueError("TIFF corrupt: LZW code out of range")
            out += entry
            prev = entry
            if len(table) == (1 << width) - 1 and width < 12:  # early change
                width += 1
            if len(out) >= expect:
                return bytes(out[:expect])
    if len(out) < expect:
        raise ValueError("TIFF corrupt: LZW stream underrun")
    return bytes(out[:expect])


def tiff_decode(data: bytes) -> np.ndarray:
    """TIFF → uint8 (H, W) gray or (H, W, 3) RGB."""
    if data[:4] == b"II*\x00":
        e = "<"
    elif data[:4] == b"MM\x00*":
        e = ">"
    else:
        raise ValueError("not a TIFF (bad byte-order header)")
    try:
        (ifd_off,) = struct.unpack_from(e + "I", data, 4)
        tags = _read_ifd(data, ifd_off, e)
    except struct.error as exc:
        raise ValueError(f"TIFF corrupt: {exc}") from None
    try:
        width = tags[256][0]
        height = tags[257][0]
        offsets = tags[273]
        counts = tags[279]
    except KeyError as exc:
        raise ValueError(f"TIFF corrupt: missing required tag {exc}") from None
    bits = tags.get(258, [8])
    if any(b != 8 for b in bits):
        raise ValueError("TIFF: only 8-bit samples supported")
    spp = tags.get(277, [len(bits)])[0]
    if spp not in (1, 3):
        raise ValueError(f"TIFF: {spp} samples/pixel unsupported")
    if tags.get(284, [1])[0] != 1:
        raise ValueError("TIFF: planar configuration 2 unsupported")
    if 322 in tags or 323 in tags:
        raise ValueError("TIFF: tiled organization unsupported")
    compression = tags.get(259, [1])[0]
    photometric = tags.get(262, [1])[0]
    rows_per_strip = tags.get(278, [height])[0] or height
    predictor = tags.get(317, [1])[0]

    stride = width * spp
    raw = bytearray()
    for i, (off, cnt) in enumerate(zip(offsets, counts)):
        if off + cnt > len(data):
            raise ValueError("TIFF corrupt: strip past EOF")
        strip = data[off : off + cnt]
        nrows = min(rows_per_strip, height - i * rows_per_strip)
        expect = nrows * stride
        if compression == 1:
            if len(strip) < expect:
                raise ValueError("TIFF corrupt: short uncompressed strip")
            raw += strip[:expect]
        elif compression == 32773:
            raw += _packbits_decode(strip, expect)
        elif compression == 5:
            raw += _lzw_decode(strip, expect)
        else:
            raise ValueError(f"TIFF: compression {compression} unsupported")
    px = np.frombuffer(bytes(raw), dtype=np.uint8, count=height * stride)
    px = px.reshape(height, width, spp)
    if predictor == 2:  # horizontal differencing
        px = np.cumsum(px.astype(np.int64), axis=1).astype(np.uint8)
    elif predictor != 1:
        raise ValueError(f"TIFF: predictor {predictor} unsupported")
    if photometric == 0:  # WhiteIsZero
        px = 255 - px
    return px[:, :, 0] if spp == 1 else px


def tiff_encode(
    px: np.ndarray, compression: str = "none", rows_per_strip: int = 8
) -> bytes:
    """uint8 (H, W) gray or (H, W, 3) RGB → little-endian baseline TIFF
    with strip organization; compression 'none' or 'packbits'."""
    px = np.ascontiguousarray(px, dtype=np.uint8)
    gray = px.ndim == 2
    h, w = px.shape[:2]
    spp = 1 if gray else px.shape[2]
    if spp not in (1, 3):
        raise ValueError("tiff_encode: 1 or 3 channels only")
    flat = px.reshape(h, w * spp)
    comp_tag = {"none": 1, "packbits": 32773}.get(compression)
    if comp_tag is None:
        raise ValueError(f"tiff_encode: unknown compression {compression!r}")

    strips = []
    for y0 in range(0, h, rows_per_strip):
        block = flat[y0 : y0 + rows_per_strip].tobytes()
        strips.append(
            block if comp_tag == 1 else _packbits_encode(block)
        )

    n_tags = 9
    header = b"II*\x00" + struct.pack("<I", 8)
    ifd_size = 2 + 12 * n_tags + 4
    # layout: header | IFD | bits-per-sample array (rgb) | strip tables | strips
    pos = 8 + ifd_size
    bps_off = pos
    if not gray:
        pos += 6
    off_tab = pos
    pos += 4 * len(strips)
    cnt_tab = pos
    pos += 4 * len(strips)
    strip_offsets = []
    for s in strips:
        strip_offsets.append(pos)
        pos += len(s)

    def entry(tag, typ, count, value):
        return struct.pack("<HHII", tag, typ, count, value)

    entries = [
        entry(256, 4, 1, w),
        entry(257, 4, 1, h),
        entry(258, 3, spp, 8 if gray else bps_off),
        entry(259, 3, 1, comp_tag),
        entry(262, 3, 1, 1 if gray else 2),
        entry(273, 4, len(strips), off_tab if len(strips) > 1 else strip_offsets[0]),
        entry(277, 3, 1, spp),
        entry(278, 4, 1, rows_per_strip),
        entry(279, 4, len(strips), cnt_tab if len(strips) > 1 else len(strips[0])),
    ]
    out = bytearray(header)
    out += struct.pack("<H", n_tags)
    for en in sorted(entries, key=lambda b: struct.unpack("<H", b[:2])[0]):
        out += en
    out += struct.pack("<I", 0)  # next IFD
    if not gray:
        out += struct.pack("<HHH", 8, 8, 8)
    out += b"".join(struct.pack("<I", o) for o in strip_offsets)
    out += b"".join(struct.pack("<I", len(s)) for s in strips)
    for s in strips:
        out += s
    return bytes(out)