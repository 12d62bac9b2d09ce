"""Snappy block format + Hadoop codec framing, from the public specs.

Why: Hive clusters commonly store RCFile/Avro/SequenceFile data
snappy-compressed (org.apache.hadoop.io.compress.SnappyCodec /
avro.codec=snappy). This container has no python-snappy, but the format is
small and published (google/snappy format_description.txt), and the JVM
side ships snappy-java — so the cross-parity tests exercise this decoder
against real snappy-java output, not just our own encoder.

Three layers here:

1. **Raw snappy block format** (``snappy_decompress`` / ``snappy_compress``):
   varint preamble (uncompressed length), then literal/copy elements.
   The compressor is a greedy 4-byte-hash matcher emitting 2-byte-offset
   copies — spec-valid output; ratio within ~10-20% of the reference
   implementation on text, and any spec-conforming decoder (snappy-java
   included) reads it.
2. **Hadoop block framing** (``hadoop_snappy_decompress`` /
   ``hadoop_snappy_compress``): BlockCompressorStream's wire layout —
   repeated [int32-BE raw block length][one or more chunks of
   [int32-BE compressed length][compressed bytes]] — what
   ``codec.createOutputStream`` wraps around RCFile column segments
   (parity target: RCFile.java's per-segment codec streams in
   /root/reference ql/src/java/org/apache/hadoop/hive/ql/io/RCFile.java).
3. Avro's snappy block framing (raw snappy + CRC32 of the uncompressed
   bytes) lives in storage/avro.py next to the other avro codecs.

100 TB note: these Python kernels serve the in-memory-session read/write
carve-out only (same scope as the RCFile pure-Python parser); hive-catalog
sessions compress/decompress JVM-side via snappy-java.
"""

from __future__ import annotations

import struct

_HADOOP_BLOCK = 256 * 1024  # io.compression.codec.snappy.buffersize default

__all__ = [
    "hadoop_snappy_compress",
    "hadoop_snappy_decompress",
    "snappy_compress",
    "snappy_decompress",
]


# --------------------------------------------------------------------------
# Raw snappy block format
# --------------------------------------------------------------------------


def _read_varint(data: bytes, pos: int) -> tuple[int, int]:
    shift, acc = 0, 0
    while True:
        b = data[pos]
        pos += 1
        acc |= (b & 0x7F) << shift
        if not (b & 0x80):
            return acc, pos
        shift += 7
        if shift > 35:
            raise ValueError("snappy corrupt: varint overflow")


def snappy_decompress(data: bytes) -> bytes:
    """Decode one raw snappy block (the format inside Hadoop/Avro framing)."""
    if not data:
        raise ValueError("snappy corrupt: empty input")
    total, pos = _read_varint(data, 0)
    out = bytearray()
    n = len(data)
    while pos < n:
        tag = data[pos]
        pos += 1
        kind = tag & 3
        if kind == 0:  # literal
            v = tag >> 2
            if v < 60:
                ln = v + 1
            else:
                nb = v - 59  # 1..4 extra little-endian length bytes
                ln = int.from_bytes(data[pos : pos + nb], "little") + 1
                pos += nb
            if pos + ln > n:
                raise ValueError("snappy corrupt: literal overruns input")
            out += data[pos : pos + ln]
            pos += ln
            continue
        if kind == 1:  # copy, 1-byte offset, length 4..11
            ln = 4 + ((tag >> 2) & 0x7)
            off = ((tag >> 5) << 8) | data[pos]
            pos += 1
        elif kind == 2:  # copy, 2-byte LE offset
            ln = (tag >> 2) + 1
            off = int.from_bytes(data[pos : pos + 2], "little")
            pos += 2
        else:  # copy, 4-byte LE offset
            ln = (tag >> 2) + 1
            off = int.from_bytes(data[pos : pos + 4], "little")
            pos += 4
        if off == 0 or off > len(out):
            raise ValueError("snappy corrupt: copy offset out of range")
        start = len(out) - off
        if off >= ln:
            out += out[start : start + ln]
        else:  # overlapping copy: byte-serial semantics (RLE-style)
            for i in range(ln):
                out.append(out[start + i])
    if len(out) != total:
        raise ValueError(
            f"snappy corrupt: produced {len(out)} bytes, preamble said {total}"
        )
    return bytes(out)


def _emit_literal(out: bytearray, chunk: bytes) -> None:
    ln = len(chunk)
    if not ln:
        return
    if ln <= 60:
        out.append((ln - 1) << 2)
    elif ln <= 0x100:
        out.append(60 << 2)
        out.append(ln - 1)
    elif ln <= 0x10000:
        out.append(61 << 2)
        out += (ln - 1).to_bytes(2, "little")
    elif ln <= 0x1000000:
        out.append(62 << 2)
        out += (ln - 1).to_bytes(3, "little")
    else:
        out.append(63 << 2)
        out += (ln - 1).to_bytes(4, "little")
    out += chunk


def snappy_compress(data: bytes) -> bytes:
    """Encode one raw snappy block: greedy 4-byte-hash matching with
    2-byte-offset copies (≤64 per element, ≥4 to take a match), literals
    between matches — the same scheme as the reference implementation's
    fast path, minus its skip heuristics."""
    n = len(data)
    out = bytearray()
    # varint preamble
    u = n
    while True:
        b = u & 0x7F
        u >>= 7
        if u:
            out.append(b | 0x80)
        else:
            out.append(b)
            break
    if n < 4:
        _emit_literal(out, data)
        return bytes(out)
    table: dict[bytes, int] = {}
    i = 0
    lit_start = 0
    while i + 4 <= n:
        key = data[i : i + 4]
        j = table.get(key)
        table[key] = i
        if j is None or i - j > 0xFFFF:
            i += 1
            continue
        # extend the match
        ln = 4
        while i + ln < n and ln < 64 and data[j + ln] == data[i + ln]:
            ln += 1
        _emit_literal(out, data[lit_start:i])
        off = i - j
        out.append(((ln - 1) << 2) | 2)
        out += off.to_bytes(2, "little")
        i += ln
        lit_start = i
    _emit_literal(out, data[lit_start:])
    return bytes(out)


# --------------------------------------------------------------------------
# Hadoop BlockCompressorStream framing
# --------------------------------------------------------------------------


def hadoop_snappy_decompress(data: bytes) -> bytes:
    """Unframe a Hadoop SnappyCodec stream: repeated
    [int32-BE raw length][chunks of [int32-BE compressed length][bytes]]."""
    out = bytearray()
    pos, n = 0, len(data)
    while pos < n:
        if pos + 4 > n:
            raise ValueError("hadoop-snappy corrupt: truncated block header")
        (raw_len,) = struct.unpack_from(">i", data, pos)
        pos += 4
        produced = 0
        while produced < raw_len:
            if pos + 4 > n:
                raise ValueError("hadoop-snappy corrupt: truncated chunk header")
            (clen,) = struct.unpack_from(">i", data, pos)
            pos += 4
            if pos + clen > n:
                raise ValueError("hadoop-snappy corrupt: truncated chunk")
            piece = snappy_decompress(data[pos : pos + clen])
            pos += clen
            out += piece
            produced += len(piece)
        if produced != raw_len:
            raise ValueError(
                f"hadoop-snappy corrupt: block produced {produced}, "
                f"header said {raw_len}"
            )
    return bytes(out)


def hadoop_snappy_compress(data: bytes) -> bytes:
    """Frame ``data`` the way Hadoop's BlockCompressorStream does: blocks of
    ≤256 KiB raw, one snappy chunk each (matches the JVM writer's flush
    cadence, and stays inside snappy-java's decompressor buffer)."""
    if not data:  # an empty codec stream frames nothing at all
        return b""
    out = bytearray()
    for base in range(0, len(data), _HADOOP_BLOCK):
        block = data[base : base + _HADOOP_BLOCK]
        comp = snappy_compress(block)
        out += struct.pack(">i", len(block))
        out += struct.pack(">i", len(comp))
        out += comp
    return bytes(out)
