"""LZ4 block codec from the public format spec + Hadoop framing.

Completes the Hadoop codec family next to `snappy_codec.py` (same
motivation: hive/hadoop-written files must PARSE in in-memory sessions
with no native library, and files we write must read back through the
JVM). The block format is the published lz4 specification: per
sequence, a token byte (high nibble = literal length, low nibble =
match length − 4, 15 ⇒ continuation bytes of 255), literals, a 2-byte
little-endian match offset, and overlapping back-references; the final
sequence is literals-only. The compressor is a greedy 4-byte-hash
matcher — same shape as `snappy_compress` — whose output any conforming
decoder accepts.

Hadoop's Lz4Codec wraps blocks in the identical BlockCompressorStream
framing snappy uses: [int32-BE raw length][chunks of [int32-BE
compressed length][block]].

Cross-parity (tests/test_lz4.py): the container ships lz4-java — our
streams must decompress through `net.jpountz.lz4` and theirs through
ours, both the raw block and the Hadoop framing.
"""

from __future__ import annotations

import struct

__all__ = [
    "lz4_compress",
    "lz4_decompress",
    "hadoop_lz4_compress",
    "hadoop_lz4_decompress",
]

_HADOOP_BLOCK = 256 * 1024
_MIN_MATCH = 4


def lz4_decompress(data: bytes, expected: int | None = None) -> bytes:
    """One LZ4 block → raw bytes. ``expected`` (when known from the
    framing) bounds the output and validates the final size."""
    out = bytearray()
    pos = 0
    n = len(data)
    while pos < n:
        token = data[pos]
        pos += 1
        lit_len = token >> 4
        if lit_len == 15:
            while True:
                if pos >= n:
                    raise ValueError("lz4 corrupt: truncated literal length")
                b = data[pos]
                pos += 1
                lit_len += b
                if b != 255:
                    break
        if pos + lit_len > n:
            raise ValueError("lz4 corrupt: literals past end")
        out += data[pos : pos + lit_len]
        pos += lit_len
        if pos >= n:
            break  # final literals-only sequence
        if pos + 2 > n:
            raise ValueError("lz4 corrupt: truncated match offset")
        (offset,) = struct.unpack_from("<H", data, pos)
        pos += 2
        if offset == 0 or offset > len(out):
            raise ValueError("lz4 corrupt: bad match offset")
        match_len = (token & 0xF) + _MIN_MATCH
        if (token & 0xF) == 15:
            while True:
                if pos >= n:
                    raise ValueError("lz4 corrupt: truncated match length")
                b = data[pos]
                pos += 1
                match_len += b
                if b != 255:
                    break
        start = len(out) - offset
        for i in range(match_len):  # byte-wise: offsets may overlap
            out.append(out[start + i])
        if expected is not None and len(out) > expected:
            raise ValueError("lz4 corrupt: output exceeds declared size")
    if expected is not None and len(out) != expected:
        raise ValueError("lz4 corrupt: output size mismatch")
    return bytes(out)


def _write_len(out: bytearray, ln: int) -> None:
    while ln >= 255:
        out.append(255)
        ln -= 255
    out.append(ln)


def lz4_compress(data: bytes) -> bytes:
    """Greedy hash-match compressor emitting spec-conformant sequences.
    Honors the spec's end-of-block restrictions (last 5 bytes are always
    literals; matches must not start within the last 12 bytes)."""
    n = len(data)
    out = bytearray()
    if n == 0:
        out.append(0)
        return bytes(out)
    table: dict[bytes, int] = {}
    anchor = 0
    pos = 0
    limit = n - 12  # spec: no match may begin past this point
    while pos < limit:
        key = data[pos : pos + 4]
        cand = table.get(key)
        table[key] = pos
        if cand is not None and pos - cand <= 0xFFFF and data[cand : cand + 4] == key:
            match_len = 4
            max_len = (n - 5) - pos  # keep the final 5 literals
            while (
                match_len < max_len
                and data[cand + match_len] == data[pos + match_len]
            ):
                match_len += 1
            lit = data[anchor:pos]
            token_lit = 15 if len(lit) >= 15 else len(lit)
            token_match = 15 if match_len - 4 >= 15 else match_len - 4
            out.append((token_lit << 4) | token_match)
            if token_lit == 15:
                _write_len(out, len(lit) - 15)
            out += lit
            out += struct.pack("<H", pos - cand)
            if token_match == 15:
                _write_len(out, match_len - 4 - 15)
            pos += match_len
            anchor = pos
        else:
            pos += 1
    lit = data[anchor:]
    token_lit = 15 if len(lit) >= 15 else len(lit)
    out.append(token_lit << 4)
    if token_lit == 15:
        _write_len(out, len(lit) - 15)
    out += lit
    return bytes(out)


def hadoop_lz4_decompress(data: bytes) -> bytes:
    """Hadoop Lz4Codec BlockCompressorStream framing (identical to the
    snappy framing): repeated [int32-BE raw][chunks of [int32-BE
    clen][lz4 block]]."""
    out = bytearray()
    pos = 0
    n = len(data)
    while pos < n:
        if pos + 4 > n:
            raise ValueError("hadoop-lz4 corrupt: truncated block header")
        (raw_len,) = struct.unpack_from(">i", data, pos)
        pos += 4
        got = 0
        while got < raw_len:
            if pos + 4 > n:
                raise ValueError("hadoop-lz4 corrupt: truncated chunk header")
            (clen,) = struct.unpack_from(">i", data, pos)
            pos += 4
            if pos + clen > n:
                raise ValueError("hadoop-lz4 corrupt: truncated chunk")
            chunk = lz4_decompress(data[pos : pos + clen])
            pos += clen
            out += chunk
            got += len(chunk)
        if got != raw_len:
            raise ValueError("hadoop-lz4 corrupt: block length mismatch")
    return bytes(out)


def hadoop_lz4_compress(data: bytes) -> bytes:
    out = bytearray()
    for base in range(0, len(data), _HADOOP_BLOCK):
        block = data[base : base + _HADOOP_BLOCK]
        comp = lz4_compress(block)
        out += struct.pack(">i", len(block))
        out += struct.pack(">i", len(comp))
        out += comp
    return bytes(out)
