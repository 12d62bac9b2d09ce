"""Seekable-zstd container: the public zstd seekable-format spec.

Plain ``.zst`` streams are not random-access, which forces
one-task-per-shard ingestion (llm/corpus_shards.py's documented cost
model). The zstd project's SEEKABLE format fixes that with plain-spec
machinery: the file is a sequence of ordinary zstd frames (each
compressing one bounded chunk) followed by ONE skippable frame holding
a seek table — so any spec decoder reads the whole file unchanged
(skippable frames are ignored), while seek-aware readers jump straight
to the frame containing any offset. Spec:
``zstd/contrib/seekable_format/zstd_seekable_compression_format.md``
(magic ``0x8F92EAB1`` footer inside an ``0x184D2A5E`` skippable frame;
per-frame entries of compressed/decompressed sizes + optional XXH64-low
checksums).

This module writes and reads that container on top of
storage/zstd_codec.py (writes ride its compressing LZ77+FSE encoder);
reads accept any conformant seekable file.

100 TB role: a seekable ``.jsonl.zst`` shard decomposes into
independently decodable frames ⇒ one Spark task per FRAME with ranged
preads, not per shard — the same split discipline as the RCFile/Avro
sync-marker readers. llm/corpus_shards.py builds on this for
``read_jsonl_seekable``.
"""

from __future__ import annotations

import os
import struct

from hdp2_5_hive2_spark.storage.zstd_codec import (
    xxh64,
    zstd_compress,
    zstd_decompress,
)

__all__ = [
    "write_seekable",
    "read_seek_table",
    "read_seek_table_file",
    "read_seekable",
    "SeekEntry",
]

_SKIP_MAGIC_E = 0x184D2A5E
_SEEK_MAGIC = 0x8F92EAB1
_MAX_FRAMES = 0x8000000  # spec: number of frames fits u32; sane cap


class SeekEntry:
    """One frame of a seekable file: byte ranges in both domains, plus
    the optional XXH64-low checksum of the decompressed chunk."""

    __slots__ = ("c_off", "c_len", "d_off", "d_len", "checksum")

    def __init__(self, c_off: int, c_len: int, d_off: int, d_len: int,
                 checksum: int | None = None):
        self.c_off = c_off
        self.c_len = c_len
        self.d_off = d_off
        self.d_len = d_len
        self.checksum = checksum

    def __repr__(self) -> str:  # debugging aid
        return f"SeekEntry(c={self.c_off}+{self.c_len}, d={self.d_off}+{self.d_len})"


def write_seekable(
    chunks: list[bytes], checksums: bool = True
) -> bytes:
    """Each chunk becomes one standard zstd frame; the caller picks chunk
    boundaries (for JSONL shards: whole lines, so every frame parses on
    its own). Appends the spec's seek-table skippable frame."""
    if len(chunks) > _MAX_FRAMES:
        raise ValueError("seekable zstd: too many frames")
    out = bytearray()
    entries = []
    for chunk in chunks:
        frame = zstd_compress(chunk, checksum=False)
        entries.append((len(frame), len(chunk), xxh64(chunk) & 0xFFFFFFFF))
        out += frame
    entry_size = 12 if checksums else 8
    table = bytearray()
    table += struct.pack("<II", _SKIP_MAGIC_E, entry_size * len(entries) + 9)
    for c_len, d_len, ck in entries:
        table += struct.pack("<II", c_len, d_len)
        if checksums:
            table += struct.pack("<I", ck)
    descriptor = 0x80 if checksums else 0x00
    table += struct.pack("<IBI", len(entries), descriptor, _SEEK_MAGIC)
    return bytes(out) + bytes(table)


def read_seek_table(blob: bytes) -> list[SeekEntry]:
    """Parse the footer seek table → frame ranges. Only the LAST
    ``9 + entries`` bytes are examined, mirroring how a remote reader
    would issue one ranged GET for the footer."""
    if len(blob) < 17:
        raise ValueError("seekable zstd corrupt: too short for a seek table")
    n_frames, descriptor, magic = struct.unpack_from("<IBI", blob, len(blob) - 9)
    if magic != _SEEK_MAGIC:
        raise ValueError("seekable zstd corrupt: bad seekable magic")
    if descriptor & 0x7C:
        raise ValueError("seekable zstd corrupt: reserved descriptor bits set")
    entry_size = 12 if descriptor & 0x80 else 8
    table_len = entry_size * n_frames + 9
    head = len(blob) - table_len - 8
    if head < 0:
        raise ValueError("seekable zstd corrupt: seek table exceeds file")
    skip_magic, skip_len = struct.unpack_from("<II", blob, head)
    if skip_magic != _SKIP_MAGIC_E or skip_len != table_len:
        raise ValueError("seekable zstd corrupt: bad seek-table skippable frame")
    entries: list[SeekEntry] = []
    c_off = d_off = 0
    pos = head + 8
    for _ in range(n_frames):
        c_len, d_len = struct.unpack_from("<II", blob, pos)
        ck = (
            struct.unpack_from("<I", blob, pos + 8)[0]
            if entry_size == 12
            else None
        )
        pos += entry_size
        entries.append(SeekEntry(c_off, c_len, d_off, d_len, ck))
        c_off += c_len
        d_off += d_len
    if c_off != head:
        raise ValueError("seekable zstd corrupt: frame sizes do not tile file")
    return entries


def read_seekable(blob: bytes, entry: SeekEntry, verify: bool = True) -> bytes:
    """Decode one frame given its seek entry (callers with ranged IO pass
    just that slice's bytes positioned via c_off/c_len)."""
    data = zstd_decompress(blob[entry.c_off : entry.c_off + entry.c_len])
    if len(data) != entry.d_len:
        raise ValueError("seekable zstd corrupt: frame size mismatch")
    if verify and entry.checksum is not None:
        if xxh64(data) & 0xFFFFFFFF != entry.checksum:
            raise ValueError("seekable zstd corrupt: frame checksum mismatch")
    return data


def read_seek_table_file(path: str) -> list[SeekEntry] | None:
    """Footer-only seek-table parse via two ranged preads (the object-store
    planning pattern): 9-byte footer probe, then just the table. Returns
    None when the file is not seekable-zstd (callers fall back to
    whole-member reading)."""
    size = os.path.getsize(path)
    if size < 17:
        return None
    with open(path, "rb") as fh:
        fh.seek(size - 9)
        n_frames, descriptor, magic = struct.unpack("<IBI", fh.read(9))
        if magic != _SEEK_MAGIC or descriptor & 0x7C:
            return None
        entry_size = 12 if descriptor & 0x80 else 8
        table_len = entry_size * n_frames + 9
        head = size - table_len - 8
        if head < 0:
            return None
        fh.seek(head)
        tail = fh.read(8 + entry_size * n_frames)
    skip_magic, skip_len = struct.unpack_from("<II", tail, 0)
    if skip_magic != _SKIP_MAGIC_E or skip_len != table_len:
        raise ValueError("seekable zstd corrupt: bad seek-table skippable frame")
    entries: list[SeekEntry] = []
    c_off = d_off = 0
    pos = 8
    for _ in range(n_frames):
        c_len, d_len = struct.unpack_from("<II", tail, pos)
        ck = (
            struct.unpack_from("<I", tail, pos + 8)[0]
            if entry_size == 12
            else None
        )
        pos += entry_size
        entries.append(SeekEntry(c_off, c_len, d_off, d_len, ck))
        c_off += c_len
        d_off += d_len
    if c_off != head:
        raise ValueError("seekable zstd corrupt: frame sizes do not tile file")
    return entries
