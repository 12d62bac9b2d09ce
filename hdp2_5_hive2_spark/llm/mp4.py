"""MP4 / ISO Base Media File Format container from the public spec.

Parity target: same multimodal-ingest contract as `llm/avi.py` (SURVEY §2
"multimodal columns") — MP4 is the dominant container in crawled video
corpora, so a training-data pipeline must at minimum AUDIT it (codec,
geometry, duration, frame count, bitrate) and locate sample byte ranges
without a codec library. Everything derives from the published ISO/IEC
14496-12 box grammar: box = u32 size + fourcc (size 1 → u64 largesize),
`moov/trak/mdia/minf/stbl` hierarchy, and the sample tables

  stsd — sample descriptions (codec fourcc, width/height for video)
  stts — decoding time deltas, run-length encoded (sample_count, delta)
  stsz — per-sample byte sizes (or one constant size)
  stsc — sample→chunk mapping runs (first_chunk, samples_per_chunk, ...)
  stco / co64 — chunk file offsets (u32 / u64)

With those five tables every sample's (file_offset, length, timestamp)
is computable — `mp4_sample_ranges` does exactly that, which is the
ranged-GET random-access path at 100 TB (the moov box is a tiny prefix/
suffix read; mdat is never scanned). Full pixel decode stays honestly
bounded: `mjpeg`-coded tracks (fourcc 'jpeg'/'mjpa') decode through the
from-spec T.81 decoder; AVC/HEVC payloads are extracted but not decoded
(a real codec library's job — same boundary avi.py draws for H264).

The writer emits a minimal conformant file (ftyp + mdat + moov with one
video track, identity matrices, 1000-unit timescale) so roundtrips and
cross-checks don't depend on any external muxer.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field

__all__ = [
    "Mp4Track",
    "mp4_parse",
    "mp4_probe",
    "mp4_sample_ranges",
    "mp4_mux",
    "mp4_decode_frames",
]


def _u32(x: int) -> bytes:
    return struct.pack(">I", x)


def _box(fourcc: bytes, body: bytes) -> bytes:
    return _u32(8 + len(body)) + fourcc + body


def _full(fourcc: bytes, body: bytes, version: int = 0, flags: int = 0) -> bytes:
    return _box(fourcc, struct.pack(">I", (version << 24) | flags) + body)


def _walk(data: bytes, pos: int, end: int):
    """Yield (fourcc, body_start, body_end) over a box sequence."""
    while pos + 8 <= end:
        (size,) = struct.unpack_from(">I", data, pos)
        fourcc = data[pos + 4 : pos + 8]
        body = pos + 8
        if size == 1:
            (size,) = struct.unpack_from(">Q", data, pos + 8)
            body = pos + 16
        elif size == 0:  # box extends to end of file
            size = end - pos
        if size < 8 or pos + size > end:
            raise ValueError("MP4 corrupt: box overruns its parent")
        yield fourcc, body, pos + size
        pos += size


def _find(data: bytes, pos: int, end: int, fourcc: bytes):
    for fc, b, e in _walk(data, pos, end):
        if fc == fourcc:
            return b, e
    return None


@dataclass
class Mp4Track:
    """One video track's audit row + sample geometry."""

    codec: str                 # stsd entry fourcc, e.g. "avc1", "jpeg"
    width: int
    height: int
    timescale: int             # mdhd units/second
    duration: int              # mdhd units
    n_samples: int
    sample_sizes: list[int] = field(repr=False)
    sample_offsets: list[int] = field(repr=False)
    sample_ts: list[int] = field(repr=False)  # decode times, mdhd units

    @property
    def duration_ms(self) -> int:
        return self.duration * 1000 // self.timescale if self.timescale else 0

    def ts_ms(self, i: int) -> int:
        return self.sample_ts[i] * 1000 // self.timescale


def _parse_stbl(data: bytes, b: int, e: int):
    codec = width = height = None
    sizes: list[int] = []
    chunk_offsets: list[int] = []
    stsc_runs: list[tuple[int, int]] = []
    deltas: list[tuple[int, int]] = []
    for fc, bb, ee in _walk(data, b, e):
        if fc == b"stsd":
            (n,) = struct.unpack_from(">I", data, bb + 4)
            if n:
                entry = bb + 8
                codec = data[entry + 4 : entry + 8].decode("ascii", "replace")
                # VisualSampleEntry: 8 size/fourcc + 6 reserved + 2 dri +
                # 16 predefined/reserved → width/height u16 at entry+32
                width, height = struct.unpack_from(">HH", data, entry + 32)
        elif fc == b"stsz":
            const, n = struct.unpack_from(">II", data, bb + 4)
            sizes = (
                [const] * n
                if const
                else list(struct.unpack_from(f">{n}I", data, bb + 12))
            )
        elif fc == b"stco":
            (n,) = struct.unpack_from(">I", data, bb + 4)
            chunk_offsets = list(struct.unpack_from(f">{n}I", data, bb + 8))
        elif fc == b"co64":
            (n,) = struct.unpack_from(">I", data, bb + 4)
            chunk_offsets = list(struct.unpack_from(f">{n}Q", data, bb + 8))
        elif fc == b"stsc":
            (n,) = struct.unpack_from(">I", data, bb + 4)
            for i in range(n):
                first, per, _desc = struct.unpack_from(">III", data, bb + 8 + 12 * i)
                stsc_runs.append((first, per))
        elif fc == b"stts":
            (n,) = struct.unpack_from(">I", data, bb + 4)
            for i in range(n):
                cnt, delta = struct.unpack_from(">II", data, bb + 8 + 8 * i)
                deltas.append((cnt, delta))
    return codec, width, height, sizes, chunk_offsets, stsc_runs, deltas


def _sample_layout(
    sizes: list[int],
    chunk_offsets: list[int],
    stsc_runs: list[tuple[int, int]],
    deltas: list[tuple[int, int]],
):
    """Resolve stsz+stco+stsc+stts into per-sample (offset, ts)."""
    # samples per chunk: stsc runs apply from first_chunk until next run
    per_chunk: list[int] = []
    for i, (first, per) in enumerate(stsc_runs):
        last = (
            stsc_runs[i + 1][0] - 1 if i + 1 < len(stsc_runs) else len(chunk_offsets)
        )
        per_chunk.extend([per] * (last - first + 1))
    offsets: list[int] = []
    si = 0
    for ci, base in enumerate(chunk_offsets):
        off = base
        for _ in range(per_chunk[ci] if ci < len(per_chunk) else 0):
            if si >= len(sizes):
                break
            offsets.append(off)
            off += sizes[si]
            si += 1
    ts: list[int] = []
    t = 0
    for cnt, delta in deltas:
        for _ in range(cnt):
            ts.append(t)
            t += delta
    return offsets, ts


def mp4_parse(data: bytes) -> list[Mp4Track]:
    """Parse moov and return every video track's audit + sample geometry.
    Only box headers and the (small) sample tables are touched — mdat
    payload bytes are never read, so at scale this is a metadata-sized
    read per asset."""
    if len(data) < 12 or data[4:8] != b"ftyp":
        raise ValueError("not an MP4 (missing ftyp)")
    moov = _find(data, 0, len(data), b"moov")
    if moov is None:
        raise ValueError("MP4 corrupt: missing moov")
    return _parse_moov(data, *moov)


def _parse_moov(data: bytes, start: int, end: int) -> list[Mp4Track]:
    """Track extraction over a moov BODY — shared by the whole-buffer
    parser and the seek-based file probe (which reads only the moov box).
    Corrupt sample tables (truncated arrays, missing required boxes)
    raise ValueError, never struct.error/IndexError — crawl data is
    hostile and callers filter on a single exception type."""
    try:
        return _parse_moov_inner(data, start, end)
    except struct.error as exc:
        raise ValueError(f"MP4 corrupt: truncated table ({exc})") from None


def _parse_moov_inner(data: bytes, start: int, end: int) -> list[Mp4Track]:
    tracks: list[Mp4Track] = []
    for fc, b, e in _walk(data, start, end):
        if fc != b"trak":
            continue
        mdia = _find(data, b, e, b"mdia")
        if mdia is None:
            continue
        mdhd = _find(data, *mdia, b"mdhd")
        hdlr = _find(data, *mdia, b"hdlr")
        if mdhd is None or hdlr is None:
            raise ValueError("MP4 corrupt: trak missing mdhd/hdlr")
        version = data[mdhd[0]]
        if version == 1:
            timescale, duration = struct.unpack_from(">IQ", data, mdhd[0] + 20)
        else:
            timescale, duration = struct.unpack_from(">II", data, mdhd[0] + 12)
        handler = data[hdlr[0] + 8 : hdlr[0] + 12]
        if handler != b"vide":
            continue
        minf = _find(data, *mdia, b"minf")
        stbl = _find(data, *minf, b"stbl") if minf is not None else None
        if stbl is None:
            raise ValueError("MP4 corrupt: video trak missing minf/stbl")
        codec, width, height, sizes, chunks, stsc, deltas = _parse_stbl(data, *stbl)
        offsets, ts = _sample_layout(sizes, chunks, stsc, deltas)
        if len(offsets) != len(sizes) or len(ts) < len(sizes):
            raise ValueError("MP4 corrupt: sample tables disagree on count")
        tracks.append(
            Mp4Track(
                codec or "????", width or 0, height or 0, timescale, duration,
                len(sizes), sizes, offsets, ts[: len(sizes)],
            )
        )
    return tracks


def mp4_probe(fh) -> list[Mp4Track]:
    """Seek-based probe over an open binary file: walks top-level box
    HEADERS (8-16 bytes each), loads only the moov box into memory, and
    resolves the sample tables — mdat is skipped with a seek, so probing
    a multi-GB file reads kilobytes. The object-store translation is two
    ranged GETs (header walk + moov); sample offsets in the returned
    tracks are absolute file offsets, ready for ranged payload reads."""
    hdr = fh.read(12)
    if len(hdr) < 12 or hdr[4:8] != b"ftyp":
        raise ValueError("not an MP4 (missing ftyp)")
    (size,) = struct.unpack_from(">I", hdr, 0)
    fh.seek(size)
    while True:
        head = fh.read(8)
        if len(head) < 8:
            raise ValueError("MP4 corrupt: missing moov")
        (size,) = struct.unpack_from(">I", head, 0)
        fourcc = head[4:8]
        body = 8
        if size == 1:
            (size,) = struct.unpack(">Q", fh.read(8))
            body = 16
        if size < body:
            raise ValueError("MP4 corrupt: bad box size")
        if fourcc == b"moov":
            moov = fh.read(size - body)
            if len(moov) < size - body:
                raise ValueError("MP4 corrupt: truncated moov")
            return _parse_moov(moov, 0, len(moov))
        fh.seek(size - body, 1)


def mp4_sample_ranges(data: bytes) -> list[tuple[int, int, int]]:
    """(file_offset, length, ts_ms) per video sample of the first video
    track — the ranged-GET access path: frame k is one bounded read."""
    tracks = mp4_parse(data)
    if not tracks:
        raise ValueError("MP4: no video track")
    t = tracks[0]
    return [
        (t.sample_offsets[i], t.sample_sizes[i], t.ts_ms(i))
        for i in range(t.n_samples)
    ]


def mp4_mux(
    frames: list[bytes],
    width: int,
    height: int,
    codec: str = "jpeg",
    timescale: int = 1000,
    sample_delta: int = 40,
) -> bytes:
    """Minimal conformant single-video-track MP4: ftyp, mdat (frame
    payloads back to back), moov with full sample tables. Chunk layout:
    one chunk holding all samples (stsc run (1, n)), stco pointing into
    mdat — enough to exercise every table the parser resolves."""
    if not frames:
        raise ValueError("MP4: need at least one frame")
    ftyp = _box(b"ftyp", b"isom" + _u32(512) + b"isomiso2mp41")
    mdat_body = b"".join(frames)
    mdat = _box(b"mdat", mdat_body)
    data_start = len(ftyp) + 8  # offset of first sample in the file

    n = len(frames)
    duration = n * sample_delta

    # VisualSampleEntry body: 6 reserved + u16 data_ref_index, then
    # pre_defined/reserved (16 bytes), width, height, resolutions, frame
    # count, compressorname(32), depth, pre_defined
    sample_entry = _box(
        codec.encode("ascii"),
        b"\x00" * 6 + struct.pack(">H", 1) + b"\x00" * 16
        + struct.pack(">HH", width, height)
        + struct.pack(">II", 0x00480000, 0x00480000)  # 72 dpi
        + _u32(0) + struct.pack(">H", 1) + b"\x00" * 32
        + struct.pack(">Hh", 24, -1),
    )
    stsd = _full(b"stsd", _u32(1) + sample_entry)
    stts = _full(b"stts", _u32(1) + struct.pack(">II", n, sample_delta))
    stsc = _full(b"stsc", _u32(1) + struct.pack(">III", 1, n, 1))
    stsz = _full(b"stsz", _u32(0) + _u32(n) + b"".join(_u32(len(f)) for f in frames))
    stco = _full(b"stco", _u32(1) + _u32(data_start))
    stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)

    vmhd = _full(b"vmhd", struct.pack(">HHHH", 0, 0, 0, 0), flags=1)
    dref = _full(b"dref", _u32(1) + _full(b"url ", b"", flags=1))
    dinf = _box(b"dinf", dref)
    minf = _box(b"minf", vmhd + dinf + stbl)

    mdhd = _full(b"mdhd", struct.pack(">IIIIHH", 0, 0, timescale, duration, 0x55C4, 0))
    hdlr = _full(b"hdlr", _u32(0) + b"vide" + _u32(0) * 3 + b"VideoHandler\x00")
    mdia = _box(b"mdia", mdhd + hdlr + minf)

    matrix = struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
    tkhd = _full(
        b"tkhd",
        struct.pack(">IIIII", 0, 0, 1, 0, duration) + b"\x00" * 16 + matrix
        + struct.pack(">II", width << 16, height << 16),
        flags=3,
    )
    trak = _box(b"trak", tkhd + mdia)
    mvhd = _full(
        b"mvhd",
        struct.pack(">IIII", 0, 0, timescale, duration)
        + struct.pack(">iH", 0x10000, 0x0100) + b"\x00" * 10 + matrix
        + b"\x00" * 24 + _u32(2),
    )
    moov = _box(b"moov", mvhd + trak)
    return ftyp + mdat + moov


def mp4_decode_frames(data: bytes):
    """[(ts_ms, RGB uint8 array)] for mjpeg-coded tracks ('jpeg'/'mjpa'
    sample entries) via the from-spec T.81 decoder; other codecs raise —
    use mp4_sample_ranges for codec-agnostic extraction."""
    import numpy as np

    tracks = mp4_parse(data)
    if not tracks:
        raise ValueError("MP4: no video track")
    t = tracks[0]
    if t.codec not in ("jpeg", "mjpa"):
        raise ValueError(f"MP4: unsupported sample codec {t.codec!r}")
    from hdp2_5_hive2_spark.llm.jpeg import jpeg_decode

    out = []
    for i in range(t.n_samples):
        o, ln = t.sample_offsets[i], t.sample_sizes[i]
        px = jpeg_decode(data[o : o + ln])
        if px.ndim == 2:
            px = np.repeat(px[:, :, None], 3, axis=2)
        out.append((t.ts_ms(i), px))
    return out
